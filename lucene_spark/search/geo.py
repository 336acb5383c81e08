"""LatLonPoint geo queries and distance sort — Spark-first.

Reference semantics:

- ``core/document/LatLonPoint.java`` ``newDistanceQuery(field, lat, lon,
  radiusMeters)`` → ``LatLonPointDistanceQuery``: match docs whose point
  lies within ``radiusMeters`` of the center (haversine distance), with a
  bounding-box pre-filter (the BKD-tree pruning step).
- ``core/document/LatLonDocValuesField.java`` ``newDistanceSort(field, lat,
  lon)``: sort hits by haversine distance to a center point.
- ``core/geo/GeoEncodingUtils.java`` (encodeLatitude/decodeLatitude):
  coordinates are stored quantized to int32 — ``floor(lat · 2^31/90)`` /
  the inverse scale on decode (~4.2e-8 deg resolution). We apply the same
  encode/decode roundtrip when attaching geo doc values, so the stored
  precision contract matches Lucene's.
- ``core/util/SloppyMath.java`` ``haversinMeters`` — mean earth radius
  6371008.7714 m. (Lucene's "sloppy" sin is a JVM speed hack; Catalyst's
  codegen trig intrinsics fill that role here, so we use exact
  sin/cos/asin.)

Plan shape (100-TB lens): geo doc values are a columnar side table
(doc_id, lat, lon). A distance query is ONE scan — cheap bounding-box
comparisons prune rows before any trig (pushdown-able when the table is
parquet), then the exact haversine predicate; no shuffle, no Python UDF.
A distance sort joins the distributed match set to the geo table and
TakeOrdered's k rows to the driver.

The arithmetic is emitted as ONE SQL expression string (`haversine_sql`)
used both by the engine (``F.expr`` → Catalyst codegen) and by the DuckDB
correctness oracle — identical operation order on both sides, so the only
cross-engine divergence is libm trig in the last ulps (the gates quantize
distances to whole meters, 7+ orders of magnitude above that noise).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

# SloppyMath.TO_METERS (mean earth radius, meters)
EARTH_RADIUS_M = 6371008.7714


def dlit(x: float) -> str:
    """A float as a DOUBLE SQL literal valid in both Spark SQL and DuckDB.
    Bare decimal literals (``0.5``) parse as DECIMAL in both engines —
    scientific notation with 17 significant digits parses as DOUBLE and
    round-trips the exact IEEE value."""
    return format(float(x), ".17e")


# GeoEncodingUtils scales: int32 range over ±90 / ±180 degrees
LAT_SCALE = "(2147483648e0 / 90e0)"
LON_SCALE = "(2147483648e0 / 180e0)"
_DEG2RAD = dlit(math.pi / 180.0)


def quantize_sql(col: str, scale: str) -> str:
    """GeoEncodingUtils encode→decode roundtrip as a SQL expression:
    ``floor(x·scale) / scale`` (int32 clamp is a no-op for in-range
    coordinates; callers validate range)."""
    return f"(floor(({col}) * {scale}) / {scale})"


def haversine_sql(lat_col: str, lon_col: str,
                  center_lat: float, center_lon: float) -> str:
    """Haversine meters from (lat_col, lon_col) in degrees to a fixed
    center, as one SQL scalar expression (valid in both Spark SQL and
    DuckDB). Center-dependent constants (radians, cos) are folded to
    double literals in Python so both engines consume identical bits."""
    phi2 = dlit(math.radians(center_lat))
    lam2 = dlit(math.radians(center_lon))
    cos_phi2 = dlit(math.cos(math.radians(center_lat)))
    two_r = dlit(2.0 * EARTH_RADIUS_M)
    phi1 = f"(({lat_col}) * {_DEG2RAD})"
    lam1 = f"(({lon_col}) * {_DEG2RAD})"
    sdphi = f"sin(({phi1} - {phi2}) * 5e-1)"
    sdlam = f"sin(({lam1} - {lam2}) * 5e-1)"
    h = f"({sdphi} * {sdphi} + cos({phi1}) * {cos_phi2} * ({sdlam} * {sdlam}))"
    return f"({two_r} * asin(least(1e0, sqrt({h}))))"


def distance_bbox(center_lat: float, center_lon: float, radius_m: float):
    """Conservative bounding box for the distance query's pre-filter
    (``core/geo/Rectangle.java`` fromPointDistance analogue), as
    (lat_min, lat_max, lon_ranges) where lon_ranges is a list of
    (lon_min, lon_max) intervals (two when the box crosses the
    antimeridian, the single full range when the box touches a pole).

    A small epsilon pads every edge: the box only PRE-filters — the exact
    haversine predicate decides membership — so padding costs a few extra
    candidate rows, never correctness.
    """
    eps = 1e-6
    dlat = math.degrees(radius_m / EARTH_RADIUS_M) + eps
    lat_min = max(-90.0, center_lat - dlat)
    lat_max = min(90.0, center_lat + dlat)
    if lat_min <= -90.0 + eps or lat_max >= 90.0 - eps:
        return lat_min, lat_max, [(-180.0, 180.0)]  # pole in range
    max_abs_lat = max(abs(lat_min), abs(lat_max))
    sin_ratio = math.sin(radius_m / EARTH_RADIUS_M) / math.cos(
        math.radians(max_abs_lat))
    if abs(sin_ratio) >= 1.0:
        return lat_min, lat_max, [(-180.0, 180.0)]
    dlon = math.degrees(math.asin(sin_ratio)) + eps
    lon_min, lon_max = center_lon - dlon, center_lon + dlon
    if lon_min < -180.0 and lon_max > 180.0:
        return lat_min, lat_max, [(-180.0, 180.0)]
    if lon_min < -180.0:  # wraps west across the antimeridian
        return lat_min, lat_max, [(-180.0, lon_max), (lon_min + 360.0, 180.0)]
    if lon_max > 180.0:  # wraps east
        return lat_min, lat_max, [(lon_min, 180.0), (-180.0, lon_max - 360.0)]
    return lat_min, lat_max, [(lon_min, lon_max)]


def bbox_condition(lat_col: str, lon_col: str,
                   center_lat: float, center_lon: float, radius_m: float):
    """The bounding-box pre-filter as a Spark Column (pure comparisons —
    prunes before any trig evaluates; pushdown-able on parquet geo
    tables)."""
    lat_min, lat_max, lon_ranges = distance_bbox(center_lat, center_lon,
                                                 radius_m)
    cond = F.col(lat_col).between(lat_min, lat_max)
    lon_cond = None
    for lo, hi in lon_ranges:
        rng = F.col(lon_col).between(lo, hi)
        lon_cond = rng if lon_cond is None else (lon_cond | rng)
    return cond & lon_cond


def attach_geo(geo_df, lat_col: str = "lat", lon_col: str = "lon"):
    """Quantize a (doc_id, lat, lon) DataFrame through the
    GeoEncodingUtils int32 encode/decode roundtrip (what LatLonPoint
    stores) — one JVM projection."""
    return geo_df.select(
        "doc_id",
        F.expr(quantize_sql(f"CAST({lat_col} AS DOUBLE)", LAT_SCALE))
        .alias("lat"),
        F.expr(quantize_sql(f"CAST({lon_col} AS DOUBLE)", LON_SCALE))
        .alias("lon"),
    )


def box_bounds(min_lat: float, max_lat: float,
               min_lon: float, max_lon: float):
    """Query-box edge quantization for ``LatLonPoint.newBoxQuery``
    (``core/document/LatLonPoint.java`` newBoxQuery →
    ``core/geo/GeoEncodingUtils.java`` encodeCeil on the min edges /
    encode (floor) on the max edges): snap each edge to the int32 grid so
    an inclusive comparison over the stored (floor-quantized) coordinates
    is equivalent to Lucene's encoded-int32 compare."""
    lat_s = 2147483648.0 / 90.0
    lon_s = 2147483648.0 / 180.0
    return (
        math.ceil(min_lat * lat_s) / lat_s,
        math.floor(max_lat * lat_s) / lat_s,
        math.ceil(min_lon * lon_s) / lon_s,
        math.floor(max_lon * lon_s) / lon_s,
    )


def box_condition_sql(lat_col: str, lon_col: str, min_lat: float,
                      max_lat: float, min_lon: float, max_lon: float) -> str:
    """The box-membership predicate as ONE SQL boolean expression (valid
    in both Spark SQL and DuckDB — identical double literals via ``dlit``,
    so engine and oracle evaluate the same bits). ``min_lon > max_lon``
    means the box crosses the antimeridian and the longitude test becomes
    a disjunction (``LatLonPointBoxQuery`` splits the same way)."""
    lo_lat, hi_lat, lo_lon, hi_lon = box_bounds(min_lat, max_lat,
                                                min_lon, max_lon)
    lat_c = (f"({lat_col} >= {dlit(lo_lat)} AND "
             f"{lat_col} <= {dlit(hi_lat)})")
    if min_lon > max_lon:
        lon_c = (f"({lon_col} >= {dlit(lo_lon)} OR "
                 f"{lon_col} <= {dlit(hi_lon)})")
    else:
        lon_c = (f"({lon_col} >= {dlit(lo_lon)} AND "
                 f"{lon_col} <= {dlit(hi_lon)})")
    return f"({lat_c} AND {lon_c})"


def box_filter(geo_df, min_lat: float, max_lat: float,
               min_lon: float, max_lon: float):
    """``LatLonPoint.newBoxQuery`` match set: (doc_id) of docs whose
    quantized point lies inside the rectangle — pure comparisons
    (pushdown-able on parquet geo tables), one scan, no shuffle, no trig."""
    cond = box_condition_sql("lat", "lon", min_lat, max_lat,
                             min_lon, max_lon)
    return geo_df.filter(F.expr(cond)).select("doc_id")


def polygon_condition_sql(lat_col: str, lon_col: str, lats, lons) -> str:
    """``LatLonPoint.newPolygonQuery`` membership as ONE SQL boolean
    expression (valid in both Spark SQL and DuckDB).

    The reference's ``Polygon2D`` resolves containment with the PNPOLY
    ray-crossing parity test (``core/geo/EdgeTree.java:106`` — "ported to
    java from … pnpoly", W. R. Franklin's algorithm): a point is inside
    when a ray to +x crosses the edges an odd number of times, with the
    per-edge test ``((yi > y) != (yj > y)) && (x < (xj−xi)·(y−yi)/(yj−yi)
    + xi)``. Emitted here as Σ CASE crossing indicators, parity via % 2 —
    every vertex folded to a shared double literal so engine and oracle
    evaluate identical bits. A cheap bounding-box conjunct prefixes the
    parity sum (the BKD pruning step; pushdown-able pure comparisons).

    Documented divergences: points exactly ON an edge follow PNPOLY's
    deterministic edge rule rather than the reference's on-edge⇒contained
    byte (``EdgeTree.java:60`` — reachable only at exact double equality);
    polygons must not cross the antimeridian (split them, as Lucene
    requires single-component polygons there too); holes via a second
    polygon's NOT (``Polygon2D.contains:109``)."""
    n = len(lats)
    if n < 3 or n != len(lons):
        raise ValueError("polygon needs >= 3 (lat, lon) vertices")
    y, x = f"({lat_col})", f"({lon_col})"
    terms = []
    for i in range(n):
        j = (i - 1) % n
        yi, yj = dlit(lats[i]), dlit(lats[j])
        xi, xj = dlit(lons[i]), dlit(lons[j])
        cross = (
            f"(({yi} > {y}) <> ({yj} > {y})) AND "
            f"({x} < ({xj} - {xi}) * ({y} - {yi}) / ({yj} - {yi}) + {xi})"
        )
        terms.append(f"(CASE WHEN {cross} THEN 1 ELSE 0 END)")
    bbox = (f"({y} >= {dlit(min(lats))} AND {y} <= {dlit(max(lats))} AND "
            f"{x} >= {dlit(min(lons))} AND {x} <= {dlit(max(lons))})")
    return f"({bbox} AND (({' + '.join(terms)}) % 2) = 1)"


def polygon_filter(geo_df, lats, lons):
    """``LatLonPoint.newPolygonQuery`` match set: (doc_id) of docs whose
    quantized point lies inside the polygon — one codegen'd comparison
    chain per row, one scan, no shuffle, no Python."""
    cond = polygon_condition_sql("lat", "lon", lats, lons)
    return geo_df.filter(F.expr(cond)).select("doc_id")


def distance_filter(geo_df, center_lat: float, center_lon: float,
                    radius_m: float):
    """LatLonPointDistanceQuery match set: (doc_id) within radius —
    bbox pre-filter then exact haversine, one scan, no shuffle."""
    dist = F.expr(haversine_sql("lat", "lon", center_lat, center_lon))
    return (
        geo_df
        .filter(bbox_condition("lat", "lon", center_lat, center_lon,
                               radius_m))
        .filter(dist <= float(radius_m))
        .select("doc_id")
    )


def distance_sorted(geo_df, match_df, center_lat: float, center_lon: float,
                    k: int | None = None):
    """LatLonDocValuesField.newDistanceSort: the match set ordered by
    haversine meters ASC, doc_id ASC; returns (doc_id, dist_m)."""
    dist = F.expr(haversine_sql("lat", "lon", center_lat, center_lon))
    out = (
        match_df.join(geo_df, "doc_id")
        .select("doc_id", dist.alias("dist_m"))
        .orderBy(F.asc("dist_m"), F.asc("doc_id"))
    )
    return out.limit(int(k)) if k is not None else out
