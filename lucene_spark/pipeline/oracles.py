"""DuckDB oracle SQL for the pipeline operators (dedup / simsearch / textqc /
multimodal).

Each statement recomputes the corresponding Spark plan from the raw
``documents`` / ``embeddings`` parquet with NO shared code, following the
deterministic contracts in ``contracts.py`` (md5-hex hashing, integer
similarity arithmetic, exact int-ratio doubles) so values hash-match
bit-for-bit. Mirrors ``lucene_spark/pipeline/{dedup,simsearch,textqc,
multimodal}.py`` — every constant here (16 perms, 4×4 bands, bucket cap 64,
quantization 1000, thresholds) must stay in sync with those modules.
"""

from __future__ import annotations

from lucene_spark.pipeline.textqc import LANG_MARKERS, STOPWORDS

# ---------------------------------------------------------------- text CTEs -

PDOCS = """
pdocs AS (SELECT doc_id, lower(coalesce(text, '')) AS t FROM documents),
ptoks AS (SELECT doc_id, regexp_extract_all(t, '[a-z0-9]+') AS toks FROM pdocs)
"""

# augmented corpus: base docs ∪ truncate-last-5-tokens twins (+1000000 ids)
ADOCS = """
adocs AS (
  SELECT doc_id, toks FROM ptoks
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         list_slice(toks, 1, greatest(len(toks) - 5, 1)) AS toks
  FROM ptoks
),
ash AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(toks) - 1),
                                 i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS sh
    FROM adocs WHERE len(toks) >= 3
  )
)
"""

MINHASH = """
perms AS (SELECT unnest(range(0, 16)) AS p),
mh AS (
  SELECT doc_id, p, min(md5(p::VARCHAR || ':' || sh)) AS h
  FROM ash, perms GROUP BY doc_id, p
),
sig AS (SELECT doc_id, list(h ORDER BY p) AS sig FROM mh GROUP BY doc_id),
bandkeys AS (
  SELECT doc_id, band,
         md5(array_to_string(list_slice(sig, band * 4 + 1, band * 4 + 4), '|')) AS key
  FROM sig, (SELECT unnest(range(0, 4)) AS band) bb
),
sized AS (
  SELECT doc_id, band, key, count(*) OVER (PARTITION BY band, key) AS bsz
  FROM bandkeys
),
cand AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM (SELECT * FROM sized WHERE bsz <= 64) l
  JOIN (SELECT * FROM sized WHERE bsz <= 64) r
    ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
),
inter AS (
  SELECT c.a, c.b, count(*) AS inter
  FROM cand c
  JOIN ash sa ON sa.doc_id = c.a
  JOIN ash sb ON sb.doc_id = c.b AND sb.sh = sa.sh
  GROUP BY c.a, c.b
),
sizes AS (SELECT doc_id, count(*) AS n FROM ash GROUP BY doc_id),
vj AS (
  SELECT c.a, c.b,
         coalesce(i.inter, 0) AS inter,
         za.n + zb.n - coalesce(i.inter, 0) AS uni
  FROM cand c
  LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
  JOIN sizes za ON za.doc_id = c.a
  JOIN sizes zb ON zb.doc_id = c.b
)
"""


def dedup_exact_sql() -> str:
    return f"""
WITH {PDOCS},
hashed AS (SELECT doc_id, md5(array_to_string(toks, ' ')) AS h FROM ptoks),
grp AS (
  SELECT h, min(doc_id) AS canonical_id, count(*)::BIGINT AS group_size
  FROM hashed GROUP BY h
)
SELECT d.doc_id, g.canonical_id, g.group_size
FROM hashed d JOIN grp g USING (h)
ORDER BY doc_id
"""


def dedup_minhash_sql(threshold: float = 0.5) -> str:
    return f"""
WITH {PDOCS},{ADOCS},{MINHASH}
SELECT a, b, inter::BIGINT AS inter, uni::BIGINT AS uni,
       CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) AS jaccard
FROM vj
WHERE CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) >= {threshold!r}
ORDER BY a, b
"""


def dedup_ngram_topk_sql(k: int = 50, max_df: int = 100) -> str:
    return f"""
WITH {PDOCS},{ADOCS},
rare AS (
  SELECT doc_id, sh FROM (
    SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM ash
  ) WHERE df <= {max_df}
),
cand AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM rare l JOIN rare r ON l.sh = r.sh AND l.doc_id < r.doc_id
),
inter AS (
  SELECT c.a, c.b, count(*) AS inter
  FROM cand c
  JOIN ash sa ON sa.doc_id = c.a
  JOIN ash sb ON sb.doc_id = c.b AND sb.sh = sa.sh
  GROUP BY c.a, c.b
),
sizes AS (SELECT doc_id, count(*) AS n FROM ash GROUP BY doc_id),
vj AS (
  SELECT c.a, c.b, coalesce(i.inter, 0) AS inter,
         za.n + zb.n - coalesce(i.inter, 0) AS uni
  FROM cand c
  LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
  JOIN sizes za ON za.doc_id = c.a
  JOIN sizes zb ON zb.doc_id = c.b
)
SELECT a, b, inter::BIGINT AS inter, uni::BIGINT AS uni,
       CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) AS jaccard
FROM vj
ORDER BY jaccard DESC, a ASC, b ASC
LIMIT {k}
"""


SIMHASH = """
stf AS (
  SELECT doc_id, tok, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(toks) AS tok FROM adocs)
  GROUP BY doc_id, tok
),
sbits AS (
  SELECT doc_id, (pos - 1) * 4 + q AS bitpos,
         sum(tf * (2 * (CAST(floor((strpos('0123456789abcdef', substr(md5(tok), pos, 1)) - 1)
                                   / power(2, q)) AS BIGINT) % 2) - 1)) AS w
  FROM stf,
       (SELECT unnest(range(1, 17)) AS pos) pp,
       (SELECT unnest(range(0, 4)) AS q) qq
  GROUP BY doc_id, bitpos
),
shb AS (
  SELECT doc_id, CAST(floor(bitpos / 16) AS INT) AS band,
         sum((CASE WHEN w > 0 THEN 1 ELSE 0 END)
             * CAST(power(2, bitpos % 16) AS BIGINT)) AS v
  FROM sbits GROUP BY doc_id, band
),
sh4 AS (
  SELECT doc_id,
         sum(CASE WHEN band = 0 THEN v ELSE 0 END)::BIGINT AS b0,
         sum(CASE WHEN band = 1 THEN v ELSE 0 END)::BIGINT AS b1,
         sum(CASE WHEN band = 2 THEN v ELSE 0 END)::BIGINT AS b2,
         sum(CASE WHEN band = 3 THEN v ELSE 0 END)::BIGINT AS b3
  FROM shb GROUP BY doc_id
),
ssized AS (
  SELECT doc_id, band, v, count(*) OVER (PARTITION BY band, v) AS bsz
  FROM shb
),
scand AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM ssized l JOIN ssized r
    ON l.band = r.band AND l.v = r.v AND l.doc_id < r.doc_id
  WHERE l.bsz <= 64
)
"""


def dedup_simhash_sql(max_hamming: int = 8) -> str:
    return f"""
WITH {PDOCS},{ADOCS},{SIMHASH}
SELECT a, b,
       (bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
        + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)))::BIGINT AS hamming
FROM scand c
JOIN sh4 x ON x.doc_id = c.a
JOIN sh4 y ON y.doc_id = c.b
WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
      + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) <= {max_hamming}
ORDER BY a, b
"""


# ------------------------------------------------------------- embeddings ---

QEMB = """
qemb AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS q
  FROM embeddings
),
comps AS (
  SELECT vec_id, unnest(q) AS v, generate_subscripts(q, 1) AS j FROM qemb
),
norms2 AS (SELECT vec_id, sum(v * v)::BIGINT AS n2 FROM comps GROUP BY vec_id),
buckets AS (
  SELECT vec_id,
         sum(CASE WHEN j <= 8 AND v >= 0
                  THEN CAST(power(2, j - 1) AS BIGINT) ELSE 0 END)::BIGINT AS bucket
  FROM comps GROUP BY vec_id
)
"""

# augmented: original vectors ∪ near-dup twins (dim 1 bumped +1, id +1000000)
AQEMB = """
aqemb AS (
  SELECT vec_id, q FROM qemb
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         list_transform(range(1, len(q) + 1),
                        i -> q[i] + CASE WHEN i = 1 THEN 1 ELSE 0 END) AS q
  FROM qemb
),
acomps AS (
  SELECT vec_id, unnest(q) AS v, generate_subscripts(q, 1) AS j FROM aqemb
),
anorms2 AS (SELECT vec_id, sum(v * v)::BIGINT AS n2 FROM acomps GROUP BY vec_id),
abands AS (
  SELECT vec_id, CAST(floor((j - 1) / 16) AS BIGINT) AS band,
         sum(CASE WHEN v >= 0
                  THEN CAST(power(2, (j - 1) % 16) AS BIGINT)
                  ELSE 0 END)::BIGINT AS key
  FROM acomps GROUP BY vec_id, band
),
asized AS (
  SELECT vec_id, band, key, count(*) OVER (PARTITION BY band, key) AS bsz
  FROM abands
)
"""


def dedup_embedding_sql(t_num: int = 361, t_den: int = 400) -> str:
    return f"""
WITH {QEMB},{AQEMB},
cand AS (
  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
  FROM asized x JOIN asized y
    ON x.band = y.band AND x.key = y.key AND x.vec_id < y.vec_id
  WHERE x.bsz <= 64
),
dots AS (
  SELECT c.a, c.b, sum(ca.v * cb.v)::BIGINT AS dot
  FROM cand c
  JOIN acomps ca ON ca.vec_id = c.a
  JOIN acomps cb ON cb.vec_id = c.b AND cb.j = ca.j
  GROUP BY c.a, c.b
)
SELECT d.a, d.b, d.dot
FROM dots d
JOIN anorms2 na ON na.vec_id = d.a
JOIN anorms2 nb ON nb.vec_id = d.b
WHERE d.dot >= 0 AND {t_den} * d.dot * d.dot >= {t_num} * na.n2 * nb.n2
ORDER BY a, b
"""


def ann_brute_sql(n_queries: int = 5, k: int = 10) -> str:
    return f"""
WITH {QEMB},
qcomps AS (
  SELECT vec_id AS query_id, v, j FROM comps WHERE vec_id < {n_queries}
),
alldots AS (
  SELECT qc.query_id, c.vec_id AS neighbor_id, sum(qc.v * c.v)::BIGINT AS dot
  FROM qcomps qc
  JOIN comps c ON c.j = qc.j AND c.vec_id != qc.query_id
  GROUP BY qc.query_id, c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, dot,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dot DESC, neighbor_id ASC) AS rnk
  FROM alldots
)
SELECT query_id, rnk::INT AS rank, neighbor_id, dot
FROM ranked WHERE rnk <= {k}
ORDER BY query_id, rank
"""


def ann_lsh_sql(n_queries: int = 5, k: int = 10, bands: int = 8,
                band_bits: int = 8) -> str:
    return f"""
WITH {QEMB},
qbands AS (
  SELECT vec_id, CAST(floor((j - 1) / {band_bits}) AS BIGINT) AS band,
         sum(CASE WHEN v >= 0
                  THEN CAST(power(2, (j - 1) % {band_bits}) AS BIGINT)
                  ELSE 0 END)::BIGINT AS key
  FROM comps
  WHERE j <= {bands * band_bits}
  GROUP BY vec_id, band
),
cands AS (
  SELECT DISTINCT q.vec_id AS query_id, v.vec_id AS neighbor_id
  FROM qbands q
  JOIN qbands v ON v.band = q.band AND v.key = q.key AND v.vec_id != q.vec_id
  WHERE q.vec_id < {n_queries}
),
dots AS (
  SELECT cd.query_id, cd.neighbor_id, sum(qc.v * nc.v)::BIGINT AS dot
  FROM cands cd
  JOIN comps qc ON qc.vec_id = cd.query_id
  JOIN comps nc ON nc.vec_id = cd.neighbor_id AND nc.j = qc.j
  GROUP BY cd.query_id, cd.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, dot,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dot DESC, neighbor_id ASC) AS rnk
  FROM dots
)
SELECT query_id, rnk::INT AS rank, neighbor_id, dot
FROM ranked WHERE rnk <= {k}
ORDER BY query_id, rank
"""



def ann_ivf_sql(n_queries: int = 5, k: int = 10, n_centroids: int = 16,
                nprobe: int = 4) -> str:
    """Mirrors ``simsearch.ivf_topk`` with lloyd_iters=1: seed centroids =
    quantized vectors of vec_ids [0, C), one floor-mean Lloyd step (empty
    cells keep their seed), squared-L2 assignment (tie -> min cid), nprobe
    nearest cells per query, exact integer-dot re-rank."""
    return f"""
WITH {QEMB},
scomps AS (SELECT vec_id AS cid, v, j FROM comps WHERE vec_id < {n_centroids}),
d0 AS (
  SELECT c.vec_id, s.cid,
         sum(s.v * s.v)::BIGINT - 2 * sum(c.v * s.v)::BIGINT AS dist
  FROM comps c JOIN scomps s ON s.j = c.j
  GROUP BY c.vec_id, s.cid
),
a0 AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d0
  ) WHERE rn = 1
),
cellmean AS (
  SELECT a.cell, c.j, CAST(floor(sum(c.v)::DOUBLE / count(*)) AS BIGINT) AS v
  FROM a0 a JOIN comps c ON c.vec_id = a.vec_id
  GROUP BY a.cell, c.j
),
cents AS (
  SELECT s.cid, s.j, coalesce(m.v, s.v) AS v
  FROM scomps s LEFT JOIN cellmean m ON m.cell = s.cid AND m.j = s.j
),
cn2 AS (SELECT cid, sum(v * v)::BIGINT AS n2 FROM cents GROUP BY cid),
d1 AS (
  SELECT c.vec_id, t.cid, any_value(n.n2) - 2 * sum(c.v * t.v)::BIGINT AS dist
  FROM comps c JOIN cents t ON t.j = c.j JOIN cn2 n ON n.cid = t.cid
  GROUP BY c.vec_id, t.cid
),
assign AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d1
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d1 WHERE vec_id < {n_queries}
  ) WHERE rn <= {nprobe}
),
cands AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign a ON a.cell = p.cell AND a.vec_id != p.query_id
),
dots AS (
  SELECT cd.query_id, cd.neighbor_id, sum(qc.v * nc.v)::BIGINT AS dot
  FROM cands cd
  JOIN comps qc ON qc.vec_id = cd.query_id
  JOIN comps nc ON nc.vec_id = cd.neighbor_id AND nc.j = qc.j
  GROUP BY cd.query_id, cd.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, dot,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dot DESC, neighbor_id ASC) AS rnk
  FROM dots
)
SELECT query_id, rnk::INT AS rank, neighbor_id, dot
FROM ranked WHERE rnk <= {k}
ORDER BY query_id, rank
"""


# ------------------------------------------------------------------ textqc --

def _markers_values() -> str:
    return ",".join(
        f"('{lang}','{t}')" for lang, ts in LANG_MARKERS.items() for t in ts
    )


def lang_id_sql() -> str:
    return f"""
WITH {PDOCS},
markers(lang, tok) AS (VALUES {_markers_values()}),
lhits AS (
  SELECT t.doc_id, m.lang, count(*)::BIGINT AS n_hits
  FROM (SELECT doc_id, unnest(toks) AS tok FROM ptoks) t
  JOIN markers m ON m.tok = t.tok
  GROUP BY t.doc_id, m.lang
),
lbest AS (
  SELECT doc_id, lang, n_hits,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY n_hits DESC, lang ASC) AS rn
  FROM lhits
)
SELECT p.doc_id AS doc_id, coalesce(b.lang, 'und') AS pred_lang,
       coalesce(b.n_hits, 0)::BIGINT AS n_hits
FROM pdocs p
LEFT JOIN (SELECT * FROM lbest WHERE rn = 1) b ON b.doc_id = p.doc_id
ORDER BY p.doc_id
"""


def quality_sql() -> str:
    stop_list = ",".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH {PDOCS},
q AS (
  SELECT p.doc_id,
         length(p.t)::BIGINT AS n_chars,
         len(k.toks)::BIGINT AS n_tokens,
         coalesce(list_sum(list_transform(k.toks, x -> length(x))), 0)::BIGINT AS n_alpha,
         len(regexp_extract_all(p.t, '[^a-z0-9\\s]'))::BIGINT AS n_punct,
         len(list_filter(k.toks, x -> list_contains([{stop_list}], x)))::BIGINT AS n_stop
  FROM pdocs p JOIN ptoks k USING (doc_id)
)
SELECT doc_id, n_chars, n_tokens, n_alpha, n_punct, n_stop,
       (n_tokens >= 10 AND n_stop * 20 >= n_tokens AND n_punct * 5 <= n_tokens
        AND n_alpha >= 2 * n_tokens AND n_alpha <= 12 * n_tokens) AS quality_ok
FROM q ORDER BY doc_id
"""


def token_counts_sql() -> str:
    return f"""
WITH {PDOCS}
SELECT doc_id,
       len(regexp_extract_all(t, '\\S+'))::BIGINT AS n_ws,
       len(regexp_extract_all(t, '[a-z]+|[0-9]+|[^a-z0-9\\s]'))::BIGINT AS n_bpe
FROM pdocs ORDER BY doc_id
"""


def fingerprints_sql(sketch_size: int = 4) -> str:
    return f"""
WITH {PDOCS},
psh AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(toks) - 1),
                                 i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS sh
    FROM ptoks WHERE len(toks) >= 3
  )
),
fps AS (SELECT doc_id, md5(array_to_string(toks, ' ')) AS fp FROM ptoks),
sk AS (
  SELECT doc_id,
         array_to_string(list_slice(list_sort(list(DISTINCT md5(sh))), 1, {sketch_size}), '|') AS sketch
  FROM psh GROUP BY doc_id
)
SELECT f.doc_id, f.fp, coalesce(k.sketch, '') AS sketch
FROM fps f LEFT JOIN sk k USING (doc_id)
ORDER BY doc_id
"""


# -------------------------------------------------------------- multimodal --

def binary_stats_sql() -> str:
    return """
WITH pay AS (
  SELECT doc_id,
         md5(coalesce(text, '')) || md5(coalesce(text, '') || '2') AS hx
  FROM documents
),
bytes AS (
  SELECT doc_id, i,
         (16 * (strpos('0123456789abcdef', substr(hx, 2 * i - 1, 1)) - 1)
          + (strpos('0123456789abcdef', substr(hx, 2 * i, 1)) - 1))::BIGINT AS bv
  FROM pay, (SELECT unnest(range(1, 33)) AS i) ii
)
SELECT doc_id,
       CAST(32 AS BIGINT) AS n_bytes,
       sum(bv)::BIGINT AS sum_bytes,
       max(bv)::BIGINT AS max_byte,
       sum(CASE WHEN (i - 1) % 8 = 0 THEN bv ELSE 0 END)::BIGINT AS frame_sum
FROM bytes GROUP BY doc_id ORDER BY doc_id
"""


def knn_brute_sql(query_vec_id: int = 0, k: int = 10) -> str:
    """Exact-KNN oracle (recall = 1): top-k corpus vectors by quantized
    integer dot with vector ``query_vec_id``'s embedding — the brute-force
    config of ``search/knn.knn_topk_df`` (KnnFloatVectorQuery semantics,
    the query vector taken from the corpus so both engines quantize the
    identical float32 input)."""
    qemb_comps = QEMB.split(",\nnorms2")[0]
    return f"""
WITH {qemb_comps},
qv AS (SELECT v, j FROM comps WHERE vec_id = {query_vec_id})
SELECT c.vec_id AS doc_id, sum(c.v * qv.v)::BIGINT AS dot
FROM comps c JOIN qv ON qv.j = c.j
GROUP BY c.vec_id
ORDER BY dot DESC, doc_id ASC
LIMIT {k}
"""


def dedup_clusters_sql(threshold: float = 0.5) -> str:
    """Connected components over the near-dup pair graph via a recursive
    min-reachability CTE: cluster_id(n) = min doc_id reachable from n
    (undirected edges = verified MinHash pairs with jaccard ≥ threshold,
    over the augmented corpus — singletons keep their own id)."""
    return f"""
WITH RECURSIVE {PDOCS},{ADOCS},{MINHASH},
edges AS (
  SELECT a AS s, b AS d FROM vj
  WHERE CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) >= {threshold}
  UNION ALL
  SELECT b AS s, a AS d FROM vj
  WHERE CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) >= {threshold}
),
reach(n, r) AS (
  SELECT doc_id, doc_id FROM adocs
  UNION
  SELECT e.d, rr.r FROM reach rr JOIN edges e ON e.s = rr.n
)
SELECT n AS doc_id, min(r)::BIGINT AS cluster_id
FROM reach GROUP BY n ORDER BY doc_id
"""


def dedup_incremental_sql(threshold: float = 0.5,
                          batch_lo: int = 1000000) -> str:
    """Incremental-dedup oracle: batch = augmented twins (doc_id ≥
    ``batch_lo``), corpus = base docs; for each batch doc the min corpus
    near-dup partner and that pair's exact jaccard."""
    return f"""
WITH {PDOCS},{ADOCS},{MINHASH},
cross_pairs AS (
  SELECT CASE WHEN a >= {batch_lo} THEN a ELSE b END AS doc_id,
         CASE WHEN a >= {batch_lo} THEN b ELSE a END AS dup_of,
         CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) AS jaccard
  FROM vj
  WHERE ((a >= {batch_lo}) <> (b >= {batch_lo}))
    AND CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) >= {threshold}
),
best AS (SELECT doc_id, min(dup_of) AS dup_of FROM cross_pairs GROUP BY doc_id)
SELECT b.doc_id, b.dup_of, c.jaccard
FROM best b
JOIN cross_pairs c ON c.doc_id = b.doc_id AND c.dup_of = b.dup_of
ORDER BY b.doc_id
"""


# ---------------------------------------------------------------- curation --

def contamination_sql(min_hits: int = 2) -> str:
    """Eval-set n-gram decontamination: eval split = doc_id % 10 == 7,
    corpus = the rest (mirrors the gate's deterministic split)."""
    return f"""
WITH {PDOCS},
sh AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(toks) - 1),
                                 i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS sh
    FROM ptoks WHERE len(toks) >= 3
  )
),
ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 10 = 7),
corpus AS (SELECT doc_id FROM pdocs WHERE doc_id % 10 <> 7),
tot AS (
  SELECT doc_id, count(*) AS n_shingles FROM sh
  WHERE doc_id % 10 <> 7 GROUP BY doc_id
),
hit AS (
  SELECT s.doc_id, count(*) AS n_hit FROM sh s JOIN ev USING (sh)
  WHERE s.doc_id % 10 <> 7 GROUP BY s.doc_id
)
SELECT c.doc_id,
       coalesce(h.n_hit, 0) AS n_hit,
       coalesce(t.n_shingles, 0) AS n_shingles,
       coalesce(h.n_hit, 0) >= {min_hits} AS contaminated
FROM corpus c
LEFT JOIN tot t USING (doc_id)
LEFT JOIN hit h USING (doc_id)
ORDER BY doc_id
"""


def _rep_ctes(n: int, p: str) -> str:
    return f"""
g{n} AS (
  SELECT doc_id, g, count(*) AS c FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(toks) - {n - 2}),
                                 i -> array_to_string(list_slice(toks, i, i + {n - 1}), ' '))) AS g
    FROM ptoks WHERE len(toks) >= {n}
  ) GROUP BY doc_id, g
),
a{n} AS (
  SELECT doc_id, sum(c)::BIGINT AS {p}_total,
         (sum(c) - count(*))::BIGINT AS {p}_dup,
         max(c) AS {p}_top
  FROM g{n} GROUP BY doc_id
)"""


def repetition_sql() -> str:
    return f"""
WITH {PDOCS},
{_rep_ctes(2, 'g2')},
{_rep_ctes(3, 'g3')}
SELECT t.doc_id, len(t.toks) AS n_tokens,
       coalesce(a2.g2_total, 0) AS g2_total,
       coalesce(a2.g2_dup, 0) AS g2_dup,
       coalesce(a2.g2_top, 0) AS g2_top,
       coalesce(a3.g3_total, 0) AS g3_total,
       coalesce(a3.g3_dup, 0) AS g3_dup,
       coalesce(a3.g3_top, 0) AS g3_top,
       (len(t.toks) < 10 OR
        (coalesce(a2.g2_dup, 0) * 5 <= coalesce(a2.g2_total, 0)
         AND coalesce(a3.g3_dup, 0) * 10 <= coalesce(a3.g3_total, 0)
         AND coalesce(a2.g2_top, 0) * 5 <= coalesce(a2.g2_total, 0))) AS rep_ok
FROM ptoks t
LEFT JOIN a2 USING (doc_id)
LEFT JOIN a3 USING (doc_id)
ORDER BY doc_id
"""


def stratified_sample_sql(n_per_stratum: int = 3) -> str:
    """Deterministic stratified sample over (lang, source): rank by
    (md5(doc_id), doc_id) inside each stratum, keep rank <= n."""
    return f"""
SELECT lang, source, doc_id, rk FROM (
  SELECT lang, source, doc_id,
         row_number() OVER (
           PARTITION BY lang, source
           ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
  FROM documents
) WHERE rk <= {n_per_stratum}
ORDER BY lang, source, rk
"""


def domain_mix_sql(weights: dict, total: int,
                   domain_col: str = "lang") -> str:
    """Oracle for curation.domain_mix: same floor-requested counts, same
    (md5(doc_id), doc_id) in-domain permutation."""
    from lucene_spark.pipeline.curation import _mix_requested

    req = _mix_requested(weights, total)
    vals = ",".join(f"('{d}', {n})" for d, n in sorted(req.items()))
    return f"""
WITH req(dom, n) AS (VALUES {vals}),
ranked AS (
  SELECT {domain_col} AS dom, doc_id,
         row_number() OVER (
           PARTITION BY {domain_col}
           ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
  FROM documents
)
SELECT r.dom AS {domain_col}, r.doc_id, r.rk
FROM ranked r JOIN req q ON q.dom = r.dom
WHERE r.rk <= q.n
ORDER BY 1, 3
"""


def domain_mix_report_sql(weights: dict, total: int,
                          domain_col: str = "lang") -> str:
    """Oracle for curation.domain_mix_report: taken = least(requested,
    available); achieved = taken / Σ taken (exact int-ratio double)."""
    from lucene_spark.pipeline.curation import _mix_requested

    req = _mix_requested(weights, total)
    vals = ",".join(f"('{d}', {n})" for d, n in sorted(req.items()))
    return f"""
WITH req(dom, requested) AS (VALUES {vals}),
avail AS (
  SELECT {domain_col} AS dom, count(*)::BIGINT AS available
  FROM documents GROUP BY 1
),
j AS (
  SELECT a.dom, a.available, q.requested::BIGINT AS requested,
         least(q.requested, a.available)::BIGINT AS taken
  FROM avail a JOIN req q ON q.dom = a.dom
)
SELECT dom AS {domain_col}, available, requested, taken,
       taken::DOUBLE / sum(taken) OVER ()::DOUBLE AS achieved
FROM j
ORDER BY 1
"""


def redact_pii_sql() -> str:
    """PII scrub oracle — mirrors the gate's deterministic injection (every
    5th doc gets an email / phone / IPv4 suffix) and curation.redact_pii's
    sequential count-then-replace contract."""
    email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    phone = "\\+?[0-9][0-9()\\-. ]{7,}[0-9]"
    ipv4 = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
    return f"""
WITH inj AS (
  SELECT doc_id,
         coalesce(text, '') ||
         CASE doc_id % 5
           WHEN 0 THEN ' mail user' || doc_id::VARCHAR || '@example.com ok'
           WHEN 1 THEN ' call +1 (555) 010-7788 now'
           WHEN 2 THEN ' host 10.1.2.3 up'
           ELSE ''
         END AS t0
  FROM documents
),
s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(t0, '{email}'))::BIGINT AS n_email,
         regexp_replace(t0, '{email}', '<EMAIL>', 'g') AS t1
  FROM inj
),
s2 AS (
  SELECT doc_id, n_email,
         len(regexp_extract_all(t1, '{ipv4}'))::BIGINT AS n_ipv4,
         regexp_replace(t1, '{ipv4}', '<IPV4>', 'g') AS t2
  FROM s1
),
s3 AS (
  SELECT doc_id, n_email, n_ipv4,
         len(regexp_extract_all(t2, '{phone}'))::BIGINT AS n_phone,
         regexp_replace(t2, '{phone}', '<PHONE>', 'g') AS clean_text
  FROM s2
)
SELECT doc_id, clean_text, n_email, n_ipv4, n_phone,
       (n_email > 0 OR n_ipv4 > 0 OR n_phone > 0) AS has_pii
FROM s3
ORDER BY doc_id
"""


# --------------------------------------------------------------- curation 2 -

# boilerplate the line-dedup GATE injects around every doc (mirrors
# __spark_entry__._q_line_dedup — web-corpus boilerplate shape)
LINE_HEADER = "cookie policy"
LINE_FOOTERS = ("all rights reserved", "contact us")


def line_dedup_sql() -> str:
    """Global first-occurrence line dedup over the boilerplate-injected
    corpus (mirrors curation.line_dedup: first = smallest (doc_id, pos);
    the oracle uses a window where the engine uses a two-stage min-struct
    groupBy — identical semantics)."""
    nl = "chr(10)"
    return f"""
WITH ldocs AS (
  SELECT doc_id,
         '{LINE_HEADER}' || {nl} || coalesce(text, '') || {nl}
         || '{LINE_FOOTERS[0]}' || {nl} || '{LINE_FOOTERS[1]}' AS t
  FROM documents
),
lines AS (
  SELECT doc_id, u.pos, u.line FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, len(ls) + 1),
             i -> struct_pack(pos := i - 1, line := ls[i]))) AS u
    FROM (SELECT doc_id, string_split(t, {nl}) AS ls FROM ldocs)
  )
),
ranked AS (
  SELECT doc_id, pos, line,
         row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
  FROM lines
),
kept AS (SELECT doc_id, pos, line FROM ranked WHERE rn = 1),
reb AS (
  SELECT doc_id, count(*)::BIGINT AS n_kept,
         string_agg(line, {nl} ORDER BY pos) AS text_clean
  FROM kept GROUP BY doc_id
),
tot AS (SELECT doc_id, count(*)::BIGINT AS n_lines FROM lines GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(t.n_lines, 0)::BIGINT AS n_lines,
       coalesce(r.n_kept, 0)::BIGINT AS n_kept,
       md5(coalesce(r.text_clean, '')) AS clean_md5
FROM documents d
LEFT JOIN tot t USING (doc_id)
LEFT JOIN reb r USING (doc_id)
ORDER BY d.doc_id
"""


def unigram_logprob_sql() -> str:
    """Self-trained unigram-LM mean log-prob per doc (mirrors
    textqc.unigram_logprob: float32 per-term ln, exact double sums)."""
    return f"""
WITH {PDOCS},
utf AS (SELECT doc_id, unnest(toks) AS term FROM ptoks),
tfx AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM utf GROUP BY 1, 2),
lm0 AS (SELECT term, sum(tf)::BIGINT AS ttf FROM tfx GROUP BY 1),
tot AS (SELECT sum(ttf)::BIGINT AS tot FROM lm0),
lm AS (
  SELECT term,
         CAST(ln(CAST(ttf AS DOUBLE)
                 / (SELECT CAST(tot AS DOUBLE) FROM tot)) AS FLOAT) AS lp
  FROM lm0
),
pd AS (
  SELECT t.doc_id,
         sum(CAST(t.tf AS DOUBLE) * CAST(l.lp AS DOUBLE)) AS slp,
         sum(t.tf)::BIGINT AS n_tokens
  FROM tfx t JOIN lm l USING (term) GROUP BY 1
)
SELECT d.doc_id,
       coalesce(p.n_tokens, 0)::BIGINT AS n_tokens,
       CAST(coalesce(p.slp / p.n_tokens, 0e0) AS DOUBLE) AS avg_lp
FROM documents d LEFT JOIN pd p USING (doc_id)
ORDER BY d.doc_id
"""


def exact_substring_sql(window: int = 10, k: int = 100) -> str:
    """ExactSubstr window-dedup stats over the augmented corpus (mirrors
    curation.exact_substring_stats on contracts.augmented_docs): a
    window-token span duplicates when the identical window occurs >= 2
    times corpus-wide; every occurrence except the smallest (doc_id, pos)
    is a candidate; dup_tokens = per-doc union length of candidate spans
    (gaps-and-islands sweep, same as the engine's two window functions)."""
    return f"""
WITH {PDOCS},
adocs AS (
  SELECT doc_id, toks FROM ptoks
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         list_slice(toks, 1, greatest(len(toks) - 5, 1)) AS toks
  FROM ptoks
),
wins AS (
  SELECT doc_id, i - 1 AS pos,
         md5(array_to_string(list_slice(toks, i, i + {window} - 1), ' ')) AS h
  FROM adocs, unnest(range(1, len(toks) - {window} + 2)) AS r(i)
  WHERE len(toks) >= {window}
),
stats AS (
  SELECT h, count(*) AS cnt,
         min(struct_pack(d := doc_id, p := pos)) AS o
  FROM wins GROUP BY h
),
cand AS (
  SELECT w.doc_id, w.pos AS s, w.pos + {window} AS e
  FROM wins w JOIN stats t USING (h)
  WHERE t.cnt >= 2 AND NOT (w.doc_id = t.o.d AND w.pos = t.o.p)
),
isl AS (
  SELECT doc_id, s, e,
         CASE WHEN s > coalesce(max(e) OVER (
                PARTITION BY doc_id ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_isl
  FROM cand
),
isl2 AS (
  SELECT doc_id, s, e,
         sum(new_isl) OVER (PARTITION BY doc_id ORDER BY s
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS g
  FROM isl
),
dup AS (
  SELECT doc_id, sum(ilen)::BIGINT AS dup_tokens FROM (
    SELECT doc_id, g, max(e) - min(s) AS ilen
    FROM isl2 GROUP BY doc_id, g
  ) GROUP BY doc_id
)
SELECT a.doc_id, len(a.toks)::BIGINT AS n_tokens, d.dup_tokens
FROM adocs a JOIN dup d USING (doc_id)
WHERE d.dup_tokens > 0
ORDER BY d.dup_tokens DESC, a.doc_id ASC
LIMIT {k}
"""


def pack_report_sql(context_len: int, k: int = 100) -> str:
    """Sequence-packing report (mirrors curation.pack_report): docs
    concatenate in doc_id order (BPE-ish tokens + 1 EOS each), the stream
    chunks into fixed context windows; per pack: contributing docs, tokens
    landing inside, docs contained entirely."""
    L = int(context_len)
    return f"""
WITH d AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(coalesce(text, '')),
             '[a-z]+|[0-9]+|[^a-z0-9\\s]'))::BIGINT + 1 AS n_tok
  FROM documents
),
s AS (
  SELECT doc_id, n_tok,
         coalesce(sum(n_tok) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0)::BIGINT AS st
  FROM d
),
per AS (
  SELECT s.doc_id, s.st, s.n_tok, r.pack_id
  FROM s, unnest(range(s.st // {L}, (s.st + s.n_tok - 1) // {L} + 1))
       AS r(pack_id)
)
SELECT pack_id,
       count(*)::BIGINT AS n_docs,
       sum(least(st + n_tok, (pack_id + 1) * {L})
           - greatest(st, pack_id * {L}))::BIGINT AS n_tokens,
       sum(CASE WHEN st >= pack_id * {L}
                 AND st + n_tok <= (pack_id + 1) * {L}
            THEN 1 ELSE 0 END)::BIGINT AS n_full_docs
FROM per
GROUP BY pack_id
ORDER BY pack_id
LIMIT {k}
"""


def ann_euclidean_sql(n_queries: int = 5, k: int = 10) -> str:
    """Mirror of simsearch.euclidean_topk — integer squared distances."""
    return f"""
WITH {QEMB},
qcomps AS (
  SELECT vec_id AS query_id, v, j FROM comps WHERE vec_id < {n_queries}
),
alld AS (
  SELECT qc.query_id, c.vec_id AS neighbor_id,
         sum((qc.v - c.v) * (qc.v - c.v))::BIGINT AS dist2
  FROM qcomps qc
  JOIN comps c ON c.j = qc.j AND c.vec_id != qc.query_id
  GROUP BY qc.query_id, c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, dist2,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dist2 ASC, neighbor_id ASC) AS rnk
  FROM alld
)
SELECT query_id, rnk::INT AS rank, neighbor_id, dist2
FROM ranked WHERE rnk <= {k}
ORDER BY query_id, rank
"""


def ann_cosine_sql(n_queries: int = 5, k: int = 10) -> str:
    """Mirror of simsearch.cosine_topk — exact integer dot/norms, then the
    same three IEEE double ops (divide, sqrt, sqrt are correctly rounded →
    bit-identical across engines)."""
    return f"""
WITH {QEMB},
norms AS (
  SELECT vec_id, sum(v * v)::BIGINT AS n2 FROM comps GROUP BY vec_id
),
qcomps AS (
  SELECT vec_id AS query_id, v, j FROM comps WHERE vec_id < {n_queries}
),
alld AS (
  SELECT qc.query_id, c.vec_id AS neighbor_id,
         sum(qc.v * c.v)::BIGINT AS dot
  FROM qcomps qc
  JOIN comps c ON c.j = qc.j AND c.vec_id != qc.query_id
  GROUP BY qc.query_id, c.vec_id
),
scored AS (
  SELECT a.query_id, a.neighbor_id,
         (a.dot::DOUBLE / sqrt(nq.n2::DOUBLE) / sqrt(nn.n2::DOUBLE)) AS cos
  FROM alld a
  JOIN norms nq ON nq.vec_id = a.query_id
  JOIN norms nn ON nn.vec_id = a.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rnk
  FROM scored
)
SELECT query_id, rnk::INT AS rank, neighbor_id, cos
FROM ranked WHERE rnk <= {k}
ORDER BY query_id, rank
"""


def gopher_filter_sql(min_words: int = 10, max_words: int = 100_000) -> str:
    """Mirror of curation.gopher_filter — every rule an integer compare.
    DuckDB's regexp split + list ops recompute the same counts."""
    stops = ",".join(f"'{s}'" for s in sorted(STOPWORDS))
    return f"""
WITH d AS (
  SELECT doc_id, lower(coalesce(text, '')) AS t FROM documents
),
w AS (
  SELECT doc_id, t,
         list_filter(regexp_split_to_array(trim(t), '\\s+'),
                     x -> x != '') AS words,
         regexp_split_to_array(t, '\\n') AS lines
  FROM d
),
base AS (
  SELECT doc_id,
         len(words)::BIGINT AS n_words,
         coalesce(list_sum(list_transform(words, x -> length(x))),
                  0)::BIGINT AS n_wchars,
         len(regexp_extract_all(t, '#|\\.\\.\\.'))::BIGINT AS n_sym,
         len(list_filter(words,
                         x -> regexp_matches(x, '[a-z]')))::BIGINT
           AS n_alpha_words,
         len(list_filter(words, x -> x IN ({stops})))::BIGINT AS n_stop,
         len(lines)::BIGINT AS n_lines,
         (len(lines) - len(list_distinct(lines)))::BIGINT AS dup_lines
  FROM w
),
m AS (
  SELECT doc_id, n_words,
         (CASE WHEN n_words < {int(min_words)} THEN 1 ELSE 0 END
          + CASE WHEN n_words > {int(max_words)} THEN 2 ELSE 0 END
          + CASE WHEN 3 * n_words > n_wchars
                   OR n_wchars > 10 * n_words THEN 4 ELSE 0 END
          + CASE WHEN 10 * n_sym > n_words THEN 8 ELSE 0 END
          + CASE WHEN 5 * n_alpha_words < 4 * n_words THEN 16 ELSE 0 END
          + CASE WHEN n_stop < 2 THEN 32 ELSE 0 END
          + CASE WHEN 10 * dup_lines > 3 * n_lines THEN 64 ELSE 0 END
         )::BIGINT AS fail_mask
  FROM base
)
SELECT doc_id, n_words, fail_mask, fail_mask = 0 AS keep
FROM m ORDER BY doc_id
"""
