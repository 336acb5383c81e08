"""Per-segment HNSW graphs for vector search — the reference's flagship
vector index re-expressed for Spark
(``core/codecs/lucene95/Lucene95HnswVectorsFormat.java``,
``core/util/hnsw/HnswGraphBuilder.java:34`` / ``HnswGraphSearcher.java``).

Architecture parity: the reference builds ONE HNSW per segment and merges
per-segment top-k at search time — exactly what this module does, with the
graph build running inside each segment's ``applyInPandas`` task and the
adjacency persisted as parquet rows (seg, node, level, neighbors). Nothing
graph-shaped ever sits on the driver; a query fans out per segment, each
task loads only its own adjacency + vectors, and the driver merges k rows
per segment (the same bounded-merge contract as the text searcher).

Determinism: node levels come from a splitmix64 hash of the vector id
(``-ln(u) · mL`` like ``HnswGraphBuilder.getRandomGraphLevel``, but keyed
on the id instead of a shared RNG so ANY insertion partitioning yields the
same levels), insertion runs in ascending id order, and every ordering
tie-breaks on (similarity DESC, id ASC) — identical graphs and results on
every run. Similarity is the integer dot product over the quantized
embedding contract (maximum-inner-product search, the DOT_PRODUCT vector
similarity of the reference).

Documented divergence: neighbor selection keeps the M highest-similarity
candidates (no diversity heuristic — the reference's
``findWorstNonDiverse`` pruning); recall is therefore measured, not
assumed, and pytest pins it against brute force. HNSW results are
graph-walk-dependent and NOT SQL-expressible — the driver gate is a
rows-only check (the contract's documented weaker tier), with the
pytest recall/determinism suite as the real verification.
"""

from __future__ import annotations

import heapq
import math

import numpy as np

DEFAULT_M = 8
DEFAULT_EF_CONSTRUCTION = 64
LEVEL_SEED = 20260816


def node_levels(ids: np.ndarray, m: int = DEFAULT_M,
                seed: int = LEVEL_SEED) -> np.ndarray:
    """Deterministic per-id HNSW level: splitmix64(id) → u ∈ (0,1) →
    floor(-ln(u) · mL), mL = 1/ln(M) (HnswGraphBuilder.getRandomGraphLevel)."""
    h = ids.astype(np.uint64) + np.uint64(seed)
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    h = h ^ (h >> np.uint64(31))
    u = ((h >> np.uint64(11)).astype(np.float64) + 1.0) / float(2**53)
    m_l = 1.0 / math.log(m)
    return np.floor(-np.log(u) * m_l).astype(np.int64)


def _search_layer(q, entries, ef, adj, vecs):
    """Best-first beam over one layer: ``entries`` = [(sim, node)];
    returns the ef highest-sim nodes reached (HnswGraphSearcher.searchLevel).
    Ties break (sim DESC, node ASC) everywhere."""
    visited = {n for _, n in entries}
    # candidates: max-heap by sim → heapq of (-sim, node)
    cand = [(-s, n) for s, n in entries]
    heapq.heapify(cand)
    # best: min-heap of (sim, -node) keeps the ef best, worst on top
    best = [(s, -n) for s, n in entries]
    heapq.heapify(best)
    while len(best) > ef:
        heapq.heappop(best)
    while cand:
        nsim, c = heapq.heappop(cand)
        if len(best) >= ef and -nsim < best[0][0]:
            break
        nbrs = [nb for nb in adj.get(c, ()) if nb not in visited]
        if not nbrs:
            continue
        visited.update(nbrs)
        sims = vecs[nbrs] @ q
        for nb, s in zip(nbrs, sims.tolist()):
            if len(best) < ef or s > best[0][0] or (
                s == best[0][0] and -nb > best[0][1]
            ):
                heapq.heappush(best, (s, -nb))
                if len(best) > ef:
                    heapq.heappop(best)
                heapq.heappush(cand, (-s, nb))
    out = [(s, -negn) for s, negn in best]
    out.sort(key=lambda x: (-x[0], x[1]))
    return out


class SegmentHnsw:
    """One segment's HNSW graph over positional node ids 0..n-1."""

    def __init__(self, vecs: np.ndarray, levels: np.ndarray,
                 m: int = DEFAULT_M,
                 ef_construction: int = DEFAULT_EF_CONSTRUCTION):
        self.vecs = vecs
        self.m = m
        self.levels = levels
        self.adj: list[dict[int, list[int]]] = [
            {} for _ in range(int(levels.max()) + 1 if len(levels) else 1)
        ]
        self.entry, self.top = -1, -1
        for i in range(len(vecs)):
            self._insert(i, int(levels[i]), ef_construction)

    def _insert(self, i: int, li: int, efc: int):
        if self.entry < 0:
            for L in range(li + 1):
                self.adj[L][i] = []
            self.entry, self.top = i, li
            return
        q = self.vecs[i]
        cur = [(float(self.vecs[self.entry] @ q), self.entry)]
        for L in range(self.top, li, -1):
            cur = _search_layer(q, cur, 1, self.adj[L], self.vecs)
        for L in range(min(li, self.top), -1, -1):
            cands = _search_layer(q, cur, efc, self.adj[L], self.vecs)
            m_max = self.m if L > 0 else 2 * self.m
            sel = cands[: self.m]
            self.adj[L][i] = [n for _, n in sel]
            for s, e in sel:
                lst = self.adj[L].setdefault(e, [])
                lst.append(i)
                if len(lst) > m_max:
                    # shrink: keep the m_max highest-sim neighbors of e
                    ev = self.vecs[e]
                    sims = self.vecs[lst] @ ev
                    order = sorted(range(len(lst)),
                                   key=lambda j: (-sims[j], lst[j]))
                    self.adj[L][e] = [lst[j] for j in order[:m_max]]
            cur = cands
        if li > self.top:
            self.entry, self.top = i, li

    def search(self, q: np.ndarray, k: int, ef: int = 64):
        """[(sim, node)] — k highest-dot nodes, (sim DESC, node ASC)."""
        return graph_search(self.vecs, self.adj, self.entry, self.top,
                            q, k, ef)

    # -- flat serialization (parquet rows) -----------------------------------
    def to_rows(self, seg: int, ids: np.ndarray):
        """(seg, node, level, neighbors) rows in EXTERNAL ids, plus one
        entry row (node = -1, level = top, neighbors = [entry])."""
        rows = [(seg, -1, self.top, [int(ids[self.entry])])]
        for L, layer in enumerate(self.adj):
            for n, nbrs in layer.items():
                rows.append((seg, int(ids[n]), L,
                             [int(ids[x]) for x in nbrs]))
        return rows


def graph_search(vecs, adj, entry, top, q, k, ef=64):
    """HnswGraphSearcher.search over a (possibly reconstructed) graph:
    greedy ef=1 descent through the upper layers, beam max(ef, k) at
    layer 0."""
    if entry < 0:
        return []
    cur = [(float(vecs[entry] @ q), entry)]
    for L in range(top, 0, -1):
        cur = _search_layer(q, cur, 1, adj[L], vecs)
    best = _search_layer(q, cur, max(ef, k), adj[0], vecs)
    return best[:k]


def graph_from_rows(rows, id_to_pos):
    """Rebuild (adj, entry, top) from to_rows output (positional ids)."""
    adj: list[dict[int, list[int]]] = []
    entry, top = -1, -1
    for seg, node, level, nbrs in rows:
        if node == -1:
            entry, top = id_to_pos[nbrs[0]], level
            continue
        while len(adj) <= level:
            adj.append({})
        adj[level][id_to_pos[node]] = [id_to_pos[x] for x in nbrs]
    while len(adj) <= max(top, 0):
        adj.append({})
    return adj, entry, top
