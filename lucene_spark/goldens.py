"""Brute-force reference scorer — generates golden top-k from a raw corpus.

Independent of the index format, block codec, and WAND kernel: works directly
on a pandas corpus with dense python dicts, reimplementing only the scoring
contract of SURVEY.md §2.8 (float32 BM25 over SmallFloat norm bytes). This is
the FIXTURES.md §3 golden generator: every engine execution path (exhaustive
and WAND, any segmentation) must reproduce these (doc_id, float32 score) lists
exactly.

Collector semantics mirrored: hit iff (all MUST ∧ no MUST_NOT ∧ (MUST present
∨ ≥1 SHOULD) ∧ should-count ≥ minShouldMatch); score = float32(Σ_double of
float32 clause scores); top-k by (score DESC, doc_id ASC).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucene_spark.analysis import get_analyzer
from lucene_spark.search import ast
from lucene_spark.similarity import BM25Similarity
from lucene_spark.smallfloat import int_to_byte4

F32 = np.float32


class BruteForceIndex:
    """In-memory inverted index over a pandas transcript corpus."""

    def __init__(self, corpus: pd.DataFrame, analyzer: str = "standard",
                 similarity: BM25Similarity | None = None,
                 keyword_fields: tuple = ()):
        self.analyzer = get_analyzer(analyzer)
        self.similarity = similarity or BM25Similarity()
        pdf = corpus.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
        self.pdf = pdf
        # keyword fields: field -> value -> sorted doc array (StringField)
        self.keyword: dict[str, dict[str, np.ndarray]] = {}
        for kf in keyword_fields:
            m: dict[str, list] = {}
            for doc_id, v in enumerate(pdf[kf]):
                if v is not None:
                    m.setdefault(str(v), []).append(doc_id)
            self.keyword[kf] = {v: np.array(d, dtype=np.int64)
                                for v, d in m.items()}
        # per-keyword-field collection stats (single-valued, tf=1 per doc:
        # docCount = sumTTF = number of docs carrying the field)
        self.kw_field_stats = {
            kf: {"doc_count": (nd := sum(len(d) for d in vals.values())),
                 "sum_ttf": nd}
            for kf, vals in self.keyword.items()
        }
        tokens = self.analyzer.tokenize_series(pdf["text"])
        self.n = len(pdf)
        self.dl = tokens.map(len).to_numpy(dtype=np.int64)
        self.norms = int_to_byte4(self.dl).astype(np.int64)
        # postings: term -> (doc_id array, tf array), doc ascending; plus
        # positions (term -> doc -> [pos]) with Lucene position semantics:
        # dropped over-length tokens still increment the position counter
        post: dict[str, dict[int, int]] = {}
        self.positions: dict[str, dict[int, list]] = {}
        for doc_id, text in enumerate(pdf["text"]):
            for pos, t in self._tokens_with_positions(text):
                post.setdefault(t, {})
                post[t][doc_id] = post[t].get(doc_id, 0) + 1
                self.positions.setdefault(t, {}).setdefault(doc_id, []).append(pos)
        self.postings = {
            t: (
                np.array(sorted(m), dtype=np.int64),
                np.array([m[d] for d in sorted(m)], dtype=np.int64),
            )
            for t, m in post.items()
        }
        self.doc_count = self.n
        self.sum_ttf = int(self.dl.sum())

    def _tokens_with_positions(self, text: str):
        """(position, token) pairs via the analyzer's raw regex stream —
        independent of the byte-level production tokenizer."""
        import re

        from lucene_spark import analysis as A

        if not text:
            return
        if self.analyzer.name == "simple":
            for pos, t in enumerate(A._SIMPLE_RE.findall(text.lower())):
                yield pos, t
            return
        pos = 0
        filt = getattr(self.analyzer, "filter_token", None)
        stop = getattr(self.analyzer, "stopwords", None)
        for t in A._STANDARD_RE.findall(text.lower()):
            keep = (len(t) <= self.analyzer.max_token_length
                    and A._HAS_ALNUM_RE.search(t))
            if keep:
                if filt is not None:  # english chain: possessive/stop/stem
                    t2 = filt(t)
                    if t2 is not None:
                        yield pos, t2
                elif not stop or t not in stop:
                    yield pos, t
            pos += 1  # skipped tokens still bump position (stop filter holes too)

    def phrase_postings(self, terms):
        """{doc: freq} of exact-phrase matches (consecutive positions)."""
        out = {}
        maps = [self.positions.get(t, {}) for t in terms]
        if not maps or any(not m for m in maps):
            return out
        for doc, p0 in maps[0].items():
            cand = set(p0)
            for i, m in enumerate(maps[1:], start=1):
                ps = m.get(doc)
                if not ps:
                    cand = set()
                    break
                cand &= {p - i for p in ps}
                if not cand:
                    break
            if cand:
                out[doc] = len(cand)
        return out

    def _mt_matches(self, q) -> list:
        """Terms of q.field's vocabulary matching a MultiTermQuery (brute
        force) — keyword-field expansions run over that field's raw values
        (unanalyzed, case-preserved), not text tokens."""
        import re

        from lucene_spark.search.multiterm import damerau_levenshtein

        def pred(t):
            if q.kind == "prefix":
                return t.startswith(q.value)
            if q.kind == "wildcard":
                rx = "".join(
                    ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
                    for ch in q.value
                )
                return re.fullmatch(rx, t) is not None
            if q.kind == "regexp":
                return re.fullmatch(f"(?:{q.value})", t) is not None
            if q.kind == "fuzzy":
                return damerau_levenshtein(t, q.value) <= q.max_edits
            if q.kind == "range":
                return ((q.lower is None or t >= q.lower)
                        and (q.upper is None or t <= q.upper))
            if q.kind == "set":
                return t in q.terms
            raise ValueError(q.kind)

        vocab = (self.postings if q.field == "text"
                 else self.keyword.get(q.field, {}))
        return [t for t in vocab if pred(t)]

    def _mt_docs(self, q, matched):
        """Union doc array of the matched terms in q.field, or None."""
        if not matched:
            return None
        if q.field == "text":
            arrs = [self.postings[t][0] for t in matched]
        else:
            arrs = [self.keyword[q.field][t] for t in matched]
        return np.unique(np.concatenate(arrs))

    def sloppy_phrase_postings(self, per_slot_positions, slop):
        """{doc: float32 freq} under sloppy matching. ``per_slot_positions``:
        one {doc: [raw positions]} map per phrase slot. Uses the shared
        per-doc matcher (validated separately by hand-derived unit goldens);
        positions here come from the independent regex token stream."""
        from lucene_spark.search.phrase import _sloppy_freq_doc

        docs = set(per_slot_positions[0])
        for m in per_slot_positions[1:]:
            docs &= set(m)
        out = {}
        for doc in docs:
            pls = [np.array(sorted(m[doc]), dtype=np.int64) - i
                   for i, m in enumerate(per_slot_positions)]
            f = _sloppy_freq_doc(pls, slop)
            if f > 0.0:
                out[doc] = f
        return out

    def _slot_positions(self, slot):
        """Union {doc: sorted positions} over a tuple of alternative terms."""
        out: dict[int, set] = {}
        for t in slot:
            for doc, ps in self.positions.get(t, {}).items():
                out.setdefault(doc, set()).update(ps)
        return {d: sorted(ps) for d, ps in out.items()}

    def _exact_slot_matches(self, per_slot_positions):
        """{doc: freq}: count of start positions matching every slot."""
        out = {}
        docs = set(per_slot_positions[0])
        for m in per_slot_positions[1:]:
            docs &= set(m)
        for doc in docs:
            sets = [
                {p - i for p in per_slot_positions[i][doc]}
                for i in range(len(per_slot_positions))
            ]
            inter = set.intersection(*sets)
            if inter:
                out[doc] = len(inter)
        return out

    def _phrase_topk(self, matches, dfs, boost, k):
        if not matches or any(d == 0 for d in dfs):
            return []
        scorer = self.similarity.scorer(boost, self.doc_count, self.sum_ttf, dfs)
        docs = np.array(sorted(matches), dtype=np.int64)
        freqs = np.array([matches[d] for d in docs.tolist()])
        sc = scorer.score(freqs, self.norms[docs])
        order = np.lexsort((docs, -sc.astype(np.float64)))[:k]
        return [(int(docs[i]), float(sc[i])) for i in order]

    def search(self, query, k: int = 10):
        if isinstance(query, str):
            query = ast.parse(query, self.analyzer,
                              fields=("text",) + tuple(self.keyword))
        q = ast.normalize(query)
        if isinstance(q, ast.MatchNoDocsQuery) or self.doc_count == 0:
            return []
        if isinstance(q, ast.PhraseQuery):
            dfs = [self.postings[t][0].size if t in self.postings else 0
                   for t in q.terms]
            if any(d == 0 for d in dfs):
                return []
            if q.slop:
                slots = [dict(self.positions.get(t, {})) for t in q.terms]
                matches = self.sloppy_phrase_postings(slots, q.slop)
            else:
                matches = self.phrase_postings(list(q.terms))
            return self._phrase_topk(matches, dfs, q.boost, k)
        if isinstance(q, ast.MultiPhraseQuery):
            present_slots = [
                tuple(t for t in slot if t in self.postings)
                for slot in q.slots
            ]
            if any(not s for s in present_slots):
                return []
            dfs = [self.postings[t][0].size for slot in present_slots
                   for t in slot]
            per_slot = [self._slot_positions(s) for s in present_slots]
            if q.slop:
                matches = self.sloppy_phrase_postings(per_slot, q.slop)
            else:
                matches = self._exact_slot_matches(per_slot)
            return self._phrase_topk(matches, dfs, q.boost, k)
        if isinstance(q, ast.MultiTermQuery):
            # CONSTANT_SCORE: k smallest matching docIDs, score == boost
            docs = self._mt_docs(q, self._mt_matches(q))
            if docs is None:
                return []
            return [(int(d), float(F32(q.boost))) for d in docs[:k]]
        if isinstance(q, ast.SpanNearQuery):
            # standalone span: k smallest matching docIDs, score == boost
            docs = self._span_docs(q)
            if docs is None:
                return []
            return [(int(d), float(F32(q.boost))) for d in docs[:k]]
        if isinstance(q, (ast.TermQuery, ast.SynonymQuery)):
            q = ast.BooleanQuery(((ast.SHOULD, q),))
        if not isinstance(q, ast.BooleanQuery):
            raise NotImplementedError(
                f"BruteForceIndex.search does not model "
                f"{type(q).__name__} (engine-only query shape)")

        res = self._bool_eval(q)
        if res is None:
            return []
        ok, sc_all = res
        idx = np.flatnonzero(ok)
        if idx.size == 0:
            return []
        sc = sc_all[idx]
        order = np.lexsort((idx, -sc.astype(np.float64)))[:k]
        return [(int(idx[i]), float(sc[i])) for i in order]

    def _span_docs(self, q):
        """Brute span-near match set (docID array) for a SpanNearQuery —
        per-doc exhaustive enumeration over the slots' position lists
        (a slot may be a tuple of SpanOr alternatives); None when a slot
        has no indexed alternative."""
        from itertools import permutations, product

        slots = [tuple(t) if isinstance(t, (tuple, list)) else (t,)
                 for t in q.terms]
        maps = []
        for slot in slots:
            merged: dict = {}
            for t in slot:
                for d, ps in self.positions.get(t, {}).items():
                    merged.setdefault(d, set()).update(ps)
            if not merged:
                return None
            maps.append(merged)
        docs = set(maps[0])
        for m in maps[1:]:
            docs &= set(m)
        n = len(slots)
        out = []
        for d in sorted(docs):
            pls = [sorted(m[d]) for m in maps]

            def feasible(order_idx):
                for combo in product(*[pls[i] for i in order_idx]):
                    if all(combo[j] > combo[j - 1] for j in range(1, n)) \
                            and combo[-1] - combo[0] - (n - 1) <= q.slop:
                        return True
                return False

            hit = (feasible(list(range(n))) if q.in_order else
                   any(feasible(list(p)) for p in permutations(range(n))))
            if hit:
                out.append(d)
        return np.array(out, dtype=np.int64) if out else None

    def _bool_eval(self, q):
        """Recursive boolean evaluation: (match mask, float32 scores over all
        docs) or None when the node can never match. Nested BooleanQuery
        clauses evaluate bottom-up — each inner node contributes its float32
        node score as ONE virtual clause (the ``Boolean2ScorerSupplier``
        composition the engine's mixed kernel mirrors)."""
        score = np.zeros(self.n, dtype=np.float64)
        must_cnt = np.zeros(self.n, dtype=np.int64)
        should_cnt = np.zeros(self.n, dtype=np.int64)
        excluded = np.zeros(self.n, dtype=bool)
        n_req = 0
        any_scoring = False
        for occur, tq in q.clauses:
            if isinstance(tq, ast.BooleanQuery):
                sub = self._bool_eval(tq)
                sub_docs = (np.flatnonzero(sub[0])
                            if sub is not None else np.zeros(0, np.int64))
                if sub_docs.size == 0:
                    if occur in (ast.MUST, ast.FILTER):
                        return None
                    continue
                if occur == ast.MUST_NOT:
                    excluded[sub_docs] = True
                    continue
                if occur in (ast.MUST, ast.FILTER):
                    n_req += 1
                    must_cnt[sub_docs] += 1
                if occur in (ast.MUST, ast.SHOULD):
                    any_scoring = True
                    score[sub_docs] += sub[1][sub_docs].astype(np.float64)
                    if occur == ast.SHOULD:
                        should_cnt[sub_docs] += 1
                continue
            if isinstance(tq, ast.MatchAllDocsQuery):
                # MatchAllDocsQuery clause (the SimpleQueryParser NOT
                # wrapper): every doc matches at constant f32(boost)
                if occur == ast.MUST_NOT:
                    excluded[:] = True
                    continue
                if occur in (ast.MUST, ast.FILTER):
                    n_req += 1
                    must_cnt += 1
                if occur in (ast.MUST, ast.SHOULD):
                    any_scoring = True
                    score += float(F32(tq.boost))
                    if occur == ast.SHOULD:
                        should_cnt += 1
                continue
            if isinstance(tq, ast.TermQuery) and tq.field != "text":
                # keyword field: constant similarity score (freq=1, dl=1,
                # keyword-field collection stats), occur preserved
                docs = self.keyword.get(tq.field, {}).get(tq.term)
                if occur == ast.MUST_NOT:
                    if docs is not None:
                        excluded[docs] = True
                    continue
                if occur in (ast.MUST, ast.FILTER):
                    n_req += 1
                    if docs is None:
                        return None
                    must_cnt[docs] += 1
                if occur in (ast.MUST, ast.SHOULD):
                    if docs is None:
                        continue
                    from lucene_spark.search.searcher import (
                        keyword_const_score,
                    )

                    st = {"df": int(docs.size), "ttf": int(docs.size)}
                    const = keyword_const_score(
                        self.similarity, tq.boost,
                        self.kw_field_stats.get(tq.field), st)
                    any_scoring = True
                    score[docs] += float(const)
                    if occur == ast.SHOULD:
                        should_cnt[docs] += 1
                continue
            if isinstance(tq, ast.SpanNearQuery):
                # span clause in a boolean: constant-score match set
                docs = self._span_docs(tq)
                if occur == ast.MUST_NOT:
                    if docs is not None:
                        excluded[docs] = True
                    continue
                if occur in (ast.MUST, ast.FILTER):
                    n_req += 1
                    if docs is None:
                        return None
                    must_cnt[docs] += 1
                if occur in (ast.MUST, ast.SHOULD):
                    if docs is None:
                        continue
                    any_scoring = True
                    score[docs] += float(F32(tq.boost))
                    if occur == ast.SHOULD:
                        should_cnt[docs] += 1
                continue
            if isinstance(tq, ast.MultiTermQuery):
                # CONSTANT_SCORE rewrite: union doc set, contributes boost
                docs = self._mt_docs(tq, self._mt_matches(tq))
                if occur == ast.MUST_NOT:
                    if docs is not None:
                        excluded[docs] = True
                    continue
                if occur in (ast.MUST, ast.FILTER):
                    n_req += 1
                    if docs is None:
                        return None
                    must_cnt[docs] += 1
                if occur in (ast.MUST, ast.SHOULD):
                    if docs is None:
                        continue
                    any_scoring = True
                    score[docs] += float(F32(tq.boost))
                    if occur == ast.SHOULD:
                        should_cnt[docs] += 1
                continue
            if isinstance(tq, ast.PhraseQuery):
                if tq.slop:
                    slots = [dict(self.positions.get(t, {}))
                             for t in tq.terms]
                    matches = self.sloppy_phrase_postings(slots, tq.slop)
                else:
                    matches = self.phrase_postings(list(tq.terms))
                present = bool(matches) and all(
                    t in self.postings for t in tq.terms
                )
                hit = None
                if present:
                    pd_ = np.array(sorted(matches), dtype=np.int64)
                    # sloppy freqs are float32 (Σ 1/(1+matchLength)),
                    # exact freqs integer counts — same as the engine
                    hit = (pd_, np.array(
                        [matches[d] for d in pd_.tolist()],
                        dtype=F32 if tq.slop else np.int64))
                dfs = [self.postings[t][0].size for t in tq.terms
                       if t in self.postings]
                if len(dfs) != len(tq.terms):
                    hit = None
            elif isinstance(tq, ast.TermQuery):
                hit = self.postings.get(tq.term)
                dfs = [hit[0].size] if hit is not None else []
            elif isinstance(tq, ast.SynonymQuery):
                # blended pseudo-term (SynonymQuery.java:205-222): tf summed
                # per doc across PRESENT members, df = max over present
                members = [self.postings[t]
                           for t in dict.fromkeys(tq.terms)
                           if t in self.postings]
                if not members:
                    hit, dfs = None, []
                else:
                    uniq, inv = np.unique(
                        np.concatenate([m[0] for m in members]),
                        return_inverse=True)
                    tfsum = np.zeros(uniq.size, dtype=np.int64)
                    np.add.at(tfsum, inv,
                              np.concatenate([m[1] for m in members]))
                    hit = (uniq, tfsum)
                    dfs = [max(m[0].size for m in members)]
            else:
                raise NotImplementedError(
                    f"BruteForceIndex._bool_eval does not model "
                    f"{type(tq).__name__} clauses")
            if occur == ast.MUST_NOT:
                if hit is not None:
                    excluded[hit[0]] = True
                continue
            if occur in (ast.MUST, ast.FILTER):
                n_req += 1
                if hit is None:
                    return None  # required clause absent / never matches
                must_cnt[hit[0]] += 1
            if occur in (ast.MUST, ast.SHOULD):
                if hit is None:
                    continue
                any_scoring = True
                docs, tfs = hit
                ttfs = ([int(tfs.sum())]
                        if isinstance(tq, ast.TermQuery) else None)
                if isinstance(tq, ast.TermQuery) and tq.df1:
                    # artificial df = ttf = 1 (NearestFuzzyQuery.java:199)
                    dfs, ttfs = [1], [1]
                scorer = self.similarity.scorer(
                    tq.boost, self.doc_count, self.sum_ttf, dfs, ttfs=ttfs
                )
                score[docs] += scorer.score(tfs, self.norms[docs]).astype(np.float64)
                if occur == ast.SHOULD:
                    should_cnt[docs] += 1

        msm = max(q.min_should_match, 0 if n_req else 1)
        ok = (must_cnt >= n_req) & ~excluded
        if msm:
            ok &= should_cnt >= msm
        if not any_scoring and n_req == 0:
            return None
        return ok, score.astype(F32)
