"""BM25 scoring, bit-identical to the reference BM25Similarity (float32 ops).

Contract reproduced (semantics, not code) from
``core/search/similarities/BM25Similarity.java``:

- ``idf = (float) log(1 + (docCount - df + 0.5) / (df + 0.5))`` — double math,
  rounded once to float32 (:109-111 of the reference file).
- ``avgdl = (float) (sumTotalTermFreq / (double) docCount)`` (:113-116).
- per-norm cache: ``cache[c] = 1f / (k1 * ((1 - b) + b * LENGTH_TABLE[c] / avgdl))``
  — every op float32, evaluated left-to-right (:207-210).
- ``weight = boost * idf`` float32 (:236); multi-term idf is the sum of per-term
  float idfs accumulated in double, then cast to float (:185-194).
- ``score(tf, norm) = weight - weight / (1f + tf * cache[norm & 0xFF])`` with
  float32 multiply/add/divide/subtract (:240-252).

numpy float32 uses IEEE-754 round-to-nearest-even, same as the JVM, so these
kernels reproduce Java float results bit-for-bit as long as no op silently
promotes to float64 — every intermediate below is dtype-pinned.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from lucene_spark.smallfloat import LENGTH_TABLE

F32 = np.float32


def idf(df: int, doc_count: int) -> np.float32:
    """Per-term idf: double math, single rounding to float32."""
    return np.float32(math.log(1.0 + (doc_count - df + 0.5) / (df + 0.5)))


def sum_idf(dfs, doc_count: int) -> np.float32:
    """Multi-term idf: per-term float32 idfs accumulated in float64, cast once."""
    acc = 0.0  # python float == double
    for df in dfs:
        acc += float(idf(df, doc_count))
    return np.float32(acc)


def avg_field_length(sum_total_term_freq: int, doc_count: int) -> np.float32:
    return np.float32(sum_total_term_freq / float(doc_count))


def norm_cache(avgdl: np.float32, k1: np.float32, b: np.float32) -> np.ndarray:
    """256-entry float32 inverse-norm cache; all ops float32, left-to-right."""
    k1 = F32(k1)
    b = F32(b)
    avgdl = F32(avgdl)
    one = F32(1.0)
    # (1 - b) + b * LENGTH_TABLE[i] / avgdl, float32 each step
    t = (LENGTH_TABLE * b).astype(F32)
    t = (t / avgdl).astype(F32)
    t = ((one - b) + t).astype(F32)
    t = (k1 * t).astype(F32)
    return (one / t).astype(F32)


@dataclass(frozen=True)
class BM25Similarity:
    """Reference-default BM25: k1=1.2, b=0.75, discountOverlaps=True."""

    k1: float = 1.2
    b: float = 0.75

    def scorer(
        self,
        boost: float,
        doc_count: int,
        sum_total_term_freq: int,
        dfs,
        ttfs=None,
    ) -> "BM25Scorer":
        """Bind collection + term statistics, mirroring Similarity.scorer().

        ``dfs`` is a sequence of per-term docFreqs; len>1 sums idfs (phrase /
        synonym semantics). Stats are whole-index (all segments), so scores
        are segmentation-independent.
        """
        dfs = list(dfs)
        w_idf = idf(dfs[0], doc_count) if len(dfs) == 1 else sum_idf(dfs, doc_count)
        avgdl = avg_field_length(sum_total_term_freq, doc_count)
        cache = norm_cache(avgdl, F32(self.k1), F32(self.b))
        weight = F32(F32(boost) * w_idf)  # float32 * float32 stays float32
        return BM25Scorer(weight=weight, cache=cache, avgdl=avgdl)


@dataclass(frozen=True)
class BM25Scorer:
    weight: np.float32
    cache: np.ndarray  # float32[256]
    avgdl: np.float32

    def score(self, tf, norm_code) -> np.ndarray:
        """Vectorized float32 score for (tf, norm byte) arrays.

        Exactly ``weight - weight / (1f + tf * cache[norm])`` in float32.
        """
        tf = np.asarray(tf, dtype=F32)
        norm_code = np.asarray(norm_code, dtype=np.int64) & 0xFF
        inv = self.cache[norm_code]  # float32
        one = F32(1.0)
        denom = (one + (tf * inv).astype(F32)).astype(F32)
        return (self.weight - (self.weight / denom).astype(F32)).astype(F32)

    def max_score(self, tf, norm_code) -> np.float32:
        """Upper bound for a block given its competitive (tf, norm) impacts."""
        s = self.score(np.asarray(tf), np.asarray(norm_code))
        return F32(s.max()) if s.size else F32(0.0)


# --------------------------------------------------------------------------
# Additional similarity models — the Similarity plug-in surface
# (``core/search/similarities/``). Each provides the same
# ``scorer(boost, doc_count, sum_ttf, dfs, ttfs=None)`` protocol as BM25;
# the returned scorer exposes ``weight`` (float32, used for spec metadata)
# and vectorized ``score(tf, norm_code)``. All models are monotone ↑tf and
# ↓decoded-length, so the stored Pareto impacts remain valid block-max
# bounds for the generic WAND kernel.
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class ClassicSimilarity:
    """Vector-space TF-IDF (``core/search/similarities/ClassicSimilarity.java``):
    idf = float(ln((docCount+1)/(df+1)) + 1); tf = float(sqrt(freq));
    lengthNorm = float(1/sqrt(decoded_len)); score = tf·(boost·idf)·norm,
    each op float32 (``TFIDFSimilarity.java:505-510``)."""

    name = "classic"

    def scorer(self, boost, doc_count, sum_ttf, dfs, ttfs=None):
        dfs = list(dfs)
        # per-term float idfs summed in double, cast once (idfExplain array)
        acc = 0.0
        for df in dfs:
            acc += float(F32(math.log((doc_count + 1) / float(df + 1)) + 1.0))
        w_idf = F32(acc) if len(dfs) > 1 else F32(
            math.log((doc_count + 1) / float(dfs[0] + 1)) + 1.0)
        query_weight = F32(F32(boost) * w_idf)
        norm_table = np.zeros(256, dtype=F32)
        lt = LENGTH_TABLE.astype(np.float64)
        norm_table[1:] = (1.0 / np.sqrt(lt[1:])).astype(F32)
        norm_table[0] = F32(F32(1.0) / norm_table[255])
        return ClassicScorer(weight=query_weight, norm_table=norm_table)


@dataclass(frozen=True)
class ClassicScorer:
    weight: np.float32
    norm_table: np.ndarray

    def score(self, tf, norm_code) -> np.ndarray:
        raw = (np.sqrt(np.asarray(tf, dtype=np.float64)).astype(F32)
               * self.weight).astype(F32)
        nv = self.norm_table[np.asarray(norm_code, dtype=np.int64) & 0xFF]
        return (raw * nv).astype(F32)


@dataclass(frozen=True)
class BooleanSimilarity:
    """Constant per-clause score == boost
    (``core/search/similarities/BooleanSimilarity.java:58-60``)."""

    name = "boolean"

    def scorer(self, boost, doc_count, sum_ttf, dfs, ttfs=None):
        return BooleanScorer(weight=F32(boost))


@dataclass(frozen=True)
class BooleanScorer:
    weight: np.float32

    def score(self, tf, norm_code) -> np.ndarray:
        return np.full(np.asarray(tf).shape, self.weight, dtype=F32)


@dataclass(frozen=True)
class LMDirichletSimilarity:
    """Dirichlet-smoothed language model
    (``core/search/similarities/LMDirichletSimilarity.java:68-75``):
    score = float(max(0, boost·(ln(1 + tf/(μ·P)) + ln(μ/(dl+μ))))) with
    P = (ttf+1)/(sumTTF+1) in double (``LMSimilarity.java:145-147``) and
    dl the decoded SmallFloat length (``SimilarityBase.java:218-224``)."""

    mu: float = 2000.0
    name = "lm_dirichlet"

    def scorer(self, boost, doc_count, sum_ttf, dfs, ttfs=None):
        if ttfs is None or len(ttfs) != 1:
            raise NotImplementedError(
                "LMDirichletSimilarity scores single-term clauses "
                "(ttf statistics required)"
            )
        p = (float(ttfs[0]) + 1.0) / (float(sum_ttf) + 1.0)
        return LMDirichletScorer(weight=F32(boost), boost=float(boost),
                                 mu=float(F32(self.mu)), p=p)


@dataclass(frozen=True)
class LMDirichletScorer:
    weight: np.float32  # spec metadata only
    boost: float
    mu: float
    p: float

    def score(self, tf, norm_code) -> np.ndarray:
        dl = LENGTH_TABLE[np.asarray(norm_code, dtype=np.int64) & 0xFF]
        dl = dl.astype(np.float64)
        tf64 = np.asarray(tf, dtype=F32).astype(np.float64)
        s = self.boost * (np.log(1.0 + tf64 / (self.mu * self.p))
                          + np.log(self.mu / (dl + self.mu)))
        return np.maximum(s, 0.0).astype(F32)


_LN2 = math.log(2.0)


@dataclass(frozen=True)
class DFRSimilarity:
    """Divergence-from-randomness GB2: BasicModelG + AfterEffectB +
    NormalizationH2(c=1) (``core/search/similarities/DFRSimilarity.java:104-108``):

    - tfn = tf · log2(1 + c·avgdl/dl) (``NormalizationH2.java:57-59``)
    - λ = F/(N+F) with F = ttf+1; A = log2(λ+1); B = log2((1+λ)/λ)
      (``BasicModelG.java:36-51``)
    - aeTimes1pTfn = (F+1)/(df+1) (``AfterEffectB.java:32-36``)
    - score = float(boost · (B − (B−A)/(1+tfn)) · ae / (1+tfn)-combined)
      — all double math, single float cast (``SimilarityBase.java:223-224``).
    avgdl = sumTTF/docCount in DOUBLE (``SimilarityBase.java:109-111`` —
    unlike BM25's float cast)."""

    c: float = 1.0
    name = "dfr_gb2"

    def scorer(self, boost, doc_count, sum_ttf, dfs, ttfs=None):
        if ttfs is None or len(dfs) != 1:
            raise NotImplementedError(
                "DFRSimilarity scores single-term clauses (ttf required)")
        F = float(ttfs[0]) + 1.0
        N = float(doc_count)
        lam = F / (N + F)
        A = math.log(lam + 1.0) / _LN2
        Bv = math.log((1.0 + lam) / lam) / _LN2
        ae = (F + 1.0) / (float(dfs[0]) + 1.0)
        avgdl = float(sum_ttf) / float(doc_count)
        return DFRScorer(weight=F32(boost), boost=float(boost), A=A, B=Bv,
                         ae=ae, avgdl=avgdl, c=float(self.c))


@dataclass(frozen=True)
class DFRScorer:
    weight: np.float32  # spec metadata only
    boost: float
    A: float
    B: float
    ae: float
    avgdl: float
    c: float

    def score(self, tf, norm_code) -> np.ndarray:
        dl = LENGTH_TABLE[np.asarray(norm_code, dtype=np.int64) & 0xFF]
        dl = dl.astype(np.float64)
        tf64 = np.asarray(tf, dtype=F32).astype(np.float64)
        tfn = tf64 * (np.log(1.0 + self.c * self.avgdl / dl) / _LN2)
        s = self.boost * (self.B - (self.B - self.A) / (1.0 + tfn)) * self.ae
        return s.astype(F32)


@dataclass(frozen=True)
class IBSimilarity:
    """Information-based LL·DF·H2(c=1)
    (``core/search/similarities/IBSimilarity.java:92-96``):
    λ = float((df+1)/(N+1)) (``LambdaDF.java:33-39``),
    tfn = tf · log2(1 + avgdl/dl) (``NormalizationH2.java:57-59``),
    score = float(boost · (−ln(λ/(tfn+λ)))) (``DistributionLL.java:33-35``)."""

    c: float = 1.0
    name = "ib_ll"

    def scorer(self, boost, doc_count, sum_ttf, dfs, ttfs=None):
        if len(dfs) != 1:
            raise NotImplementedError(
                "IBSimilarity scores single-term clauses")
        lam = F32((float(dfs[0]) + 1.0) / (float(doc_count) + 1.0))
        if float(lam) == 1.0:
            lam = np.nextafter(lam, F32(0.0), dtype=F32)
        avgdl = float(sum_ttf) / float(doc_count)
        return IBScorer(weight=F32(boost), boost=float(boost),
                        lam=float(lam), avgdl=avgdl, c=float(self.c))


@dataclass(frozen=True)
class IBScorer:
    weight: np.float32  # spec metadata only
    boost: float
    lam: float
    avgdl: float
    c: float

    def score(self, tf, norm_code) -> np.ndarray:
        dl = LENGTH_TABLE[np.asarray(norm_code, dtype=np.int64) & 0xFF]
        dl = dl.astype(np.float64)
        tf64 = np.asarray(tf, dtype=F32).astype(np.float64)
        tfn = tf64 * (np.log(1.0 + self.c * self.avgdl / dl) / _LN2)
        s = self.boost * (-np.log(self.lam / (tfn + self.lam)))
        return s.astype(F32)


@dataclass(frozen=True)
class DFISimilarity:
    """Divergence-from-independence, chi-squared measure
    (``core/search/similarities/DFISimilarity.java:57-67`` +
    ``IndependenceChiSquared.java:33-35``): expected = (ttf+1)·dl/(T+1)
    with T = sumTotalTermFreq; freq ≤ expected → 0; else score =
    float(boost · log2((freq−expected)²/expected + 1))."""

    name = "dfi_chi2"

    def scorer(self, boost, doc_count, sum_ttf, dfs, ttfs=None):
        if ttfs is None or len(dfs) != 1:
            raise NotImplementedError(
                "DFISimilarity scores single-term clauses (ttf required)")
        return DFIScorer(weight=F32(boost), boost=float(boost),
                         ttf1=float(ttfs[0]) + 1.0,
                         T1=float(sum_ttf) + 1.0)


@dataclass(frozen=True)
class DFIScorer:
    weight: np.float32  # spec metadata only
    boost: float
    ttf1: float
    T1: float

    def score(self, tf, norm_code) -> np.ndarray:
        dl = LENGTH_TABLE[np.asarray(norm_code, dtype=np.int64) & 0xFF]
        dl = dl.astype(np.float64)
        tf64 = np.asarray(tf, dtype=F32).astype(np.float64)
        expected = self.ttf1 * dl / self.T1
        with np.errstate(divide="ignore", invalid="ignore"):
            measure = (tf64 - expected) ** 2 / expected
            s = self.boost * (np.log(measure + 1.0) / _LN2)
        s = np.where(tf64 <= expected, 0.0, s)
        return s.astype(F32)


@dataclass(frozen=True)
class AxiomaticF2EXP:
    """Axiomatic F2EXP (``core/search/similarities/AxiomaticF2EXP.java:59-84``
    via ``Axiomatic.java:96-106``): score = float(max(0, boost ·
    freq/(freq + s + s·dl/avgdl) · ((N+1)/df)^k)); defaults s=0.25, k=0.35;
    avgdl = sumTTF/N in DOUBLE."""

    s: float = 0.25
    k: float = 0.35
    name = "axiomatic_f2exp"

    def scorer(self, boost, doc_count, sum_ttf, dfs, ttfs=None):
        if len(dfs) != 1:
            raise NotImplementedError(
                "AxiomaticF2EXP scores single-term clauses")
        idf = math.pow((float(doc_count) + 1.0) / float(dfs[0]),
                       float(F32(self.k)))
        avgdl = float(sum_ttf) / float(doc_count)
        return AxiomaticF2EXPScorer(weight=F32(boost), boost=float(boost),
                                    s=float(F32(self.s)), idf=idf,
                                    avgdl=avgdl)


@dataclass(frozen=True)
class AxiomaticF2EXPScorer:
    weight: np.float32  # spec metadata only
    boost: float
    s: float
    idf: float
    avgdl: float

    def score(self, tf, norm_code) -> np.ndarray:
        dl = LENGTH_TABLE[np.asarray(norm_code, dtype=np.int64) & 0xFF]
        dl = dl.astype(np.float64)
        tf64 = np.asarray(tf, dtype=F32).astype(np.float64)
        tfln = tf64 / (tf64 + self.s + self.s * dl / self.avgdl)
        s = np.maximum(self.boost * tfln * self.idf, 0.0)
        return s.astype(F32)


@dataclass(frozen=True)
class AxiomaticSimilarity:
    """Axiomatic family F1/F2/F3 × EXP/LOG
    (``core/search/similarities/Axiomatic.java:96-106`` composition:
    score = max(0, boost · (tf · ln · tfln · idf − gamma))):

    - F1*: tf = 1 + ln(1 + ln(freq+1)) (``AxiomaticF1EXP.java:59-62``),
      ln = (avgdl+s)/(avgdl + dl·s) (:66-68), tfln = 1.
    - F2*: tf = ln = 1, tfln = freq/(freq + s + s·dl/avgdl)
      (``AxiomaticF2LOG.java:61-63``).
    - F3*: tf as F1, ln = tfln = 1,
      gamma = (dl − queryLen)·s·queryLen/avgdl (``AxiomaticF3EXP.java:84-86``).
    - *EXP: idf = ((N+1)/df)^k (``AxiomaticF1EXP.java:78-80``);
      *LOG: idf = ln((N+1)/df) (``AxiomaticF1LOG.java:69-71``).

    Defaults s=0.25, k=0.35, queryLen=1 (``Axiomatic.java`` ctor defaults);
    s/k stored float32 like the reference fields; formula math is double
    with a single float cast (``SimilarityBase.java:223-225``)."""

    variant: str = "f1exp"  # f1exp|f1log|f2log|f3exp|f3log (f2exp: class above)
    s: float = 0.25
    k: float = 0.35
    query_len: int = 1

    def scorer(self, boost, doc_count, sum_ttf, dfs, ttfs=None):
        if len(dfs) != 1:
            raise NotImplementedError(
                "AxiomaticSimilarity scores single-term clauses")
        fam, kind = self.variant[:2], self.variant[2:]
        if kind == "exp":
            idf_v = math.pow((float(doc_count) + 1.0) / float(dfs[0]),
                             float(F32(self.k)))
        else:
            idf_v = math.log((float(doc_count) + 1.0) / float(dfs[0]))
        avgdl = float(sum_ttf) / float(doc_count)
        gamma_coeff = 0.0
        if fam == "f3":
            gamma_coeff = float(F32(self.s)) * float(self.query_len) / avgdl
        return AxiomaticScorer(
            weight=F32(boost), boost=float(boost), s=float(F32(self.s)),
            idf=idf_v, avgdl=avgdl, use_tf=(fam in ("f1", "f3")),
            use_ln=(fam == "f1"), use_tfln=(fam == "f2"),
            gamma_coeff=gamma_coeff, query_len=float(self.query_len))


@dataclass(frozen=True)
class AxiomaticScorer:
    weight: np.float32  # spec metadata only
    boost: float
    s: float
    idf: float
    avgdl: float
    use_tf: bool
    use_ln: bool
    use_tfln: bool
    gamma_coeff: float
    query_len: float

    def score(self, tf, norm_code) -> np.ndarray:
        dl = LENGTH_TABLE[np.asarray(norm_code, dtype=np.int64) & 0xFF]
        dl = dl.astype(np.float64)
        tf64 = np.asarray(tf, dtype=F32).astype(np.float64)
        comp = np.full_like(tf64, self.idf)
        if self.use_tf:
            comp *= 1.0 + np.log(1.0 + np.log(tf64 + 1.0))
        if self.use_ln:
            comp *= (self.avgdl + self.s) / (self.avgdl + dl * self.s)
        if self.use_tfln:
            comp *= tf64 / (tf64 + self.s + self.s * dl / self.avgdl)
        if self.gamma_coeff:
            comp = comp - (dl - self.query_len) * self.gamma_coeff
        return np.maximum(comp * self.boost, 0.0).astype(F32)


@dataclass(frozen=True)
class IndriDirichletSimilarity:
    """Indri's Dirichlet-smoothed query likelihood
    (``core/search/similarities/IndriDirichletSimilarity.java:62-66``):
    score = float(ln((tf + μ·P)/(dl + μ))) with
    P = ttf/sumTTF (``IndriCollectionModel``, :104-106 — no +1 smoothing).
    Faithful quirks: the boost is NOT applied (the reference's ``score()``
    ignores ``stats.getBoost()``) and scores are log-probabilities, i.e.
    NEGATIVE — the scorer flags ``nonnegative=False`` so the WAND kernel
    clamps block bounds at 0 (valid, no pruning), mirroring how impacts
    cannot prune a negative-scoring model."""

    mu: float = 2000.0
    name = "indri_dirichlet"

    def scorer(self, boost, doc_count, sum_ttf, dfs, ttfs=None):
        if ttfs is None or len(ttfs) != 1:
            raise NotImplementedError(
                "IndriDirichletSimilarity scores single-term clauses")
        p = float(ttfs[0]) / float(sum_ttf)
        return IndriDirichletScorer(weight=F32(1.0), mu=float(F32(self.mu)),
                                    p=p)


@dataclass(frozen=True)
class IndriDirichletScorer:
    weight: np.float32  # spec metadata only
    mu: float
    p: float
    nonnegative = False

    def score(self, tf, norm_code) -> np.ndarray:
        dl = LENGTH_TABLE[np.asarray(norm_code, dtype=np.int64) & 0xFF]
        dl = dl.astype(np.float64)
        tf64 = np.asarray(tf, dtype=F32).astype(np.float64)
        s = np.log((tf64 + self.mu * self.p) / (dl + self.mu))
        return s.astype(F32)


@dataclass(frozen=True)
class DFRInL2Similarity:
    """DFR I(n)L2: BasicModelIn + AfterEffectL + NormalizationH2(c=1).
    A = log2((N+1)/(df+0.5)) (``BasicModelIn.java:34-44``);
    AfterEffectL ⇒ aeTimes1pTfn = 1 (``AfterEffectL.java:32-34``);
    score = boost · A · (1 − 1/(1+tfn)), tfn = tf·log2(1 + c·avgdl/dl)
    (``NormalizationH2.java:57-59``); avgdl double
    (``SimilarityBase.java:109-111``)."""

    c: float = 1.0
    name = "dfr_inl2"

    def scorer(self, boost, doc_count, sum_ttf, dfs, ttfs=None):
        if len(dfs) != 1:
            raise NotImplementedError(
                "DFRInL2Similarity scores single-term clauses")
        A = math.log((float(doc_count) + 1.0) / (float(dfs[0]) + 0.5)) / _LN2
        avgdl = float(sum_ttf) / float(doc_count)
        return DFRInL2Scorer(weight=F32(boost), boost=float(boost), A=A,
                             avgdl=avgdl, c=float(self.c))


@dataclass(frozen=True)
class DFRInL2Scorer:
    weight: np.float32  # spec metadata only
    boost: float
    A: float
    avgdl: float
    c: float

    def score(self, tf, norm_code) -> np.ndarray:
        dl = LENGTH_TABLE[np.asarray(norm_code, dtype=np.int64) & 0xFF]
        dl = dl.astype(np.float64)
        tf64 = np.asarray(tf, dtype=F32).astype(np.float64)
        tfn = tf64 * (np.log(1.0 + self.c * self.avgdl / dl) / _LN2)
        s = self.boost * self.A * (1.0 - 1.0 / (1.0 + tfn))
        return s.astype(F32)


@dataclass(frozen=True)
class DFRIneB2Similarity:
    """DFR I(ne)B2: BasicModelIne + AfterEffectB + NormalizationH2(c=1).
    ne = N·(1 − ((N−1)/N)^F) with F = ttf (``BasicModelIne.java:34-44``);
    A = log2((N+1)/(ne+0.5)); AfterEffectB ⇒ ae = (ttf+2)/(df+1)
    (``AfterEffectB.java:32-36``: F=ttf+1, n=df+1, (F+1)/n);
    score = boost · A · ae · (1 − 1/(1+tfn))."""

    c: float = 1.0
    name = "dfr_ineb2"

    def scorer(self, boost, doc_count, sum_ttf, dfs, ttfs=None):
        if ttfs is None or len(dfs) != 1:
            raise NotImplementedError(
                "DFRIneB2Similarity scores single-term clauses (ttf required)")
        N = float(doc_count)
        Fv = float(ttfs[0])
        ne = N * (1.0 - math.pow((N - 1.0) / N, Fv))
        A = math.log((N + 1.0) / (ne + 0.5)) / _LN2
        ae = (Fv + 2.0) / (float(dfs[0]) + 1.0)
        avgdl = float(sum_ttf) / float(doc_count)
        return DFRIneB2Scorer(weight=F32(boost), boost=float(boost), A=A,
                              ae=ae, avgdl=avgdl, c=float(self.c))


@dataclass(frozen=True)
class DFRIneB2Scorer:
    weight: np.float32  # spec metadata only
    boost: float
    A: float
    ae: float
    avgdl: float
    c: float

    def score(self, tf, norm_code) -> np.ndarray:
        dl = LENGTH_TABLE[np.asarray(norm_code, dtype=np.int64) & 0xFF]
        dl = dl.astype(np.float64)
        tf64 = np.asarray(tf, dtype=F32).astype(np.float64)
        tfn = tf64 * (np.log(1.0 + self.c * self.avgdl / dl) / _LN2)
        s = self.boost * self.A * self.ae * (1.0 - 1.0 / (1.0 + tfn))
        return s.astype(F32)


@dataclass(frozen=True)
class IBSPLSimilarity:
    """IB SPL·TTF·H2(c=1) (``IBSimilarity.java:92-96`` with
    ``DistributionSPL`` + ``LambdaTTF``):
    λ = f32((ttf+1)/(N+1)), nextUp'ed when exactly 1 (``LambdaTTF.java:32-39``);
    q = 1 − 1/(tfn+1), nextDown(1.0) when 1; pow = λ^q nudged off λ on
    rounding collision (``DistributionSPL.java:34-58``);
    score = boost · (−ln((pow−λ)/(1−λ)))."""

    c: float = 1.0
    name = "ib_spl"

    def scorer(self, boost, doc_count, sum_ttf, dfs, ttfs=None):
        if ttfs is None or len(dfs) != 1:
            raise NotImplementedError(
                "IBSPLSimilarity scores single-term clauses (ttf required)")
        lam = F32((float(ttfs[0]) + 1.0) / (float(doc_count) + 1.0))
        if float(lam) == 1.0:
            lam = np.nextafter(lam, F32(2.0), dtype=F32)
        avgdl = float(sum_ttf) / float(doc_count)
        return IBSPLScorer(weight=F32(boost), boost=float(boost),
                           lam=float(lam), avgdl=avgdl, c=float(self.c))


@dataclass(frozen=True)
class IBSPLScorer:
    weight: np.float32  # spec metadata only
    boost: float
    lam: float
    avgdl: float
    c: float

    def score(self, tf, norm_code) -> np.ndarray:
        dl = LENGTH_TABLE[np.asarray(norm_code, dtype=np.int64) & 0xFF]
        dl = dl.astype(np.float64)
        tf64 = np.asarray(tf, dtype=F32).astype(np.float64)
        tfn = tf64 * (np.log(1.0 + self.c * self.avgdl / dl) / _LN2)
        q = 1.0 - 1.0 / (tfn + 1.0)
        q = np.where(q == 1.0, np.nextafter(1.0, 0.0), q)
        pw = np.power(self.lam, q)
        # rounding collision: force pow ≠ lam the way DistributionSPL does
        if self.lam < 1.0:
            fix = np.nextafter(self.lam, 2.0)
        else:
            fix = np.nextafter(self.lam, 0.0)
        pw = np.where(pw == self.lam, fix, pw)
        s = self.boost * (-np.log((pw - self.lam) / (1.0 - self.lam)))
        return s.astype(F32)


def get_similarity(name: str, **kw):
    """Similarity registry — the plug-in lookup used by jobs and gates.
    22 models: the full ``core/search/similarities/`` package plus the
    misc module's SweetSpotSimilarity."""
    if name == "bm25":
        return BM25Similarity(**kw)
    if name == "classic":
        return ClassicSimilarity()
    if name == "boolean":
        return BooleanSimilarity()
    if name == "lm_dirichlet":
        return LMDirichletSimilarity(**kw)
    if name == "lm_jelinek_mercer":
        return LMJelinekMercerSimilarity(**kw)
    if name == "indri_dirichlet":
        return IndriDirichletSimilarity(**kw)
    if name == "dfr_gb2":
        return DFRSimilarity(**kw)
    if name == "dfr_inl2":
        return DFRInL2Similarity(**kw)
    if name == "dfr_ineb2":
        return DFRIneB2Similarity(**kw)
    if name == "ib_ll":
        return IBSimilarity(**kw)
    if name == "ib_spl":
        return IBSPLSimilarity(**kw)
    if name == "dfi_chi2":
        return DFISimilarity()
    if name in ("dfi_sat", "dfi_std"):
        return DFIIndependenceSimilarity(measure=name[4:], **kw)
    if name == "axiomatic_f2exp":
        return AxiomaticF2EXP(**kw)
    if name in ("axiomatic_f1exp", "axiomatic_f1log", "axiomatic_f2log",
                "axiomatic_f3exp", "axiomatic_f3log"):
        return AxiomaticSimilarity(variant=name.split("_")[1], **kw)
    if name == "sweet_spot":
        return SweetSpotSimilarity(**kw)
    if name == "multi_bm25_classic":
        return MultiSimilarity((BM25Similarity(), ClassicSimilarity()))
    raise ValueError(f"unknown similarity: {name}")


@dataclass(frozen=True)
class SweetSpotSimilarity:
    """Plateau length norm + baseline tf
    (``misc/src/java/org/apache/lucene/misc/SweetSpotSimilarity.java``):
    TFIDF (Classic) idf/weight, lengthNorm = f32(1/sqrt(s·(|x−min| +
    |x−max| − (max−min)) + 1)) — 1.0 across the [min,max] plateau, sqrt
    falloff outside — and baselineTf = 0 at freq 0, tf_base up to tf_min,
    f32(sqrt(freq + tf_base² − tf_min)) past it (:94-137,:106-118).

    The plateau penalizes SHORT docs too, so the score is NOT monotone
    ↓length — ``length_monotone = False`` makes the WAND kernel run this
    model unpruned (the Pareto (max tf, min norm) block bound would not be
    valid)."""

    ln_min: int = 1
    ln_max: int = 1
    steepness: float = 0.5
    tf_base: float = 0.0
    tf_min: float = 0.0
    name = "sweet_spot"

    def scorer(self, boost, doc_count, sum_ttf, dfs, ttfs=None):
        dfs = list(dfs)
        acc = 0.0
        for df in dfs:
            acc += float(F32(math.log((doc_count + 1) / float(df + 1)) + 1.0))
        w_idf = F32(acc) if len(dfs) > 1 else F32(
            math.log((doc_count + 1) / float(dfs[0] + 1)) + 1.0)
        query_weight = F32(F32(boost) * w_idf)
        lt = LENGTH_TABLE.astype(np.float64)
        l, h, s = int(self.ln_min), int(self.ln_max), F32(self.steepness)
        tri = (np.abs(lt - l) + np.abs(lt - h) - (h - l)).astype(F32)
        inner = ((s * tri).astype(F32) + F32(1.0)).astype(F32)
        norm_table = (1.0 / np.sqrt(inner.astype(np.float64))).astype(F32)
        return SweetSpotScorer(weight=query_weight, norm_table=norm_table,
                               tf_base=F32(self.tf_base),
                               tf_min=F32(self.tf_min))


@dataclass(frozen=True)
class SweetSpotScorer:
    weight: np.float32
    norm_table: np.ndarray
    tf_base: np.float32
    tf_min: np.float32
    length_monotone = False  # plateau norm: unpruned evaluation only

    def score(self, tf, norm_code) -> np.ndarray:
        freq = np.asarray(tf, dtype=np.float64).astype(F32)
        b2 = F32(self.tf_base * self.tf_base)
        inner = ((freq + b2).astype(F32) - self.tf_min).astype(F32)
        tfv = np.sqrt(inner.astype(np.float64)).astype(F32)
        tfv = np.where(freq <= self.tf_min, self.tf_base, tfv).astype(F32)
        tfv = np.where(freq == 0, F32(0.0), tfv)
        raw = (tfv * self.weight).astype(F32)
        nv = self.norm_table[np.asarray(norm_code, dtype=np.int64) & 0xFF]
        return (raw * nv).astype(F32)


@dataclass(frozen=True)
class DFIIndependenceSimilarity:
    """DFI with the saturated / standardized independence measures
    (``DFISimilarity.java:57-67`` + ``IndependenceSaturated.java:32-34``
    (freq−e)/e, ``IndependenceStandardized.java:33-35`` (freq−e)/√e);
    same gating (freq ≤ expected → 0) and log2(measure+1) envelope as chi²."""

    measure: str = "sat"  # sat | std

    @property
    def name(self):
        return f"dfi_{self.measure}"

    def scorer(self, boost, doc_count, sum_ttf, dfs, ttfs=None):
        if ttfs is None or len(dfs) != 1:
            raise NotImplementedError(
                "DFIIndependenceSimilarity scores single-term clauses")
        return DFIIndependenceScorer(weight=F32(boost), boost=float(boost),
                                     ttf1=float(ttfs[0]) + 1.0,
                                     T1=float(sum_ttf) + 1.0,
                                     sqrt_e=(self.measure == "std"))


@dataclass(frozen=True)
class DFIIndependenceScorer:
    weight: np.float32  # spec metadata only
    boost: float
    ttf1: float
    T1: float
    sqrt_e: bool

    def score(self, tf, norm_code) -> np.ndarray:
        dl = LENGTH_TABLE[np.asarray(norm_code, dtype=np.int64) & 0xFF]
        dl = dl.astype(np.float64)
        tf64 = np.asarray(tf, dtype=F32).astype(np.float64)
        expected = self.ttf1 * dl / self.T1
        with np.errstate(divide="ignore", invalid="ignore"):
            denom = np.sqrt(expected) if self.sqrt_e else expected
            measure = (tf64 - expected) / denom
            s = self.boost * (np.log(measure + 1.0) / _LN2)
        s = np.where(tf64 <= expected, 0.0, s)
        return s.astype(F32)


@dataclass(frozen=True)
class MultiSimilarity:
    """``core/search/similarities/MultiSimilarity.java:64-70``: per-doc score
    is the float32 running sum of the sub-scorers' float32 scores (sequential
    ``float sum += sub.score(...)`` — order matters for bit-parity, preserved
    here). Each sub-similarity binds its own stats-derived scorer."""

    sims: tuple

    def scorer(self, boost, doc_count, sum_ttf, dfs, ttfs=None):
        subs = tuple(s.scorer(boost, doc_count, sum_ttf, dfs, ttfs=ttfs)
                     for s in self.sims)
        return MultiScorer(weight=subs[0].weight, subs=subs)


@dataclass(frozen=True)
class MultiScorer:
    weight: np.float32  # spec metadata only (first sub's weight)
    subs: tuple

    @property
    def nonnegative(self):
        return all(getattr(s, "nonnegative", True) for s in self.subs)

    def score(self, tf, norm_code) -> np.ndarray:
        acc = None
        for s in self.subs:
            v = s.score(tf, norm_code)
            acc = v if acc is None else (acc + v).astype(F32)
        return acc


@dataclass(frozen=True)
class LMJelinekMercerSimilarity:
    """Jelinek-Mercer smoothed language model
    (``core/search/similarities/LMJelinekMercerSimilarity.java:62-68``):
    score = float(boost · ln(1 + ((1−λ)·tf/dl) / (λ·P))), double math,
    P = (ttf+1)/(sumTTF+1), dl the decoded SmallFloat length."""

    lam: float = 0.1
    name = "lm_jelinek_mercer"

    def scorer(self, boost, doc_count, sum_ttf, dfs, ttfs=None):
        if ttfs is None or len(ttfs) != 1:
            raise NotImplementedError(
                "LMJelinekMercerSimilarity scores single-term clauses"
            )
        p = (float(ttfs[0]) + 1.0) / (float(sum_ttf) + 1.0)
        return LMJelinekMercerScorer(weight=F32(boost), boost=float(boost),
                                     lam=float(F32(self.lam)), p=p)


@dataclass(frozen=True)
class LMJelinekMercerScorer:
    weight: np.float32  # spec metadata only
    boost: float
    lam: float
    p: float

    def score(self, tf, norm_code) -> np.ndarray:
        dl = LENGTH_TABLE[np.asarray(norm_code, dtype=np.int64) & 0xFF]
        dl = dl.astype(np.float64)
        tf64 = np.asarray(tf, dtype=F32).astype(np.float64)
        s = self.boost * np.log(
            1.0 + ((1.0 - self.lam) * tf64 / dl) / (self.lam * self.p)
        )
        return s.astype(F32)
