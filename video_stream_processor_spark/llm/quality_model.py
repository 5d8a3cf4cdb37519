"""Learned quality filter (L4): distill the heuristic rule filter into
a trained logistic-regression scorer, expressed entirely as DataFrame
aggregations.

Real training-data pipelines rarely ship the hand-written quality rule
to production — they train a small classifier (fastText-style) on
rule- or LLM-labeled examples and score the corpus with the model,
because a smooth score supports thresholds/sampling and transfers to
text the rule's authors never saw. This module reproduces that loop
Spark-first:

* **featurize** — JVM-side per-doc signals (scaled length, stopword
  ratio, lexical diversity, squared length — the quadratic term lets a
  linear model express the rule's "length BETWEEN a AND b" band) built
  from the same expressions as :mod:`.text.quality_columns`; no Python
  in the row path.
* **label** — the teacher is the existing heuristic rule
  (``llm_quality_filter``'s thresholds), so training data is free and
  deterministic.
* **standardize** — one moments pass (avg/stddev_pop per feature,
  8 scalars to the driver), then map-side z-scoring with the moments
  inlined as literals. Full-batch GD without this oscillates on these
  correlated features (observed: stuck at the majority class).
* **train** — full-batch gradient descent on the logistic loss. One
  iteration = ONE ``agg`` producing p+1 scalars (the gradient); the
  weight vector is O(p) driver state, re-broadcast as literals into
  the next iteration's expressions. At 100 TB each round is a single
  map-side-combined pass over the corpus — the same shape as one
  Lloyd's round in ``similarity.kmeans_centroids``.
* **score** — a map-side sigmoid column with the trained weights
  inlined as literals: zero shuffles, whole-stage codegen,
  streaming-safe.

Determinism contract (what makes even the TRAINING oracle-replayable
in SQL, mirroring the unrolled k-means oracle in plans/llm.py):

* moments and each gradient component are ``round(avg(...), 9)`` — the
  ONLY places engines could drift (sum order, exp/stddev ulps) are
  squeezed through a 9dp round that both engines resolve to the same
  double;
* weights start at exactly 0, so the first sigmoid is exactly 0.5;
* the learning rate is a POWER OF TWO and the weight update is left
  unrounded: ``w - 2.0*g`` on bit-identical doubles is an exact IEEE
  operation, so the trained weights stay bit-identical across engines
  with no further rounding to disagree about;
* the final score is rounded to 6dp before thresholding.

Reference scope note: the reference engine (video_processor.py) has no
trained models; this is part of the mandated LLM-pipeline surface
beyond reference parity.
"""

from __future__ import annotations

import math
import threading

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import tokens
from .text import STOPWORDS

#: Order fixes the weight-vector layout: bias first, then these.
FEATURE_NAMES = ("x_len", "x_stop", "x_div", "x_len2")
_RAW_NAMES = ("r_len", "r_stop", "r_div", "r_len2")

DEFAULT_ITERS = 32
DEFAULT_LR = 2.0  # power of two: the weight update stays exact IEEE


def quality_features(docs: DataFrame) -> DataFrame:
    """Per-doc raw-feature/label frame: (doc_id, lang, source, r_len,
    r_stop, r_div, r_len2, y).

    Features are all O(1)-per-token JVM expressions; the label y is the
    heuristic rule filter (length in [120, 450], diversity >= 0.35,
    stopword ratio <= 0.12) as a 0/1 double. Zero-token docs get 0.0
    ratios (they can never pass the rule, and a NULL feature would
    silently drop rows from the gradient avg).
    """
    tok = tokens()
    n_tok = F.size(tok)
    stop = F.array([F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(tok, lambda x: F.array_contains(stop, x)))
    n_chars = F.length("text")
    scaled_len = n_chars / F.lit(1000.0)
    diversity = F.coalesce(
        F.try_divide(F.size(F.array_distinct(tok)), n_tok), F.lit(0.0)
    )
    stop_ratio = F.coalesce(F.try_divide(n_stop, n_tok), F.lit(0.0))
    rule = (
        n_chars.between(120, 450)
        & (diversity >= 0.35)
        & (stop_ratio <= 0.12)
    )
    return docs.select(
        "doc_id",
        "lang",
        "source",
        scaled_len.alias("r_len"),
        stop_ratio.alias("r_stop"),
        diversity.alias("r_div"),
        (scaled_len * scaled_len).alias("r_len2"),
        F.when(rule, F.lit(1.0)).otherwise(F.lit(0.0)).alias("y"),
    )


def feature_moments(feats: DataFrame) -> dict[str, float]:
    """One pass: 9dp-rounded mean and population stddev per raw
    feature — 2p scalars across the driver."""
    aggs = []
    for r in _RAW_NAMES:
        aggs.append(F.round(F.avg(r), 9).alias(f"m_{r}"))
        aggs.append(F.round(F.stddev_pop(r), 9).alias(f"s_{r}"))
    return feats.agg(*aggs).first().asDict()


def standardize(feats: DataFrame, moments: dict[str, float]) -> DataFrame:
    """Map-side z-scoring with moments inlined as plan literals; a
    zero stddev degrades to divide-by-1 (constant feature stays 0)."""
    cols = [c for c in feats.columns if c not in _RAW_NAMES]
    zs = []
    for r, x in zip(_RAW_NAMES, FEATURE_NAMES):
        sd = moments[f"s_{r}"] or 1.0
        zs.append(
            ((F.col(r) - F.lit(moments[f"m_{r}"])) / F.lit(sd)).alias(x)
        )
    return feats.select(*cols, *zs)


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def _margin(weights: list[float]) -> Column:
    """w·x with the bias first and weights inlined as literals."""
    z = F.lit(weights[0])
    for w, name in zip(weights[1:], FEATURE_NAMES):
        z = z + F.lit(w) * F.col(name)
    return z


# Same bounded-memo policy as similarity._TRAIN_MEMO, but the artifact
# is a tiny (moments, weights) tuple, not a DataFrame.
_MODEL_MEMO: dict[tuple, tuple[dict[str, float], list[float]]] = {}
_MODEL_MEMO_MAX = 16
_MODEL_LOCK = threading.Lock()


def logreg_train(
    sfeats: DataFrame, iters: int = DEFAULT_ITERS, lr: float = DEFAULT_LR
) -> list[float]:
    """Full-batch gradient descent on the logistic loss over an
    already-standardized feature frame; returns [w_bias, w_x_len,
    w_x_stop, w_x_div, w_x_len2] after ``iters`` rounds.

    Each round runs ONE aggregation job over ``sfeats`` (p+1 averaged
    gradient components, map-side combined — constant-size partial
    state per partition like any avg) and updates p+1 driver-side
    floats. Gradient components are rounded to 9dp; with a power-of-two
    ``lr`` the update itself is exact IEEE arithmetic, so the trained
    weights are bit-identical across engines and replayable in the
    DuckDB oracle.
    """
    if not math.log2(lr).is_integer():
        raise ValueError(f"lr must be a power of two for exact updates: {lr}")
    w = [0.0] * (1 + len(FEATURE_NAMES))
    for _ in range(iters):
        err = _sigmoid(_margin(w)) - F.col("y")
        grads = [F.round(F.avg(err), 9).alias("g_bias")] + [
            F.round(F.avg(err * F.col(name)), 9).alias(f"g_{name}")
            for name in FEATURE_NAMES
        ]
        row = sfeats.agg(*grads).first()  # p+1 scalars cross the driver
        w = [wj - lr * gj for wj, gj in zip(w, row)]  # exact: lr = 2^k
    return w


def train_quality_model(
    docs: DataFrame,
    iters: int = DEFAULT_ITERS,
    lr: float = DEFAULT_LR,
    sample_mod: int | None = None,
) -> tuple[dict[str, float], list[float]]:
    """(moments, weights) for the corpus' own rule labels; memoized per
    (session, params, input plan, input files) like the other trained
    artifacts, so a resident session trains once.

    ``sample_mod``: train on the deterministic 1/mod hash-sample of
    doc_ids instead of the full corpus. This is the 100 TB shape: the
    training loop runs ``iters + 1`` passes, so at scale you pay them
    over a hash-sample (xxhash64 — reproducible, no sampling state)
    while the single inference pass still covers every row. The
    registered oracle query trains on the full (small) fixture corpus;
    the sampled path is pinned in tests to stay within a few accuracy
    points of the full-corpus model."""
    from .dedup import _input_fingerprint

    feats = quality_features(docs)
    if sample_mod is not None:
        feats = feats.filter(
            F.pmod(F.xxhash64(F.col("doc_id")), F.lit(sample_mod)) == 0
        )
    try:
        key = (
            id(docs.sparkSession),
            f"logreg-{iters}-{lr}-{sample_mod}",
            feats.semanticHash(),
            _input_fingerprint(feats),
        )
    except Exception:
        key = None
    if key is not None:
        with _MODEL_LOCK:
            hit = _MODEL_MEMO.get(key)
        if hit is not None:
            return dict(hit[0]), list(hit[1])

    from ..session import materialize

    moments = feature_moments(feats)
    # Materialize the standardized 5-column frame ONCE: the GD loop
    # re-reads it ``iters`` times, and without this every round would
    # re-scan the corpus and re-run tokenization (observed: the
    # dominant training cost). At 100 TB: one wide tokenization pass,
    # then iters narrow numeric passes over ~40 bytes/row.
    sfeats = materialize(
        standardize(feats, moments).select(*FEATURE_NAMES, "y"),
        "quality-logreg-feats",
    )
    w = logreg_train(sfeats, iters=iters, lr=lr)

    if key is not None:
        with _MODEL_LOCK:
            while len(_MODEL_MEMO) >= _MODEL_MEMO_MAX:
                _MODEL_MEMO.pop(next(iter(_MODEL_MEMO)))
            _MODEL_MEMO[key] = (dict(moments), list(w))
    return moments, w


def score_quality(sfeats: DataFrame, weights: list[float]) -> DataFrame:
    """Append the model score (6dp sigmoid) — map-side only."""
    return sfeats.withColumn(
        "quality_score", F.round(_sigmoid(_margin(weights)), 6)
    )


def model_quality_filter(
    docs: DataFrame,
    iters: int = DEFAULT_ITERS,
    lr: float = DEFAULT_LR,
    threshold: float = 0.5,
) -> DataFrame:
    """Train on the corpus' own rule labels, keep docs the MODEL scores
    >= threshold: (doc_id, lang, source). The inference pass is pure
    map-side column math — at 100 TB the trained model travels in the
    plan itself (moments + weights as literals), not via any join or
    broadcast variable.
    """
    moments, w = train_quality_model(docs, iters=iters, lr=lr)
    sfeats = standardize(quality_features(docs), moments)
    return (
        score_quality(sfeats, w)
        .filter(F.col("quality_score") >= threshold)
        .select("doc_id", "lang", "source")
    )
