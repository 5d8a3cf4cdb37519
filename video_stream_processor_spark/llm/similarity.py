"""L3 — similarity search over the ``embeddings`` table
(``ArrayType(FloatType)``, 64-dim).

No analog in the reference (its closest "similarity" is substring
matching in error classification, ``video_processor.py:116-128``);
mandated north-star.

Scale notes (100 TB):
* ``cosine_topk`` broadcasts the single query vector and computes the
  dot product with JVM higher-order functions (zip_with + aggregate):
  one scan, no shuffle, TakeOrderedAndProject for the top-k. Exact, and
  the right baseline at any scale where a full scan is affordable.
* ``ivf_topk`` is the pruned path: vectors are pre-assigned to coarse
  centroids (one broadcast join at build time, persisted in practice);
  a query probes only the ``nprobe`` nearest cells, turning the scan
  into a partition-pruned read of nprobe/C of the data. Centroids here
  are a deterministic subset of the vectors (id < n_centroids) so the
  whole operator is reproducible without a training step; swap in
  k-means centroids for real recall curves.
* All math is double-precision after an explicit cast — float
  accumulation order would otherwise differ between engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dvec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    embeddings: DataFrame, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """L3 baseline: exact cosine top-k against the embedding of
    ``query_vec_id``. Cosine is rounded to 6dp *before* ranking so the
    (cosine, vec_id) order is engine-stable."""
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        _dvec("embedding").alias("qe")
    )
    scored = (
        embeddings.filter(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine(_dvec("embedding"), F.col("qe")), 6).alias("cosine"),
        )
    )
    return scored.orderBy(F.desc("cosine"), "vec_id").limit(k)


def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.95, max_id: int | None = None
) -> DataFrame:
    """L2/L3: embedding-cosine near-duplicate pairs (cos >= threshold).
    Exact all-pairs form — O(n^2), the ground truth the LSH/IVF paths
    are judged against; cap with ``max_id`` when registering at larger
    SFs."""
    e = embeddings if max_id is None else embeddings.filter(F.col("vec_id") < max_id)
    a = e.select(F.col("vec_id").alias("id_a"), _dvec("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), _dvec("embedding").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def label_centroids(embeddings: DataFrame) -> DataFrame:
    """L3/L5: per-label centroid in long form (label, pos, avg_val) —
    vector aggregation via posexplode + one (label, pos) hash agg.
    Long form keeps it engine-portable (no array equality across
    engines) and shuffle-light: 64 rows per label out."""
    e = embeddings.select(
        "label", F.posexplode(_dvec("embedding")).alias("pos0", "v")
    )
    return e.groupBy("label", (F.col("pos0") + 1).alias("pos")).agg(
        F.round(F.avg("v"), 6).alias("avg_val")
    )


def ivf_assignments(embeddings: DataFrame, n_centroids: int = 8) -> DataFrame:
    """Assign every vector to its nearest coarse centroid (by cosine).
    Centroids = vectors with vec_id < n_centroids — deterministic stand-
    ins for trained k-means; the assignment join broadcasts them."""
    cent = embeddings.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), _dvec("embedding").alias("cv")
    )
    scored = embeddings.join(F.broadcast(cent)).select(
        "vec_id",
        "label",
        "embedding",
        "centroid_id",
        # round before argmax, and break exact ties on centroid_id, so
        # the assignment is engine-stable (float summation order would
        # otherwise pick different winners on near-ties)
        F.round(cosine(_dvec("embedding"), F.col("cv")), 9).alias("ccos"),
    )
    return (
        scored.groupBy("vec_id")
        .agg(
            F.max_by(
                "centroid_id",
                F.struct(F.col("ccos"), -F.col("centroid_id")),
            ).alias("centroid_id"),
            F.first("label").alias("label"),
            F.first("embedding").alias("embedding"),
        )
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 4,
) -> DataFrame:
    """L3 scale path: IVF-style pruned search — probe the ``nprobe``
    centroid cells nearest the query and rank only vectors assigned
    there. Returns the same shape as ``cosine_topk``; recall vs the
    exact scan is pinned in tests."""
    assigned = ivf_assignments(embeddings, n_centroids)
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        _dvec("embedding").alias("qe")
    )
    cent = embeddings.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), _dvec("embedding").alias("cv")
    )
    probe = (
        cent.join(F.broadcast(q))
        .select(
            "centroid_id",
            F.round(cosine(F.col("cv"), F.col("qe")), 9).alias("qcos"),
        )
        .orderBy(F.desc("qcos"), "centroid_id")
        .limit(nprobe)
        .select("centroid_id")
    )
    return (
        assigned.join(F.broadcast(probe), "centroid_id")
        .filter(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine(_dvec("embedding"), F.col("qe")), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )
