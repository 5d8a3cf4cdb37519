"""Continuous corpus ingestion: the streaming twin of the
`prepare-corpus` CLI — what a crawler feeding a training corpus runs
continuously instead of nightly.

Per incoming document (micro-)batch:

1. **learned quality gate** — the trained model rides as plan literals
   (moments + weights), so scoring is a stateless map-side projection;
2. **near-dup admission vs the REFERENCE corpus** — the stateless
   stream-static LSH check (`dedup.streaming_near_dup_flags`): incoming
   docs that near-duplicate the existing corpus are rejected. (The
   batch CLI dedups the corpus against ITSELF — min-id survivor;
   admission control is the correct streaming semantics: the corpus is
   the authority, the stream is candidate material.)
3. **token-window chunking with text** — map-side explode;
4. **append write** — hive-partitioned parquet appends.

Steps 1-3 are pure stateless column math + one stream-static join, so
they would run directly on the unbounded stream; the admission
anti-join (drop every doc with at least one verified flag) is the one
per-batch aggregation, which is why the pipeline runs inside
``foreachBatch`` — each micro-batch is a complete DataFrame where
left-anti semantics are exact, and the writer gets the reference
engine's per-batch commit shape (pipeline/sink.py T3) for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import streaming_near_dup_flags
from .quality_model import quality_features, score_quality, standardize
from .text import chunk_token_windows


def ingest_batch(
    docs: DataFrame,
    corpus: DataFrame,
    moments: dict[str, float],
    weights: list[float],
    threshold: float = 0.5,
    minhash_threshold: float = 0.5,
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """One admission round as a pure batch transform (shared by the
    streaming foreachBatch and the batch equivalence test): quality
    gate -> reject near-dups of ``corpus`` -> chunk with text."""
    scored = score_quality(standardize(quality_features(docs), moments), weights)
    kept_ids = scored.filter(F.col("quality_score") >= threshold).select("doc_id")
    kept = docs.join(kept_ids, "doc_id", "left_semi")
    flagged = (
        streaming_near_dup_flags(kept, corpus, threshold=minhash_threshold)
        .select("doc_id")
        .distinct()
    )
    admitted = kept.join(flagged, "doc_id", "left_anti")
    return chunk_token_windows(admitted, window=window, stride=stride, with_text=True)


def prepare_corpus_stream(
    stream_docs: DataFrame,
    corpus: DataFrame,
    moments: dict[str, float],
    weights: list[float],
    out_path: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    minhash_threshold: float = 0.5,
    window: int = 64,
    stride: int = 48,
):
    """Unstarted streaming query writing admitted chunk shards as
    hive-partitioned parquet appends; caller picks the trigger and
    starts it. Exactly-once per batch via the checkpointed foreachBatch
    epoch log."""

    def handle(batch_df: DataFrame, _epoch_id: int) -> None:
        (
            ingest_batch(
                batch_df,
                corpus,
                moments,
                weights,
                threshold=threshold,
                minhash_threshold=minhash_threshold,
                window=window,
                stride=stride,
            )
            .write.mode("append")
            .partitionBy("lang")
            .parquet(out_path)
        )

    return (
        stream_docs.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
