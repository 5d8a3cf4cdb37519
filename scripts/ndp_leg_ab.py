#!/usr/bin/env python
"""Decompose llm_near_dup_pairs at sf-scale and A/B the exact ngram
leg's co-shingle join against a SIZE-BOUND variant (r16, r15 verdict
item 5): J(a,b) >= t forces min(|a|,|b|) >= t*max(|a|,|b|) (J <=
min/max), so attaching per-doc shingle counts to both sides of the
exploded join and pruning size-incompatible pairs BEFORE the pair
aggregation cannot change the thresholded output — modulo the 6dp
rounding of the final filter, which the bound respects with a 1e-6
margin (prune only when min < (t - 1e-6) * max). Verified here by
exceptAll in both directions, and timed same-window.

Usage: python scripts/ndp_leg_ab.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    import bench
    from video_stream_processor_spark.io import load_table
    from video_stream_processor_spark.llm.dedup import (
        _doc_shingles,
        _memo_checkpoint,
        minhash_near_dup_pairs_portable,
        ngram_jaccard_pairs,
        simhash_near_dup_pairs_portable,
    )
    from video_stream_processor_spark.session import get_spark

    calib_start = bench.calibrate_ms()
    spark = get_spark(app_name="vsp-ndp-leg-ab")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    sh = _memo_checkpoint(_doc_shingles(docs), "near_dup_sh")
    threshold = 0.5

    def ngram_current():
        return ngram_jaccard_pairs(docs, threshold=threshold, shingles=sh)

    def ngram_size_bound():
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
        a_sh = sh.join(sizes, "doc_id").select(
            F.col("doc_id").alias("doc_a"), "sh", F.col("n_sh").alias("n_a")
        )
        b_sh = sh.join(sizes, "doc_id").select(
            F.col("doc_id").alias("doc_b"), "sh", F.col("n_sh").alias("n_b")
        )
        tb = threshold - 1e-6
        pairs = (
            a_sh.join(b_sh, "sh")
            .filter(
                (F.col("doc_a") < F.col("doc_b"))
                & (F.least("n_a", "n_b") >= tb * F.greatest("n_a", "n_b"))
            )
            .groupBy("doc_a", "doc_b")
            .agg(
                F.count(F.lit(1)).alias("common"),
                F.first("n_a").alias("n_a"),
                F.first("n_b").alias("n_b"),
            )
        )
        return pairs.select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")),
                6,
            ).alias("jaccard"),
        ).filter(F.col("jaccard") >= threshold)

    cur, sb = ngram_current(), ngram_size_bound()
    extra_cur = cur.exceptAll(sb).count()
    extra_sb = sb.exceptAll(cur).count()

    def timed(build, label: str) -> dict:
        spark.sparkContext.setJobDescription(f"ndp_leg_ab:{label}")
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        timed_ts = ts[1:]
        return {
            "warm": ts[0],
            "min": min(timed_ts),
            "med": sorted(timed_ts)[1],
            "max": max(timed_ts),
        }

    res = {
        "ngram_current": timed(ngram_current, "ngram_current"),
        "ngram_size_bound": timed(ngram_size_bound, "ngram_size_bound"),
        "minhash_portable": timed(
            lambda: minhash_near_dup_pairs_portable(
                docs, threshold=threshold, shingles=sh
            ),
            "minhash_portable",
        ),
        "simhash": timed(
            lambda: simhash_near_dup_pairs_portable(docs, max_hamming=3),
            "simhash",
        ),
    }
    print(
        json.dumps(
            {
                "metric": "ndp_leg_ab",
                "sf_dir": sf_dir,
                "identical": extra_cur == 0 and extra_sb == 0,
                "extra_in_current": extra_cur,
                "extra_in_size_bound": extra_sb,
                "legs_s": res,
                "calib_ms": calib_start,
                "calib_ms_end": bench.calibrate_ms(),
                "calib_band_ms": bench.CALIB_IDLE_BAND_MS,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
