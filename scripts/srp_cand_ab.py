#!/usr/bin/env python
"""Same-window A/B of llm_srp_pairs' candidate stage (r16, r15 verdict
item 1): OLD = per-bucket sorted collect_set + nested-transform pair
explode (interpreted HOF) + distinct; NEW = (band, bucket) self-join
over a checkpointed banding table + the same distinct. Both run in ONE
process back to back (warm + med-of-3 each), and the candidate SETS are
checked identical both ways (exceptAll in both directions), so the A/B
is apples-to-apples and the equivalence claim is executed, not argued.

Usage: python scripts/srp_cand_ab.py [sf_dir]
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
    from video_stream_processor_spark.llm.similarity import (
        SRP_BANDS,
        SRP_PLANES,
        srp_signatures,
    )
    from video_stream_processor_spark.session import get_spark, materialize

    calib_start = bench.calibrate_ms()
    spark = get_spark(app_name="vsp-srp-cand-ab")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings")
    planes_per_band = SRP_PLANES // SRP_BANDS
    sig = srp_signatures(emb)
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.substring(
                    "sig", b * planes_per_band + 1, planes_per_band
                ).alias("bucket"),
            )
            for b in range(SRP_BANDS)
        ]
    )
    banded_plan = sig.select("vec_id", F.explode(band_cols).alias("bb")).select(
        "vec_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )

    def old_cand():
        bucket_docs = (
            banded_plan.groupBy("band", "bucket")
            .agg(F.sort_array(F.collect_set("vec_id")).alias("ds"))
            .filter(F.size("ds") >= 2)
        )
        pair_expr = F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.size("ds") - 1),
                lambda i: F.transform(
                    F.sequence(i + 1, F.size("ds")),
                    lambda j: F.struct(
                        F.get("ds", i - 1).alias("id_a"),
                        F.get("ds", j - 1).alias("id_b"),
                    ),
                ),
            )
        )
        return (
            bucket_docs.select(F.explode(pair_expr).alias("p"))
            .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
            .distinct()
        )

    def new_cand():
        banded = materialize(banded_plan, "srp_banded_ab")
        return (
            banded.select("band", "bucket", F.col("vec_id").alias("id_a"))
            .join(
                banded.select("band", "bucket", F.col("vec_id").alias("id_b")),
                ["band", "bucket"],
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )

    # Equivalence first: identical candidate sets, both directions.
    old_df, new_df = old_cand(), new_cand()
    extra_old = old_df.exceptAll(new_df).count()
    extra_new = new_df.exceptAll(old_df).count()
    n_cand = new_df.count()

    def timed(build, label: str) -> dict:
        spark.sparkContext.setJobDescription(f"srp_cand_ab:{label}")
        ts = []
        for _ in range(4):  # first is warm
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

    res_old = timed(old_cand, "old")
    res_new = timed(new_cand, "new")
    # and the full query at the new head, for the done-bar number
    from video_stream_processor_spark.llm.similarity import srp_near_dup_pairs

    def full():
        return srp_near_dup_pairs(emb, threshold=0.4)

    res_full = timed(full, "full_srp_new")

    print(
        json.dumps(
            {
                "metric": "srp_cand_ab",
                "sf_dir": sf_dir,
                "n_candidates": n_cand,
                "extra_in_old": extra_old,
                "extra_in_new": extra_new,
                "identical": extra_old == 0 and extra_new == 0,
                "old_cand_stage_s": res_old,
                "new_cand_stage_s": res_new,
                "full_srp_new_s": res_full,
                "calib_ms": calib_start,
                "calib_ms_end": bench.calibrate_ms(),
                "calib_band_ms": bench.CALIB_IDLE_BAND_MS,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
