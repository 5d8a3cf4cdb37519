#!/usr/bin/env python
"""Isolated noop-sink timings for the token/shingle operators touched
by the r15 single-evaluation pass (guide §1.4: time the computation,
not the sink; §1.2: per-task work).

These operators are memo-checkpointed inside the registered queries
(`_memo_checkpoint`), so bench/registry timings hide their cost after
the first call in a process; this script times the operator frames
DIRECTLY (no memo), warm-then-median-of-3, in one process, so a code
change to the operator is visible as a same-window A/B.

Usage: python scripts/opbench_tokens.py [sf_dir] [tag]
Writes JSON to stdout and plans/r15/opbench_<tag>.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    tag = sys.argv[2] if len(sys.argv) > 2 else "before"

    import bench
    from pyspark.sql import functions as F

    from video_stream_processor_spark.io import load_table
    from video_stream_processor_spark.llm.dedup import (
        _doc_shingle_arrays,
        contamination_overlap,
        minhash_signatures,
        minhash_signatures_oph,
        segment_dedup,
        tokens,
        word_shingles,
    )
    from video_stream_processor_spark.llm.text import (
        chunk_token_windows,
        repetition_signals,
    )
    from video_stream_processor_spark.session import get_spark

    load_1m, comparable = bench._await_quiet_machine()
    calib = bench.calibrate_ms()

    spark = get_spark(app_name="vsp-opbench-tokens")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    bench_docs = docs.filter(F.col("doc_id") % 7 == 0).select("text")

    # oph_docs: the OPH signature path's nested lambdas are quadratic
    # in the BEFORE form (measured: did not finish sf0.1's 5000 docs in
    # 11 min); a 500-doc slice keeps the before/after A/B finite and
    # like-for-like.
    oph_docs = docs.filter(F.col("doc_id") % 10 == 0)
    ops = {
        # the shingle-set builder every MinHash path reads
        "doc_shingle_arrays": lambda: _doc_shingle_arrays(docs),
        # signatures including the shingle build (no memo)
        "minhash_signatures": lambda: minhash_signatures(
            _doc_shingle_arrays(docs)
        ).drop("sh_arr"),
        # the portable string-shingle explode path (dedup.py near-dup)
        "word_shingle_explode": lambda: docs.filter(
            F.size(tokens()) >= 2
        ).select("doc_id", F.explode(word_shingles(tokens())).alias("sh")),
        # decontam as llm_doc_annotations drives it
        "contamination_overlap": lambda: contamination_overlap(
            docs, bench_docs, n=3, threshold=0.05, portable=True
        ),
        # llm_repetition_clean's two operators
        "repetition_signals": lambda: repetition_signals(docs),
        "segment_dedup": lambda: segment_dedup(
            docs, seg_len=3, max_occurrences=2
        ),
        # llm_sequence_packing's chunker
        "chunk_token_windows": lambda: chunk_token_windows(
            docs, window=64, stride=48, with_text=False
        ),
        "minhash_signatures_oph_x500docs": lambda: minhash_signatures_oph(
            _doc_shingle_arrays(oph_docs)
        ).drop("sh_arr"),
    }

    def noop(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    out: dict[str, dict] = {}
    dest = os.path.join(REPO, "plans", "r15", f"opbench_{tag}.json")
    for name, build in ops.items():
        spark.sparkContext.setJobDescription(f"opbench:{name}")
        df = build()
        noop(df)  # warm: codegen/JIT
        ts = sorted(noop(df) for _ in range(3))
        out[name] = {"min": ts[0], "med": ts[1], "max": ts[2]}
        print(f"# {name}: med={ts[1]} min={ts[0]} max={ts[2]}", file=sys.stderr)
        with open(dest + ".partial", "w") as fh:
            json.dump(out, fh)
        spark.sparkContext.setJobDescription(None)

    payload = {
        "metric": "opbench_tokens",
        "tag": tag,
        "sf_dir": sf_dir,
        "load_1m": load_1m,
        "comparable": comparable,
        "calib_ms": calib,
        "calib_ms_end": bench.calibrate_ms(),
        "calib_band_ms": bench.CALIB_IDLE_BAND_MS,
        "ops": out,
    }
    line = json.dumps(payload)
    print(line)
    with open(dest, "w") as fh:
        fh.write(line + "\n")
    if os.path.exists(dest + ".partial"):
        os.remove(dest + ".partial")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
