#!/usr/bin/env python3
"""Throughput line for the streaming sketch maintainers (round-3 verdict
item #8): replay the sf documents table as an N-file availableNow stream
through stream_count_min / stream_hll / stream_bloom and report docs/s.

Each micro-batch pays its own token scan + a sketch-sized merge (the
foreachBatch cost model SCALE.md describes); this measures that end to
end, checkpoint + versioned sketch writes included.

Usage: python3 scripts/streaming_bench.py [sf_dir] [n_files]
Prints one RESULT line per sketch.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)
N_FILES = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def main() -> None:
    from pyspark.sql import functions as F

    from document_quality_assessment_ocr_spark.session import get_spark
    from document_quality_assessment_ocr_spark.streaming.sketches import (
        stream_bloom,
        stream_count_min,
        stream_histogram,
        stream_hll,
    )

    spark = get_spark()
    work = tempfile.mkdtemp(prefix="stream_bench_")
    in_dir = os.path.join(work, "in")
    docs = (
        spark.read.parquet(os.path.join(SF, "documents.parquet"))
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
            "text",
        )
    )
    n_docs = docs.count()
    docs.repartition(N_FILES).write.mode("overwrite").parquet(in_dir)

    # second input: full document columns for the label/manifest twins
    docs_full = spark.read.parquet(
        os.path.join(SF, "documents.parquet")
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "text",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
    )
    din = os.path.join(work, "din")
    docs_full.repartition(N_FILES).write.mode("overwrite").parquet(din)

    # third input: the events table for the entity/day-grid twins
    ein = os.path.join(work, "ein")
    ev = spark.read.parquet(os.path.join(SF, "events.parquet"))
    n_events = ev.count()
    ev.repartition(N_FILES).write.mode("overwrite").parquet(ein)

    from document_quality_assessment_ocr_spark.streaming.drift import (
        stream_auc,
        stream_zone_map,
    )
    from document_quality_assessment_ocr_spark.streaming.sessions import (
        stream_daily,
        stream_rfm,
    )

    runs = {
        "auc": lambda ck, sk: stream_auc(spark, din + "/*.parquet", ck, sk),
        "zone_map": lambda ck, sk: stream_zone_map(
            spark, din + "/*.parquet", ck, sk
        ),
        "rfm": lambda ck, sk: stream_rfm(
            spark, ein + "/*.parquet", ck, sk
        ),
        "daily": lambda ck, sk: stream_daily(
            spark, ein + "/*.parquet", ck, sk
        ),
        "cms": lambda ck, sk: stream_count_min(
            spark, in_dir + "/*.parquet", ck, sk, width=256, depth=4
        ),
        "hll": lambda ck, sk: stream_hll(spark, in_dir + "/*.parquet", ck, sk),
        "bloom": lambda ck, sk: stream_bloom(
            spark, in_dir + "/*.parquet", ck, sk
        ),
        "hist": lambda ck, sk: stream_histogram(
            spark, in_dir + "/*.parquet", ck, sk
        ),
    }
    out = {}
    for name, fn in runs.items():
        ck = os.path.join(work, name + "_ckpt")
        sk = os.path.join(work, name + "_sketch")
        t0 = time.monotonic()
        fn(ck, sk)
        dt = time.monotonic() - t0
        n_rows = n_events if name in ("rfm", "daily") else n_docs
        out[name] = {
            "sec": round(dt, 2),
            "rows_per_sec": round(n_rows / dt, 1),
            "batches": N_FILES,
        }
        print(
            f"RESULT stream_{name} "
            + json.dumps({"n_rows": n_rows, **out[name]}),
            flush=True,
        )
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
