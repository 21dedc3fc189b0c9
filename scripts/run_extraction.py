#!/usr/bin/env python3
"""CLI driver — the spark-submit deployment surface (reference ``src/main.py``
argparse entry re-expressed; north_rule: ``spark-submit --py-files pkg.zip
scripts/run_extraction.py``).

    spark-submit --py-files dqa_spark_pkg.zip scripts/run_extraction.py \
        --input  /data/spans_parquet \
        --payloads /data/payloads_parquet \
        --output /data/extracted \
        [--config criteria.json] [--max-media-spans 3] \
        [--checkpoint-dir /data/snap --groups 32] [--metrics /data/metrics]

Without --checkpoint-dir: one-shot write. With it: group-committed snapshots
resumable after a crash (plans/checkpoint.py). Run metrics + rejection
summary print to stdout and optionally persist (reference
``evaluator.py:91-130``/``utils.py:188-204`` analog).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# under spark-submit the package arrives via --py-files; for plain local runs
# fall back to the repo root next to this script
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Span extraction pipeline")
    ap.add_argument("--input", default=None, help="spans parquet path")
    ap.add_argument("--payloads", default=None, help="media payloads parquet path")
    ap.add_argument(
        "--json-batches",
        default=None,
        help="reference-format DocumentBatch JSON array (instead of --input/"
        "--payloads); output becomes the batch-shaped JSON echo",
    )
    ap.add_argument(
        "--content",
        default=None,
        help="binary content parquet (documentPath, content) for --json-batches",
    )
    ap.add_argument("--output", required=True, help="output parquet path")
    ap.add_argument("--config", default=None, help="criteria JSON (reference format)")
    ap.add_argument("--max-media-spans", type=int, default=None, help="page budget")
    ap.add_argument("--checkpoint-dir", default=None, help="resumable snapshot dir")
    ap.add_argument("--groups", type=int, default=16, help="checkpoint group count")
    ap.add_argument("--metrics", default=None, help="metrics output parquet path")
    ap.add_argument("--assume-unique-doc-ids", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from document_quality_assessment_ocr_spark.config import load_criteria_config
    from document_quality_assessment_ocr_spark.plans import checkpoint as cp
    from document_quality_assessment_ocr_spark.plans.metrics import (
        rejection_summary,
        run_metrics,
    )
    from document_quality_assessment_ocr_spark.plans.pipeline import run_extraction
    from document_quality_assessment_ocr_spark.session import get_spark
    from document_quality_assessment_ocr_spark.sources import tables

    criteria = load_criteria_config(args.config) if args.config else None
    spark = get_spark(app_name="extract", master=args.master)

    if args.json_batches:
        # reference-style run: nested JSON batches in, batch-shaped echo out
        # (reference main.py flow: load_json → run_pipeline → save_json)
        if not args.content:
            ap.error("--json-batches requires --content")
        from pyspark.sql import functions as F

        from document_quality_assessment_ocr_spark.sources.json_batches import (
            evaluate_document_batches,
            read_document_batches,
        )

        batches = read_document_batches(spark, args.json_batches)
        content = spark.read.parquet(args.content)
        out_batches = evaluate_document_batches(batches, content, criteria=criteria)
        out_batches.write.mode("overwrite").json(args.output)
        docs = spark.read.json(args.output).select(
            F.explode("documents").alias("d")
        ).select("d.documentID", "d.isAccepted", "d.reasons").distinct()
        total = docs.count()
        accepted = docs.filter(F.col("isAccepted")).count()
        rej = {
            r["reason"]: r["n"]
            for r in docs.filter(~F.col("isAccepted"))
            .select(F.explode("reasons").alias("reason"))
            .groupBy("reason")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        print(json.dumps({
            "summary": {"total_docs": total, "accepted_docs": accepted,
                        "rejected_docs": total - accepted},
            "rejection_summary": rej,
        }, indent=1))
        spark.stop()
        return 0

    if not args.input or not args.payloads:
        ap.error("--input and --payloads are required without --json-batches")
    spans = tables.read_spans(spark, args.input)
    payloads = tables.read_payloads(spark, args.payloads)

    if args.checkpoint_dir:
        result = cp.run_with_checkpoints(
            spark,
            spans,
            payloads,
            args.checkpoint_dir,
            criteria=criteria,
            n_groups=args.groups,
            assume_unique_doc_ids=args.assume_unique_doc_ids,
            max_media_spans=args.max_media_spans,
        )
        result.write.mode("overwrite").parquet(args.output)
    else:
        result = run_extraction(
            spans,
            payloads,
            criteria=criteria,
            assume_unique_doc_ids=args.assume_unique_doc_ids,
            max_media_spans=args.max_media_spans,
        )
        result.write.mode("overwrite").parquet(args.output)

    out = spark.read.parquet(args.output)
    summary = run_metrics(out).collect()[0].asDict()
    rej = {r["reason"]: r["n"] for r in rejection_summary(out).collect()}
    report = {"summary": summary, "rejection_summary": rej}
    print(json.dumps(report, indent=1))
    if args.metrics:
        rejection_summary(out).write.mode("overwrite").parquet(args.metrics)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
