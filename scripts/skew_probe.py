#!/usr/bin/env python3
"""Mega-document skew probe (VERDICT r3 #5): end-to-end extraction with a
planted 10⁵-span document, with and without ``split_oversized_docs``.

Corpus: the sf0.01 documents table derived into spans (500 docs × 5 spans,
catalog payloads) + ONE text-only mega-doc whose spans array is built
engine-side (``F.sequence`` → ``F.transform``, no driver materialization).
Text-only isolates the doc_id-keyed path — kernel work is keyed by
media_ref and spreads regardless (SCALE.md §3).

Measures, per variant: wall seconds and the MAX single-task duration of the
stages the run executed (Spark REST taskSummary, quantile 1.0) — the
straggler signal the salting exists to kill. Asserts the mega-doc's verdict
row is identical in both variants (split is a pure partitioning change).

Prints one RESULT json line; paste into SCALE.md §3.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MEGA_ID = "mega_doc"
MEGA_SPANS = int(os.environ.get("SKEW_PROBE_SPANS", 100_000))
SPLIT_AT = int(os.environ.get("SKEW_PROBE_SPLIT_AT", 10_000))


def _stage_ids(ui: str, app: str) -> set[int]:
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
        return {s["stageId"] for s in json.load(r)}


def _max_task_ms(ui: str, app: str, stage_ids: set[int]) -> float:
    worst = 0.0
    for sid in stage_ids:
        try:
            url = (
                f"{ui}/api/v1/applications/{app}/stages/{sid}/0/"
                "taskSummary?quantiles=1.0"
            )
            with urllib.request.urlopen(url) as r:
                worst = max(worst, float(json.load(r)["duration"][0]))
        except Exception:
            pass  # skipped/cached stages have no task summary
    return worst


def main() -> None:
    from pyspark.sql import functions as F

    from document_quality_assessment_ocr_spark.operators.salting import (
        split_oversized_docs,
    )
    from document_quality_assessment_ocr_spark.plans.pipeline import run_extraction
    from document_quality_assessment_ocr_spark.session import get_spark
    from document_quality_assessment_ocr_spark.sources.derive import (
        payloads_df,
        spans_from_documents,
    )
    from document_quality_assessment_ocr_spark.sources.fixtures import payload_names

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(
        app_name="skew_probe",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        # get_spark disables the UI (bench hygiene); the probe needs the
        # REST taskSummary endpoint for max-task-duration
        extra_conf={"spark.ui.enabled": "true"},
    )
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    base = spans_from_documents(docs, sorted(payload_names()))
    mega = spark.range(1).select(
        F.lit(MEGA_ID).alias("doc_id"),
        F.lit(False).alias("skip_checks"),
        F.lit(10**9).cast("long").alias("ingest_seq"),
        F.transform(
            F.sequence(F.lit(0), F.lit(MEGA_SPANS - 1)),
            lambda i: F.struct(
                F.lit("text").alias("kind"),
                F.concat(F.lit("span body text number "), i.cast("string")).alias(
                    "text"
                ),
                F.lit("").alias("media_ref"),
                i.cast("int").alias("offset"),
            ),
        ).alias("spans"),
    )
    spans = base.unionByName(mega)
    pay = payloads_df(spark)

    results = {}
    mega_rows = {}
    for variant, sdf, kw in (
        ("unsplit", spans, {}),
        ("split", split_oversized_docs(spans, max_spans_per_row=SPLIT_AT), {}),
        # round-5 part-doc mode (VERDICT r4 #2): two-level aggregation with
        # per-part bounded sort + flatten-by-part_idx re-merge — the path
        # that lifts the single-task reassembly ceiling
        ("partdoc", spans, {"partdoc_max_spans": SPLIT_AT}),
    ):
        out = run_extraction(sdf, pay, assume_unique_doc_ids=True, **kw)
        # warm codegen/scan once so the A/B is steady-state
        out.write.mode("overwrite").format("noop").save()
        before = _stage_ids(ui, app)
        t0 = time.time()
        out.write.mode("overwrite").format("noop").save()
        wall = time.time() - t0
        new_stages = _stage_ids(ui, app) - before
        results[variant] = {
            "wall_sec": round(wall, 2),
            "max_task_ms": round(_max_task_ms(ui, app, new_stages), 1),
            "n_stages": len(new_stages),
        }
        mega_rows[variant] = (
            out.where(F.col("doc_id") == MEGA_ID)
            .select(
                "doc_id",
                "accepted",
                "reasons",
                "warnings",
                F.size("spans").alias("n_spans"),
                F.md5(F.to_json("spans")).alias("spans_md5"),
            )
            .collect()[0]
            .asDict()
        )

    for v in mega_rows:
        assert mega_rows["unsplit"] == mega_rows[v], (
            f"{v} changed the mega-doc verdict!",
            mega_rows,
        )
    out = {
        "probe": "mega_doc_skew",
        "mega_spans": MEGA_SPANS,
        "split_at": SPLIT_AT,
        "n_base_docs": docs.count(),
        "cpus": cpus,
        **{f"{k}_{m}": v for k, r in results.items() for m, v in r.items()},
        "mega_verdict_identical": True,
        "mega_n_spans": mega_rows["split"]["n_spans"],
    }
    spark.stop()
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
