"""Checkpointed extraction runs: snapshot commits + resume (north_rule).

The production deployment writes Iceberg snapshots; this container has no
Iceberg runtime, so the same semantics are implemented on plain parquet with
an atomic JSON manifest (write-temp + rename — the snapshot commit):

    base_dir/
      data/group=<g>/*.parquet        -- extraction output per doc-hash group
      manifests/group=<g>/*.parquet   -- per-partition lineage+metrics rows
      _SNAPSHOT.json                  -- committed group ids (atomic rename)

Documents are routed to ``n_groups`` deterministic hash groups
(xxhash64(doc_id)); each group is extracted and committed independently, so a
killed run resumes from the last committed group and re-emits nothing
(idempotent re-run of an uncommitted group overwrites its directory). The
payload table is scored ONCE and persisted across groups."""

from __future__ import annotations

import json
import os
import tempfile
import time
from typing import List, Optional

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import CriteriaConfig
from .metrics import partition_manifest
from .pipeline import run_extraction, score_payload_table

SNAPSHOT = "_SNAPSHOT.json"


def _read_snapshot(base_dir: str) -> dict:
    p = os.path.join(base_dir, SNAPSHOT)
    if not os.path.exists(p):
        return {"committed_groups": [], "runs": []}
    with open(p) as f:
        return json.load(f)


def _commit_snapshot(base_dir: str, snap: dict) -> None:
    fd, tmp = tempfile.mkstemp(dir=base_dir, prefix="._snap_")
    with os.fdopen(fd, "w") as f:
        json.dump(snap, f, indent=1)
    os.replace(tmp, os.path.join(base_dir, SNAPSHOT))  # atomic commit


def run_with_checkpoints(
    spark: SparkSession,
    spans_df: DataFrame,
    payloads_df: DataFrame,
    base_dir: str,
    criteria: Optional[List[CriteriaConfig]] = None,
    n_groups: int = 8,
    run_id: Optional[str] = None,
    assume_unique_doc_ids: bool = False,
    max_media_spans: Optional[int] = None,
    scored_payloads: Optional[DataFrame] = None,
) -> DataFrame:
    """Extract group-by-group with snapshot commits; returns the full result
    read back from committed data. Safe to re-invoke after a crash.
    ``scored_payloads`` injects a pre-built score table (e.g. the binary
    front-end's kernel scores ∪ handler-error rows) — still scored once and
    persisted across groups."""
    os.makedirs(base_dir, exist_ok=True)
    snap = _read_snapshot(base_dir)
    done = set(snap["committed_groups"])
    todo = [g for g in range(n_groups) if g not in done]
    if todo:
        scored = (
            scored_payloads if scored_payloads is not None else score_payload_table(payloads_df)
        ).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            grp = F.pmod(F.xxhash64("doc_id"), F.lit(n_groups)).cast("int")
            for g in todo:
                part = spans_df.filter(grp == g)
                res = run_extraction(
                    part,
                    payloads_df,
                    criteria=criteria,
                    include_metrics_cols=True,
                    scored_payloads=scored,
                    assume_unique_doc_ids=assume_unique_doc_ids,
                    max_media_spans=max_media_spans,
                )
                data_dir = os.path.join(base_dir, "data", f"group={g}")
                res.write.mode("overwrite").parquet(data_dir)
                mani = partition_manifest(
                    spark.read.parquet(data_dir)
                )  # manifest over COMMITTED files (true lineage)
                mani.withColumn("group_id", F.lit(g)).write.mode("overwrite").parquet(
                    os.path.join(base_dir, "manifests", f"group={g}")
                )
                snap["committed_groups"] = sorted(set(snap["committed_groups"]) | {g})
                snap["runs"].append(
                    {"run_id": run_id or "run", "group": g, "ts": time.time()}
                )
                _commit_snapshot(base_dir, snap)
        finally:
            scored.unpersist()
    return spark.read.parquet(os.path.join(base_dir, "data")).drop(
        "n_spans", "n_media", "n_kept", "min_lap", "max_abs_skew", "max_noise"
    )


def read_manifests(spark: SparkSession, base_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(base_dir, "manifests"))


def snapshot_history(base_dir: str) -> List[dict]:
    """The snapshot commit log as Iceberg-style versions: entry i is the
    state AFTER the i-th group commit (version = i, plus the committed
    group, run_id and wall-clock ts). Empty list before the first commit."""
    snap = _read_snapshot(base_dir)
    return [
        {"version": i, "group": r["group"], "run_id": r["run_id"], "ts": r["ts"]}
        for i, r in enumerate(snap["runs"])
    ]


def read_as_of(
    spark: SparkSession, base_dir: str, version: Optional[int] = None
) -> DataFrame:
    """Time-travel read: the extraction output as of snapshot ``version``
    (None → latest). Only the groups committed by that version are read —
    the group id is a physical partition column, so the filter is a
    partition PRUNE (skipped directories), not a scan-and-discard; at
    Iceberg scale this is the manifest-pruned snapshot read."""
    history = snapshot_history(base_dir)
    if version is None:
        version = len(history) - 1
    if version < 0 or not history:
        raise ValueError(f"no committed snapshot at version {version}")
    groups = sorted({h["group"] for h in history[: version + 1]})
    return (
        spark.read.parquet(os.path.join(base_dir, "data"))
        .where(F.col("group").isin(groups))
        .drop("n_spans", "n_media", "n_kept", "min_lap", "max_abs_skew", "max_noise")
        .drop("group")
    )


def run_binary_with_checkpoints(
    spark: SparkSession,
    docs_df: DataFrame,
    base_dir: str,
    criteria: Optional[List[CriteriaConfig]] = None,
    n_groups: int = 8,
    max_pages: int = 5,
    parser=None,
    run_id: Optional[str] = None,
) -> DataFrame:
    """Checkpointed end-to-end run over a BINARY documents table: rasterize
    once (persisted — pages feed both the score table and the spans), then
    group-committed extraction with resume, exactly like the spans path.
    ``doc_id`` must be unique (dedup upstream, reference evaluator.py:55-57)."""
    from ..sources.binary_docs import (
        error_scored_rows,
        pages_to_payloads,
        pages_to_spans,
        parse_page_container,
        rasterize,
    )

    pages = rasterize(
        docs_df, max_pages=max_pages, parser=parser or parse_page_container
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        payloads = pages_to_payloads(pages)
        scored = score_payload_table(payloads).unionByName(error_scored_rows(pages))
        spans = pages_to_spans(pages, docs_df)
        return run_with_checkpoints(
            spark,
            spans,
            payloads,
            base_dir,
            criteria=criteria,
            n_groups=n_groups,
            run_id=run_id,
            assume_unique_doc_ids=True,
            scored_payloads=scored,
        )
    finally:
        pages.unpersist()
