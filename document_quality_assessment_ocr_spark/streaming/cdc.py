"""Streaming MERGE: a changelog stream upserts into a versioned snapshot —
the Structured-Streaming face of :mod:`..operators.cdc` (Iceberg/Delta
streaming merge-on-read, file-based here).

``readStream`` tails a changes directory; each micro-batch applies
:func:`..operators.cdc.apply_changes` against the CURRENT snapshot
version and commits the result as the NEXT version directory, so

* every version is immutable (time travel = read version k);
* the stream checkpoint + the monotone version counter give effective
  exactly-once application (a replayed batch rewrites the same next
  version rather than double-applying);
* batch parity holds by construction: applying batches 1..k in order
  equals one batch apply of the seq-ordered union (last-wins collapse is
  associative on ordered seq) — pinned by the stream==batch test.

Scale notes: each micro-batch pays the ``apply_changes`` plan — the
changelog side is the micro-batch (small), and at production scale the
snapshot side is bucketed (``sources/bucketed``) so rewrites co-locate;
versions are directories exactly like ``plans/checkpoint`` groups.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.cdc import apply_changes

_VER_PREFIX = "v"


def _versions(snapshot_dir: str) -> list[int]:
    if not os.path.isdir(snapshot_dir):
        return []
    out = []
    for name in os.listdir(snapshot_dir):
        if name.startswith(_VER_PREFIX) and name[len(_VER_PREFIX):].isdigit():
            out.append(int(name[len(_VER_PREFIX):]))
    return sorted(out)


def current_snapshot(spark: SparkSession, snapshot_dir: str) -> DataFrame:
    """Read the latest committed snapshot version."""
    vs = _versions(snapshot_dir)
    if not vs:
        raise FileNotFoundError(f"no snapshot versions in {snapshot_dir}")
    return spark.read.parquet(os.path.join(snapshot_dir, f"{_VER_PREFIX}{vs[-1]}"))


def read_snapshot_version(
    spark: SparkSession, snapshot_dir: str, version: int
) -> DataFrame:
    """Time travel: read snapshot version ``version``."""
    return spark.read.parquet(os.path.join(snapshot_dir, f"{_VER_PREFIX}{version}"))


def stream_apply_changes(
    spark: SparkSession,
    changes_dir: str,
    changes_schema: str,
    snapshot_dir: str,
    checkpoint_dir: str,
    key: str = "doc_id",
    seq: str = "seq",
    op: str = "op",
    available_now: bool = True,
):
    """Tail ``changes_dir`` and fold each micro-batch into the snapshot.

    ``snapshot_dir`` must hold an initial ``v0`` (write the base table
    there first); each batch commits ``v{n+1}``. Returns the
    StreamingQuery.
    """
    stream = (
        spark.readStream.schema(changes_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(changes_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # version = batch_id + 1, NOT "latest dir + 1": batch ids are
        # monotone from the stream checkpoint and REUSED on replay, so a
        # crashed-then-replayed batch reads the same base (v{batch_id})
        # and overwrites the same target (v{batch_id+1}) — idempotent —
        # where a directory-derived counter would double-apply.
        #
        # checkpoint_dir and snapshot_dir are a paired unit: a FRESH
        # checkpoint pointed at a snapshot_dir with existing history
        # beyond v{batch_id+1} would silently rewrite v1..vN and fork the
        # version chain — fail fast instead of corrupting lineage.
        ahead = [v for v in _versions(snapshot_dir) if v > batch_id + 1]
        if ahead:
            raise RuntimeError(
                f"snapshot_dir {snapshot_dir!r} already holds versions "
                f"{ahead} beyond v{batch_id + 1}: the stream checkpoint "
                "is behind the snapshot history (new checkpoint against "
                "an old snapshot?). Reset checkpoint_dir and snapshot_dir "
                "together — they are a paired unit."
            )
        base = spark.read.parquet(
            os.path.join(snapshot_dir, f"{_VER_PREFIX}{batch_id}")
        )
        nxt = apply_changes(base, batch_df, key=key, seq=seq, op=op)
        nxt.write.mode("overwrite").parquet(
            os.path.join(snapshot_dir, f"{_VER_PREFIX}{batch_id + 1}")
        )

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
