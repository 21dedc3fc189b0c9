"""CDC / MERGE: apply a changelog to a snapshot table — the Iceberg
merge-on-read maintenance analog for the checkpointed corpus tables.

``changes`` rows are ``(key, seq, op, <payload…>)`` with ``op`` one of
``'I'``/``'U'``/``'D'``. Per key the highest-``seq`` change wins (full
struct tie-break → deterministic under replay); the survivor is applied
as upsert (``I``/``U`` insert-or-replace, ``D`` deletes).

Scale notes (100 TB): the changelog is collapsed with one hash aggregate
on its own (small) side; the snapshot join is a full-outer equi-join on
the key — the ONE shape that cannot broadcast, so co-location is the
play: with the snapshot bucketed by key (``sources/bucketed``) the big
side never shuffles, and the collapsed changelog's HashPartitioning from
its groupBy is reused by the join. That is exactly how Iceberg/Delta
MERGE schedules at scale (rewrite only matched buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key: str = "doc_id",
    seq: str = "seq",
    op: str = "op",
) -> DataFrame:
    """New snapshot = base ⊕ changelog (last-wins per key, upsert + delete).

    Payload columns are every base column except ``key``; ``changes`` must
    carry the same payload columns plus ``seq`` and ``op``.
    """
    payload = [c for c in base.columns if c != key]
    missing = [c for c in payload + [seq, op] if c not in changes.columns]
    if missing:
        raise ValueError(f"changes is missing columns: {missing}")

    winner = F.struct(
        F.col(op).alias("op"), *[F.col(c).alias(c) for c in payload]
    )
    # seq leads the order key; op+payload complete it so replayed/duplicated
    # change rows still resolve deterministically
    ordk = F.struct(F.col(seq), F.col(op), *[F.col(c) for c in payload])
    coll = changes.groupBy(key).agg(F.max_by(winner, ordk).alias("_c"))

    j = base.alias("b").join(coll, on=key, how="full_outer")
    has_c = F.col("_c").isNotNull()
    return j.where(~has_c | (F.col("_c.op") != F.lit("D"))).select(
        F.col(key),
        *[
            F.when(has_c, F.col(f"_c.{c}")).otherwise(F.col(f"b.{c}")).alias(c)
            for c in payload
        ],
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "doc_id",
) -> DataFrame:
    """Changelog BETWEEN two snapshots (Iceberg ``table_changes`` /
    Delta CDF analog, and ``apply_changes``'s inverse): rows only in
    ``new`` → ``'I'``, only in ``old`` → ``'D'``, in both with any
    payload column differing → ``'U'`` (new payload); unchanged rows are
    dropped.

    One full-outer equi-join on the key — the same single shape as
    MERGE, with the same bucketing story (both snapshot versions of a
    bucketed table co-locate, so the diff never shuffles the big side).
    Payload equality is null-safe (``eqNullSafe`` per column), so a
    NULL→value transition correctly reads as an update.

    Output: key, op ('I'|'U'|'D'), payload columns (new side for I/U,
    old side for D).
    """
    payload = [c for c in old.columns if c != key]
    if [c for c in new.columns if c != key] != payload:
        raise ValueError(
            f"snapshot schemas differ: {old.columns} vs {new.columns}"
        )
    o = old.alias("o")
    n = new.alias("n")
    j = o.join(n, F.col(f"o.{key}").eqNullSafe(F.col(f"n.{key}")), "full_outer")
    in_old = F.col(f"o.{key}").isNotNull()
    in_new = F.col(f"n.{key}").isNotNull()
    changed = F.lit(False)
    for c in payload:
        changed = changed | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    op_col = (
        F.when(in_new & ~in_old, F.lit("I"))
        .when(in_old & ~in_new, F.lit("D"))
        .when(changed, F.lit("U"))
    )
    out_cols = [
        F.coalesce(F.col(f"n.{key}"), F.col(f"o.{key}")).alias(key),
        op_col.alias("op"),
    ] + [
        F.when(op_col == "D", F.col(f"o.{c}")).otherwise(F.col(f"n.{c}")).alias(c)
        for c in payload
    ]
    return j.where(op_col.isNotNull()).select(*out_cols)
