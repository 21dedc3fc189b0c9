"""Iterative graph analytics over document-relation edges (near-duplicate
graphs, citation/link graphs) — PageRank in FIXED-POINT integer arithmetic.

Floating-point PageRank cannot pass a bit-exact cross-engine gate: the
per-node contribution sum is order-dependent in IEEE. Ranks here are
integers in units of 1/SCALE (default nano-ranks): contributions use
integer division, damping is (85·x) DIV 100 — every operation is exact and
associative, so Spark and the DuckDB oracle agree to the last bit, and the
result is stable across retries/partitionings (determinism is a
checkpoint-resume requirement, not a nicety).

Scale shape: each iteration is one join (edges ⋈ ranks, co-partitioned on
src) + one hash aggregate on dst + a left join back to the node table —
the standard Pregel-as-dataframes step. The iteration count is fixed and
small (driver loop, no convergence collect); lineage is truncated per
iteration only by Spark's AQE plan reuse — for production-scale counts
checkpoint every ~5 iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000


def pagerank_fixed(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 3,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """Fixed-point PageRank. ``nodes``: one row per vertex (``id_col``);
    ``edges``: directed (src, dst). Dangling mass is dropped (simplified
    variant) identically on both engines. Output: (id_col, pr) with pr in
    1/SCALE units, BIGINT."""
    deg = edges.groupBy(src_col).agg(F.count(F.lit(1)).alias("outdeg"))
    base = (SCALE * (damp_den - damp_num)) // damp_den
    r = nodes.select(F.col(id_col), F.lit(SCALE).cast("long").alias("pr"))
    for _ in range(iters):
        contrib = (
            edges.join(r, edges[src_col] == r[id_col])
            .join(deg, src_col)
            .select(
                F.col(dst_col).alias(id_col),
                F.expr("pr DIV outdeg").alias("c"),
            )
        )
        sums = contrib.groupBy(id_col).agg(F.sum("c").alias("m"))
        r = nodes.join(sums, id_col, "left").select(
            F.col(id_col),
            (
                F.lit(base).cast("long")
                + F.expr(f"({damp_num} * coalesce(m, 0)) DIV {damp_den}")
            ).alias("pr"),
        )
    return r
