"""Physical-layout clustering keys: Morton (Z-order) interleaving of two
bounded integer dimensions — the multi-dimensional data-clustering
technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY`` (Morton 1966;
Bayer's UB-tree ordering): rows near each other in (x, y) land near each
other in the one-dimensional key, so range-partitioned files are
simultaneously selective on BOTH dimensions and per-file min/max stats
prune scans for either predicate.

Scale shape: the key is a pure codegen projection — zero shuffle, zero
UDF — built from ``&``/``*``/``+`` on two already-bounded integer
columns; at 100 TB it rides the write path (``repartitionByRange(zkey)``
+ ``sortWithinPartitions``) where the range exchange is the write's own
layout shuffle, not an extra one. The expression text itself is the
cross-engine twin: :func:`morton16_sql` emits ONLY syntax Spark SQL and
DuckDB share byte-for-byte, so the engine (via ``F.expr``) and the
DuckDB oracle interpolate the SAME string.

No reference analog (`/root/reference` is single-machine scoring code
with no storage layout surface); this is a task-brief scale operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def morton16_sql(x: str, y: str) -> str:
    """SQL expression interleaving the low 8 bits of two NON-NEGATIVE
    integer expressions into a 16-bit Morton key (x in even bits, y in
    odd bits).

    Built only from ``&``, ``*``, ``+`` and integer literals — the
    operator subset Spark SQL and DuckDB parse identically (shifts are
    spelled differently across engines; ``(x & 2^i) * 2^i`` plants bit i
    at position 2i without one). Inputs outside [0, 255] must be clamped
    by the caller first.
    """
    terms = []
    for i in range(8):
        terms.append(f"(({x}) & {1 << i}) * {1 << i}")
        terms.append(f"(({y}) & {1 << i}) * {1 << (i + 1)}")
    return "(" + " + ".join(terms) + ")"


def morton16_py(x: int, y: int) -> int:
    """Pure-python replay of :func:`morton16_sql` for tests."""
    z = 0
    for i in range(8):
        z += (x & (1 << i)) * (1 << i)
        z += (y & (1 << i)) * (1 << (i + 1))
    return z


def zorder_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str = "doc_id",
    cells_per_file: int = 64,
) -> DataFrame:
    """Z-order layout assignment: Morton key over two bounded integer
    dimension columns plus the target file id (``zkey DIV
    cells_per_file`` — non-negative, so Spark ``DIV`` == DuckDB ``//``).

    Both dimension columns must already be integers in [0, 255] (clamp
    or bucket upstream — e.g. ``LEAST(n_words, 255)`` and an
    md5-mod-256 source bucket). With ``cells_per_file`` z-cells per
    file, file f covers one aligned square-ish tile of the (x, y) grid,
    which is exactly what makes per-file min/max zone maps selective on
    either dimension alone.

    Output: (id_col, x_col, y_col, zkey, file_id) — zkey/file_id BIGINT.
    """
    z = F.expr(morton16_sql(x_col, y_col)).cast("long")
    return df.select(
        F.col(id_col),
        F.col(x_col),
        F.col(y_col),
        z.alias("zkey"),
    ).withColumn(
        "file_id", F.expr(f"zkey DIV {int(cells_per_file)}L").cast("long")
    )
