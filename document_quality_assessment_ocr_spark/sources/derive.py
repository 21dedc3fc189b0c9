"""Derive a spans corpus from the driver-provided ``documents`` table.

``entry()``/bench need a ``(doc_id, spans)`` input at every scale factor; the
sandbox's testdata has no spans table, so we derive one deterministically from
``documents.parquet`` with pure Column expressions: each document's text is
chunked into three text spans (offset = char position) and two media spans
referencing the seeded payload catalog (choice keyed on a hash of doc_id).
No external data; same rows at a given sf_dir every run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .fixtures import build_payloads


def payloads_df(spark: SparkSession, seed: int = 42, size=(800, 1000)) -> DataFrame:
    pl = build_payloads(seed=seed, size=size)
    rows = [
        (name, 0 if p["arr"] is None else int(p["arr"].shape[1]),
         0 if p["arr"] is None else int(p["arr"].shape[0]), int(p["dpi"]),
         bytearray(p["png"]))
        for name, p in pl.items()
    ]
    return spark.createDataFrame(
        rows, "media_ref string, width int, height int, dpi int, png binary"
    )


def _md5_pick_index(hcol: str, npay: int):
    """0-based payload index from the first 6 hex nibbles of an md5 column.

    md5-nibble arithmetic (not F.hash): murmur3 has no DuckDB equivalent, so
    this keeps the derived corpus reproducible in the SQL oracle
    (``__spark_entry__._md5_pick_sql`` is the byte-identical twin)."""
    val = F.lit(0).cast("long")
    for i in range(1, 7):
        nib = F.expr(f"locate(substr({hcol}, {i}, 1), '0123456789abcdef') - 1").cast("long")
        val = val + nib * F.lit(16 ** (6 - i)).cast("long")
    return F.pmod(val, F.lit(npay)).cast("int")


def spans_from_documents(docs: DataFrame, payload_names: list[str]) -> DataFrame:
    """documents(doc_id, text, ...) → (doc_id, skip_checks, ingest_seq, spans)."""
    docs = docs.select(
        "*",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|1"))).alias("_h1"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|2"))).alias("_h2"),
    )
    n = F.length(F.coalesce(F.col("text"), F.lit("")))
    third = F.greatest((n / 3).cast("int"), F.lit(1))
    names = F.array(*[F.lit(x) for x in payload_names])
    npay = len(payload_names)
    pick = lambda salt: F.element_at(names, _md5_pick_index(f"_h{salt}", npay) + 1)
    t = F.coalesce(F.col("text"), F.lit(""))
    spans = F.array(
        F.struct(F.lit("text").alias("kind"), t.substr(F.lit(1), third).alias("text"),
                 F.lit("").alias("media_ref"), F.lit(0).cast("int").alias("offset")),
        F.struct(F.lit("media").alias("kind"), F.lit("").alias("text"),
                 pick(1).alias("media_ref"), third.cast("int").alias("offset")),
        F.struct(F.lit("text").alias("kind"), t.substr(third + 1, third).alias("text"),
                 F.lit("").alias("media_ref"), (third + 1).cast("int").alias("offset")),
        F.struct(F.lit("media").alias("kind"), F.lit("").alias("text"),
                 pick(2).alias("media_ref"), (third * 2).cast("int").alias("offset")),
        F.struct(F.lit("text").alias("kind"), t.substr(third * 2 + 1, n).alias("text"),
                 F.lit("").alias("media_ref"), (third * 2 + 1).cast("int").alias("offset")),
    )
    # first text span must not collide at offset with others; chunk spans use
    # 0, third+1, 2*third+1 and media use third, 2*third — distinct for n>=3
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit(False).alias("skip_checks"),
        F.monotonically_increasing_id().alias("ingest_seq"),
        F.filter(spans, lambda s: (s["kind"] == "media") | (F.length(s["text"]) > 0)).alias(
            "spans"
        ),
    )
