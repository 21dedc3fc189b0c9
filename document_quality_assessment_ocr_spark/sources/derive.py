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


def spans_from_documents(docs: DataFrame, payload_names: list[str]) -> DataFrame:
    """documents(doc_id, text, ...) → (doc_id, skip_checks, ingest_seq, spans)."""
    n = F.length(F.coalesce(F.col("text"), F.lit("")))
    third = F.greatest((n / 3).cast("int"), F.lit(1))
    names = F.array(*[F.lit(x) for x in payload_names])
    npay = F.lit(len(payload_names))
    pick = lambda salt: F.element_at(names, (F.pmod(F.hash(F.col("doc_id"), F.lit(salt)), npay) + 1).cast("int"))
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
