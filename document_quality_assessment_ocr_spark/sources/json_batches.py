"""DocumentBatch JSON ingestion + batch-shaped output (SURVEY §2.1 S1, §1.2).

The reference's outer data model is a JSON ARRAY of batches
(``README.md:44-60``, ``input.json``; pydantic models ``models.py:55-70``)::

    [{"customerID": "...", "transactionID": "...",
      "documents": [{"documentID": "...", "documentPath": "...",
                     "documentFormat": "...", "requiresOCR": true}, ...]}, ...]

loaded by ``utils.load_json`` (``utils.py:104-137``), evaluated once per
DISTINCT documentID with last-occurrence-wins dedup (the ``all_docs`` dict
build, ``evaluator.py:55-57``), and echoed back in the INPUT batch shape with
verdicts filled in — every batch referencing a documentID receives the same
shared result object (``evaluator.py:132-139``).

Spark mapping:
  * :func:`read_document_batches` — ``spark.read.schema(...).json`` of the
    nested array (multiLine), one row per batch.
  * :func:`batches_to_documents` — posexplode + last-wins dedup keyed on
    (batch ingest order, position in batch).
  * :func:`reattach_results` — the fan-back-out:
    ``groupBy(customerID, transactionID).agg(sort_array(collect_list(
    struct(pos, doc))))`` after an equi-join of the shared per-document
    results; duplicate documentIDs inside or across batches all see the one
    result row. AQE picks the join strategy (results are usually the small
    side → broadcast at batch scale; never forced).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("documentID", T.StringType()),
        T.StructField("documentType", T.StringType()),
        T.StructField("documentFormat", T.StringType()),
        T.StructField("documentPath", T.StringType()),
        T.StructField("requiresOCR", T.BooleanType()),
        T.StructField("isAccepted", T.BooleanType()),
        T.StructField("reasons", T.ArrayType(T.StringType())),
        T.StructField("warnings", T.ArrayType(T.StringType())),
    ]
)

BATCH_SCHEMA = T.StructType(
    [
        T.StructField("customerID", T.StringType()),
        T.StructField("transactionID", T.StringType()),
        T.StructField("documents", T.ArrayType(DOCUMENT_SCHEMA)),
    ]
)


def read_document_batches(spark: SparkSession, path: str) -> DataFrame:
    """Reference-format nested JSON → one row per batch. ``multiLine`` handles
    the top-level array file exactly as ``utils.load_json`` + pydantic do;
    unknown fields are dropped, missing ones null (requiresOCR defaults False
    in the reference model — normalized here so downstream bypass logic never
    sees null)."""
    df = spark.read.schema(BATCH_SCHEMA).option("multiLine", True).json(path)
    fix = F.transform(
        "documents",
        lambda d: d.withField("requiresOCR", F.coalesce(d["requiresOCR"], F.lit(False))),
    )
    return df.select("customerID", "transactionID", fix.alias("documents"))


def batches_to_documents(batches_df: DataFrame) -> DataFrame:
    """Flatten batches to one row per DISTINCT documentID, last occurrence
    wins (the reference's ``all_docs`` dict build iterates batches then
    documents in order and overwrites — ``evaluator.py:55-57``).

    Batch order is the file/row order: ``monotonically_increasing_id`` is
    non-contiguous but order-preserving per split, and splits are ordered —
    the same guarantee a single-driver JSON parse gives the reference."""
    ex = batches_df.select(
        F.monotonically_increasing_id().alias("batch_seq"),
        F.posexplode("documents").alias("pos", "d"),
    ).select(
        F.col("d.documentID").alias("documentID"),
        F.col("d.documentFormat").alias("documentFormat"),
        F.col("d.documentPath").alias("documentPath"),
        F.coalesce(F.col("d.requiresOCR"), F.lit(False)).alias("requiresOCR"),
        F.struct(F.col("batch_seq"), F.col("pos")).alias("_seq"),
    )
    others = [c for c in ex.columns if c not in ("documentID", "_seq")]
    return (
        ex.groupBy("documentID")
        .agg(F.max_by(F.struct(*others), F.col("_seq")).alias("v"))
        .select("documentID", *[F.col(f"v.{c}").alias(c) for c in others])
    )


def reattach_results(batches_df: DataFrame, results_df: DataFrame) -> DataFrame:
    """Fan-back-out (``evaluator.py:132-139``): echo the input batch skeleton
    with per-document verdicts filled in. ``results_df`` has one row per
    distinct doc: (doc_id, accepted, reasons, warnings). Duplicate
    documentIDs — within a batch or across batches — all receive the SAME
    shared result; documents without a result keep null verdict fields (the
    reference's pre-evaluation ``isAccepted=None``)."""
    ex = batches_df.select(
        "customerID", "transactionID", F.posexplode("documents").alias("pos", "d")
    )
    res = results_df.select(
        F.col("doc_id").alias("_rid"),
        F.col("accepted").alias("_acc"),
        F.col("reasons").alias("_rea"),
        F.col("warnings").alias("_war"),
    )
    j = ex.join(res, ex["d.documentID"] == res["_rid"], "left")
    elem = batches_df.schema["documents"].dataType.elementType
    keep = [f for f in elem.fieldNames() if f not in ("isAccepted", "reasons", "warnings")]
    doc = F.struct(
        *(
            [F.col(f"d.{f}").alias(f) for f in keep]
            + [
                F.col("_acc").alias("isAccepted"),
                F.col("_rea").alias("reasons"),
                F.col("_war").alias("warnings"),
            ]
        )
    )
    ordered = F.transform(
        F.sort_array(F.collect_list(F.struct(F.col("pos").alias("pos"), doc.alias("doc")))),
        lambda x: x["doc"],
    )
    return j.groupBy("customerID", "transactionID").agg(ordered.alias("documents"))


def evaluate_document_batches(
    batches_df: DataFrame,
    content_df: DataFrame,
    criteria=None,
    max_pages: int = 5,
    parser=None,
) -> DataFrame:
    """The reference's whole outer flow, Spark-shaped: batches → distinct
    documents (last-wins) → binary content join → rasterize + extract →
    batch-shaped echo with shared results.

    ``content_df`` maps documentPath → content binary (the distributed stand-
    in for the reference's local-filesystem reads — on a cluster this is the
    object-store/Iceberg binary table keyed by path)."""
    from .binary_docs import extract_from_binary, parse_page_container

    docs = batches_to_documents(batches_df)
    binput = docs.join(content_df, "documentPath", "left").select(
        F.col("documentID").alias("doc_id"),
        F.col("documentFormat").alias("fmt"),
        F.col("content"),
        F.col("requiresOCR").alias("requires_ocr"),
    )
    results = extract_from_binary(
        binput,
        criteria=criteria,
        max_pages=max_pages,
        parser=parser or parse_page_container,
    )
    return reattach_results(batches_df, results)
