"""document_quality_assessment_ocr_spark — a PySpark-native extraction engine.

A from-scratch, Spark-first reimplementation of the query/data-processing
capabilities of the reference repo ``dangleh/document-quality-assessment-ocr``
(single-machine document image-quality gate), re-targeted per the north rule to
a main-content extraction pipeline over tables of interleaved text+media
documents ``(doc_id, spans: array<struct<kind,text,media_ref,offset>>)``.

Design (see SURVEY.md):
  * All per-span scoring math (blur / skew / noise / brightness / density /
    watermark / entropy / DPI — reference ``src/document_assessor/criteria.py``)
    lives in :mod:`.kernels` as pure-numpy functions shared by BOTH the Spark
    pandas-UDF path (:mod:`.functions.udfs`) and the pure-Python oracle
    (:mod:`.oracle`), so parity is structural.
  * The dataflow (dedup, explode, gate, aggregate, verdict fold, ordered
    reassembly) is declarative DataFrame code in :mod:`.plans.pipeline` —
    Catalyst plans it; exactly one shuffle for the per-document aggregation.
  * Everything is batch (the reference has no streaming surface); an optional
    Structured Streaming wrapper lives in :mod:`.streaming`.
"""

__version__ = "0.1.0"
