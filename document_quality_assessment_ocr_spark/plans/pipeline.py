"""End-to-end extraction plan (SURVEY.md §3 'Spark lifecycle').

Dataflow::

    payloads ── score_media (pandas UDF, ONCE per distinct payload) ──┐
    spans ── dedup(last-wins) ── sort spans by offset ── posexplode ──┴─ join
          ── span gating columns ── ONE groupBy(doc_id) ── verdict fold
          ── ordered reassembly ── (doc_id, accepted, reasons, warnings, spans)

Scale notes (the 100 TB story):
  * PNG bytes never travel with span rows — kernels run over the payload
    table, and only the small numeric score struct joins to spans. With
    mostly-unique payloads this is the same kernel work as scoring in-line,
    with deduplicated work for free when media repeats (very common in web
    corpora).
  * Exactly one all-to-all over the big span table when ``assume_unique_doc_ids``
    (the dedup shuffle otherwise precedes it and the final groupBy reuses its
    exchange — HashPartitioning(doc_id) satisfies the aggregate's clustering).
  * The verdict fold + reassembly are pure Column expressions — whole-stage
    codegen, no Python.
  * Mega-documents skew the explode→aggregate path; `salt_hint` documents the
    AQE-driven mitigation (spans arrays are bounded per-row; AQE skew-join +
    adaptive coalescing handle the rest — see plans/metrics.py histograms).

Semantics mirror :mod:`..oracle` exactly; parity is pinned by
tests/test_parity_spark.py byte-for-byte.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import RECOMMENDED, REQUIRED, WARNING, CriteriaConfig, Threshold, default_criteria
from ..functions.text import text_density
from ..functions.udfs import score_media
from ..oracle import NO_IMAGES_MSG

_EMPTY_STR_ARR = "array<string>"
_OUT_SPAN = "array<struct<kind:string,text:string,media_ref:string,order:int>>"


def _get(criteria: List[CriteriaConfig], name: str) -> Optional[CriteriaConfig]:
    return next((c for c in criteria if c.name == name), None)


def _agg_by_mode(col: Column, mode: str) -> Column:
    if mode == "max":
        return F.max(col)
    if mode == "avg":
        return F.avg(col)
    return F.min(col)  # "min" and unknown modes (reference criteria.py:149)


def score_payload_table(payloads_df: DataFrame) -> DataFrame:
    """Payload table → (media_ref, p_dpi, ms struct of K1–K8 scores/error).

    The ONLY pandas-UDF stage. Runs once per distinct payload.
    """
    return payloads_df.select(
        "media_ref",
        F.col("dpi").cast("double").alias("p_dpi"),
        score_media(F.col("png"), F.col("media_ref")).alias("ms"),
    )


def dedup_last_wins(spans_df: DataFrame) -> DataFrame:
    """Duplicate doc_ids collapse, last ingest wins (reference
    ``evaluator.py:55-57``). Single hash aggregate — no window, and the
    resulting HashPartitioning(doc_id) is reused by the final aggregation."""
    cols = spans_df.columns
    seq = F.col("ingest_seq") if "ingest_seq" in cols else F.monotonically_increasing_id()
    skip = F.col("skip_checks") if "skip_checks" in cols else F.lit(False)
    return (
        spans_df.select(
            "doc_id", F.struct(seq.alias("seq"), F.col("spans").alias("spans"), skip.alias("skip_checks")).alias("v")
        )
        .groupBy("doc_id")
        .agg(F.max_by("v", F.col("v.seq")).alias("v"))
        .select("doc_id", F.col("v.spans").alias("spans"), F.col("v.skip_checks").alias("skip_checks"))
    )


def run_extraction(
    spans_df: DataFrame,
    payloads_df: DataFrame,
    criteria: Optional[List[CriteriaConfig]] = None,
    assume_unique_doc_ids: bool = False,
    include_metrics_cols: bool = False,
    scored_payloads: Optional[DataFrame] = None,
    max_media_spans: Optional[int] = None,
    broadcast_scores: bool = True,
    partdoc_max_spans: Optional[int] = None,
) -> DataFrame:
    """The flagship plan: spans+payloads → per-document verdict + surviving
    ordered span sequence ``(kind, text, media_ref, order)``.

    ``scored_payloads`` lets callers inject a pre-scored (and e.g. persisted)
    payload table so multi-pass drivers (checkpointed group runs) pay the
    kernel cost once.

    ``broadcast_scores`` (default True) puts an explicit broadcast hint on
    the score join's payload side: after payload dedup the scored table is
    one NUMERIC row per distinct rendered page — the bounded side — so
    span rows never shuffle for the join even with AQE off (the static
    plan a 1000-executor run compiles). Set False when scores are
    genuinely corpus-sized (every doc its own pages, no shared panel);
    the join then falls back to a media_ref-keyed shuffle join and AQE's
    runtime size check decides.

    ``max_media_spans`` — the reference's page budget analog (≤3 PDF pages /
    ≤20 TIFF frames, ``pdf_handler.py:65``, ``tiff_handler.py:15``): only the
    first K media spans per document (offset order) feed the DOCUMENT
    verdict; span gating still sees every span.

    ``partdoc_max_spans`` — PART-DOC mode for mega-documents (SCALE.md §3):
    spans bucket into ``(doc_id, part_idx)`` part-docs by OFFSET RANGE
    (``part_idx = offset DIV K`` — contiguous offset ranges, so no
    array-local global sort ever materializes on the scan task, which the
    round-5 probe measured as the real 10⁶-span hot task); every
    doc-level aggregate is computed per part first (all partials are
    algebraic: counts, min/max, (sum, count) pairs for means, min-structs
    for first-error/first-page selection, and a per-part
    ``sort_array(collect_list)`` that runs reduce-side, parallel across
    parts), then merged per logical doc — the surviving span sequence
    re-assembles as ``flatten`` of per-part sorted lists in ``part_idx``
    order, which IS the global offset order because parts partition the
    offset space: an algebraic concat, no global resort. The verdict
    fold still runs ONCE per logical doc, on the merged aggregates.
    Requires ``assume_unique_doc_ids=True`` (same contract as
    ``operators.salting.split_oversized_docs``) and is incompatible with
    ``max_media_spans`` (the page budget needs the whole array in one row).
    Costs one extra Exchange (doc_id+part_idx, then doc_id) whose second
    hop moves per-part aggregates only.

    Two caveats (r5 ADVICE): (a) the size bound assumes offsets are
    reasonably DENSE and mostly unique — many spans sharing one K-wide
    offset range re-concentrate that part on a single reducer (ties stay
    correct, they colocate by construction); probe the offset density
    (the salting path's spans-length histogram) before picking K.
    (b) the per-part mean merges (Σ per-part sums / Σ counts) associate
    float additions differently than the single-Exchange ``F.avg`` plan,
    so results agree up to the same last-ulp nondeterminism class as
    ``F.avg`` itself — fixture margins are engineered away from the
    ``%.2f`` reason boundaries (the kernels.py margin convention), not
    guaranteed bit-stable at them."""
    criteria = criteria or default_criteria()

    # ---- driver-side constants (config is tiny: closed over, never a join)
    td = _get(criteria, "text_density")
    td_thresh = td.threshold if td and td.threshold else Threshold(min_percent=1.0, max_percent=80.0)
    min_content = td_thresh.min_percent if td_thresh.min_percent is not None else 1.0
    blur_c = _get(criteria, "blur")
    skew_c = _get(criteria, "skew")
    noise_c = _get(criteria, "noise")

    docs = spans_df if assume_unique_doc_ids else dedup_last_wins(spans_df)
    if assume_unique_doc_ids and "skip_checks" not in docs.columns:
        docs = docs.withColumn("skip_checks", F.lit(False))
    # NOTE on narrow inputs: a single-row-group spans file serializes the
    # span gate/fold on one scan task in this (no-dedup, no-exchange) mode;
    # the FIX lives in sources/tables.read_spans (row-group-aware
    # repartition after the read), NOT here — run_extraction must respect
    # the caller's layout (a bucketed spans table is deliberately
    # pre-partitioned so this plan stays shuffle-free, tests/test_bucketed).

    # sort spans by offset ONCE (array-local, no shuffle); offset leads the
    # struct so sort_array orders by it (posexplode pos is then offset-rank)
    spans_sorted = F.sort_array(
        F.transform(
            "spans",
            lambda s: F.struct(
                s["offset"].alias("offset"),
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        )
    )
    if partdoc_max_spans is not None:
        if not assume_unique_doc_ids:
            raise ValueError("partdoc mode requires assume_unique_doc_ids=True")
        if max_media_spans is not None:
            raise ValueError("partdoc mode is incompatible with max_media_spans")
        # NO array-local global sort in this mode: the round-5 skew probe
        # measured that sorting a 10⁶-element spans array on the scan task
        # IS the irreducible hot task (7.5 s), so parts bucket by OFFSET
        # RANGE instead — part_idx = offset DIV K partitions the offset
        # space into contiguous ranges (equal offsets, whatever their
        # kind/text tiebreak, land in the same part, so the per-part
        # struct sort resolves ties exactly like a global sort would) and
        # the per-part sort_array runs REDUCE-side, parallel across
        # parts. Dense 0..n-1 offsets give ≤K spans per part; sparse
        # offsets give fewer — the spans_length_histogram hook is the
        # monitor either way. The raw struct field order differs from the
        # sorted path's (offset-first) layout, but every consumer reads
        # fields by name and builds its own key structs.
        docs = docs.select("doc_id", "skip_checks", "spans")
    else:
        docs = docs.select("doc_id", "skip_checks", spans_sorted.alias("spans"))
    if max_media_spans is not None:
        # array POSITIONS of the first K media spans — the document's
        # "pages". Index-based (not offset-based) so duplicate offsets at the
        # budget boundary resolve by the same total order the oracle slices
        # (oracle.py: media[:max_media_spans] over the sorted list).
        docs = docs.withColumn(
            "page_pos",
            F.slice(
                F.filter(
                    F.transform(
                        "spans", lambda x, i: F.when(x["kind"] == F.lit("media"), i)
                    ),
                    lambda v: v.isNotNull(),
                ),
                1,
                max_media_spans,
            ),
        )
    else:
        docs = docs.withColumn("page_pos", F.lit(None).cast("array<int>"))

    ex = docs.select(
        "doc_id",
        "skip_checks",
        "page_pos",
        F.posexplode_outer("spans").alias("pos", "s"),
    )
    if partdoc_max_spans is not None:
        ex = ex.withColumn(
            "part_idx",
            F.coalesce(
                F.expr(f"(s.offset) DIV {int(partdoc_max_spans)}"), F.lit(0)
            ).cast("long"),
        )
        # spread the per-part work BEFORE the aggregation: without this,
        # map-side partial aggregation builds ALL of a mega-doc's part
        # lists on its single scan task (stage-level probe measured 9.0 s
        # there vs 1.6 s on the final merge). Repartitioning the raw
        # exploded rows on exactly the grouping keys satisfies the
        # aggregation's required distribution, so the groupBy adds no
        # second raw-row exchange — the scan task only explodes and
        # shuffle-writes.
        ex = ex.repartition("doc_id", "part_idx", "skip_checks")

    scored = scored_payloads if scored_payloads is not None else score_payload_table(payloads_df)
    if broadcast_scores:
        scored = F.broadcast(scored)
    ex = ex.join(scored, ex["s.media_ref"] == scored["media_ref"], "left").drop(
        scored["media_ref"]
    )

    is_media = F.col("s.kind") == F.lit("media")
    # is this media span one of the document's scored "pages"?
    if max_media_spans is None:
        is_page = is_media
    else:
        is_page = is_media & F.array_contains(
            F.coalesce(F.col("page_pos"), F.array().cast("array<int>")),
            F.col("pos"),
        )
    # error-as-data: missing payload or decode failure (only meaningful for
    # non-bypass docs and only within the page budget — the reference never
    # decodes beyond it; oracle short-circuits bypass before decode)
    err_span = F.when(
        is_page & ~F.col("skip_checks"),
        F.when(
            F.col("p_dpi").isNull(),
            # coalesce: a NULL media_ref is still a missing payload (concat
            # with NULL would swallow the whole error); oracle mirrors with
            # `or ''`
            F.concat(
                F.lit("missing media payload "),
                F.coalesce(F.col("s.media_ref"), F.lit("")),
            ),
        ).otherwise(F.col("ms.error")),
    )

    # ---- span-level gating (north_star): text density band; media
    # blur/skew/noise thresholds — thresholds read from config, absent → pass
    gate = F.lit(True)
    if blur_c and blur_c.threshold and blur_c.threshold.min_variance is not None:
        gate = gate & (F.col("ms.lap_var") >= F.lit(float(blur_c.threshold.min_variance)))
    if skew_c and skew_c.threshold and skew_c.threshold.max_deg is not None:
        gate = gate & (F.abs(F.col("ms.skew_deg")) <= F.lit(float(skew_c.threshold.max_deg)))
    if noise_c and noise_c.threshold and noise_c.threshold.max_percent is not None:
        gate = gate & (F.col("ms.noise_pct") <= F.lit(float(noise_c.threshold.max_percent)))
    t_min = float(td_thresh.min_percent if td_thresh.min_percent is not None else 1.0)
    t_max = float(td_thresh.max_percent if td_thresh.max_percent is not None else 80.0)
    dens = text_density(F.col("s.text"))
    survives = F.when(F.col("s").isNull(), F.lit(False)).otherwise(
        F.when(F.col("skip_checks"), F.lit(True)).otherwise(
            F.when(~is_media, (dens >= F.lit(t_min)) & (dens <= F.lit(t_max))).otherwise(
                F.coalesce(gate, F.lit(False))
            )
        )
    )

    def pg(col: Column) -> Column:
        return F.when(is_page, col)

    ratio = pg(F.col("ms.content_ratio"))
    ferr_struct = F.min(
        F.when(
            err_span.isNotNull(),
            F.struct(
                F.col("s.offset").alias("o"),
                F.col("s.text").alias("t"),
                F.col("s.media_ref").alias("m"),
                err_span.alias("e"),
            ),
        )
    )
    fest_struct = F.min(
        F.when(
            is_page,
            F.struct(
                F.col("s.offset").alias("o"),
                F.col("s.text").alias("t"),
                F.col("s.media_ref").alias("m"),
                F.col("ms.est_dpi").alias("v"),
            ),
        )
    )
    kept_struct = F.sort_array(
        F.collect_list(
            F.when(
                survives,
                F.struct(
                    F.col("s.offset").alias("offset"),
                    F.col("s.kind").alias("kind"),
                    F.col("s.text").alias("text"),
                    F.col("s.media_ref").alias("media_ref"),
                ),
            )
        )
    )
    if partdoc_max_spans is not None:
        # ---- part-doc two-level aggregation: every doc statistic has an
        # exact algebraic partial (count→sum, min/max→min/max, mean→(sum,
        # count) merged as Σsum/Σcount — the same partial Spark's own avg
        # uses — min-structs→min), and the per-part kept list is sorted
        # within its bounded part only. Exchange 1 keys (doc_id, part_idx)
        # so no reducer ever sorts more than partdoc_max_spans spans;
        # Exchange 2 keys doc_id and moves per-part aggregates.
        td_mode = td.aggregate_mode if td else "avg"
        part_aggs = [
            F.count(F.col("s")).alias("n_spans_p"),
            F.count(F.when(is_media, F.lit(1))).alias("n_media_p"),
            ferr_struct.alias("ferr_p"),
            F.sum(ratio).alias("sum_ratio_p"),
            F.count(ratio).alias("cnt_ratio_p"),
            F.min(ratio).alias("min_ratio_p"),
            F.sum(pg(F.col("ms.brightness"))).alias("sum_bright_p"),
            F.count(pg(F.col("ms.brightness"))).alias("cnt_bright_p"),
            F.min(pg(F.col("ms.lap_var"))).alias("min_lap_p"),
            F.max(pg(F.abs(F.col("ms.skew_deg")))).alias("max_abs_skew_p"),
            F.max(pg(F.col("ms.watermark"))).alias("max_wm_p"),
            F.max(pg(F.col("ms.noise_pct"))).alias("max_noise_p"),
            F.min(pg(F.col("ms.entropy"))).alias("min_ent_p"),
            F.min(pg(F.col("p_dpi"))).alias("min_dpi_meta_p"),
            fest_struct.alias("fest_p"),
            kept_struct.alias("kept_p"),
        ]
        if td_mode not in ("avg",):
            part_aggs.append(_agg_by_mode(ratio, td_mode).alias("td_part_p"))
        part = ex.groupBy("doc_id", "part_idx", "skip_checks").agg(*part_aggs)
        if td_mode == "avg":
            td_merged = F.sum("sum_ratio_p") / F.sum("cnt_ratio_p")
        elif td_mode == "max":
            td_merged = F.max("td_part_p")
        else:
            td_merged = F.min("td_part_p")
        agg = part.groupBy("doc_id", "skip_checks").agg(
            F.sum("n_spans_p").alias("n_spans"),
            F.sum("n_media_p").alias("n_media"),
            F.min("ferr_p").alias("ferr"),
            (F.sum("sum_ratio_p") / F.sum("cnt_ratio_p")).alias("avg_ratio"),
            F.min("min_ratio_p").alias("min_ratio"),
            td_merged.alias("td_ratio"),
            (F.sum("sum_bright_p") / F.sum("cnt_bright_p")).alias("avg_bright"),
            F.min("min_lap_p").alias("min_lap"),
            F.max("max_abs_skew_p").alias("max_abs_skew"),
            F.max("max_wm_p").alias("max_wm"),
            F.max("max_noise_p").alias("max_noise"),
            F.min("min_ent_p").alias("min_ent"),
            F.min("min_dpi_meta_p").alias("min_dpi_meta"),
            F.min("fest_p").alias("fest"),
            # ordered re-merge: parts are contiguous ranges of the sorted
            # spans array, so concatenating per-part sorted survivor lists
            # in part_idx order IS the globally sorted sequence — flatten,
            # never a second sort_array over the full doc
            F.flatten(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                F.col("part_idx").alias("i"),
                                F.col("kept_p").alias("k"),
                            )
                        )
                    ),
                    lambda x: x["k"],
                )
            ).alias("kept"),
        )
        return _verdict_select(agg, criteria, min_content, include_metrics_cols)
    # ---- ONE shuffle: every doc-level aggregate in a single HashAggregate.
    # n_spans is an aggregate (count of non-null exploded spans), NOT a group
    # key — so a mega-document's spans array may be pre-split across several
    # input rows (operators/salting.split_oversized_docs) and the partial
    # aggregation merges the pieces transparently.
    agg = ex.groupBy("doc_id", "skip_checks").agg(
        F.count(F.col("s")).alias("n_spans"),
        F.count(F.when(is_media, F.lit(1))).alias("n_media"),
        # first-error selection: min over the FULL span total order
        # (offset, text, media_ref — kind is constant 'media' among pages;
        # struct min orders null fields first, matching the oracle's sort
        # key) so ties on offset pick the same page the oracle's pages[0]
        # loop hits first. NOT keyed on posexplode pos: pos is chunk-local
        # under operators/salting.split_oversized_docs.
        ferr_struct.alias("ferr"),
        F.avg(ratio).alias("avg_ratio"),
        F.min(ratio).alias("min_ratio"),
        _agg_by_mode(ratio, td.aggregate_mode if td else "avg").alias("td_ratio"),
        F.avg(pg(F.col("ms.brightness"))).alias("avg_bright"),
        F.min(pg(F.col("ms.lap_var"))).alias("min_lap"),
        F.max(pg(F.abs(F.col("ms.skew_deg")))).alias("max_abs_skew"),
        F.max(pg(F.col("ms.watermark"))).alias("max_wm"),
        F.max(pg(F.col("ms.noise_pct"))).alias("max_noise"),
        F.min(pg(F.col("ms.entropy"))).alias("min_ent"),
        F.min(pg(F.col("p_dpi"))).alias("min_dpi_meta"),
        # K8 fallback value of page ONE (reference criteria.py:243): min over
        # the same full-key total order as ferr
        fest_struct.alias("fest"),
        kept_struct.alias("kept"),
    )
    return _verdict_select(agg, criteria, min_content, include_metrics_cols)


def _verdict_select(
    agg: DataFrame,
    criteria: List[CriteriaConfig],
    min_content: float,
    include_metrics_cols: bool,
) -> DataFrame:
    """Verdict fold (reference criteria.py:205-325) over the merged per-doc
    aggregate columns — shared by the single-Exchange plan and the part-doc
    two-level plan (both produce identical column names/semantics)."""

    def fail_and_reason(c: CriteriaConfig) -> tuple[Column, Column]:
        t = c.threshold or Threshold()
        n = c.name
        false = F.lit(False)
        if n == "file_integrity":
            return false, F.lit("")
        if n == "resolution":
            skip_blank = F.coalesce(F.col("avg_ratio"), F.lit(0.0)) < F.lit(float(min_content))
            meta_low = F.col("min_dpi_meta") < F.lit(float(t.min_dpi))
            est_low = F.coalesce(F.col("fest.v"), F.lit(0.0)) < F.lit(float(t.min_dpi))
            fail = ~skip_blank & F.coalesce(meta_low & est_low, false)
            reason = F.format_string(
                "Resolution too low (metadata_dpi: %.2f, estimated_dpi: %.2f)",
                F.coalesce(F.col("min_dpi_meta"), F.lit(0.0)),
                F.coalesce(F.col("fest.v"), F.lit(0.0)),
            )
            return fail, reason
        if n == "brightness":
            v = F.col("avg_bright")
            fail = F.coalesce(~((v >= F.lit(float(t.min))) & (v <= F.lit(float(t.max)))), false)
            return fail, F.lit("Brightness out of range")
        if n == "blur":
            v = F.col("min_lap")
            fail = F.coalesce(v < F.lit(float(t.min_variance)), false)
            return fail, F.format_string("Image too blurry (variance: %.2f)", F.coalesce(v, F.lit(0.0)))
        if n == "skew":
            v = F.col("max_abs_skew")
            fail = F.coalesce(v > F.lit(float(t.max_deg)), false)
            return fail, F.lit("Skew angle too large")
        if n == "watermark":
            v = F.col("max_wm")
            fail = F.coalesce(v > F.lit(float(t.max_overlap)), false)
            return fail, F.format_string(
                "Watermark interference too high (FFT score: %.2f)", F.coalesce(v, F.lit(0.0))
            )
        if n == "text_density":
            v = F.col("td_ratio")
            fail = F.coalesce(
                ~((v >= F.lit(float(t.min_percent))) & (v <= F.lit(float(t.max_percent)))), false
            )
            return fail, F.format_string("Text density out of range (%.2f%%)", F.coalesce(v, F.lit(0.0)))
        if n == "noise":
            v = F.col("max_noise")
            fail = F.coalesce(v > F.lit(float(t.max_percent)), false)
            return fail, F.format_string("Noise level too high (max: %.2f%%)", F.coalesce(v, F.lit(0.0)))
        if n == "compression":
            v = F.col("min_ent")
            fail = F.coalesce(v < F.lit(float(t.min_entropy)), false)
            return fail, F.format_string(
                "Compression artifact detected (min_entropy: %.2f)", F.coalesce(v, F.lit(0.0))
            )
        if n == "missing_pages":
            v = F.col("min_ratio")
            fail = F.coalesce(v < F.lit(float(t.min_content_ratio)), false)
            return fail, F.format_string(
                "Page may be missing or blank (content ratio: %.2f%%)", F.coalesce(v, F.lit(0.0))
            )
        return false, F.lit("")  # unknown criterion name → implicit pass

    check_structs = []
    for i, c in enumerate(criteria):
        fail, reason = fail_and_reason(c)
        check_structs.append(
            F.struct(
                F.lit(i).alias("idx"),
                F.lit(c.type).alias("ctype"),
                fail.alias("fail"),
                reason.alias("reason"),
            )
        )
    checks = F.array(*check_structs)

    agg = agg.withColumn("checks", checks)
    first_req = F.array_min(
        F.transform(
            F.filter("checks", lambda x: x["fail"] & (x["ctype"] == F.lit(REQUIRED))),
            lambda x: x["idx"],
        )
    )
    agg = agg.withColumn("first_req", first_req)
    processed = F.filter(
        "checks", lambda x: F.col("first_req").isNull() | (x["idx"] <= F.col("first_req"))
    )
    reasons_fold = F.transform(
        F.filter(
            processed,
            lambda x: x["fail"]
            & ((x["ctype"] == F.lit(REQUIRED)) | (x["ctype"] == F.lit(RECOMMENDED))),
        ),
        lambda x: x["reason"],
    )
    warnings_fold = F.transform(
        F.filter(processed, lambda x: x["fail"] & (x["ctype"] == F.lit(WARNING))),
        lambda x: x["reason"],
    )

    empty_s = F.array().cast(_EMPTY_STR_ARR)
    has_err = F.col("ferr").isNotNull()
    err_msg = F.concat(F.lit("Critical error during evaluation: "), F.col("ferr.e"))
    no_media = F.col("n_media") == 0

    # CASE order mirrors the oracle: bypass → empty → error → fold
    accepted = (
        F.when(F.col("skip_checks"), F.lit(True))
        .when(F.col("n_spans") == 0, F.lit(False))
        .when(has_err, F.lit(False))
        .when(no_media, F.lit(True))
        .otherwise(F.col("first_req").isNull())
    )
    reasons = (
        F.when(F.col("skip_checks"), empty_s)
        .when(F.col("n_spans") == 0, F.array(F.lit(NO_IMAGES_MSG)))
        .when(has_err, F.array(err_msg))
        .when(no_media, empty_s)
        .otherwise(reasons_fold)
    )
    warnings = (
        F.when(F.col("skip_checks"), empty_s)
        .when((F.col("n_spans") == 0) | has_err | no_media, empty_s)
        .otherwise(warnings_fold)
    )
    spans_out = F.when(
        ~F.col("skip_checks") & ((F.col("n_spans") == 0) | has_err),
        F.array().cast(_OUT_SPAN),
    ).otherwise(
        F.transform(
            "kept",
            lambda x, i: F.struct(
                x["kind"].alias("kind"),
                x["text"].alias("text"),
                x["media_ref"].alias("media_ref"),
                i.cast("int").alias("order"),
            ),
        )
    )

    out_cols = [
        F.col("doc_id"),
        accepted.alias("accepted"),
        reasons.alias("reasons"),
        warnings.alias("warnings"),
        spans_out.alias("spans"),
    ]
    if include_metrics_cols:
        out_cols += [
            F.col("n_spans"),
            F.col("n_media"),
            F.size(spans_out).alias("n_kept"),
            F.col("min_lap"),
            F.col("max_abs_skew"),
            F.col("max_noise"),
        ]
    return agg.select(*out_cols)


def assemble_main_content(result: DataFrame, sep: str = "\n") -> DataFrame:
    """Extraction result → the document's main-content TEXT: surviving text
    spans joined in order, with media placeholders elided. Pure Column
    expressions over the already-ordered spans array."""
    text = F.array_join(
        F.transform(
            F.filter("spans", lambda s: s["kind"] == F.lit("text")),
            lambda s: s["text"],
        ),
        sep,
    )
    n_media_kept = F.size(F.filter("spans", lambda s: s["kind"] == F.lit("media")))
    return result.select(
        "doc_id",
        "accepted",
        text.alias("main_text"),
        F.length(text).alias("n_chars"),
        n_media_kept.alias("n_media_kept"),
    )
