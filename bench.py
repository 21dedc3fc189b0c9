"""Benchmark harness — prints ONE JSON line with per-query seconds.

Input scale follows $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1);
parallelism follows $SPARK_GRAFT_CPUS (default: all cores). The flagship
``extract`` query runs the full extraction pipeline over a spans corpus
derived from the sf_dir documents table plus a cached pool of DISTINCT
payload pages (unique media is the production-representative regime: kernel
work scales with media spans). Remaining queries are the driver-contract
headliners over the raw sf_dir tables.

Scaling evidence (north_rule: ≥0.8 efficiency N→4N) is produced by
``scripts/scaling_bench.py`` which runs this file at two parallelism levels
on the SAME input and writes BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # cwd-independent

BENCH_SIZE = (512, 640)  # (w, h) of bench payload pages
MAX_PAYLOADS = 12288
DOC_REPLICATION = 4  # replicas of the documents table → more docs + spans
PAYLOADS_PER_FILE = 64  # pre-split payload dataset → scan-parallel, no shuffle


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _gen_payload_part(args) -> str:
    """Generate one payload parquet part (runs in a worker process)."""
    part_idx, start, count, w, h, out_dir = args
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from document_quality_assessment_ocr_spark import png as pngmod
    from document_quality_assessment_ocr_spark.sources import fixtures

    prows = []
    for i in range(start, start + count):
        rng = np.random.default_rng(42 + i)  # per-payload seed → order-free
        kind = i % 20
        if kind < 16:
            arr = fixtures.draw_text_page(rng, w=w, h=h)
        elif kind == 16:
            arr = fixtures.salt_pepper(rng, fixtures.draw_text_page(rng, w=w, h=h))
        elif kind == 17:
            arr = fixtures.gaussian_blur(fixtures.draw_text_page(rng, w=w, h=h), 5.0)
        elif kind == 18:
            arr = fixtures.rotate_nearest(fixtures.draw_text_page(rng, w=w, h=h), 4.0)
        else:
            arr = fixtures.periodic_dot_comb(h, w)
        prows.append(
            {
                "media_ref": f"p{i:05d}",
                "width": int(arr.shape[1]),
                "height": int(arr.shape[0]),
                "dpi": 200,
                "png": pngmod.encode_gray(arr, dpi=200),
            }
        )
    path = os.path.join(out_dir, f"part-{part_idx:04d}.parquet")
    pq.write_table(pa.Table.from_pylist(prows, schema=fixtures.PAYLOADS_SCHEMA), path)
    return path


def build_bench_corpus(sf_dir: str, cache_root: str) -> str:
    """Derive (spans, payloads) parquet from sf_dir/documents.parquet +
    seeded distinct pages; cached on disk keyed by sf dir name. Payloads are
    written as MANY small files so the Spark scan is naturally split (the
    production Iceberg scan would be too) — no repartition shuffle needed."""
    from multiprocessing import Pool

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from document_quality_assessment_ocr_spark.sources import fixtures

    key = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out_dir = os.path.join(
        cache_root, f"bench_{key}_{BENCH_SIZE[0]}x{BENCH_SIZE[1]}_v2"
    )
    spans_path = os.path.join(out_dir, "documents_spans.parquet")
    pay_dir = os.path.join(out_dir, "media_payloads")
    done_marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(done_marker):
        return out_dir
    os.makedirs(pay_dir, exist_ok=True)

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    doc_ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    n_base = len(doc_ids)
    n_docs = n_base * DOC_REPLICATION
    n_pay = max(64, min(MAX_PAYLOADS, n_docs))
    n_pay -= n_pay % PAYLOADS_PER_FILE
    w, h = BENCH_SIZE

    log(f"[bench] generating {n_pay} distinct payloads ({w}x{h}) for {n_docs} docs ...")
    t0 = time.time()
    parts = [
        (p, p * PAYLOADS_PER_FILE, PAYLOADS_PER_FILE, w, h, pay_dir)
        for p in range(n_pay // PAYLOADS_PER_FILE)
    ]
    with Pool(min(16, os.cpu_count() or 4)) as pool:
        pool.map(_gen_payload_part, parts)
    log(f"[bench] payloads done in {time.time()-t0:.1f}s")

    t0 = time.time()
    rng2 = np.random.default_rng(7)
    srows = []
    pick = rng2.integers(0, n_pay, size=(n_docs, 2))
    j = 0
    for rep in range(DOC_REPLICATION):
        for did, text in zip(doc_ids, texts):
            text = text or ""
            third = max(1, len(text) // 3)
            spans = [
                {"kind": "text", "text": text[:third], "media_ref": "", "offset": 0},
                {"kind": "media", "text": "", "media_ref": f"p{pick[j,0]:05d}", "offset": third},
                {"kind": "text", "text": text[third : 2 * third], "media_ref": "", "offset": third + 1},
                {"kind": "media", "text": "", "media_ref": f"p{pick[j,1]:05d}", "offset": 2 * third + 2},
                {"kind": "text", "text": text[2 * third :], "media_ref": "", "offset": 2 * third + 3},
            ]
            srows.append(
                {"doc_id": f"{did}_{rep}", "skip_checks": False, "ingest_seq": j, "spans": spans}
            )
            j += 1
    pq.write_table(pa.Table.from_pylist(srows, schema=fixtures.SPANS_SCHEMA), spans_path)
    log(f"[bench] spans done in {time.time()-t0:.1f}s")
    with open(done_marker, "w") as f:
        f.write("ok")
    return out_dir


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    # SPARK_GRAFT_MASTER overrides the master URL — scaling_bench uses
    # local-cluster[N,c,mem] to model N separate executors (north_rule runs
    # at two cluster sizes); cpus then means TOTAL cores for sizing
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    repo = os.path.dirname(os.path.abspath(__file__))
    cache_root = os.path.join(repo, ".bench_cache")
    corpus_dir = build_bench_corpus(sf_dir, cache_root)

    from document_quality_assessment_ocr_spark.plans.pipeline import run_extraction
    from document_quality_assessment_ocr_spark.session import get_spark
    from document_quality_assessment_ocr_spark.sources import tables

    spark = get_spark(
        app_name=f"bench[{cpus}]",
        master=master,
        shuffle_partitions=max(2 * cpus, 8),
        # one scan partition per payload part-file (the files are ~0.4 MB;
        # default openCost would bin-pack them into too few splits to keep
        # the kernel UDF busy on all cores)
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(1024 * 1024),
            "spark.sql.files.openCostInBytes": str(64 * 1024),
        },
    )

    # warm up executor python workers with a REAL kernel batch (worker
    # processes import numpy + the kernels module on their first task; that
    # one-time cost is not steady-state throughput)
    from pyspark.sql import functions as F

    from document_quality_assessment_ocr_spark.plans.pipeline import score_payload_table

    warm_pay = tables.read_payloads(spark, os.path.join(corpus_dir, "media_payloads"))
    score_payload_table(warm_pay.limit(2 * cpus).repartition(2 * cpus)).select(
        F.count("ms.lap_var")
    ).collect()

    timings: dict[str, float] = {}
    sink = os.path.join(cache_root, "bench_out")

    def timed(name, fn, reps: int = 2):
        # best-of-N: the sandbox host has noisy neighbors (identical queries
        # measured 0.2s..60s); min is the least-contended observation
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        log(f"[bench] {name}: {timings[name]}s")

    spans = tables.read_spans(spark, os.path.join(corpus_dir, "documents_spans.parquet"))
    pay = tables.read_payloads(spark, os.path.join(corpus_dir, "media_payloads"))
    n_docs = spans.count()

    def run_extract():
        shutil.rmtree(sink, ignore_errors=True)
        run_extraction(spans, pay, assume_unique_doc_ids=True).write.mode(
            "overwrite"
        ).parquet(sink)

    # cold includes whole-stage-codegen JIT of the fold expressions (a fixed
    # per-query cost, not throughput); steady-state is the headline number
    timed("extract_cold", run_extract, reps=1)
    timed("extract", run_extract, reps=2)

    # scaling sweeps only consume the extract throughput — let them skip
    # the (now 50+ query) per-operator timing tail (SPARK_GRAFT_SKIP_QUERIES=1)
    if os.environ.get("SPARK_GRAFT_SKIP_QUERIES") == "1":
        docs_per_sec = round(n_docs / timings["extract"], 2)
        print(json.dumps({
            "metric": "docs_per_sec_extraction",
            "value": docs_per_sec,
            "unit": "docs/sec",
            "queries": timings,
            "sf": sf_dir,
            "cpus": cpus,
            "master": master,
            "n_docs": n_docs,
        }), flush=True)
        spark.stop()
        return

    # driver-contract headliners on the raw sf tables
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(repo, "__spark_entry__.py")
    )
    se = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(se)
    qs = se.queries()

    # persist-once cluster artifact (round-3 verdict #4): the q31 iterative
    # CC loop is shared by the clustering composites (q100/q111/q117/q134);
    # time the loop ONCE as its own line, then time q134's consumer stage
    # against the persisted assignment — each line now reads as its own cost
    # (a real deployment persists the assignment table exactly like this)
    from pyspark.sql import functions as F2

    from document_quality_assessment_ocr_spark.operators.dedup import (
        duplicate_clusters,
    )

    docs_tbl = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        F2.col("doc_id").cast("long").alias("doc_id"), "text"
    )

    def run_cluster_loop():
        duplicate_clusters(docs_tbl, n_hashes=8, bands=4).write.mode(
            "overwrite"
        ).format("noop").save()

    timed("q31_cluster_loop", run_cluster_loop)
    clustered = duplicate_clusters(docs_tbl, n_hashes=8, bands=4).persist()
    clustered.count()  # materialize the artifact outside any timed line

    def run_q134():
        se._q_preference_pairs(spark, sf_dir, clustered=clustered).write.mode(
            "overwrite"
        ).format("noop").save()

    timed("q134_preference_pairs", run_q134)

    def run_q243():
        se._q_ess(spark, sf_dir, clustered=clustered).write.mode(
            "overwrite"
        ).format("noop").save()

    timed("q243_ess_weights", run_q243)
    clustered.unpersist()

    # streaming sketch throughput (round-3 verdict #8): the CMS incremental
    # twin over the sf corpus split into 8 micro-batch files — per-batch
    # partial + merge into the versioned sketch state, availableNow
    from document_quality_assessment_ocr_spark.streaming.sketches import (
        stream_count_min,
    )

    stream_in = os.path.join(cache_root, "bench_stream_in")
    if not os.path.exists(os.path.join(stream_in, "_SUCCESS")):
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
            F2.col("doc_id").cast("long").alias("doc_id"),
            F2.lit("2026-01-01").cast("timestamp").alias("ts"),
            "text",
        ).repartition(8).write.mode("overwrite").parquet(stream_in)

    def run_stream_cms():
        ck = os.path.join(cache_root, "bench_stream_ckpt")
        sk = os.path.join(cache_root, "bench_stream_sketch")
        shutil.rmtree(ck, ignore_errors=True)
        shutil.rmtree(sk, ignore_errors=True)
        stream_count_min(spark, stream_in + "/*.parquet", ck, sk)

    timed("stream_cms_sketch", run_stream_cms)

    # q25 rejoined the timed set in round 3: word-shingle minhash (5-10×
    # fewer md5s) + 4×4 banding + 0.8 verify → ~3 s warm at sf0.1 (was 87 s
    # in its r02 char/0.3 form)
    for name in (
        "q01_text_density",
        "q25_lsh_jaccard",
        "q03_fingerprint_dedup",
        "q04_agg_modes",
        "q07_reassembly",
        "q27_sessionize",
        "q33_repetition",
        "q36_asof_join",
        "q40_chunk_dedup",
        "q42_bloom_decontam",
        "q45_curation_v2",
        "q46_pq_topk",
        "q49_sequence_packing",
        "q63_html_main",
        "q64_cdc_upsert",
        "q67_surprisal",
        "q73_exact_substring",
        "q79_curation_v3",
        "q84_quality_classifier",
        "q85_temperature_mixture",
        "q86_snapshot_diff",
        "q87_line_dedup",
        "q88_c4_filter",
        "q89_gopher_filter",
        "q93_curation_v4",
        "q94_dsir_resample",
        "q98_bm25_search",
        "q102_rrf_hybrid",
        "q103_chunk_profile",
        "q104_corpus_line_dedup",
        "q105_simhash_pairs",
        "q106_unimax_sample",
        "q107_prototype_prune",
        "q109_ngram_novelty",
        "q110_fim_split",
        "q111_d4_prune",
        "q112_k_anonymize",
        "q113_hard_negatives",
        "q114_fuzzy_decontam",
        "q116_readability",
        "q118_window_chunks",
        "q119_ann_recall",
        "q120_phrase_search",
        "q121_bigram_lm",
        "q122_edit_pairs",
        "q123_incremental_dedup",
        "q124_heavy_hitters",
        "q125_vocab_growth",
        "q126_curriculum",
        "q127_anchor_index",
        "q128_exact_k_sample",
        "q129_shard_checksums",
        "q130_stopgram_blocklist",
        "q131_host_pagerank",
        "q132_budget_select",
        "q133_chat_spans",
        "q135_trim_repeats",
        "q136_ict_pairs",
        "q137_audio_rms",
        "q138_video_frames",
        "q139_blocklist_gate",
        "q140_weighted_sample",
        "q141_hll_overlap",
        "q142_span_corruption",
        "q143_bt_strength",
        "q144_kneser_ney",
        "q145_rho1_select",
        "q146_binary_topk",
        "q147_zorder_layout",
        "q148_matryoshka_topk",
        "q149_hits",
        "q150_borda_ensemble",
        "q151_fragment_stitch",
        "q152_template_expand",
        "q153_group_percentile",
        "q154_png_chunks",
        "q155_mw_weights",
        "q156_token_drift",
        "q157_video_scenes",
        "q158_zone_map",
        "q159_distinct_n",
        "q160_triangles",
        "q161_containment",
        "q162_skew_audit",
        "q163_pmi",
        "q164_funnel",
        "q165_retention",
        "q166_transitions",
        "q167_posting_size",
        "q168_emb_profile",
        "q169_audio_quality",
        "q170_join_explain",
        "q171_encoding_advisor",
        "q172_reciprocity",
        "q173_kcore",
        "q174_calibration",
        "q175_tfidf_keywords",
        "q176_degree_hist",
        "q177_gap_hist",
        "q178_source_overlap",
        "q179_prefix_compression",
        "q180_quality_joint",
        "q181_char_classes",
        "q182_anchor_diversity",
        "q183_event_bursts",
        "q184_props_stats",
        "q185_rendezvous",
        "q186_dup_closure",
        "q187_url_depth",
        "q188_two_hop",
        "q189_field_consistency",
        "q190_source_surprisal",
        "q191_l_diversity",
        "q192_boilerplate",
        "q194_annotator_agreement",
        "q195_vocab_health",
        "q196_mirror_hosts",
        "q197_event_transitions",
        "q198_snapshot_churn",
        "q199_span_integrity",
        "q200_ab_lift",
        "q201_compression_quality",
        "q202_ks_drift",
        "q203_bootstrap_ci",
        "q204_html_tables",
        "q205_kcenter_coreset",
        "q206_rr_release",
        "q207_pca_project",
        "q208_lang_confusion",
        "q209_threshold_sweep",
        "q210_text_segments",
        "q211_concentration",
        "q212_entity_extract",
        "q213_bitext_margin",
        "q214_banding_selectivity",
        "q215_isotropy",
        "q216_cuped_lift",
        "q217_encoding_quality",
        "q218_quota_apportion",
        "q219_benford",
        "q220_scrub_effect",
        "q221_zipf_fit",
        "q222_chisq_grid",
        "q223_mad_outliers",
        "q224_pareto_frontier",
        "q225_year_coverage",
        "q226_quantile_map",
        "q227_cocitation",
        "q228_vocab_coverage",
        "q229_burstiness",
        "q230_gini",
        "q231_rfm_segments",
        "q232_stickiness",
        "q233_rank_concordance",
        "q234_filter_attribution",
        "q235_assortativity",
        "q236_winsorized_mean",
        "q237_mmr_rerank",
        "q238_auc",
        "q239_pr_sweep",
        "q240_centroid_drift",
        "q241_daily_autocorr",
        "q242_label_prop",
        "q244_simpson_diversity",
        "q245_assoc_rules",
        "q246_local_clustering",
        "q247_ndcg",
        "q248_mrr",
        "q249_keep_effect_size",
        "q250_zipf_slope",
        "q251_mcnemar_filters",
        "q252_kaplan_meier",
        "q253_mann_kendall",
        "q254_textrank",
        "q255_psi_drift",
        "q256_conductance",
        "q257_modularity",
        "q258_bpe_fertility",
        "q259_sqrt_mixture",
        "q260_prf_expansion",
        "q261_jpeg_profile",
        "q262_silhouette",
        "q263_hoover",
        "q264_reencode_dedup",
    ):
        timed(name, lambda name=name: qs[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save())

    docs_per_sec = round(n_docs / timings["extract"], 2)
    out = {
        "metric": "docs_per_sec_extraction",
        "value": docs_per_sec,
        "unit": "docs/sec",
        "queries": timings,
        "sf": sf_dir,
        "cpus": cpus,
        "master": master,
        "n_docs": n_docs,
    }
    spark.stop()
    print(json.dumps(out), flush=True)
    # The driver captures a bounded tail of stdout; with 150+ per-query lines the
    # full JSON line above can fall off the buffer and lose the headline (r4
    # lesson: BENCH_r04.json had no "value"). Persist the full record to a file
    # and emit a compact summary as the LAST line so a tail capture always
    # parses a headline.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_full.json"), "w") as f:
            json.dump(out, f)
    except OSError:
        pass
    summary = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "sf": out["sf"],
        "cpus": cpus,
        "n_docs": n_docs,
        "n_queries": len(timings),
        "extract_sec": timings.get("extract"),
        "full_record": "BENCH_full.json",
    }
    print("RESULT_SUMMARY " + json.dumps(summary), flush=True)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
