import sys
sys.path.insert(0, '/root/repo')
import importlib.util
spec = importlib.util.spec_from_file_location('e', '/root/repo/__spark_entry__.py')
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
from document_quality_assessment_ocr_spark.session import get_spark
spark = get_spark(master='local[4]')
sf = '/root/testdata/sf0.001'
qs = m.queries()

PICK = {
 'q90_extract_full': 'flagship extraction (spans+payloads -> verdicts)',
 'q63_html_main': 'HTML main-content extraction',
 'q64_cdc_upsert': 'CDC MERGE',
 'q10_minhash_lsh_pairs': 'MinHash-LSH candidate pairs',
 'q25_lsh_jaccard': 'word-shingle LSH + exact-jaccard verify',
 'q13_cosine_topk': 'two-level exact cosine top-k',
 'q49_sequence_packing': 'distributed two-level prefix sum',
 'q67_surprisal': 'unigram surprisal',
 'q73_exact_substring': 'ExactSubstr dedup',
 'q98_bm25_search': 'fixed-point BM25 (panel-pushed postings, two-level top-k)',
 'q103_chunk_profile': 'content-defined chunking dedup profile',
 'q93_curation_v4': 'FineWeb-shape curation composite v4',
 'q94_dsir_resample': 'DSIR importance resampling (map-side literal tables)',
 'q102_rrf_hybrid': 'RRF fusion of BM25 + hash-dot rank lists',
 'q120_phrase_search': 'positional phrase search (term-filtered postings, one exchange)',
 'q121_bigram_lm': 'interpolated bigram LM (Zipf-bounded model joins)',
 'q124_heavy_hitters': 'CMS-propose/exact-verify heavy hitters (map-side literal-map filter)',
 'q126_curriculum': 'window-free global curriculum rank (bucket-partitioned window only)',
 'q131_host_pagerank': 'host-graph PageRank (host-cardinality iterations)',
 'q132_budget_select': 'token-budget selection (bucket-partitioned running SUM only)',
 'q133_chat_spans': 'chat render + loss-mask spans (one conversation-keyed exchange)',
 'q136_ict_pairs': 'ICT pretext pairs (zero-shuffle codegen projection)',
 'q111_d4_prune': 'D4 prune (scaled k-means cells, Arrow-vectorized assignment + pair cosine)',
 'q138_video_frames': 'Y4M video frame sampling (real decode in mapInPandas, broadcast stats join)',
 'q139_blocklist_gate': 'bad-word blocklist gate (literal InSet, zero-shuffle projection)',
 'q140_weighted_sample': 'weighted priority sample (two-level top-k, no corpus sort)',
 'q141_hll_overlap': 'HLL corpus overlap (256-register exchange, single-row fold)',
 'q142_span_corruption': 'T5 span corruption (zero-shuffle codegen projection)',
 'q143_bt_strength': 'Bradley-Terry MM strengths (edge-table iterations)',
 'q147_zorder_layout': 'Morton z-order layout key (zero-shuffle codegen projection)',
 'q148_matryoshka_topk': 'Matryoshka prefix-dim coarse + full-dim exact rerank (two-level top-m)',
 'q149_hits': 'HITS hubs/authorities (weighted-edge iterations, checkpointed)',
 'q150_borda_ensemble': 'Borda rank fusion (bucket-partitioned windows only)',
 'q151_fragment_stitch': 'crawl-fragment stitching (capped boundary-key equi-join)',
 'q152_template_expand': 'instruction-template expansion (zero-shuffle codegen projection)',
 'q153_group_percentile': 'per-group percentile (group+bucket windows, no per-group reducer)',
 'q154_png_chunks': 'PNG container profiling (mapInPandas byte-walk, broadcast stats join)',
 'q155_mw_weights': 'MW domain reweighting (one corpus aggregate, O(domains) rounds)',
 'q156_token_drift': 'TVD corpus drift monitor (token-dim merge, two-level top-k)',
 'q157_video_scenes': 'video scene profile (mapInPandas hashes, bounded lag window)',
 'q158_zone_map': 'zone-map pruning audit (one bucket agg, explode fanout)',
 'q159_distinct_n': 'distinct-n diversity (tagged-struct explode, two-level agg)',
 'q160_triangles': 'degree-oriented triangle counting (sqrt(m)-bounded wedge joins)',
 'q161_containment': 'asymmetric containment dedup (banded candidates, pair-keyed intersection)',
 'q162_skew_audit': 'partition-skew pre-flight (one key agg, grid explode)',
 'q163_pmi': 'whole-bit PMI collocations (Zipf-shrunk joins, two-level top-k)',
 'q164_funnel': 'ordered funnel (user-bounded level joins, grid-bounded step windows)',
 'q165_retention': 'cohort retention matrix (per-user min + distinct-period join)',
 'q166_transitions': 'Markov transition matrix (one lag exchange, types^2 rollup)',
 'q167_posting_size': 'Elias-gamma index-size planner (df-banded per-term gap windows)',
 'q168_emb_profile': 'per-dim embedding profile (one posexplode agg, truncated micro fixed point)',
 'q169_audio_quality': 'audio silence/clip gate (mapInPandas shared-int profile, broadcast join)',
 'q170_join_explain': 'join-explosion pre-flight (per-key count merge, two-level top-k)',
 'q171_encoding_advisor': 'column-encoding planner (Zipf-shrunk value pass per column)',
 'q172_reciprocity': 'host link reciprocity (swapped-key equi-join, node-bounded rollups)',
 'q173_kcore': 'bounded-round k-core peel (checkpointed edges, per-round semijoins)',
 'q174_calibration': 'classifier calibration audit (shared gram fold, constant-grid rollup)',
 'q175_tfidf_keywords': 'per-doc TF-IDF keywords (fused integer RSJ, per-doc window)',
 'q176_degree_hist': 'log2 degree histogram (node-bounded agg, <=64-row rollup)',
 'q177_gap_hist': 'inter-event gap histogram (per-user lag window, log2 rollup)',
 'q178_source_overlap': 'cross-source shingle overlap matrix (hash equi-join, |sources|^2 out)',
 'q179_prefix_compression': 'URL front-coding planner (per-host window, capped LCP)',
 'q180_quality_joint': 'length x quality joint histogram (one projection, grid rollup)',
 'q181_char_classes': 'char-class profile (codegen strip counts, source rollup)',
 'q182_anchor_diversity': 'anchor diversity (pair agg then host rollup, no countDistinct expand)',
 'q183_event_bursts': 'retry-storm detector (per-user double lag, type rollup)',
 'q184_props_stats': 'JSON props rollup (map-side path eval, type rollup)',
 'q185_rendezvous': 'HRW reshard matrix (map-side greatest-of-md5, grid rollup)',
 'q186_dup_closure': 'dup-graph wedge closure (banded pairs, degree-oriented triangles)',
 'q187_url_depth': 'URL depth x extension profile (map-side parse, grid rollup)',
 'q188_two_hop': 'two-hop reach (hub-capped wedge join, distinct union)',
 'q189_field_consistency': 'cross-field validator (one projection, source rollup)',
 'q190_source_surprisal': 'per-source surprisal (token join, source rollup)',
 'q191_l_diversity': 'l-diversity audit (one agg with exact distinct per cohort)',
 'q192_boilerplate': 'boilerplate share (distinct shingles, df join, per-doc rollup)',
 'q194_annotator_agreement': "Cohen's kappa (base agg + class-marginal join, group-bounded)",
 'q195_vocab_health': 'vocab health (one (source,token) agg, source rollup)',
 'q196_mirror_hosts': 'mirror hosts (heavy-path cap before self-join, pair agg)',
 'q197_event_transitions': 'Markov transitions (per-user lag window, grid + marginal join)',
 'q198_snapshot_churn': 'snapshot churn (full-outer hash diff, grid rollup)',
 'q199_span_integrity': 'span integrity audit (per-doc lag window, reused exchange rollup)',
 'q200_ab_lift': 'A/B lift report (variant agg, broadcast control row)',
 'q201_compression_quality': 'zlib quality panel (one Arrow mapInPandas pass, no shuffle)',
 'q202_ks_drift': 'two-sample KS statistic (bucket-grid agg, grid-only windows)',
 'q203_bootstrap_ci': 'Poisson-bootstrap CI (x32 explode, grid agg, bounded sort)',
 'q204_html_tables': 'HTML table extraction (map-side double posexplode, no exchange)',
 'q205_kcenter_coreset': 'k-center coreset (checkpointed quantized base, k 1-row argmax rounds)',
 'q207_pca_project': 'exact-stats PCA (mapInPandas Gram partials, literal projection)',
 'q209_threshold_sweep': 'dedup threshold sweep (banded pairs x bounded threshold grid)',
 'q210_text_segments': 'TextTiling segmentation (map-side block arrays, no exchange)',
 'q212_entity_extract': 'typed entity extraction (per-type regexp explode union, map-side)',
 'q213_bitext_margin': 'margin-criterion bitext mining (broadcast panel, two-level top-k)',
 'q214_banding_selectivity': 'LSH banding-selectivity planner (bucket-count grid, no pairs)',
 'q215_isotropy': 'embedding isotropy audit (posexplode grid, 1-row rollup, pair-free)',
 'q216_cuped_lift': 'CUPED adjusted lift (two corpus aggs, broadcast pooled+control rows)',
 'q217_encoding_quality': 'encoding-corruption audit (codegen regexp counts, one agg)',
 'q218_quota_apportion': 'Hamilton quota apportionment (grid agg + grid-only windows)',
 'q219_benford': 'Benford first-digit audit (one agg to groups x 9 grid, grid windows)',
 'q220_scrub_effect': 'scrub-effectiveness audit (one scan, 1-row agg, 3-row stack)',
}
out = []
out.append("""# PLANS — captured physical plans (sf0.001)

Auto-generated by scripts/gen_plans.py (re-run after plan-shape changes).
What to look for, per the SCALE.md claims: `Exchange hashpartitioning`
count (the shuffles), `BroadcastExchange`/`BroadcastHashJoin` (small
sides shipped, not shuffled), `PushedFilters`/`ReadSchema` on scans
(pushdown + pruning).

Each query is captured TWICE:

* **AQE off** — the static plan; its `Exchange hashpartitioning` count
  is the plan's intrinsic all-to-all count (the number a 1000-executor
  run pays), with no QueryStage wrappers to misread. This is the
  headline number below.
* **AQE on** (the final executed `AdaptiveSparkPlan`) — shows the
  runtime join strategy. Its RAW exchange-line count is only an UPPER
  bound: when AQE replaces a sort-merge join with a broadcast join
  mid-flight, the already-materialized shuffle stages it bypassed still
  print under the new BroadcastHashJoin. Where the two counts differ,
  the AQE-off number is the honest one.
""")
for name, desc in PICK.items():
    # --- AQE off: the static plan, no QueryStage wrappers ---
    spark.conf.set('spark.sql.adaptive.enabled', 'false')
    df = qs[name](spark, sf)
    df.collect()
    plan_off = df._jdf.queryExecution().executedPlan().toString()
    nex_off = plan_off.count('Exchange hashpartitioning')
    nbc_off = plan_off.count('BroadcastExchange')

    # --- AQE on: final executed plan (collect() runs this Dataset's OWN
    # QueryExecution, so isFinalPlan=true) ---
    spark.conf.set('spark.sql.adaptive.enabled', 'true')
    df2 = qs[name](spark, sf)
    df2.collect()
    plan_on = df2._jdf.queryExecution().executedPlan().toString()
    plan_on = plan_on.split('== Initial Plan ==')[0]
    nex_on = plan_on.count('Exchange hashpartitioning')

    lines = []
    for ln in plan_off.splitlines():
        ln = ln.rstrip()
        if len(ln) > 110:
            ln = ln[:107] + '...'
        lines.append(ln)
        if len(lines) > 60:
            lines.append('   ... (truncated)')
            break
    out.append(
        f"## {name} — {desc}\n\n"
        f"live hash exchanges (AQE off): **{nex_off}**, broadcasts: **{nbc_off}**; "
        f"AQE-final raw exchange lines: {nex_on} (upper bound — bypassed "
        f"materialized stages still print)\n\n"
        "```\n" + "\n".join(lines) + "\n```\n"
    )
spark.conf.set('spark.sql.adaptive.enabled', 'true')
open('/root/repo/PLANS.md', 'w').write("\n".join(out))
print('RESULT written', len(PICK))
