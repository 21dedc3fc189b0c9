"""Driver-contract regression: every queries() entry matches its oracle_sql()
on DuckDB at sf0.001 (the driver's own check runs at sf0.01 — same shape)."""

import importlib.util
import os

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entry_mod():
    os.environ["SPARK_GRAFT_ORACLE_SF"] = SF  # IVF oracle centroids per-sf
    path = os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("__spark_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in ["documents", "lineitem", "events", "embeddings", "orders", "customer", "part", "supplier", "nation", "region"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


@pytest.mark.slow
def test_all_queries_match_duckdb(spark, entry_mod, ducks):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    mismatches = []
    for name, fn in qs.items():
        if name not in oracles:
            continue
        sdf = fn(spark, SF).toPandas()
        odf = ducks.execute(oracles[name]).df()
        cols = sorted(sdf.columns)
        if cols != sorted(odf.columns):
            mismatches.append((name, "columns", list(sdf.columns), list(odf.columns)))
            continue
        sdf = sdf[cols].sort_values(cols).reset_index(drop=True)
        odf = odf[cols].sort_values(cols).reset_index(drop=True)
        if sdf.shape != odf.shape:
            mismatches.append((name, "shape", sdf.shape, odf.shape))
            continue
        for c in cols:
            a, b = sdf[c], odf[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                ok = np.allclose(
                    a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True
                )
            else:
                ok = (a.astype(str) == b.astype(str)).all()
            if not ok:
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    bad = ~np.isclose(
                        a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True
                    )
                else:
                    bad = (a.astype(str) != b.astype(str)).to_numpy()
                i = int(np.argmax(bad))
                mismatches.append(
                    (name, f"values:{c}", f"dtypes {a.dtype}/{b.dtype}",
                     f"row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r}")
                )
                break
    assert not mismatches, mismatches


def test_driver_window_carries_flagship_and_family_reps():
    """The driver's CORRECTNESS gate reports only the FIRST 50 queries()
    entries (dict order) — round-2 verdict item #1. Guard the ordering:
    the flagship extraction queries and one representative per operator
    family must sit inside positions 1-50, and every entry must have an
    oracle twin."""
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("__spark_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    names = list(mod.queries())
    window = set(names[:50])
    must = {
        # flagship
        "q90_extract_full", "q91_extract_metrics", "q92_main_content",
        # one per family (dedup, similarity, sketches, text, HTML, URLs,
        # BPE, CDC, joins, sampling, packing, graph, curation, phash)
        "q03_fingerprint_dedup", "q10_minhash_lsh_pairs", "q73_exact_substring",
        "q13_cosine_topk", "q46_pq_topk", "q35_hll_distinct",
        "q41_quantile_sketch", "q67_surprisal", "q63_html_main",
        "q66_host_stats", "q83_host_policy", "q74_bpe_merges",
        "q64_cdc_upsert", "q36_asof_join", "q77_mixture_sample",
        # graph-family rep rotated q56_pagerank -> q242_label_prop in r5
        "q49_sequence_packing", "q242_label_prop",
        "q76_phash_near_dup",
        # quality/classification/importance families (round 3);
        # q93 (curation v4) supersedes q79 (v3) as the curation rep —
        # v3 rides positions 51+ under the CHECKS.md audit
        "q84_quality_classifier", "q89_gopher_filter", "q93_curation_v4",
        "q94_dsir_resample", "q98_bm25_search",
        # round-3 third-session families: bigram LM, sketch-verify
        # composite, curriculum ordering (q11/q58/q70 — whose families
        # stay repped by q10/q73, q13/q46/q78, q66/q83 — ride 51+);
        # q132 (budget select) took the curriculum-family seat from q126
        # in the round-4 rotation
        "q121_bigram_lm", "q124_heavy_hitters", "q132_budget_select",
    }
    missing = must - window
    assert not missing, f"family reps fell out of the driver window: {missing}"
    # rotation policy (VERDICT r3 #6, re-pinned r4): ~15 window seats swap
    # with their positions-51+ family siblings each round so every entry
    # cycles through the driver's hard gate; this pins the r5 rotation
    # actually happened (>= 15 entries not in the r4 window, which is the
    # key order of CORRECTNESS_r04.json)
    r4_window = {
        "q90_extract_full", "q91_extract_metrics", "q92_main_content",
        "q52_normalize_text", "q116_readability", "q03_fingerprint_dedup",
        "q04_agg_modes", "q05_verdict_fold", "q123_incremental_dedup",
        "q07_reassembly", "q08_metrics_rollup", "q10_minhash_lsh_pairs",
        "q121_bigram_lm", "q105_simhash_pairs", "q100_soft_dedup",
        "q110_fim_split", "q134_preference_pairs", "q73_exact_substring",
        "q13_cosine_topk", "q119_ann_recall", "q46_pq_topk",
        "q124_heavy_hitters", "q111_d4_prune", "q76_phash_near_dup",
        "q135_trim_repeats", "q114_fuzzy_decontam", "q35_hll_distinct",
        "q130_stopgram_blocklist", "q41_quantile_sketch",
        "q42_bloom_decontam", "q43_count_min", "q75_bpe_tokenize",
        "q67_surprisal", "q120_phrase_search", "q63_html_main",
        "q66_host_stats", "q132_budget_select", "q83_host_policy",
        "q74_bpe_merges", "q64_cdc_upsert", "q84_quality_classifier",
        "q89_gopher_filter", "q93_curation_v4", "q94_dsir_resample",
        "q59_session_attribution", "q36_asof_join", "q49_sequence_packing",
        "q77_mixture_sample", "q56_pagerank", "q98_bm25_search",
    }
    assert len(window - r4_window) >= 15, (
        f"rotation regressed: only {len(window - r4_window)} window entries "
        "are new vs round 4"
    )
    oracles = set(mod.oracle_sql())
    assert set(names) == oracles, (
        f"registry/oracle mismatch: {set(names) ^ oracles}"
    )
