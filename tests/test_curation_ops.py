"""Unit tests for the round-2 curation operators: repetition filters,
decontamination, HLL sketch, as-of join, deterministic sampling, top terms."""

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from document_quality_assessment_ocr_spark.operators.asof import asof_join
from document_quality_assessment_ocr_spark.operators.decontam import contamination_report
from document_quality_assessment_ocr_spark.operators.quality import (
    repetition_line_stats,
    repetition_report,
    top_ngram_stats,
)
from document_quality_assessment_ocr_spark.operators.sampling import (
    per_group_cap,
    stratified_sample,
)
from document_quality_assessment_ocr_spark.operators.sketches import hll_distinct
from document_quality_assessment_ocr_spark.operators.textstats import top_terms


# ---------------------------------------------------------------- repetition
def test_repetition_line_stats(spark):
    docs = spark.createDataFrame(
        [
            (1, "a\nb\na\n\nc"),      # lines a,b,a,c → 4 lines, 3 distinct
            (2, "x\ny"),               # no dups
            (3, ""),                   # no lines
            (4, None),                 # null text
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_line_stats(docs).collect()}
    assert rows[1]["n_lines"] == 4
    assert rows[1]["dup_line_frac"] == pytest.approx(1 - 3 / 4)
    # duplicated chars: the two 'a' lines = 2 of 4 total chars
    assert rows[1]["dup_line_char_frac"] == pytest.approx(0.5)
    assert rows[2]["dup_line_frac"] == 0.0
    assert rows[3]["n_lines"] == 0 and rows[3]["dup_line_char_frac"] == 0.0
    assert rows[4]["n_lines"] == 0


def test_top_ngram_stats(spark):
    docs = spark.createDataFrame(
        [
            (1, "to be or not to be"),  # 2-grams: "to be"×2, others ×1
            (2, "word"),               # < 2 words → no grams
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in top_ngram_stats(docs, n=2).collect()}
    assert rows[1]["top_gram"] == "to be"
    assert rows[1]["top_cnt"] == 2
    # dup chars = 2·5 ("to be"×2); all = 2·5 + 5+6+6 ("be or","or not","not to")
    assert rows[1]["dup_gram_char_frac"] == pytest.approx(10 / 27)
    assert rows[2]["top_gram"] is None and rows[2]["top_cnt"] == 0


def test_repetition_report_joins_both(spark):
    docs = spark.createDataFrame([(1, "a b a b"), (2, "x")], "doc_id long, text string")
    out = repetition_report(docs, n=2).collect()
    assert len(out) == 2
    r1 = next(r for r in out if r["doc_id"] == 1)
    assert r1["top_gram"] == "a b" and r1["n_lines"] == 1


# --------------------------------------------------------------- decontam
def test_contamination_report_planted_overlap(spark):
    eval_set = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (1, "prefix alpha beta gamma delta epsilon suffix"),  # shares 5-grams
            (2, "completely different words here entirely now"),
            (3, "alpha beta gamma delta epsilon zeta extra"),      # shares 2 distinct
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["n_shared_shingles"] for r in contamination_report(train, eval_set, n=5).collect()}
    assert rows[1] == 1      # "alpha beta gamma delta epsilon"
    assert 2 not in rows     # clean doc not emitted
    assert rows[3] == 2      # both eval 5-grams


# --------------------------------------------------------------- HLL sketch
def test_hll_register_arithmetic_matches_python(spark):
    df = spark.createDataFrame([("k", i) for i in range(50)], "key string, item long")
    out = hll_distinct(df, "key", "item", with_exact=True).collect()[0]
    # python recomputation of the same sketch
    regs = {}
    for i in range(50):
        h = hashlib.md5(str(i).encode()).hexdigest()
        reg = int(h[:2], 16)
        v = int(h[2:10], 16)
        rho = 33 if v == 0 else 33 - len(bin(v)[2:])
        regs[reg] = max(regs.get(reg, 0), rho)
    harmonic = sum(2.0 ** -r for r in regs.values()) + (256 - len(regs))
    assert out["n_hit_registers"] == len(regs)
    assert out["harmonic_sum"] == harmonic  # exact (powers of two)
    assert out["exact_distinct"] == 50


def test_hll_accuracy_within_bound(spark):
    # m=256 → standard error 1.04/√256 = 6.5%; allow 4σ on one draw
    n = 5000
    df = spark.createDataFrame([("k", f"u{i}") for i in range(n)], "key string, item string")
    out = hll_distinct(df, "key", "item").collect()[0]
    assert abs(out["raw_estimate"] - n) / n < 0.26


# --------------------------------------------------------------- as-of join
def test_asof_join_semantics(spark):
    right = spark.createDataFrame(
        [(1, 100, 10, 1.0), (1, 200, 11, 2.0), (2, 500, 12, 3.0)],
        "user_id long, t long, event_id long, value double",
    )
    left = spark.createDataFrame(
        [(1, 50, 900), (1, 100, 901), (1, 150, 902), (1, 250, 903), (2, 400, 904)],
        "user_id long, t long, event_id long",
    )
    out = {
        r["event_id"]: (r["asof_event_id"], r["asof_value"])
        for r in asof_join(left, right, "user_id", "t", ["event_id", "value"]).collect()
    }
    assert out[900] == (None, None)          # before any right row
    assert out[901] == (10, 1.0)             # tie: t=100 is included (≤)
    assert out[902] == (10, 1.0)
    assert out[903] == (11, 2.0)             # most recent, not first
    assert out[904] == (None, None)          # other key, right row is later


def test_asof_join_randomized_vs_bruteforce(spark):
    """Property check: the union+window plan equals the quadratic-scan
    definition on a random event mix (includes keys with only-left,
    only-right, interleaved ties)."""
    import random

    rnd = random.Random(1234)
    rights = [
        (u, rnd.randrange(0, 50) * 10, 1000 + i, float(i))
        for i, u in enumerate(rnd.choices(range(8), k=60))
    ]
    # unique per (key, t): keep max event_id like callers must
    best = {}
    for u, t, eid, v in rights:
        if (u, t) not in best or eid > best[(u, t)][0]:
            best[(u, t)] = (eid, v)
    rights_dedup = [(u, t, eid, v) for (u, t), (eid, v) in best.items()]
    lefts = [
        (u, rnd.randrange(0, 50) * 10 + rnd.choice([0, 5]), 2000 + i)
        for i, u in enumerate(rnd.choices(range(10), k=80))
    ]
    right = spark.createDataFrame(
        rights_dedup, "user_id long, t long, event_id long, value double"
    )
    left = spark.createDataFrame(lefts, "user_id long, t long, event_id long")
    got = {
        r["event_id"]: (r["asof_event_id"], r["asof_value"])
        for r in asof_join(left, right, "user_id", "t", ["event_id", "value"]).collect()
    }
    for u, t, eid in lefts:
        cands = [(rt, reid, rv) for (ru, rt, reid, rv) in rights_dedup if ru == u and rt <= t]
        exp = max(cands)[1:] if cands else (None, None)
        assert got[eid] == exp, (u, t, eid)


# --------------------------------------------------------------- sampling
def test_stratified_sample_deterministic_and_rate(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(2000)], "doc_id long, lang string"
    )
    out1 = stratified_sample(docs, "lang", {"en": 0.5, "de": 0.1}).collect()
    out2 = stratified_sample(docs, "lang", {"en": 0.5, "de": 0.1}).collect()
    assert sorted(r["doc_id"] for r in out1) == sorted(r["doc_id"] for r in out2)
    n_en = sum(1 for r in out1 if r["lang"] == "en")
    n_de = sum(1 for r in out1 if r["lang"] == "de")
    assert abs(n_en / 1000 - 0.5) < 0.08 and abs(n_de / 1000 - 0.1) < 0.05
    assert all(0.0 <= r["sample_u"] < 1.0 for r in out1)


def test_per_group_cap_matches_window_reference(spark):
    from pyspark.sql import Window

    docs = spark.createDataFrame(
        [(i, f"s{i % 7}") for i in range(300)], "doc_id long, source string"
    )
    got = per_group_cap(docs, "source", k=5)
    # reference implementation: global window over the same deterministic u
    from document_quality_assessment_ocr_spark.operators.sampling import md5_uniform

    w = Window.partitionBy("source").orderBy(md5_uniform(F.col("doc_id")), F.col("doc_id"))
    ref = (
        docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("source", "doc_id")
    )
    assert sorted(map(tuple, got.select("source", "doc_id").collect())) == sorted(
        map(tuple, ref.collect())
    )
    sizes = got.groupBy("source").count().collect()
    assert all(r["count"] == 5 for r in sizes)


# --------------------------------------------------------------- plan shapes
def test_decontam_plan_broadcasts_eval_side(spark):
    """The 100 TB contract: the training corpus streams through a broadcast
    of the (tiny) eval shingle set — no shuffle of train shingles before the
    join, and only one split() per scan side (tokens are materialized once,
    not re-derived per element_at)."""
    docs = spark.createDataFrame(
        [(i, "one two three four five six") for i in range(10)],
        "doc_id long, text string",
    )
    rep = contamination_report(docs.where("doc_id > 0"), docs.where("doc_id = 0"))
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("split(") == 2, plan


def test_stratified_sample_plan_no_shuffle(spark):
    docs = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    plan = (
        stratified_sample(docs, "lang", {"en": 0.5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_per_group_cap_plan_no_window(spark):
    docs = spark.createDataFrame([(1, "s")], "doc_id long, source string")
    plan = (
        per_group_cap(docs, "source", k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan, plan


def test_repetition_line_stats_plan_no_shuffle_single_split(spark):
    docs = spark.createDataFrame([(1, "a\nb")], "doc_id long, text string")
    plan = (
        repetition_line_stats(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert plan.count("split(") == 1, plan


# --------------------------------------------------------------- top terms
def test_top_terms_ranking(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana cherry"),
            (2, "banana banana cherry cherry date"),
        ],
        "doc_id long, text string",
    )
    out = [
        (r["doc_id"], r["rank"], r["term"], r["tf"], r["df"])
        for r in top_terms(docs, k=2).orderBy("doc_id", "rank").collect()
    ]
    # doc1: apple tf=2; banana/cherry tf=1 → df tie (both 2) → term asc
    assert out[0] == (1, 1, "apple", 2, 1)
    assert out[1] == (1, 2, "banana", 1, 2)
    # doc2: banana and cherry both tf=2, df=2 → term asc
    assert out[2] == (2, 1, "banana", 2, 2)
    assert out[3] == (2, 2, "cherry", 2, 2)


# --------------------------------------------------------------- chunk dedup
def test_chunk_dedup_first_occurrence_wins(spark):
    from document_quality_assessment_ocr_spark.operators.dedup import chunk_dedup

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),   # chunks: "a b c", "d e f" — both first
            (2, "a b c x y z"),   # "a b c" is doc 1's → dropped; "x y z" kept
            (3, ""),              # empty doc → one empty chunk
            (4, "x y z q r s"),   # "x y z" is doc 2's → dropped; "q r s" kept
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in chunk_dedup(docs, chunk_words=3).collect()}
    assert rows[1]["clean_text"] == "a b c d e f" and rows[1]["n_kept"] == 2
    assert rows[2]["clean_text"] == "x y z" and rows[2]["n_kept"] == 1
    assert rows[4]["clean_text"] == "q r s" and rows[4]["n_kept"] == 1
    assert rows[3]["n_total"] == 1  # empty doc keeps a row
    assert all(r["n_total"] == 2 for d, r in rows.items() if d != 3)


def test_chunk_dedup_plan_no_window_no_selfjoin(spark):
    """The winner per distinct chunk is an algebraic min-struct aggregate —
    no per-hash window, no join back to the exploded chunk table (the only
    join is the final per-doc re-attach)."""
    from document_quality_assessment_ocr_spark.operators.dedup import chunk_dedup

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = chunk_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert plan.count("Generate explode") <= 1, plan


# --------------------------------------------------- histogram quantile sketch
def test_histogram_quantiles_matches_numpy_within_cell(spark):
    from document_quality_assessment_ocr_spark.operators.sketches import (
        histogram_quantiles,
    )

    vals = [(i % 3, (i * 37) % 1000) for i in range(300)]
    df = spark.createDataFrame(vals, "k int, v int")
    out = histogram_quantiles(df, "k", "v", lo=0, hi=1024, n_bins=64, percents=[50, 99])
    rows = {(r["k"], r["p"]): r for r in out.collect()}
    import numpy as np

    for k in (0, 1, 2):
        data = np.array(sorted(v for kk, v in vals if kk == k))
        for p in (50, 99):
            exact = data[int(np.ceil(p / 100 * len(data))) - 1]
            r = rows[(k, p)]
            assert r["est_lo"] <= exact < r["est_hi"] + 16, (k, p, exact, r)
            assert r["n"] == len(data)


def test_histogram_quantiles_clamps_out_of_range(spark):
    from document_quality_assessment_ocr_spark.operators.sketches import (
        histogram_quantiles,
    )

    df = spark.createDataFrame([(1, -5), (1, 99999)], "k int, v int")
    rows = histogram_quantiles(df, "k", "v", 0, 1024, 64, [50, 99]).collect()
    assert {r["est_bin"] for r in rows} <= {0, 63}


# ---------------------------------------------------------------- bloom filter
def test_bloom_no_false_negatives_and_probe_plan(spark):
    from document_quality_assessment_ocr_spark.operators.bloom import (
        bloom_build,
        bloom_probe,
    )

    items = spark.createDataFrame([(f"item{i}",) for i in range(50)], "s string")
    bloom = bloom_build(items, "s", n_words=64, k=3)
    probes = spark.createDataFrame(
        [(f"item{i}",) for i in range(50)] + [(f"other{i}",) for i in range(200)],
        "s string",
    )
    out = bloom_probe(probes, "s", bloom, n_words=64, k=3)
    rows = {r["s"]: r["bloom_maybe"] for r in out.collect()}
    # every inserted item MUST pass (no false negatives)
    assert all(rows[f"item{i}"] for i in range(50))
    # most non-members must be rejected (m=2048 bits, 50 items, k=3 → fp ≪ 50%)
    fp = sum(rows[f"other{i}"] for i in range(200))
    assert fp < 40, f"false-positive rate implausibly high: {fp}/200"
    # the bitmap side is broadcast — the probe corpus never shuffles for it
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_bloom_prefilter_counts_bound_exact(spark):
    from document_quality_assessment_ocr_spark.operators.bloom import (
        bloom_prefilter_contamination,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),   # eval doc
            (1, "alpha beta gamma delta epsilon zeta"),   # fully contaminated
            (2, "one two three four five six seven"),     # clean
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in bloom_prefilter_contamination(
            docs.where(F.col("doc_id") > 0), docs.where(F.col("doc_id") == 0), n=5
        ).collect()
    }
    assert out[1]["exact_matches"] == out[1]["n_shingles"] == 2
    assert out[1]["bloom_candidates"] == 2  # no false negatives
    assert out[2]["exact_matches"] == 0
    assert out[2]["bloom_candidates"] >= out[2]["exact_matches"]


# ------------------------------------------------------------- count-min sketch
def test_count_min_overestimates_only_and_tight_for_heavy(spark):
    from document_quality_assessment_ocr_spark.operators.sketches import (
        count_min_estimate,
    )

    rows = [("heavy",)] * 500 + [(f"tail{i % 97}",) for i in range(300)]
    df = spark.createDataFrame(rows, "term string")
    out = {
        r["term"]: r
        for r in count_min_estimate(
            df, "term", probes=["heavy", "tail3", "absent"], with_exact=True
        ).collect()
    }
    for r in out.values():
        assert r["est"] >= r["exact"]  # CMS never underestimates
    assert out["heavy"]["exact"] == 500
    # ε = e/256 → overestimate ≤ ~9 on 800 items w.h.p.
    assert out["heavy"]["est"] - out["heavy"]["exact"] <= 25
    assert out["absent"]["exact"] == 0


# --------------------------------------------------------------- keep-best
def test_dedup_keep_best_longest_then_smallest_id(spark):
    from document_quality_assessment_ocr_spark.operators.dedup import dedup_keep_best

    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 7)], "doc_id long, n_chars long"
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4)], "doc_id long, cluster_id long"
    )
    rows = {r["cluster_id"]: r for r in dedup_keep_best(docs, clusters, "n_chars").collect()}
    assert rows[1]["keep_id"] == 2  # longest (30), tie → smaller id (2 < 3)
    assert rows[1]["best_n_chars"] == 30 and rows[1]["n_members"] == 3
    assert rows[4]["keep_id"] == 4 and rows[4]["n_members"] == 1
    plan = dedup_keep_best(docs, clusters, "n_chars")._jdf.queryExecution()
    assert "Window" not in plan.executedPlan().toString()


# ----------------------------------------------------------- curation v2
def test_curate_documents_v2_fates(spark):
    """Each drop reason fires on its named doc, and the filters chain over
    the CLEANED text: a doc whose repetitive chunk is owned by an earlier
    doc is judged only on what survived the strip."""
    from document_quality_assessment_ocr_spark.plans.curation import (
        curate_documents_v2,
    )

    rep20 = " ".join(["spam", "ham"] * 10)           # 20 words, all 2-grams dup
    uniq20 = " ".join(f"w{i:02d}" for i in range(20))  # 20 distinct words
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
            (4, "the quick brown fox jumps over the lazy dog today"),
            (10, rep20),                                  # repetitive, first owner
            (11, rep20 + " " + uniq20),                   # dup chunk + clean chunk
        ],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame(
        [(9, "quick brown fox jumps over stuff")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in curate_documents_v2(train, eval_set).collect()}

    assert rows[1]["kept"] and rows[1]["drop_reason"] == ""
    assert rows[2]["drop_reason"] == "boilerplate" and rows[2]["n_kept"] == 0
    assert rows[4]["drop_reason"] == "contaminated" and rows[4]["contaminated"]
    assert rows[10]["drop_reason"] == "repetition"
    assert rows[10]["dup_gram_char_frac"] == pytest.approx(1.0)
    # doc 11: chunk 1 owned by doc 10 → stripped; judged on uniq20 only
    assert rows[11]["n_total"] == 2 and rows[11]["n_kept"] == 1
    assert rows[11]["keep_ratio"] == pytest.approx(0.5)
    assert rows[11]["kept"] and rows[11]["dup_gram_char_frac"] == 0.0


def test_curate_documents_v2_plan_shape(spark):
    """The composite never degenerates into a cartesian/nested-loop join or
    a per-doc window — every stage is hash aggregation + (broadcast) hash
    joins, the shape that survives a 100× scale-up."""
    from document_quality_assessment_ocr_spark.plans.curation import (
        curate_documents_v2,
    )

    train = spark.createDataFrame(
        [(i, f"doc {i} body text words here") for i in range(6)],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame([(99, "held out")], "doc_id long, text string")
    plan = (
        curate_documents_v2(train, eval_set)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan


# ----------------------------------------------------------------- scrub
def test_normalize_text_strips_and_counts(spark):
    from document_quality_assessment_ocr_spark.operators.scrub import normalize_text

    docs = spark.createDataFrame(
        [
            (1, "a​b‌c  d \x01e\x07f"),
            (2, "  plain  "),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in normalize_text(docs).collect()}
    assert out[1]["clean_text"] == "abc d ef"
    assert out[1]["n_zero_width"] == 2 and out[1]["n_controls"] == 2
    assert out[2]["clean_text"] == "plain" and out[2]["n_zero_width"] == 0
    assert out[3]["clean_text"] == "" and out[3]["n_controls"] == 0


def test_scrub_pii_redacts_and_counts(spark):
    from document_quality_assessment_ocr_spark.operators.scrub import scrub_pii

    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-1.org and 192.168.0.1 call +491234567 ok"),
            (2, "no pii here, just 1234 numbers"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in scrub_pii(docs).collect()}
    assert out[1]["scrubbed"] == "mail <EMAIL> and <IP> call <PHONE> ok"
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (1, 1, 1)
    assert out[2]["scrubbed"] == docs.collect()[1]["text"]
    assert out[2]["n_emails"] == 0 and out[2]["n_phones"] == 0


# ------------------------------------------------------------- tokenize
def test_build_vocab_and_tokenize_ids(spark):
    from document_quality_assessment_ocr_spark.operators.textstats import (
        build_vocab,
        tokenize_to_ids,
    )

    docs = spark.createDataFrame(
        [
            (1, "b b b a a c"),
            (2, "a A rare"),
        ],
        "doc_id long, text string",
    )
    vocab = {r["token"]: (r["token_id"], r["cnt"]) for r in
             build_vocab(docs, vocab_size=2).collect()}
    # counts: a=4 (lowercased), b=3, c=1, rare=1 → vocab = {a:0, b:1}
    assert vocab == {"a": (0, 4), "b": (1, 3)}

    ids = {(r["doc_id"], r["pos"]): r["token_id"] for r in
           tokenize_to_ids(docs, build_vocab(docs, vocab_size=2)).collect()}
    assert ids[(1, 0)] == 1 and ids[(1, 3)] == 0  # b → 1, a → 0
    assert ids[(1, 5)] == -1                      # c is OOV
    assert ids[(2, 1)] == 0                       # "A" lowercased → a
    assert ids[(2, 2)] == -1                      # rare OOV


# ----------------------------------------------------------------- profile
def test_profile_table_stats(spark):
    """One-pass column profiler: nulls/distincts/extrema/lengths per column,
    and the plan contains no Exchange of table rows (single global agg)."""
    from document_quality_assessment_ocr_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "aa", None), (2, "b", 5), (None, "aa", 7)],
        "k long, s string, v long",
    )
    out = {r["column"]: r for r in profile_table(df).collect()}
    assert out["k"]["n_rows"] == 3 and out["k"]["n_nulls"] == 1
    assert out["k"]["null_frac"] == pytest.approx(1 / 3)
    assert out["k"]["n_distinct"] == 2
    assert out["s"]["min_str"] == "aa" and out["s"]["max_str"] == "b"
    assert out["s"]["avg_len"] == pytest.approx(5 / 3)
    assert out["v"]["n_distinct"] == 2 and out["v"]["min_str"] == "5"

    empty = {r["column"]: r for r in
             profile_table(df.where(F.lit(False))).collect()}
    assert empty["k"]["n_rows"] == 0 and empty["k"]["null_frac"] == 0.0


# --------------------------------------------------------------- shuffle
def test_deterministic_shuffle_replay(spark):
    """md5-keyed shuffle: dense per-shard positions, python-replay equal,
    identical across invocations (retry-stable)."""
    import hashlib

    from document_quality_assessment_ocr_spark.operators.sampling import (
        deterministic_shuffle,
    )

    docs = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    out = {r["doc_id"]: (r["shard"], r["pos_in_shard"])
           for r in deterministic_shuffle(docs, n_shards=4).collect()}

    keys = {i: int(hashlib.md5(f"{i}|0".encode()).hexdigest()[:8], 16)
            for i in range(40)}
    shards = {}
    for i in range(40):
        shards.setdefault(keys[i] % 4, []).append(i)
    expect = {}
    for sh, members in shards.items():
        for pos, i in enumerate(sorted(members, key=lambda i: (keys[i], i))):
            expect[i] = (sh, pos)
    assert out == expect

    again = {r["doc_id"]: (r["shard"], r["pos_in_shard"])
             for r in deterministic_shuffle(docs, n_shards=4).collect()}
    assert again == out


def test_unigram_surprisal_fixed_point(spark):
    """Rare tokens score high, common tokens low; whole-bit surprisal
    matches an independent python replay; zero-token docs are kept as
    rows with NULL avg and keep=False."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        unigram_surprisal,
    )

    docs = [
        (1, "common common common common common common common"),
        (2, "common rare1 rare2"),
        (3, "   "),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in unigram_surprisal(df).collect()}
    # corpus: common×8, rare1×1, rare2×1 → N=10
    # bits(common) = floor(log2(10//8)) = 0; bits(rare) = floor(log2(10)) = 3
    assert out[1]["sum_bits"] == 0 and out[1]["n_tokens"] == 7
    assert out[2]["sum_bits"] == 0 + 3 + 3 and out[2]["n_tokens"] == 3
    assert out[2]["avg_bits"] == 6 / 3
    assert out[3]["n_tokens"] == 0 and out[3]["avg_bits"] is None
    assert not out[3]["keep"]
    assert not out[1]["keep"]  # avg 0 below the lo band
    assert not out[2]["keep"]  # avg 2.0 is below the [3, 9] band


def test_compaction_plan_bounds_and_summary(spark):
    """Groups are contiguous in manifest order, each overshoots the target
    by less than one file, and the summary rollup reconciles."""
    from document_quality_assessment_ocr_spark.operators.compaction import (
        compaction_summary,
        plan_compaction,
    )

    rows = [(i, 100 + (i * 37) % 400) for i in range(200)]
    m = spark.createDataFrame(rows, "file_id long, size_bytes long")
    plan = plan_compaction(m, target_bytes=1000, n_buckets=8)
    got = sorted(
        (r["file_id"], r["start_byte"], r["group_id"]) for r in plan.collect()
    )
    # spec: naive running sum
    acc, exp = 0, []
    for fid, sz in rows:
        exp.append((fid, acc, acc // 1000))
        acc += sz
    assert got == exp
    summ = {r["group_id"]: r for r in compaction_summary(plan).collect()}
    sizes = dict(rows)
    for gid, r in summ.items():
        # group total < target + its largest member (one-file overshoot)
        members = [sz for fid, sz in rows if exp[fid][2] == gid]
        assert r["n_files"] == len(members)
        assert r["total_bytes"] == sum(members)
        assert r["total_bytes"] < 1000 + max(members)


def test_inverted_index(spark):
    from document_quality_assessment_ocr_spark.operators.textstats import (
        inverted_index,
    )

    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "b c c"), (3, "c")], "doc_id long, text string"
    )
    rows = {
        (r["token"], r["doc_id"]): (r["tf"], r["df"])
        for r in inverted_index(df).collect()
    }
    assert rows[("a", 1)] == (2, 1)
    assert rows[("b", 1)] == (1, 2) and rows[("b", 2)] == (1, 2)
    assert rows[("c", 3)] == (1, 3) and rows[("c", 2)] == (2, 3)
    # min_df prunes singleton terms
    pruned = inverted_index(df, min_df=2).collect()
    assert all(r["token"] != "a" for r in pruned)


def test_exact_substring_dedup(spark):
    """Cross-document duplicated windows are removed everywhere they occur;
    unique text and short documents survive untouched."""
    from document_quality_assessment_ocr_spark.operators.dedup import (
        exact_substring_dedup,
    )

    shared = "w1 w2 w3 w4"  # duplicated 4-token run across docs 1 and 2
    docs = [
        (1, f"alpha beta {shared} gamma"),
        (2, f"{shared} delta epsilon zeta"),
        (3, "alpha beta gamma delta"),  # unique → untouched
        (4, "tiny doc"),                # shorter than window → untouched
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in exact_substring_dedup(df, window=4).collect()}
    assert out[1]["clean_text"] == "alpha beta gamma"
    assert out[1]["n_removed"] == 4 and out[1]["n_dup_windows"] == 1
    assert out[2]["clean_text"] == "delta epsilon zeta"
    assert out[3]["clean_text"] == "alpha beta gamma delta"
    assert out[3]["n_removed"] == 0
    assert out[4]["clean_text"] == "tiny doc" and out[4]["n_dup_windows"] == 0


def test_exact_substring_overlapping_windows_merge(spark):
    """Two overlapping duplicated windows cover their union, not 2×window
    tokens."""
    from document_quality_assessment_ocr_spark.operators.dedup import (
        exact_substring_dedup,
    )

    run = "a b c d e"  # 5 tokens → two overlapping 4-token dup windows
    df = spark.createDataFrame(
        [(1, f"x {run} y"), (2, f"p q {run}")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in exact_substring_dedup(df, window=4).collect()}
    assert out[1]["clean_text"] == "x y"
    assert out[1]["n_removed"] == 5 and out[1]["n_dup_windows"] == 2
    assert out[2]["clean_text"] == "p q"


def test_bpe_trainer_matches_python_reference(spark):
    """Distributed trainer reproduces the pure-python twin exactly —
    same pair counts, argmax tie-breaks, and left-to-right merge
    application across rounds (including a merged symbol re-merging in a
    later round: lo+w after l+o)."""
    from document_quality_assessment_ocr_spark.operators.bpe import (
        bpe_python,
        train_bpe,
        word_counts,
    )

    docs = spark.createDataFrame(
        [
            (1, "low lower lowest low low newer newest new"),
            (2, "wider wide new lower low"),
        ],
        "doc_id long, text string",
    )
    wc = word_counts(docs)
    wcd = {r["word"]: r["cnt"] for r in wc.collect()}
    exp = bpe_python(wcd, 6)
    got = [
        (r["step"], r["left"], r["right"], r["pair_count"])
        for r in train_bpe(spark, wc, 6).orderBy("step").collect()
    ]
    assert got == exp
    assert got[0] == (0, "l", "o", 7) and got[1] == (1, "lo", "w", 7)


def test_bpe_driver_side_mode_is_byte_identical(spark):
    """train_bpe(driver_side=True) — one word-count collect + bpe_python
    in-process — yields the exact merge table of the distributed
    per-round trainer (the production mode for 32k-merge vocabs, which
    would otherwise pay 32k sequential Spark jobs)."""
    from document_quality_assessment_ocr_spark.operators.bpe import (
        train_bpe,
        word_counts,
    )

    docs = spark.createDataFrame(
        [
            (1, "low lower lowest low low newer newest new"),
            (2, "wider wide new lower low"),
        ],
        "doc_id long, text string",
    )
    wc = word_counts(docs)
    dist = [tuple(r) for r in train_bpe(spark, wc, 6).orderBy("step").collect()]
    drv = [
        tuple(r)
        for r in train_bpe(spark, wc, 6, driver_side=True)
        .orderBy("step")
        .collect()
    ]
    assert drv == dist and len(drv) == 6


def test_bpe_min_count_stops_early(spark):
    from document_quality_assessment_ocr_spark.operators.bpe import (
        train_bpe,
        word_counts,
    )

    docs = spark.createDataFrame([(1, "ab ab cd")], "doc_id long, text string")
    out = train_bpe(spark, word_counts(docs), n_merges=5, min_count=2).collect()
    # only 'a b' (count 2) qualifies; 'c d' (count 1) is below min_count
    assert [(r["left"], r["right"]) for r in out] == [("a", "b")]


def test_apply_bpe_matches_python_segmentation(spark):
    from document_quality_assessment_ocr_spark.operators.bpe import (
        apply_bpe,
        bpe_python,
        segment_words,
        train_bpe,
        word_counts,
    )

    docs = spark.createDataFrame(
        [(1, "low lower low lowest"), (2, "newer new lower")],
        "doc_id long, text string",
    )
    wc = word_counts(docs)
    wcd = {r["word"]: r["cnt"] for r in wc.collect()}
    merges = [(l, r) for _, l, r, _ in bpe_python(wcd, 5)]
    seg = segment_words(wcd, merges)
    out = apply_bpe(docs, merges).collect()
    assert len(out) == 7  # one row per token position
    for r in out:
        assert r["seg_text"] == seg[r["word"]]
        assert r["seg_text"].replace(" ", "") == r["word"]  # lossless


def test_mixture_rates_arithmetic():
    from document_quality_assessment_ocr_spark.operators.sampling import (
        mixture_rates,
    )

    counts = {"en": 800, "de": 100, "fr": 100}
    # target 50/25/25: de binds (100 / 0.25 = 400 total) → de keeps all,
    # en keeps 200 of 800, fr keeps all 100
    r = mixture_rates(counts, {"en": 0.5, "de": 0.25, "fr": 0.25})
    assert abs(r["en"] - 0.25) < 1e-12
    # the binding stratum's rate is EXACTLY 1.0 (clamped), not 1-ulp under:
    # u in [rate, 1) would silently drop docs from a stratum promised whole
    assert r["de"] == 1.0
    assert r["fr"] == 1.0
    # absent stratum renormalizes away; zero-weight stratum gets 0
    r = mixture_rates({"en": 10, "zz": 10}, {"en": 1.0, "missing": 5.0})
    assert r == {"en": 1.0, "zz": 0.0}
    assert mixture_rates({"en": 5}, {}) == {"en": 0.0}


def test_mixture_sample_composition(spark):
    from document_quality_assessment_ocr_spark.operators.sampling import (
        mixture_sample,
    )

    rows = [(i, "big" if i % 10 else "small") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = mixture_sample(df, "lang", {"big": 0.5, "small": 0.5})
    got = {r["lang"]: r["cnt"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    # small (200 rows) binds and is kept whole; big targets ~200 of 1800
    assert got["small"] == 200
    assert 150 < got["big"] < 250


def test_curation_v3_fates(spark):
    """Each fate rule fires in order: empty, boilerplate, too_short,
    duplicate (only among gate survivors, lowest id wins), keep."""
    from document_quality_assessment_ocr_spark.plans.curation import (
        curate_documents_v3,
    )

    good_body = (
        "<p>The quick brown fox is in the yard and it is that kind of day "
        "for a walk in the park, it is fine and the sun is out for all of "
        "us to see today.</p>"
    )
    linky = '<div><a href="/x">' + "the link farm " * 30 + "</a></div>"
    docs = [
        (1, f"<html><body>{good_body}</body></html>"),
        (2, f"<html><body>{good_body}</body></html>"),  # duplicate of 1
        (3, "<html><body><div></div></body></html>"),   # no text at all
        (4, f"<html><body>{linky}</body></html>"),       # all boilerplate
        (5, "<html><body>" + good_body + "<p>x</p></body></html>"),  # near-dup, distinct
    ]
    df = spark.createDataFrame(docs, "doc_id long, html string")
    out = {r["doc_id"]: r["fate"] for r in curate_documents_v3(df).collect()}
    assert out[1] == "keep"
    assert out[2] == "duplicate"
    assert out[4] in ("empty", "boilerplate")  # zero content blocks → empty
    assert out[5] == "keep"
    assert 3 not in out or out[3] == "empty"  # tag-only doc has no blocks


def test_curation_v3_rejected_doc_does_not_shadow_duplicate(spark):
    from document_quality_assessment_ocr_spark.plans.curation import (
        curate_documents_v3,
    )

    body = (
        "<p>The quick brown fox is in the yard and it is that kind of day "
        "for a walk in the park, it is fine.</p>"
    )
    # doc 1 fails too_short gate at a high threshold; doc 2 has identical
    # clean text — it must be KEEP (doc 1 is not an eligible winner)
    df = spark.createDataFrame(
        [(1, f"<html><body>{body}</body></html>"),
         (2, f"<html><body>{body}</body></html>")],
        "doc_id long, html string",
    )
    out = {r["doc_id"]: r["fate"] for r in
           curate_documents_v3(df, min_tokens=100).collect()}
    assert out == {1: "too_short", 2: "too_short"}
    out = {r["doc_id"]: r["fate"] for r in
           curate_documents_v3(df, min_tokens=5).collect()}
    assert out == {1: "keep", 2: "duplicate"}


def test_exact_substring_fuzz_vs_python(spark):
    """Randomized corpora (seeded): the relational ExactSubstr equals a
    direct python replay of the spec — every duplicated w-window's token
    span removed everywhere."""
    import random

    from document_quality_assessment_ocr_spark.operators.dedup import (
        exact_substring_dedup,
    )

    rng = random.Random(11)
    W = 4
    vocab = [f"w{i}" for i in range(12)]
    docs = []
    shared_runs = [
        [rng.choice(vocab) for _ in range(rng.randint(W, W + 3))] for _ in range(3)
    ]
    for i in range(30):
        toks = [rng.choice(vocab) for _ in range(rng.randint(0, 14))]
        if rng.random() < 0.5:
            run = rng.choice(shared_runs)
            pos = rng.randint(0, len(toks))
            toks = toks[:pos] + run + toks[pos:]
        docs.append((i, " ".join(toks)))

    # python replay of the spec
    tok = {i: t.lower().split() for i, t in docs}
    from collections import Counter

    wins = Counter()
    for i, ts in tok.items():
        for s in range(max(len(ts) - W + 1, 0)):
            wins[tuple(ts[s : s + W])] += 1
    expect = {}
    for i, ts in tok.items():
        covered = set()
        for s in range(max(len(ts) - W + 1, 0)):
            if wins[tuple(ts[s : s + W])] > 1:
                covered.update(range(s, s + W))
        kept = [t for j, t in enumerate(ts) if j not in covered]
        expect[i] = (" ".join(kept), len(ts) - len(kept))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in exact_substring_dedup(df, window=W).collect()
    }
    assert got == expect
    assert any(n > 0 for _, n in got.values())  # fuzz actually removed text


def test_quality_classifier_semantics(spark):
    """Hashed linear scorer: deterministic integer gram fold, empty doc
    scores 0, identical texts score identically, and the plan is pure
    map-side (no Exchange — the weights live in the plan as literals)."""
    from document_quality_assessment_ocr_spark.operators.classify import (
        SCALE,
        classifier_weights,
        quality_score,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in quality_score(docs).collect()}
    # 3 unigrams + 2 bigrams
    assert out[1]["n_grams"] == 5 and out[1]["score"] == out[2]["score"]
    assert out[3]["n_grams"] == 0 and out[3]["score"] == 0.0 and out[3]["keep"]
    assert out[4]["score"] == 0.0

    # python replay of the spec for doc 1
    import hashlib

    w = classifier_weights(64, 7)
    toks = ["alpha", "beta", "gamma"]
    grams = toks + [a + "\x01" + b for a, b in zip(toks, toks[1:])]
    s = sum(
        w[int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % 64] for g in grams
    )
    assert abs(out[1]["score"] - round(s / len(grams) / SCALE, 6)) < 1e-12

    plan = quality_score(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-side only


def test_temper_weights_flattens_and_sharpens():
    from document_quality_assessment_ocr_spark.operators.sampling import (
        mixture_rates,
        temper_weights,
    )

    w = {"en": 0.8, "zh": 0.2}
    assert temper_weights(w, 1.0) == w
    t2 = temper_weights(w, 2.0)
    # T>1 flattens: ratio en/zh shrinks from 4 to 2
    assert t2["en"] / t2["zh"] == pytest.approx(2.0)
    th = temper_weights(w, 0.5)
    assert th["en"] / th["zh"] == pytest.approx(16.0)  # T<1 sharpens
    # downstream: counts match the T=1 proportions exactly (no down-sampling);
    # flattening makes zh bind and down-samples the HEAD — the tail stratum
    # stays whole, the corpus shifts toward uniform
    counts = {"en": 800, "zh": 200}
    r1 = mixture_rates(counts, w)
    r2 = mixture_rates(counts, t2)
    assert r1 == {"en": 1.0, "zh": 1.0}
    assert r2["zh"] == 1.0 and r2["en"] == pytest.approx(0.5)


def test_dedup_lines_within_doc(spark):
    """First occurrence wins in order; blanks dedup like any line; plan is
    map-side only."""
    from document_quality_assessment_ocr_spark.operators.quality import (
        dedup_lines_within_doc,
    )

    docs = spark.createDataFrame(
        [
            (1, "menu\nintro text\nmenu\nbody\n\nmore\n\nmenu"),
            (2, "only line"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup_lines_within_doc(docs).collect()}
    assert out[1]["clean_text"] == "menu\nintro text\nbody\n\nmore"
    assert out[1]["n_lines"] == 8 and out[1]["n_removed"] == 3
    assert out[2]["clean_text"] == "only line" and out[2]["n_removed"] == 0
    assert out[3]["n_lines"] == 1  # null → '' → one empty line
    plan = dedup_lines_within_doc(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_c4_line_filter_rules(spark):
    """C4 rules: terminal punctuation + >=5 words + no 'javascript' per
    line; >=3 kept lines + no 'lorem ipsum'/'{' per doc."""
    from document_quality_assessment_ocr_spark.operators.quality import (
        c4_line_filter,
    )

    good = "\n".join(
        [
            "this is a good sentence one.",   # kept
            "another perfectly fine sentence here!",  # kept
            "is this a kept question line?",  # kept
            "too short.",                     # <5 words
            "no terminal punctuation in this line at all",  # no terminal
            "enable JavaScript to view this content please.",  # javascript
        ]
    )
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, good + "\nbut sadly lorem ipsum appears somewhere."),
            (3, good + "\nvar f = function() { return 1; }"),
            (4, "one kept sentence is not enough here."),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in c4_line_filter(docs).collect()}
    assert out[1]["doc_keep"] and out[1]["n_kept"] == 3
    assert out[1]["clean_text"].count("\n") == 2
    assert not out[2]["doc_keep"] and out[2]["clean_text"] == ""  # lorem ipsum
    assert not out[3]["doc_keep"]  # curly brace
    assert not out[4]["doc_keep"] and out[4]["n_kept"] == 1  # <3 sentences


def test_gopher_quality_filter_rules(spark):
    """Each Gopher rule trips on a crafted doc; a plain passage passes;
    reason is first-failing; plan is map-side only."""
    from document_quality_assessment_ocr_spark.operators.quality import (
        gopher_quality_filter,
    )

    good = (
        "the quick brown fox jumps over that lazy dog and it went to be "
        "near the river of calm waters with a friend that would have "
        "stayed all day long because the weather was fine and the path "
        "was dry so they walked on with a song to hum and a tale to tell "
        "of days gone by and the roads that have led them here"
    )
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, "too few words here."),                            # word_count
            (3, " ".join(["a"] * 60)),                             # mean_word_length (len 1)
            (4, " ".join(["####word"] * 60)),                      # symbol_ratio... see below
            (5, "\n".join(["- heavy copper kettles whistle during evening storms"] * 10)
                + "\nthe wind that evening would have been with anyone"),  # bullet_lines
            (6, " ".join(["12345"] * 60)),                         # alpha_words (after the earlier gates)
            (7, " ".join(["zzz"] * 60)),                           # stopwords
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_quality_filter(docs).collect()}
    assert out[1]["keep"] and out[1]["reason"] is None
    assert out[2]["reason"] == "word_count"
    assert out[3]["reason"] == "mean_word_length"
    assert out[4]["symbol_word_ratio"] > 0.1
    assert out[5]["bullet_line_frac"] > 0.9 and out[5]["reason"] == "bullet_lines"
    assert out[6]["alpha_word_frac"] == 0.0
    assert out[7]["reason"] == "stopwords" and not out[7]["keep"]
    plan = gopher_quality_filter(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_curation_v4_fates(spark):
    """Each v4 stage claims its fate in precedence order; the kept doc's
    final_text is PII-scrubbed; dedup ranks only among gate survivors."""
    from document_quality_assessment_ocr_spark.plans.curation import (
        curate_documents_v4,
    )

    good = "\n".join(
        f"the data of run {w} would have to be good and that is why we keep it number {w} here."
        for w in ("one", "two", "three")
    )
    docs = spark.createDataFrame(
        [
            (1, good + "\ncontact bob@example.com at 10.0.0.1 for sure ok."),
            (2, "el valor de los datos es una tabla y la fila es un grupo."),
            (3, "the text is far too short."),
            (4, good + "\nand the config is {x} ok."),
            (5, good),  # shares the good shingles with 1 -> near-dup, demoted
            (6, good),  # same clean text as 5 -> also demoted
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in curate_documents_v4(docs).collect()}
    assert out[1]["fate"] == "keep" and out[1]["kept"]
    assert out[1]["n_pii"] == 2
    assert "<EMAIL>" in out[1]["final_text"] and "<IP>" in out[1]["final_text"]
    assert "bob@example.com" not in out[1]["final_text"]
    assert out[2]["fate"] == "language" and out[2]["final_text"] is None
    assert out[3]["fate"].startswith("gopher:")
    assert out[4]["fate"] == "c4"
    assert out[5]["fate"] == "near_duplicate"
    assert out[6]["fate"] == "near_duplicate" and not out[6]["kept"]


def test_dsir_resample(spark):
    """DSIR scores match a pure-python recomputation (md5 buckets, shared
    fixed-point log-ratios); empty docs score 0; the scoring pass itself
    is exchange-free (the raw-counts job already ran at build time)."""
    from document_quality_assessment_ocr_spark.operators.importance import (
        dsir_log_ratios_nano,
        dsir_raw_counts,
        dsir_resample,
        dsir_target_weights,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox"),
            (3, "one"),
            (4, None),
            (5, "data data data data"),
        ],
        "doc_id long, text string",
    )
    D, seed = 16, 11
    out = {r["doc_id"]: r for r in dsir_resample(docs, n_buckets=D, seed=seed).collect()}

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % D

    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox",
        5: "data data data data",
    }
    raw = [0] * D
    grams_by_doc = {}
    for d, t in texts.items():
        tk = t.lower().split()
        grams = [f"{a} {b}" for a, b in zip(tk, tk[1:])]
        grams_by_doc[d] = grams
        for g in grams:
            raw[bucket(g)] += 1
    assert raw == dsir_raw_counts(docs, n_buckets=D)
    lr = dsir_log_ratios_nano(raw, dsir_target_weights(D, seed))
    for d, grams in grams_by_doc.items():
        want = sum(lr[bucket(g)] for g in grams)
        assert out[d]["score_nano"] == want
        assert out[d]["n_grams"] == len(grams)
        assert out[d]["keep"] == (want > 0)
    for d in (3, 4):
        assert out[d]["score_nano"] == 0 and out[d]["n_grams"] == 0
        assert not out[d]["keep"]
    plan = (
        dsir_resample(docs, n_buckets=D, seed=seed)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_ccnet_perplexity_buckets(spark):
    """lp_nano matches a pure-python recomputation over the shared LM
    literals; bucket boundaries use the multiply-compare (no division);
    <2-token docs are tail with 0 grams; the scoring pass is exchange-free."""
    from document_quality_assessment_ocr_spark.operators.importance import (
        ccnet_perplexity,
        dsir_target_weights,
        lm_logprobs_nano,
    )

    D, seed = 16, 11
    lp = lm_logprobs_nano(dsir_target_weights(D, seed))

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % D

    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "alpha beta gamma delta",
        5: "data data data data data data",
    }
    docs = spark.createDataFrame(
        [(1, texts[1]), (2, texts[2]), (3, "one"), (4, None), (5, texts[5])],
        "doc_id long, text string",
    )
    # pick thresholds straddling doc 1's average so all three buckets appear
    avgs = {}
    for d, t in texts.items():
        tk = t.lower().split()
        grams = [f"{a} {b}" for a, b in zip(tk, tk[1:])]
        avgs[d] = (sum(lp[bucket(g)] for g in grams), len(grams))
    per = sorted(s // n for s, n in avgs.values())
    head_thr, tail_thr = per[-1], per[0] + 1
    q = ccnet_perplexity(docs, n_buckets=D, seed=seed,
                         head_nano=head_thr, tail_nano=tail_thr)
    out = {r["doc_id"]: r for r in q.collect()}
    for d, (s, n) in avgs.items():
        assert out[d]["lp_nano"] == s and out[d]["n_grams"] == n
        want = ("head" if s >= head_thr * n
                else "middle" if s >= tail_thr * n else "tail")
        assert out[d]["bucket"] == want
    assert {out[d]["bucket"] for d in avgs} == {"head", "middle", "tail"}
    for d in (3, 4):
        assert out[d]["bucket"] == "tail" and out[d]["n_grams"] == 0
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_assign_splits(spark):
    """Split matches the md5-uniform arithmetic exactly; proportions are
    sane at n=2000; assignment is append-stable (adding rows never moves an
    existing doc); the plan is a pure projection (no exchange)."""
    from document_quality_assessment_ocr_spark.operators.sampling import (
        assign_splits,
    )

    docs = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    q = assign_splits(docs, (("train", 0.9), ("val", 0.95)), "test", salt=97)
    out = {r["doc_id"]: r["split"] for r in q.collect()}

    def u(i):
        h = hashlib.md5(f"{i}|97".encode()).hexdigest()
        return int(h[:8], 16) / 4294967296.0

    for i in range(2000):
        want = "train" if u(i) < 0.9 else "val" if u(i) < 0.95 else "test"
        assert out[i] == want
    n_train = sum(1 for s in out.values() if s == "train")
    assert 0.85 * 2000 < n_train < 0.95 * 2000
    # append-stability: the first 500 docs get identical splits alone
    sub = assign_splits(
        spark.createDataFrame([(i,) for i in range(500)], "doc_id long"),
        (("train", 0.9), ("val", 0.95)), "test", salt=97,
    )
    assert {r["doc_id"]: r["split"] for r in sub.collect()} == {
        i: out[i] for i in range(500)
    }
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_corpus_card(spark):
    """Tallies match hand counts per (lang, source); NULL text counts as
    empty; NULL lang/source coalesce to ''; single hash aggregate."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        corpus_card,
    )

    long_txt = "w " * 6000  # 12000 chars > 10000
    docs = spark.createDataFrame(
        [
            (1, "en", "web", "hello world"),
            (2, "en", "web", ""),
            (3, "en", "web", None),
            (4, "en", "web", long_txt),
            (5, "fr", None, "bonjour"),
        ],
        "doc_id long, lang string, source string, text string",
    )
    out = {(r["lang"], r["source"]): r for r in corpus_card(docs).collect()}
    en = out[("en", "web")]
    assert en["n_docs"] == 4
    assert en["n_chars"] == len("hello world") + len(long_txt)
    assert en["n_tokens"] == 2 + 6000
    assert en["n_empty"] == 2 and en["n_short"] == 1 and en["n_long"] == 1
    fr = out[("fr", "")]
    assert fr["n_docs"] == 1 and fr["n_short"] == 1 and fr["n_tokens"] == 1
    plan = corpus_card(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") <= 2  # partial + final, one pair


def test_corpus_line_dedup(spark):
    """Lines in >= min_docs distinct docs drop EVERYWHERE (incl. repeats
    within one doc); rarer lines and blank/whitespace-only lines stay;
    order-preserving reassembly."""
    from document_quality_assessment_ocr_spark.operators.dedup import (
        corpus_line_dedup,
    )

    footer = "(c) example corp - all rights reserved"
    rare = "this line appears in only two docs"
    docs = spark.createDataFrame(
        [
            (1, f"alpha body one\n{footer}\n{rare}"),
            (2, f"beta body two\n{footer}\n{rare}\n{footer}"),
            (3, f"gamma body three\n\n{footer}"),
            (4, "   \ndelta body four"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in corpus_line_dedup(docs, min_docs=3).collect()}
    assert out[1]["clean_text"] == f"alpha body one\n{rare}"
    assert out[1]["n_lines"] == 3 and out[1]["n_removed"] == 1
    # doc 2: BOTH footer instances drop, rare line (df=2 < 3) stays
    assert out[2]["clean_text"] == f"beta body two\n{rare}"
    assert out[2]["n_removed"] == 2
    # blank line is structure — kept even though it appears everywhere
    assert out[3]["clean_text"] == "gamma body three\n"
    # whitespace-only line never a candidate
    assert out[4]["clean_text"] == "   \ndelta body four"
    assert out[4]["n_removed"] == 0


def test_simhash_near_dup_pairs_pigeonhole_exact(spark):
    """Operator output == brute-force all-pairs Hamming <= 3 over the same
    signatures (the pigeonhole guarantee: bands=4 catches every pair with
    distance <= 3), including an exact-dup pair at distance 0."""
    from document_quality_assessment_ocr_spark.operators.dedup import (
        simhash64,
        simhash_near_dup_pairs,
    )

    rows = [(1, "the quick brown fox jumps over the lazy dog")]
    rows.append((2, rows[0][1]))  # exact dup -> hamming 0
    rows.append((3, rows[0][1] + " tonight"))  # near dup
    for i in range(4, 24):
        rows.append((i, f"totally different text number {i} " * 3 + f"w{i}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig = {r["doc_id"]: r["simhash"] for r in simhash64(docs, bits=48).collect()}
    brute = {
        (a, b, bin(sig[a] ^ sig[b]).count("1"))
        for a in sig
        for b in sig
        if a < b and bin(sig[a] ^ sig[b]).count("1") <= 3
    }
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_dup_pairs(
            docs, bits=48, bands=4, max_hamming=3
        ).collect()
    }
    assert got == brute
    assert (1, 2, 0) in got


def test_unimax_budgets_arithmetic():
    """Ascending walk, epoch caps return budget to the pool, exact integer
    shares; full budget consumed when no cap binds at the end."""
    from document_quality_assessment_ocr_spark.operators.sampling import (
        unimax_budgets,
    )

    out = unimax_budgets({"a": 100, "b": 1000}, budget=600, max_epochs=2)
    # a first (smaller): share 300 capped at 200; b gets the freed 100 back
    assert out == {"a": 200, "b": 400}
    # all capped: leftover budget is simply unspent
    out2 = unimax_budgets({"a": 10, "b": 20}, budget=1000, max_epochs=3)
    assert out2 == {"a": 30, "b": 60}
    # deterministic tie-break by name at equal counts
    out3 = unimax_budgets({"y": 50, "x": 50}, budget=100, max_epochs=9)
    assert out3 == {"x": 50, "y": 50}


def test_unimax_sample(spark):
    """Capped language keeps ALL docs at weight 2e9 (2 epochs); the
    subsampled language keeps a strict, md5-deterministic subset with
    weight < 1e9; zero-shuffle predicate after the bounded count agg."""
    from document_quality_assessment_ocr_spark.operators.sampling import (
        unimax_sample,
    )

    rows = [(i, "tiny", 10) for i in range(5)]
    rows += [(100 + i, "big", 10) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    # budget 500: tiny (50 toks) capped at 2 epochs = 100 ... share 250 -> 100;
    # big (2000 toks) gets 400 of its 2000 -> rate 0.2
    out = unimax_sample(df, budget_tokens=500, max_epochs=2)
    got = out.collect()
    tiny = [r for r in got if r["lang"] == "tiny"]
    big = [r for r in got if r["lang"] == "big"]
    assert len(tiny) == 5 and all(r["weight_nano"] == 2_000_000_000 for r in tiny)
    assert 0 < len(big) < 200
    assert all(r["weight_nano"] == 200_000_000 for r in big)
    assert all(r["sample_u"] < 0.2 for r in big)
    # deterministic replay
    again = {r["doc_id"] for r in unimax_sample(df, 500, 2).collect()}
    assert again == {r["doc_id"] for r in got}


def test_phrase_search(spark):
    """Anchors at every occurrence (doc 4: 'table table table' has TWO),
    repeated phrase terms share one position array, first_pos 0-based,
    non-matching docs absent."""
    from document_quality_assessment_ocr_spark.operators.phrase import phrase_search

    d = spark.createDataFrame(
        [
            (1, "a table table key"),
            (2, "table x table table"),
            (3, "no match here"),
            (4, "table table table"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["n_matches"], r["first_pos"])
           for r in phrase_search(d, ["table", "table"]).collect()}
    assert out == {1: (1, 1), 2: (1, 2), 4: (2, 0)}
    out3 = {r["doc_id"]: (r["n_matches"], r["first_pos"])
            for r in phrase_search(d, ["table", "table", "key"]).collect()}
    assert out3 == {1: (1, 1)}


def test_bigram_lm_bits(spark):
    """Fixed-point interpolated bigram surprisal: repetitive docs score
    LOW bits, a rare continuation scores HIGH; short docs get zero
    counts, NULL avg, keep=False."""
    from document_quality_assessment_ocr_spark.operators.lm import bigram_lm_bits

    d = spark.createDataFrame(
        [
            (1, "a a a a a a a a a a a a"),
            (2, "a b c d e f g h i j k l"),
            (3, "one"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_lm_bits(d).collect()}
    assert out[1]["n_bigrams"] == 11 and out[2]["n_bigrams"] == 11
    # 'a a' is the dominant bigram -> far fewer bits than the 11 singletons
    assert out[1]["avg_bits"] < out[2]["avg_bits"]
    assert out[3]["n_bigrams"] == 0 and out[3]["avg_bits"] is None
    assert out[3]["keep"] is False and out[4]["keep"] is False
    # all-integer model: replay is bit-identical
    again = {r["doc_id"]: r["sum_bits"] for r in bigram_lm_bits(d).collect()}
    assert again == {k: v["sum_bits"] for k, v in out.items()}


def test_edit_verified_pairs(spark):
    """LSH proposes, prefix Levenshtein disposes: near-identical texts
    confirm with sim_milli >= threshold; integer milli-similarity."""
    from document_quality_assessment_ocr_spark.operators.editsim import (
        edit_verified_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog " * 4
    d = spark.createDataFrame(
        [
            (1, base),
            (2, base.replace("lazy", "hazy", 1)),
            (3, "completely different words entirely unrelated " * 4),
        ],
        "doc_id long, text string",
    )
    out = {(r["id_a"], r["id_b"]): r
           for r in edit_verified_pairs(
               d, n_hashes=8, bands=4, ngram=3, prefix_chars=100,
               keep_sim_milli=900).collect()}
    assert (1, 2) in out
    r = out[(1, 2)]
    assert r["dist"] == 1 and r["is_dup"] and r["sim_milli"] >= 900
    assert not any(3 in k for k in out)


def test_incremental_dedup_flags(spark):
    """New-shard-vs-index verdicts: a new doc duplicating a base doc
    flags is_dup with the right best match; a fresh doc rows out with
    zero candidates and no flag; ties break to the smallest base id."""
    from document_quality_assessment_ocr_spark.operators.dedup import (
        incremental_dedup_flags,
    )

    base_text = "alpha beta gamma delta epsilon zeta eta theta " * 5
    base = spark.createDataFrame(
        [(10, base_text), (11, base_text), (12, "totally different corpus words " * 6)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, base_text), (2, "nothing like anything in the base at all " * 6)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in incremental_dedup_flags(
        new, base, n_hashes=8, bands=4, ngram=3, min_match=6).collect()}
    assert out[1]["is_dup"] and out[1]["best_match_id"] == 10  # tie -> min id
    assert out[1]["best_agree_milli"] == 1000 and out[1]["n_candidates"] == 2
    assert not out[2]["is_dup"] and out[2]["n_candidates"] == 0
    assert out[2]["best_match_id"] is None

    # id-type-agnostic contract: STRING doc ids surface their best match
    # as-is (a long cast here used to NULL them)
    sbase = spark.createDataFrame(
        [("b-10", base_text)], "doc_id string, text string"
    )
    snew = spark.createDataFrame(
        [("n-1", base_text)], "doc_id string, text string"
    )
    sout = {r["doc_id"]: r for r in incremental_dedup_flags(
        snew, sbase, n_hashes=8, bands=4, ngram=3, min_match=6).collect()}
    assert sout["n-1"]["is_dup"] and sout["n-1"]["best_match_id"] == "b-10"


def test_heavy_hitters_verified(spark):
    """CMS proposes a superset (est >= exact, never a false negative);
    exact verify settles it; light terms with clean cells don't appear."""
    from document_quality_assessment_ocr_spark.operators.sketches import (
        heavy_hitters_verified,
    )

    rows = [("hot",)] * 50 + [("warm",)] * 10 + [(f"cold{i}",) for i in range(20)]
    df = spark.createDataFrame(rows, "term string")
    out = {r["term"]: r for r in
           heavy_hitters_verified(df, "term", threshold=40).collect()}
    assert "hot" in out  # no false negatives possible
    assert out["hot"]["is_true_heavy"] and out["hot"]["exact"] == 50
    assert all(r["est"] >= r["exact"] for r in out.values())
    assert all(not r["is_true_heavy"] for t, r in out.items() if t != "hot")


def test_vocab_growth(spark):
    """First-occurrence attribution: a type repeated later never counts
    again; cum_types is the running total; empty buckets emit nothing."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        vocab_growth,
    )

    d = spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, "c"), (3, "a c d"), (9, "a")],
        "doc_id long, text string",
    )
    # lo=0 hi=9 n_buckets=5 -> span=2: buckets 0:[0,1] 1:[2,3] 4:[8,9]
    out = {r["bucket"]: (r["new_types"], r["cum_types"])
           for r in vocab_growth(d, n_buckets=5).collect()}
    assert out == {0: (2, 2), 1: (2, 4)}  # bucket 4 adds nothing, absent
    # trigram mode: doc 3 has exactly one trigram type
    out3 = {r["bucket"]: r["new_types"]
            for r in vocab_growth(d, n_buckets=5, ngram=3).collect()}
    assert out3 == {1: 1}


def test_curriculum_order(spark):
    """Global rank equals the single-window formulation (score DESC,
    id ASC), ranks are dense 0..n-1, epochs stride rank%n_epochs."""
    from document_quality_assessment_ocr_spark.operators.curriculum import (
        curriculum_order,
    )

    rows = [(i, (i * 37) % 7 * 1000 + (i % 3) * 100) for i in range(40)]
    d = spark.createDataFrame(rows, "doc_id long, score long")
    out = curriculum_order(d, "score", n_epochs=4, bucket_width=1000).collect()
    got = {r["doc_id"]: (r["rank"], r["epoch"]) for r in out}
    expected = sorted(rows, key=lambda t: (-t[1], t[0]))
    for rk, (did, sc) in enumerate(expected):
        assert got[did] == (rk, rk % 4), (did, sc, got[did], rk)
    assert sorted(r["rank"] for r in out) == list(range(40))


def test_phrase_search_fuzz_vs_python(spark):
    """Seeded random corpus: engine phrase hits equal a pure-python
    sliding-window scan (count + first position), including docs where
    the phrase's repeated term overlaps itself."""
    import random

    from document_quality_assessment_ocr_spark.operators.phrase import phrase_search

    rng = random.Random(1234)
    vocab = ["a", "b", "c", "d"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for i in range(80)
    ]
    phrase = ["a", "a", "b"]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_matches"], r["first_pos"])
           for r in phrase_search(d, phrase).collect()}
    want = {}
    for i, text in rows:
        toks = text.split()
        hits = [p for p in range(len(toks) - len(phrase) + 1)
                if toks[p:p + len(phrase)] == phrase]
        if hits:
            want[i] = (len(hits), hits[0])
    assert got == want


def test_bigram_lm_fuzz_vs_python(spark):
    """Seeded random corpus: engine sum_bits equals an independent
    pure-python evaluation of the same integer interpolation (floor
    divisions, binary-length log2) — a second check beside DuckDB."""
    import random

    from document_quality_assessment_ocr_spark.operators.lm import bigram_lm_bits

    rng = random.Random(99)
    vocab = ["x", "y", "z", "w", "v"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 20))))
        for i in range(60)
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["sum_bits"])
           for r in bigram_lm_bits(d, lam_milli=700).collect()}

    c12, c1, c2 = {}, {}, {}
    streams = {}
    for i, text in rows:
        toks = text.split()
        bgs = [(toks[j], toks[j + 1]) for j in range(len(toks) - 1)]
        streams[i] = bgs
        for bg in bgs:
            c12[bg] = c12.get(bg, 0) + 1
            c1[bg[0]] = c1.get(bg[0], 0) + 1
            c2[bg[1]] = c2.get(bg[1], 0) + 1
    nb = sum(c12.values())

    def bits(bg):
        p = (700 * ((c12[bg] * 1_000_000) // c1[bg[0]])
             + 300 * ((c2[bg[1]] * 1_000_000) // nb)) // 1000
        return (1_000_000 // max(p, 1)).bit_length() - 1

    want = {i: (len(bgs), sum(bits(bg) for bg in bgs))
            for i, bgs in streams.items()}
    assert got == want


def test_exact_k_sample(spark):
    """Exactly k rows, equal to the k smallest md5 draws computed in
    python; replay-identical; k > n returns all n."""
    import hashlib

    from document_quality_assessment_ocr_spark.operators.sampling import (
        exact_k_sample,
    )

    ids = list(range(200))
    d = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = exact_k_sample(d, k=10, salt="s").collect()
    assert len(out) == 10
    draws = sorted(
        (hashlib.md5(f"s#{i}".encode()).hexdigest(), i) for i in ids
    )[:10]
    assert [(r["sample_u"], r["doc_id"]) for r in
            sorted(out, key=lambda r: r["rank"])] == draws
    again = exact_k_sample(d, k=10, salt="s").collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
    small = spark.createDataFrame([(1,), (2,)], "doc_id long")
    assert len(exact_k_sample(small, k=10).collect()) == 2


def test_shard_checksums(spark):
    """Digest equals the python md5 chain in id order regardless of
    input row order (sort_array inside the aggregate); one row per
    non-empty shard."""
    import hashlib

    from document_quality_assessment_ocr_spark.operators.profile import (
        shard_checksums,
    )

    rows = [(i, f"text {i}") for i in range(7)] + [(103, "late"), (101, "mid")]
    shuffled = rows[::-1]
    d = spark.createDataFrame(shuffled, "doc_id long, text string").repartition(4)
    out = {r["shard"]: (r["n_docs"], r["checksum"])
           for r in shard_checksums(d, shard_width=100).collect()}

    def chain(pairs):
        cat = "".join(
            hashlib.md5(t.encode()).hexdigest()
            for _, t in sorted(pairs)
        )
        return hashlib.md5(cat.encode()).hexdigest()

    assert out == {
        0: (7, chain([(i, f"text {i}") for i in range(7)])),
        1: (2, chain([(101, "mid"), (103, "late")])),
    }


def test_stopgram_blocklist(spark):
    """Document frequency counts each doc once (array_distinct): a gram
    repeated within one doc doesn't inflate df; permille is floor
    integer; below-threshold grams drop."""
    from document_quality_assessment_ocr_spark.operators.quality import (
        stopgram_blocklist,
    )

    rows = [
        (1, "click here now click here now"),   # gram repeats in-doc
        (2, "click here now something else entirely"),
        (3, "click here now more words go here"),
        (4, "unrelated text with no shared grams at all"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["gram"]: (r["df"], r["df_permille"])
           for r in stopgram_blocklist(d, n=3, min_df_permille=700).collect()}
    assert out["click here now"] == (3, 750)  # 3 docs, not 4 occurrences
    assert all(v[1] >= 700 for v in out.values())
    assert "here now click" not in out  # df=1 -> 250 permille, dropped


def test_host_pagerank_shape(spark):
    """Host-graph PageRank composite: a hub pointed at by two hosts
    outranks leaves; self-loops dropped; fixed-point ranks replay
    bit-identically."""
    from document_quality_assessment_ocr_spark.operators.graph import (
        pagerank_fixed,
    )

    edges = spark.createDataFrame(
        [("a.com", "hub.com"), ("b.com", "hub.com"), ("hub.com", "a.com")],
        "src string, dst string",
    )
    nodes = (edges.select(edges.src.alias("id"))
             .union(edges.select(edges.dst.alias("id"))).distinct())
    out = {r["id"]: r["pr"] for r in pagerank_fixed(nodes, edges, iters=3).collect()}
    assert out["hub.com"] > out["a.com"] > out["b.com"]
    again = {r["id"]: r["pr"] for r in pagerank_fixed(nodes, edges, iters=3).collect()}
    assert again == out


def test_budget_select_greedy_prefix(spark):
    """Whole-document greedy selection in (score DESC, id ASC) order:
    kept iff the INCLUSIVE running token total fits the budget — across
    score buckets (width 1000) so the two-level offsets are exercised."""
    from document_quality_assessment_ocr_spark.operators.curriculum import (
        budget_select,
    )

    docs = spark.createDataFrame(
        [  # (doc_id, score, n_tokens); buckets: 5xxx, 3xxx, 0xxx
            (1, 5500, 40), (2, 5500, 30), (3, 3200, 50),
            (4, 3100, 25), (5, 900, 10),
        ],
        "doc_id long, s long, n_tokens long",
    )
    out = {r["doc_id"]: r for r in
           budget_select(docs, 120, score_col="s").collect()}
    # order: 1 (40), 2 (70), 3 (120), 4 (145), 5 (155)
    assert [out[i]["cum_tokens"] for i in (1, 2, 3, 4, 5)] == [40, 70, 120, 145, 155]
    assert [out[i]["kept"] for i in (1, 2, 3, 4, 5)] == [True, True, True, False, False]


def test_chat_render_spans_offsets(spark):
    """Assistant-content spans index into the rendered template exactly;
    render_md5 witnesses the full rendered bytes."""
    from document_quality_assessment_ocr_spark.operators.sft import (
        chat_render_spans,
        turns_from_lines,
    )

    docs = spark.createDataFrame(
        [(7, "hello there\n\nhi back\nmore?\n ok!")], "doc_id long, text string"
    )
    turns = turns_from_lines(docs)
    got = {r["turn"]: r for r in turns.collect()}
    assert [(got[i]["role"], got[i]["content"]) for i in (1, 2, 3, 4)] == [
        ("user", "hello there"), ("assistant", "hi back"),
        ("user", "more?"), ("assistant", " ok!"),
    ]
    rendered = "".join(
        f"<|{got[i]['role']}|>{got[i]['content']}<|end|>\n" for i in (1, 2, 3, 4)
    )
    spans = {r["turn"]: r for r in chat_render_spans(turns).collect()}
    assert sorted(spans) == [2, 4]
    for t in (2, 4):
        s, e = spans[t]["span_start"], spans[t]["span_end"]
        assert rendered[s:e] == got[t]["content"]
        assert spans[t]["render_md5"] == hashlib.md5(rendered.encode()).hexdigest()


def test_preference_pairs(spark):
    """Chosen/rejected per multi-doc cluster with deterministic tie-breaks;
    equal-score clusters and singletons emit nothing."""
    from document_quality_assessment_ocr_spark.operators.sft import (
        preference_pairs,
    )

    clustered = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)],
        "doc_id long, cluster_id long",
    )
    scored = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 10), (4, 99), (5, 7), (6, 7)],
        "doc_id long, cscore long",
    )
    out = {r["cluster_id"]: r
           for r in preference_pairs(clustered, scored, "cscore").collect()}
    # cluster 4: singleton; cluster 5: all-equal scores -> no signal
    assert sorted(out) == [1]
    r = out[1]
    assert (r["chosen_id"], r["chosen_score"]) == (2, 30)
    # rejected: lowest score 10 shared by docs 1 and 3 -> LARGEST id wins
    assert (r["rejected_id"], r["rejected_score"]) == (3, 10)
    assert r["n_docs"] == 3


def test_trim_repeated_windows(spark):
    """Non-first w-token windows are removed token-wise; short and
    repetition-free docs pass through untouched."""
    from document_quality_assessment_ocr_spark.operators.quality import (
        trim_repeated_windows,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e a b c d e f"),   # window repeat at pos 6
            (2, "x y z"),                    # shorter than w
            (3, "p q r s t u v"),            # no repeats
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in trim_repeated_windows(docs, w=5).collect()}
    assert out[1]["n_tokens"] == 11
    assert out[1]["n_repeat_windows"] == 1
    assert out[1]["n_tokens_removed"] == 5
    assert out[1]["clean_md5"] == hashlib.md5(b"a b c d e f").hexdigest()
    assert out[2]["n_tokens_removed"] == 0
    assert out[3]["n_tokens_removed"] == 0
    assert out[3]["clean_md5"] == hashlib.md5(b"p q r s t u v").hexdigest()
    assert out[4]["n_tokens"] == 0
    assert out[4]["clean_md5"] == hashlib.md5(b"").hexdigest()


def test_trim_repeated_windows_fuzz_vs_python(spark):
    """Seeded random low-vocab corpus (forces plenty of window repeats):
    engine counts + cleaned-text md5 equal a pure-python scan."""
    import random

    from document_quality_assessment_ocr_spark.operators.quality import (
        trim_repeated_windows,
    )

    rng = random.Random(4242)
    vocab = ["a", "b", "c"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25))))
        for i in range(60)
    ]
    w = 3
    got = {r["doc_id"]: (r["n_tokens"], r["n_repeat_windows"],
                         r["n_tokens_removed"], r["clean_md5"])
           for r in trim_repeated_windows(
               spark.createDataFrame(rows, "doc_id long, text string"), w=w
           ).collect()}
    want = {}
    for i, text in rows:
        toks = text.split()
        seen, reps = {}, []
        for p in range(len(toks) - w + 1):
            g = " ".join(toks[p:p + w])
            if g in seen:
                reps.append(p + 1)  # 1-based
            else:
                seen[g] = p + 1
        covered = {j for r in reps for j in range(r, r + w)}
        kept = [t for j, t in enumerate(toks, 1) if j not in covered]
        want[i] = (len(toks), len(reps), len(toks) - len(kept),
                   hashlib.md5(" ".join(kept).encode()).hexdigest())
    assert got == want
    assert any(v[2] > 0 for v in want.values())  # fuzz actually trimmed


def test_budget_select_fuzz_vs_python(spark):
    """Seeded random scores/tokens across many score buckets: engine
    cum_tokens/kept equal a pure-python sort + prefix sum."""
    import random

    from document_quality_assessment_ocr_spark.operators.curriculum import (
        budget_select,
    )

    rng = random.Random(99)
    rows = [(i, rng.randint(0, 9999), rng.randint(0, 50)) for i in range(200)]
    budget = 2000
    got = {r["doc_id"]: (r["cum_tokens"], r["kept"])
           for r in budget_select(
               spark.createDataFrame(rows, "doc_id long, s long, n_tokens long"),
               budget, score_col="s", bucket_width=1000,
           ).collect()}
    want, acc = {}, 0
    for i, s, t in sorted(rows, key=lambda x: (-x[1], x[0])):
        acc += t
        want[i] = (acc, acc <= budget)
    assert got == want
    ks = [v[1] for v in want.values()]
    assert any(ks) and not all(ks)  # boundary genuinely exercised


def test_ict_pairs(spark):
    """ICT pick is md5-deterministic; query+context partition the token
    stream; sub-2-group docs emit nothing."""
    from document_quality_assessment_ocr_spark.operators.augment import (
        ict_pairs,
    )

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(25))),   # 3 groups (last short)
         (2, "a b c"),                                  # 1 group -> dropped
         (3, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ict_pairs(docs, span_tokens=10).collect()}
    assert sorted(out) == [1]
    r = out[1]
    assert r["n_tokens"] == 25 and r["n_groups"] == 3
    toks = [f"t{i}" for i in range(25)]
    g = int(r["pick"])
    assert r["query"] == " ".join(toks[g * 10:(g + 1) * 10])
    assert r["context"] == " ".join(toks[:g * 10] + toks[(g + 1) * 10:])
    # query tokens + context tokens == the document, order preserved
    assert sorted(r["query"].split() + r["context"].split()) == sorted(toks)
    again = ict_pairs(docs, span_tokens=10).collect()[0]
    assert again["pick"] == r["pick"]


# ---------------------------------------------------------- blocklist gate
def test_blocklist_gate(spark):
    """Token-exact counts (occurrences, not distinct), integer permille,
    any-hit threshold, empty/None text → 0s and unblocked."""
    from document_quality_assessment_ocr_spark.operators.quality import (
        blocklist_gate,
    )

    d = spark.createDataFrame(
        [
            (1, "bad BAD word word word"),   # 2 hits of 5 (case-folded)
            (2, "worse word"),               # 1 hit of 2
            (3, "clean words only here"),    # 0 hits
            (4, ""),                         # empty
            (5, None),                       # null
            (6, "badly bad-word embedded"),  # substrings never match
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in blocklist_gate(
            d, ["bad", "worse"], min_bad_tokens=2
        ).collect()
    }
    assert (out[1]["n_tokens"], out[1]["n_bad_tokens"]) == (5, 2)
    assert out[1]["bad_permille"] == 2000 // 5 and out[1]["blocked"]
    assert (out[2]["n_bad_tokens"], out[2]["blocked"]) == (1, False)
    assert (out[3]["n_bad_tokens"], out[3]["blocked"]) == (0, False)
    for i in (4, 5):
        assert (out[i]["n_tokens"], out[i]["bad_permille"]) == (0, 0)
        assert not out[i]["blocked"]
    assert out[6]["n_bad_tokens"] == 0  # 'badly'/'bad-word' are not 'bad'


def test_weighted_priority_sample(spark):
    """Winners equal the python k-smallest (u DIV w, id) replay; heavier
    rows beat lighter rows holding the draw fixed; replay-stable;
    k > n returns all n."""
    from document_quality_assessment_ocr_spark.operators.sampling import (
        weighted_priority_sample,
    )

    rows = [(i, (i * 7) % 50 + 1) for i in range(200)]
    d = spark.createDataFrame(rows, "doc_id long, w long")
    out = weighted_priority_sample(d, k=12, weight_col="w", salt="s").collect()
    assert len(out) == 12
    prios = sorted(
        (int(hashlib.md5(f"s#{i}".encode()).hexdigest()[:15], 16) // w, i, w)
        for i, w in rows
    )[:12]
    assert [
        (r["priority"], r["doc_id"], r["weight"])
        for r in sorted(out, key=lambda r: r["rank"])
    ] == prios
    again = weighted_priority_sample(d, k=12, weight_col="w", salt="s").collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
    # weight monotonicity: same id (same draw u), bigger w → smaller priority
    u0 = int(hashlib.md5(b"s#0").hexdigest()[:15], 16)
    assert u0 // 50 < u0 // 1
    small = spark.createDataFrame([(1, 5), (2, 9)], "doc_id long, w long")
    assert len(weighted_priority_sample(small, k=10, weight_col="w").collect()) == 2


def test_hll_overlap_matches_python_and_exact(spark):
    """Register-level python replay (per-side max-rho, union = max), exact
    powers-of-two harmonic equality, inclusion-exclusion identity, and the
    audit intersection is the true one."""
    from document_quality_assessment_ocr_spark.operators.sketches import (
        hll_overlap,
    )

    a_items = [f"w{i}" for i in range(300)]
    b_items = [f"w{i}" for i in range(200, 450)]  # true overlap = 100
    df = spark.createDataFrame(
        [("a", w) for w in a_items] + [("b", w) for w in b_items],
        "side string, item string",
    )
    out = hll_overlap(df, "side", "item", "a", "b", with_exact=True).collect()[0]

    def regs(items):
        rr = {}
        for w in items:
            h = hashlib.md5(w.encode()).hexdigest()
            reg, v = int(h[:2], 16), int(h[2:10], 16)
            rho = 33 if v == 0 else 33 - len(bin(v)[2:])
            rr[reg] = max(rr.get(reg, 0), rho)
        return rr

    ra, rb = regs(a_items), regs(b_items)
    ru = {r: max(ra.get(r, 0), rb.get(r, 0)) for r in set(ra) | set(rb)}
    for name, rr in (("a", ra), ("b", rb), ("union", ru)):
        assert out[f"n_hit_{name}"] == len(rr)
        assert out[f"harmonic_{name}"] == sum(
            2.0 ** -x for x in rr.values()
        ) + (256 - len(rr))
    assert out["overlap_est"] == out["est_a"] + out["est_b"] - out["est_union"]
    assert (out["exact_a"], out["exact_b"], out["exact_overlap"]) == (300, 250, 100)
    # m=256 → 6.5% standard error per estimate; the difference compounds,
    # so just require the estimate lands in a generous truth neighbourhood
    assert abs(out["overlap_est"] - 100) < 120


def test_span_corruption(spark):
    """Python replay of the md5 tile offsets: sentinels replace exactly
    the masked spans in place; targets carry sentinel+span; passthrough
    for sub-tile docs; reconstruction recovers the document."""
    from document_quality_assessment_ocr_spark.operators.augment import (
        span_corruption,
    )

    toks = [f"t{i}" for i in range(47)]  # 2 full tiles of 20 + tail 7
    docs = spark.createDataFrame(
        [(1, " ".join(toks)), (2, "a b c"), (3, None)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in span_corruption(docs, tile_tokens=20, span_tokens=3).collect()
    }
    r = out[1]
    assert (r["n_tokens"], r["n_spans"], r["n_masked"]) == (47, 2, 6)

    def off(doc_id, g):
        h = hashlib.md5(f"{doc_id}|sc3|{g}".encode()).hexdigest()
        return int(h[:15], 16) % (20 - 3 + 1)

    inp, tgt = [], []
    for g in range(2):
        o = off(1, g)
        tile = toks[g * 20 : (g + 1) * 20]
        inp += tile[:o] + [f"<extra_id_{g}>"] + tile[o + 3 :]
        tgt += [f"<extra_id_{g}>"] + tile[o : o + 3]
    inp += toks[40:]
    assert r["inputs"] == " ".join(inp)
    assert r["targets"] == " ".join(tgt)
    # reconstruction: substituting each sentinel's target span back into
    # inputs yields the original document
    rec = r["inputs"]
    parts = r["targets"].split()
    spans = {}
    cur = None
    for t in parts:
        if t.startswith("<extra_id_"):
            cur = t
            spans[cur] = []
        else:
            spans[cur].append(t)
    for s_tok, body in spans.items():
        rec = rec.replace(s_tok, " ".join(body))
    assert rec == " ".join(toks)
    # passthrough: shorter than one tile
    assert (out[2]["n_spans"], out[2]["targets"]) == (0, "")
    assert out[2]["inputs"] == "a b c"
    assert (out[3]["n_tokens"], out[3]["inputs"]) == (0, "")


def test_bt_strength_matches_python_replay(spark):
    """The fixed-point MM update replayed in python ints equals the
    engine bit-for-bit; more wins against the same field → higher
    strength; zero-win items fix at 0."""
    from document_quality_assessment_ocr_spark.operators.graph import (
        BT_NUM,
        BT_SCALE,
        bt_strength,
    )

    raw = [(1, 2)] * 3 + [(2, 3)] * 2 + [(1, 3), (3, 1), (1, 4)]
    pairs = spark.createDataFrame(raw, "winner_id long, loser_id long")
    out = {r["item_id"]: r for r in bt_strength(pairs, iters=3).collect()}

    edges, wins, games = {}, {}, {}
    for w, l in raw:
        edges[(min(w, l), max(w, l))] = edges.get((min(w, l), max(w, l)), 0) + 1
        wins[w] = wins.get(w, 0) + 1
        games[w] = games.get(w, 0) + 1
        games[l] = games.get(l, 0) + 1
    s = {i: BT_SCALE for i in games}
    for _ in range(3):
        d = {}
        for (i, j), n in edges.items():
            t_ij = (n * BT_NUM) // max(s[i] + s[j], 1)
            d[i] = d.get(i, 0) + t_ij
            d[j] = d.get(j, 0) + t_ij
        s = {
            i: (wins.get(i, 0) * BT_NUM) // max(d.get(i, 0), 1)
            for i in games
        }
    for i in games:
        assert out[i]["strength_micro"] == s[i], i
        assert out[i]["n_wins"] == wins.get(i, 0)
        assert out[i]["n_games"] == games[i]
    # item 1 won 5 of 6; item 4 never won
    assert out[1]["strength_micro"] > out[2]["strength_micro"]
    assert out[4]["strength_micro"] == 0


def test_kneser_ney_bits_python_replay(spark):
    """Full integer-recipe replay on a tiny corpus; KN property: a w2
    with more DISTINCT left contexts earns a larger continuation prob
    than an equally frequent w2 glued to one context."""
    from document_quality_assessment_ocr_spark.operators.lm import (
        kneser_ney_bits,
    )

    texts = {
        1: "a x b x c x d x",      # x follows 4 distinct contexts
        2: "e y e y e y e y",      # y always follows e
        3: "a x c x",
        4: "solo",                  # <2 tokens → NULL avg, keep false
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in kneser_ney_bits(docs).collect()}

    bigs = {}
    per_doc = {}
    for i, t in texts.items():
        tk = t.split()
        bgs = [f"{a} {b}" for a, b in zip(tk, tk[1:])]
        per_doc[i] = bgs
        for b in bgs:
            bigs[b] = bigs.get(b, 0) + 1
    c1, n1l, n1r = {}, {}, {}
    for b, c in bigs.items():
        w1, w2 = b.split(" ")
        c1[w1] = c1.get(w1, 0) + c
        n1l[w1] = n1l.get(w1, 0) + 1
        n1r[w2] = n1r.get(w2, 0) + 1
    n1t = len(bigs)

    def p_micro(b):
        w1, w2 = b.split(" ")
        main = (max(bigs[b] * 1000 - 750, 0) * 1000) // c1[w1]
        lam = (750 * 1000 * n1l[w1]) // c1[w1]
        pc = (n1r[w2] * 1000000) // n1t
        return main + (lam * pc) // 1000000

    def bits(b):
        return len(bin(1000000 // max(p_micro(b), 1))[2:]) - 1

    for i, bgs in per_doc.items():
        if len(bgs) == 0:
            assert out[i]["n_bigrams"] == 0 and out[i]["avg_bits"] is None
            assert out[i]["keep"] is False
            continue
        assert out[i]["n_bigrams"] == len(bgs)
        assert out[i]["sum_bits"] == sum(bits(b) for b in bgs)
        assert out[i]["avg_bits"] == sum(bits(b) for b in bgs) / len(bgs)
    # continuation property: P_cont(x) > P_cont(y) because x follows 4
    # distinct contexts while y follows 1 (equal total frequency 6 vs 4)
    assert (n1r["x"] * 1000000) // n1t > (n1r["y"] * 1000000) // n1t


def test_rho1_excess_select_python_replay(spark):
    """Full integer-recipe replay: excess = unigram-continuation bits
    minus MLE-bigram bits, per-doc ceil(rho*n/1000) top-excess pick with
    (excess DESC, pos ASC) ties."""
    from document_quality_assessment_ocr_spark.operators.lm import (
        rho1_excess_select,
    )

    texts = {
        1: "the cat sat on the mat the cat ran",
        2: "alpha beta alpha beta alpha beta",
        3: "unique words only here now",
        4: "solo",
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in rho1_excess_select(docs, rho_milli=300).collect()}

    bigs, per_doc = {}, {}
    for i, t in texts.items():
        tk = t.split()
        bgs = [f"{a} {b}" for a, b in zip(tk, tk[1:])]
        per_doc[i] = bgs
        for b in bgs:
            bigs[b] = bigs.get(b, 0) + 1
    c1, c2 = {}, {}
    for b, c in bigs.items():
        w1, w2 = b.split(" ")
        c1[w1] = c1.get(w1, 0) + c
        c2[w2] = c2.get(w2, 0) + c
    nb = sum(bigs.values())

    def bits(p):
        return len(bin(1000000 // max(p, 1))[2:]) - 1

    def excess(b):
        w1, w2 = b.split(" ")
        return bits((c2[w2] * 1000000) // nb) - bits((bigs[b] * 1000000) // c1[w1])

    for i, bgs in per_doc.items():
        if not bgs:
            assert out[i]["n_bigrams"] == 0 and out[i]["top_pos"] is None
            continue
        ranked = sorted(
            [(excess(b), pos + 1) for pos, b in enumerate(bgs)],
            key=lambda e: (-e[0], e[1]),
        )
        n = len(bgs)
        k = (300 * n + 999) // 1000
        assert out[i]["n_bigrams"] == n
        assert out[i]["n_selected"] == k
        assert out[i]["sum_excess_sel"] == sum(e for e, _ in ranked[:k])
        assert out[i]["top_pos"] == ranked[0][1]


def test_binary_sig_topk_full_rerank_equals_bruteforce(spark):
    """With rerank >= corpus-1 the Hamming prefilter admits everyone, so
    the final ranking must equal exact brute-force cosine top-k."""
    import numpy as np

    from document_quality_assessment_ocr_spark.operators.similarity import (
        binary_sig_topk,
        cosine_topk_bruteforce,
    )

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    bt = binary_sig_topk(
        emb, probe_ids=[0, 1, 2], dim=16, k=4, n_planes=24, rerank=39
    )
    bf = cosine_topk_bruteforce(emb, probe_ids=[0, 1, 2], k=4)
    got = {(r["probe_id"], r["rank"]): (r["neighbor_id"], r["cos"]) for r in bt.collect()}
    want = {(r["probe_id"], r["rank"]): (r["neighbor_id"], r["cos"]) for r in bf.collect()}
    assert got == want


def test_binary_sig_topk_prefilter_properties(spark):
    """Tight rerank: survivors are the Hamming-nearest; probe never its
    own neighbour; hd is symmetric-consistent with the packed signatures;
    ranks dense 1..k."""
    import numpy as np

    from document_quality_assessment_ocr_spark.operators.similarity import (
        binary_sig_topk,
        hyperplane_lsh_buckets,
    )

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = binary_sig_topk(
        emb, probe_ids=[3, 4], dim=16, k=3, n_planes=20, rerank=8
    ).collect()
    sigs = {
        r["vec_id"]: r["bucket"]
        for r in hyperplane_lsh_buckets(emb, 16, 20, 42).collect()
    }
    by_probe = {}
    for r in out:
        assert r["neighbor_id"] != r["probe_id"]
        assert r["hd"] == bin(sigs[r["probe_id"]] ^ sigs[r["neighbor_id"]]).count("1")
        by_probe.setdefault(r["probe_id"], []).append(r)
    for pid, rs in by_probe.items():
        assert sorted(x["rank"] for x in rs) == list(range(1, len(rs) + 1))
        # every reported neighbour is inside the true Hamming top-8
        hams = sorted(
            (bin(sigs[pid] ^ s).count("1"), vid)
            for vid, s in sigs.items() if vid != pid
        )
        allowed = {vid for _, vid in hams[:8]}
        assert {x["neighbor_id"] for x in rs} <= allowed


def test_morton16_matches_python_and_tiles():
    """The shared morton16_sql expression text replayed in python: exact
    bit interleave, bounded to 16 bits, and z-cells of 64 form aligned
    (x, y) tiles (the zone-map selectivity property)."""
    from document_quality_assessment_ocr_spark.operators.layout import (
        morton16_py,
        morton16_sql,
    )

    def interleave(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for x in (0, 1, 2, 3, 17, 128, 200, 255):
        for y in (0, 1, 5, 64, 255):
            assert morton16_py(x, y) == interleave(x, y)
    assert morton16_py(255, 255) == 65535
    # the SQL text uses only the shared operator subset
    s = morton16_sql("xb", "yb")
    assert "<<" not in s and "DIV" not in s and "//" not in s
    # 64 consecutive z-cells cover an 8x8 (x, y) tile
    cells = {(x, y) for x in range(256) for y in range(256)
             if morton16_py(x, y) // 64 == 3}
    xs, ys = {x for x, _ in cells}, {y for _, y in cells}
    assert len(cells) == 64 and len(xs) == 8 and len(ys) == 8


def test_zorder_layout_spark_matches_python(spark):
    """Engine z-keys equal the python replay; file_id = zkey DIV 64."""
    from document_quality_assessment_ocr_spark.operators.layout import (
        morton16_py,
        zorder_layout,
    )

    rows = [(i, (i * 37) % 256, (i * 91) % 256) for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, xb long, yb long")
    out = {r["doc_id"]: r for r in zorder_layout(df, "xb", "yb").collect()}
    for i, x, y in rows:
        z = morton16_py(x, y)
        assert out[i]["zkey"] == z
        assert out[i]["file_id"] == z // 64


def test_matryoshka_full_rerank_equals_bruteforce(spark):
    """With rerank >= corpus-1 the coarse stage admits everyone, so the
    full-dim rerank must equal exact brute-force cosine top-k."""
    import numpy as np

    from document_quality_assessment_ocr_spark.operators.similarity import (
        cosine_topk_bruteforce,
        matryoshka_topk,
    )

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    mt = matryoshka_topk(
        emb, probe_ids=[0, 1, 2], dim=16, d_pre=4, k=4, rerank=39
    )
    bf = cosine_topk_bruteforce(emb, probe_ids=[0, 1, 2], k=4)
    got = {(r["probe_id"], r["rank"]): (r["neighbor_id"], r["cos"]) for r in mt.collect()}
    want = {(r["probe_id"], r["rank"]): (r["neighbor_id"], r["cos"]) for r in bf.collect()}
    assert got == want


def test_matryoshka_prefilter_properties(spark):
    """Tight rerank: every survivor is inside the true coarse top-m; the
    coarse score is the prefix-slice cosine; ranks dense 1..k."""
    import numpy as np

    from document_quality_assessment_ocr_spark.operators.similarity import (
        matryoshka_topk,
    )

    rng = np.random.default_rng(9)
    vecs = {i: rng.standard_normal(12) for i in range(50)}
    rows = [(i, [float(x) for x in v]) for i, v in vecs.items()]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = matryoshka_topk(
        emb, probe_ids=[7, 8], dim=12, d_pre=4, k=3, rerank=6
    ).collect()

    def cos(a, b):
        return float(np.dot(a, b) / np.sqrt(np.dot(a, a) * np.dot(b, b)))

    by_probe = {}
    for r in out:
        assert r["neighbor_id"] != r["probe_id"]
        pc = round(cos(vecs[r["probe_id"]][:4], vecs[r["neighbor_id"]][:4]), 6)
        assert abs(r["ccos"] - pc) < 1e-9
        by_probe.setdefault(r["probe_id"], []).append(r)
    for pid, rs in by_probe.items():
        assert sorted(x["rank"] for x in rs) == list(range(1, len(rs) + 1))
        coarse = sorted(
            (-round(cos(vecs[pid][:4], vecs[j][:4]), 6), j)
            for j in vecs if j != pid
        )[:6]
        admitted = {j for _, j in coarse}
        assert all(r["neighbor_id"] in admitted for r in rs)


def test_hits_fixed_python_replay(spark):
    """Fixed-point HITS replayed in python ints equals the engine
    bit-for-bit; the most-pointed-at node tops authority, the
    best-pointing node tops hubs."""
    from document_quality_assessment_ocr_spark.operators.graph import (
        HITS_SCALE,
        hits_fixed,
    )

    raw = [(1, 3), (1, 4), (2, 3), (2, 4), (5, 3), (1, 3), (4, 5)]
    edges = spark.createDataFrame(raw, "src long, dst long")
    out = {r["id"]: r for r in hits_fixed(edges, iters=3).collect()}

    nodes = {n for e in raw for n in e}
    h = {n: HITS_SCALE for n in nodes}
    a = {}
    for _ in range(3):
        ar = {}
        for s, d in raw:
            ar[d] = ar.get(d, 0) + h.get(s, 0)
        mx = max(ar.values())
        a = {d: (v * HITS_SCALE) // max(mx, 1) for d, v in ar.items()}
        hr = {}
        for s, d in raw:
            hr[s] = hr.get(s, 0) + a.get(d, 0)
        mx = max(hr.values())
        h = {s: (v * HITS_SCALE) // max(mx, 1) for s, v in hr.items()}
    for n in nodes:
        assert out[n]["hub_micro"] == h.get(n, 0), n
        assert out[n]["auth_micro"] == a.get(n, 0), n
    # node 3 is cited by 1 (twice), 2, 5 -> top authority; node 1 points
    # at both strong authorities -> top hub
    assert out[3]["auth_micro"] == max(r["auth_micro"] for r in out.values())
    assert out[1]["hub_micro"] == max(r["hub_micro"] for r in out.values())


def test_borda_fuse_matches_naive(spark):
    """Bucket-offset ranks equal the naive global sort per signal; borda
    is their sum; tier = borda DIV tier_width."""
    from document_quality_assessment_ocr_spark.operators.curriculum import (
        borda_fuse,
    )

    rows = [
        (i, (i * 13) % 2500, (i * 7 + 3) % 1800, ((i * i) % 3000))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, s1 long, s2 long, s3 long")
    out = {
        r["doc_id"]: r
        for r in borda_fuse(
            df, ["s1", "s2", "s3"], bucket_width=100, tier_width=50
        ).collect()
    }
    for idx, col in enumerate(["s1", "s2", "s3"], start=1):
        order = sorted(rows, key=lambda r: (-r[idx], r[0]))
        for rank, r in enumerate(order):
            assert out[r[0]][f"r_{col}"] == rank, (col, r)
    for r in rows:
        o = out[r[0]]
        b = o["r_s1"] + o["r_s2"] + o["r_s3"]
        assert o["borda"] == b and o["tier"] == b // 50


def test_fragment_stitch_finds_seams_and_caps_boilerplate(spark):
    """Planted overlapping fragments stitch left->right; a boundary
    occurring more than key_cap times drops entirely; short fragments
    carry no boundary."""
    from document_quality_assessment_ocr_spark.operators.dedup import (
        fragment_stitch,
    )

    seam = " ".join(f"s{i}" for i in range(4))
    rows = [
        (1, "a1 a2 a3 " + seam),        # tail == seam
        (2, seam + " b1 b2 b3"),        # head == seam -> (1, 2)
        (3, "c1 c2 " + seam + " c3"),   # seam inside, not boundary
        (4, "short frag"),              # < k tokens, drops
    ]
    # boilerplate boundary repeated 3x on each side (cap 2 drops it)
    bp = " ".join(f"x{i}" for i in range(4))
    for j in range(3):
        rows.append((10 + j, f"l{j} " + bp))
        rows.append((20 + j, bp + f" r{j}"))
    frags = spark.createDataFrame(rows, "doc_id long, text string")
    out = fragment_stitch(frags, k=4, key_cap=2).collect()
    pairs = {(r["left_id"], r["right_id"]) for r in out}
    assert pairs == {(1, 2)}
    # with a looser cap the boilerplate pairs appear (3x3 minus none)
    out2 = fragment_stitch(frags, k=4, key_cap=3).collect()
    pairs2 = {(r["left_id"], r["right_id"]) for r in out2}
    assert pairs2 == {(1, 2)} | {(10 + a, 20 + b) for a in range(3) for b in range(3)}


def test_template_expand_renders_and_replays(spark):
    """Template pick replays the md5 recipe; input is prefix||head||suffix
    of the chosen template; target is the next n_target tokens; short and
    empty docs render empty strings, never NULL."""
    import hashlib

    from document_quality_assessment_ocr_spark.operators.augment import (
        INSTRUCTION_TEMPLATES,
        template_expand,
    )

    rows = [
        (1, " ".join(f"w{i}" for i in range(60))),
        (2, "only three words"),
        (3, ""),
        (4, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in template_expand(docs, n_head=5, n_target=4, salt=7).collect()
    }
    for i, text in rows:
        tid = int(hashlib.md5(f"{i}|tpl7".encode()).hexdigest()[:15], 16) % len(
            INSTRUCTION_TEMPLATES
        )
        toks = (text or "").split()
        pre, suf = INSTRUCTION_TEMPLATES[tid]
        assert out[i]["tpl_id"] == tid
        assert out[i]["n_tokens"] == len(toks)
        assert out[i]["input"] == pre + " ".join(toks[:5]) + suf
        assert out[i]["target"] == " ".join(toks[5:9])
        assert out[i]["input"] is not None and out[i]["target"] is not None


def test_group_percentile_matches_naive(spark):
    """Bucket-offset per-group ranks equal the naive per-group sort;
    percentile endpoints are 0 and scale; singleton groups get 0."""
    from document_quality_assessment_ocr_spark.operators.curriculum import (
        group_percentile,
    )

    rows = [(i, f"s{i % 3}", (i * 17) % 2500) for i in range(90)]
    rows.append((1000, "lone", 42))
    df = spark.createDataFrame(rows, "doc_id long, source string, sc long")
    out = {
        r["doc_id"]: r
        for r in group_percentile(df, "sc", "source", bucket_width=100).collect()
    }
    groups = {}
    for i, g, s in rows:
        groups.setdefault(g, []).append((s, i))
    for g, members in groups.items():
        members.sort()
        n = len(members)
        for rank, (s, i) in enumerate(members):
            o = out[i]
            assert o["rank_in_group"] == rank, (g, i)
            assert o["n_group"] == n
            assert o["pctl_micro"] == (rank * 1_000_000) // max(n - 1, 1)
    assert out[1000]["pctl_micro"] == 0 and out[1000]["n_group"] == 1


def test_png_chunk_profile_and_stats(spark):
    """The shared chunk-table walk reads back what png.encode_gray wrote;
    malformed containers raise in the shared fn and surface as error rows
    (not crashes) in the mapInPandas operator."""
    import numpy as np

    from document_quality_assessment_ocr_spark import png
    from document_quality_assessment_ocr_spark.operators.multimodal import (
        png_chunk_profile_values,
        png_chunk_stats,
    )

    arr = np.arange(120, dtype=np.uint8).reshape(10, 12)
    with_dpi = png.encode_gray(arr, dpi=300)
    no_dpi = png.encode_gray(arr, dpi=0)
    v = png_chunk_profile_values(with_dpi)
    assert v[2] == 12 and v[3] == 10 and v[4] == 8 and v[5] == 0
    assert v[6] == "IHDR,pHYs,IDAT,IEND" and v[0] == 4
    assert v[1] == len(with_dpi) - 8 - 4 * 12 - 13 - 9  # idat payload bytes
    v2 = png_chunk_profile_values(no_dpi)
    assert v2[6] == "IHDR,IDAT,IEND" and v2[0] == 3
    import pytest as _pt

    for bad in (b"", b"nope", with_dpi[:20], with_dpi + b"trailing"):
        with _pt.raises(ValueError):
            png_chunk_profile_values(bad)

    rows = [
        ("good", bytearray(with_dpi)),
        ("trunc", bytearray(with_dpi[:20])),
        ("junk", bytearray(b"not a png at all")),
    ]
    pay = spark.createDataFrame(rows, "media_ref string, png binary")
    out = {r["media_ref"]: r for r in png_chunk_stats(pay).collect()}
    assert out["good"]["error"] is None and out["good"]["width"] == 12
    assert out["good"]["chunk_types"] == "IHDR,pHYs,IDAT,IEND"
    assert out["trunc"]["error"] is not None and out["trunc"]["width"] is None
    assert out["junk"]["error"] is not None


def test_mw_domain_weights_python_replay(spark):
    """Fixed-point MW rounds replayed in python ints equal the engine
    bit-for-bit; the best (lowest-loss) domain ends with the smallest
    weight, the worst with the largest; weights renormalize to ~SCALE."""
    from document_quality_assessment_ocr_spark.operators.sampling import (
        MW_SCALE,
        mw_domain_weights,
    )

    rows = [
        (1, "web", 50, 10), (2, "web", 70, 10),
        (3, "code", 20, 10), (4, "code", 22, 10),
        (5, "wiki", 40, 10), (6, "wiki", 44, 12),
    ]
    per_doc = spark.createDataFrame(
        rows, "doc_id long, source string, sum_bits long, n_tokens long"
    )
    out = {
        r["source"]: r
        for r in mw_domain_weights(
            per_doc, "source", iters=3, eta_milli=200
        ).collect()
    }

    agg = {}
    for _, g, sb, nt in rows:
        a = agg.setdefault(g, [0, 0])
        a[0] += sb
        a[1] += nt
    m = {g: (sb * MW_SCALE) // max(nt, 1) for g, (sb, nt) in agg.items()}
    mn = min(m.values())
    ex = {g: v - mn for g, v in m.items()}
    w = {g: MW_SCALE for g in m}
    for _ in range(3):
        wr = {
            g: (w[g] * (MW_SCALE + (200 * ex[g]) // 1000)) // MW_SCALE
            for g in m
        }
        tot = sum(wr.values())
        w = {g: (wr[g] * MW_SCALE) // max(tot, 1) for g in m}
    for g in m:
        assert out[g]["m_micro"] == m[g], g
        assert out[g]["excess_micro"] == ex[g]
        assert out[g]["weight_micro"] == w[g]
    assert out["web"]["weight_micro"] == max(r["weight_micro"] for r in out.values())
    assert out["code"]["weight_micro"] == min(r["weight_micro"] for r in out.values())
    assert abs(sum(r["weight_micro"] for r in out.values()) - MW_SCALE) <= len(m)


def test_token_drift_python_replay(spark):
    """Fixed-point TVD + top-k drift panel replayed in python ints; a
    token present only on one side drifts hardest; identical corpora
    drift zero."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        DRIFT_SCALE,
        token_drift,
    )

    a_rows = [(1, "apple banana apple cherry"), (2, "apple date")]
    b_rows = [(3, "banana banana fig apple"), (4, "fig fig date")]
    a = spark.createDataFrame(a_rows, "doc_id long, text string")
    b = spark.createDataFrame(b_rows, "doc_id long, text string")
    out = token_drift(a, b, k=10).collect()

    def counts(rows):
        c = {}
        for _, t in rows:
            for w in t.lower().split():
                c[w] = c.get(w, 0) + 1
        return c

    ca, cb = counts(a_rows), counts(b_rows)
    na, nb = sum(ca.values()), sum(cb.values())
    toks = set(ca) | set(cb)
    stats = {}
    for t in toks:
        pa = (ca.get(t, 0) * DRIFT_SCALE) // max(na, 1)
        pb = (cb.get(t, 0) * DRIFT_SCALE) // max(nb, 1)
        stats[t] = (ca.get(t, 0), cb.get(t, 0), pa, pb, abs(pa - pb))
    tv = sum(v[4] for v in stats.values()) // 2
    order = sorted(stats, key=lambda t: (-stats[t][4], t))
    assert [r["token"] for r in out] == order
    for r in out:
        t = r["token"]
        assert (r["ca"], r["cb"], r["pa_micro"], r["pb_micro"], r["l1_micro"]) == stats[t]
        assert r["tv_micro"] == tv
    assert [r["rank"] for r in out] == list(range(1, len(order) + 1))
    # cherry (a-only) and fig (b-only, heavier) top the panel family-wise
    assert out[0]["token"] in ("fig", "cherry", "banana", "apple")
    # identical corpora -> zero TVD
    out2 = token_drift(a, a, k=5).collect()
    assert all(r["tv_micro"] == 0 and r["l1_micro"] == 0 for r in out2)


def test_zone_map_audit_python_replay(spark):
    """Bucketed min/max pruning audit replayed in python; a value-sorted
    id layout prunes strictly more than a shuffled one at the same
    threshold (the re-cluster motivation the audit exists to quantify)."""
    from document_quality_assessment_ocr_spark.operators.profile import zone_map_audit

    import random

    rnd = random.Random(7)
    vals = [rnd.randrange(0, 1000) for _ in range(200)]
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "doc_id long, v long")
    thresholds = [10, 500, 990, 2000]
    out = {r["threshold"]: r for r in zone_map_audit(
        df, "v", thresholds=thresholds, bucket_size=16
    ).collect()}

    buckets = {}
    for i, v in rows:
        buckets.setdefault(i // 16, []).append(v)
    for t in thresholds:
        pruned = [b for b in buckets.values() if max(b) < t]
        full = [b for b in buckets.values() if min(b) >= t]
        skipped = sum(len(b) for b in pruned)
        r = out[t]
        assert r["n_buckets"] == len(buckets)
        assert r["n_pruned"] == len(pruned)
        assert r["n_full"] == len(full)
        assert r["rows_total"] == 200
        assert r["rows_skipped"] == skipped
        assert r["skip_micro"] == skipped * 1_000_000 // 200
    assert out[2000]["skip_micro"] == 1_000_000  # everything prunable
    assert out[10]["n_pruned"] == 0  # nothing below the floor-ish threshold

    # sorted layout: ids assigned by value rank → contiguous value ranges
    srt = spark.createDataFrame(
        [(i, v) for i, v in enumerate(sorted(vals))], "doc_id long, v long"
    )
    out_s = {r["threshold"]: r for r in zone_map_audit(
        srt, "v", thresholds=[500], bucket_size=16
    ).collect()}
    assert out_s[500]["n_pruned"] >= out[500]["n_pruned"]
    assert out_s[500]["n_pruned"] + out_s[500]["n_full"] >= 11  # ~all decided


def test_distinct_ngram_diversity_python_replay(spark):
    """Fixed-point distinct-n replayed in python; a looping source scores
    far below a novel one on distinct-2/3."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        DIVERSITY_SCALE,
        distinct_ngram_diversity,
    )

    rows = [
        ("loop", "spam spam spam spam spam spam"),
        ("loop", "spam spam spam spam"),
        ("novel", "one two three four five six"),
        ("novel", "seven eight nine ten"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {(r["source"], r["n"]): r for r in distinct_ngram_diversity(
        df, ns=(1, 2, 3)
    ).collect()}

    def grams(text, n):
        tk = text.lower().split()
        return [" ".join(tk[i : i + n]) for i in range(len(tk) - n + 1)]

    for src in ("loop", "novel"):
        texts = [t for s, t in rows if s == src]
        for n in (1, 2, 3):
            g = [x for t in texts for x in grams(t, n)]
            r = out[(src, n)]
            assert r["total_ngrams"] == len(g)
            assert r["distinct_ngrams"] == len(set(g))
            assert r["distinct_micro"] == len(set(g)) * DIVERSITY_SCALE // max(len(g), 1)
    assert out[("loop", 2)]["distinct_micro"] < out[("novel", 2)]["distinct_micro"] // 3
    assert out[("novel", 3)]["distinct_micro"] == DIVERSITY_SCALE  # all unique


def test_triangle_count_python_replay(spark):
    """Degree-oriented triangle counting replayed by brute force on a
    known graph; direction, multiplicity, and self-loops are ignored;
    triangle-free nodes surface 0."""
    from document_quality_assessment_ocr_spark.operators.graph import triangle_count

    # two triangles sharing edge b-c, a pendant e, a self-loop, dup edges
    raw = [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("b", "d"), ("d", "c"),
        ("d", "e"),
        ("c", "b"), ("a", "b"),  # reverse + duplicate
        ("e", "e"),              # self-loop
    ]
    df = spark.createDataFrame(raw, "src string, dst string")
    out = {r["id"]: r for r in triangle_count(df).collect()}

    und = {tuple(sorted(e)) for e in raw if e[0] != e[1]}
    nodes = sorted({x for e in und for x in e})
    deg = {n: sum(n in e for e in und) for n in nodes}
    tri = {n: 0 for n in nodes}
    import itertools

    for u, v, w in itertools.combinations(nodes, 3):
        if {tuple(sorted((u, v))), tuple(sorted((v, w))),
                tuple(sorted((u, w)))} <= und:
            for x in (u, v, w):
                tri[x] += 1
    assert set(out) == set(nodes)
    for n in nodes:
        assert out[n]["degree"] == deg[n], n
        assert out[n]["tri"] == tri[n], n
    assert out["b"]["tri"] == 2 and out["c"]["tri"] == 2
    assert out["e"]["tri"] == 0


def test_containment_pairs_python_replay(spark):
    """Asymmetric containment over banded candidates replayed with python
    shingle sets: a doc extended by one word fully contains its base
    (cont=10⁶ despite Jaccard 8/9), and every emitted pair's exact set
    math matches; the threshold filters."""
    from document_quality_assessment_ocr_spark.operators.dedup import (
        containment_pairs,
    )

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima"
    ).split()
    rows = [
        (1, " ".join(base)),
        (2, " ".join(base + ["mike"])),
        (3, " ".join(base + ["mike", "november"])),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["id_a"], r["id_b"]): r
           for r in containment_pairs(df, min_cont_micro=900_000).collect()}
    # this seed's banded candidates: (1,2) and (2,3) — both full containment
    assert set(out) == {(1, 2), (2, 3)}

    def shingles(t):
        w = t.split()
        return {" ".join(w[i:i + 5]) for i in range(len(w) - 4)}

    texts = dict(rows)
    for (ia, ib), r in out.items():
        sa, sb = shingles(texts[ia]), shingles(texts[ib])
        inter = len(sa & sb)
        assert (r["sz_a"], r["sz_b"], r["inter"]) == (len(sa), len(sb), inter)
        assert r["cont_micro"] == inter * 1_000_000 // min(len(sa), len(sb))
        assert r["small_side"] == ("a" if len(sa) <= len(sb) else "b")
        assert r["cont_micro"] == 1_000_000  # strict superset extensions
    # the threshold filters: nothing below 900k was emitted with math above
    all_pairs = containment_pairs(df, min_cont_micro=0).collect()
    assert all(p["cont_micro"] >= 0 for p in all_pairs)
    assert len(all_pairs) >= len(out)


def test_partition_skew_audit_python_replay(spark):
    """md5-nibble placement replayed with hashlib; a heavily-skewed key
    distribution surfaces a large skew_micro and top_key_micro, and
    every per-P statistic matches the python rollup."""
    import hashlib

    from document_quality_assessment_ocr_spark.operators.profile import (
        partition_skew_audit,
    )

    counts = {"hot": 900, "warm": 60, "cool": 25, "rare_a": 10, "rare_b": 5}
    rows = [(k,) for k, n in counts.items() for _ in range(n)]
    df = spark.createDataFrame(rows, "k string")
    grid = (4, 8)
    out = {r["p"]: r for r in
           partition_skew_audit(df, "k", partition_grid=grid).collect()}

    def pid(k, p):
        return int(hashlib.md5(k.encode()).hexdigest()[:15], 16) % p

    total = sum(counts.values())
    for p in grid:
        parts = {}
        for k, n in counts.items():
            parts.setdefault(pid(k, p), []).append(n)
        r = out[p]
        assert r["n_keys"] == len(counts)
        assert r["n_nonempty"] == len(parts)
        assert r["rows_total"] == total
        assert r["max_rows"] == max(sum(v) for v in parts.values())
        assert r["top_key_rows"] == max(counts.values())
        assert r["skew_micro"] == (
            max(sum(v) for v in parts.values()) * p * 1_000_000 // total
        )
        assert r["top_key_micro"] == max(counts.values()) * 1_000_000 // total
    # the hot key is 90% of rows: any placement is straggler-bound
    assert all(out[p]["skew_micro"] >= 900_000 * 2 for p in grid if len(counts) >= 4)


def test_pmi_collocations_python_replay(spark):
    """Whole-bit PMI replayed in python ints (bit_length-1 == the
    LENGTH(BIN(x))-1 idiom): a welded pair ('new york') outranks a
    frequent-but-independent pair; counts and ranks match exactly."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        pmi_collocations,
    )

    # 'new york' always adjacent; 'the cat' co-occurs but 'the' is everywhere
    doc = ("new york " * 6 + "the cat sat on the mat and the dog ran by "
           "the cat sat on the mat and the dog sat by ")
    rows = [(doc,), (doc,)]
    df = spark.createDataFrame(rows, "text string")
    out = pmi_collocations(df, min_count=2, k=50).collect()

    toks = []
    for (t,) in rows:
        toks.append(t.lower().split())
    uni, big = {}, {}
    for tk in toks:
        for w in tk:
            uni[w] = uni.get(w, 0) + 1
        for i in range(len(tk) - 1):
            g = " ".join(tk[i:i + 2])
            big[g] = big.get(g, 0) + 1
    n = sum(uni.values())
    bits = lambda x: x.bit_length() - 1  # noqa: E731
    exp = {}
    for g, cxy in big.items():
        if cxy < 2:
            continue
        x, y = g.split(" ")
        exp[g] = (cxy, uni[x], uni[y],
                  bits(cxy) + bits(n) - bits(uni[x]) - bits(uni[y]))
    order = sorted(exp, key=lambda g: (-exp[g][3], -exp[g][0], g))
    assert [r["bigram"] for r in out] == order
    for r in out:
        g = r["bigram"]
        assert (r["c_xy"], r["c_x"], r["c_y"], r["pmi_bits"]) == exp[g], g
    assert [r["rank"] for r in out] == list(range(1, len(order) + 1))
    ranks = {r["bigram"]: r["rank"] for r in out}
    assert ranks["new york"] < ranks["the cat"]


def _ev_rows(seq):
    """(event_id, user, type, us_offset) → events rows with real timestamps."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    return [
        (eid, u, t, base + datetime.timedelta(microseconds=us))
        for eid, u, t, us in seq
    ]


def test_funnel_steps_python_replay(spark):
    """Ordered funnel: strictly-after semantics (a same-instant later step
    does NOT count), earliest-qualifying choice, fixed-point conversions."""
    from document_quality_assessment_ocr_spark.operators.sessions import funnel_steps

    seq = [
        # u1 completes A->B->C
        (1, 1, "A", 0), (2, 1, "B", 10), (3, 1, "C", 20),
        # u2 does A then B at the SAME instant as A (must not count), C later
        (4, 2, "A", 0), (5, 2, "B", 0), (6, 2, "C", 50),
        # u3 does B before A: only A counts
        (7, 3, "B", 0), (8, 3, "A", 10),
        # u4 does A->B only; B repeated (earliest-after kept)
        (9, 4, "A", 0), (10, 4, "B", 30), (11, 4, "B", 5),
        # u5 never does A
        (12, 5, "B", 0), (13, 5, "C", 10),
    ]
    ev = spark.createDataFrame(
        _ev_rows(seq),
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    out = {r["step"]: r for r in funnel_steps(ev, ["A", "B", "C"]).collect()}
    # A: u1,u2,u3,u4; B strictly after A: u1 (10>0), u4 (5>0) — NOT u2 (0==0);
    # C after B: u1 (20>10)
    assert [out[i]["n_users"] for i in (1, 2, 3)] == [4, 2, 1]
    assert [out[i]["event_type"] for i in (1, 2, 3)] == ["A", "B", "C"]
    assert out[1]["conv_from_first_micro"] == 1_000_000
    assert out[2]["conv_from_first_micro"] == 2 * 1_000_000 // 4
    assert out[3]["conv_from_first_micro"] == 1 * 1_000_000 // 4
    assert out[2]["conv_from_prev_micro"] == 2 * 1_000_000 // 4
    assert out[3]["conv_from_prev_micro"] == 1 * 1_000_000 // 2


def test_retention_cohorts_python_replay(spark):
    """Cohort matrix replayed in python: first-period cohorts, distinct
    activity periods, retained_micro division."""
    from document_quality_assessment_ocr_spark.operators.sessions import (
        retention_cohorts,
    )

    P = 100  # period in µs for the fixture
    seq = [
        (1, 1, "x", 0), (2, 1, "x", 150), (3, 1, "x", 310),   # u1: p0,1,3
        (4, 2, "x", 50), (5, 2, "x", 70), (6, 2, "x", 199),   # u2: p0,1
        (7, 3, "x", 120), (8, 3, "x", 350),                   # u3: p1,3
    ]
    ev = spark.createDataFrame(
        _ev_rows(seq),
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    out = {(r["cohort_period"], r["offset"]): r
           for r in retention_cohorts(ev, period_us=P).collect()}
    # cohort_period is the ABSOLUTE epoch // P; express expectations
    # relative to the fixture base instant
    import calendar
    import datetime

    base = calendar.timegm(datetime.datetime(2024, 1, 1).timetuple()) * 1_000_000
    b = base // P
    # cohorts: u1,u2 -> b+0; u3 -> b+1
    # cohort b activity: offset0 {u1,u2}, offset1 {u1,u2}, offset3 {u1}
    # cohort b+1 activity: offset0 {u3}, offset2 {u3}
    exp = {
        (b, 0): (2, 2), (b, 1): (2, 2), (b, 3): (2, 1),
        (b + 1, 0): (1, 1), (b + 1, 2): (1, 1),
    }
    assert set(out) == set(exp)
    for key, (size, active) in exp.items():
        r = out[key]
        assert (r["cohort_size"], r["n_active"]) == (size, active), key
        assert r["retained_micro"] == active * 1_000_000 // size


def test_transition_matrix_python_replay(spark):
    """Markov transition counts replayed in python with the (ts, event_id)
    tie-break; per-from-state probabilities sum to ~10⁶."""
    from document_quality_assessment_ocr_spark.operators.sessions import (
        transition_matrix,
    )

    seq = [
        (1, 1, "A", 0), (2, 1, "B", 10), (3, 1, "A", 20), (4, 1, "B", 30),
        # u2 has two events at the same ts: event_id orders them C(5) -> A(6)
        (5, 2, "C", 0), (6, 2, "A", 0), (7, 2, "B", 10),
    ]
    ev = spark.createDataFrame(
        _ev_rows(seq),
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    out = {(r["prev_type"], r["next_type"]): r
           for r in transition_matrix(ev).collect()}
    exp = {("A", "B"): 3, ("B", "A"): 1, ("C", "A"): 1}
    assert {k: v["n"] for k, v in out.items()} == exp
    assert out[("A", "B")]["prob_micro"] == 1_000_000
    assert out[("B", "A")]["prob_micro"] == 1_000_000
    assert out[("C", "A")]["prob_micro"] == 1_000_000


def test_transition_matrix2_python_replay(spark):
    """Second-order transition counts replayed in python: (prev2, prev1)
    context mass normalizes each row; users with < 3 events contribute
    nothing; same-ts events order by event_id."""
    from document_quality_assessment_ocr_spark.operators.sessions import (
        transition_matrix2,
    )

    seq = [
        (1, 1, "A", 0), (2, 1, "B", 10), (3, 1, "A", 20), (4, 1, "B", 30),
        (5, 1, "C", 40),
        # u2 has two events at the same ts: event_id orders them C(6) -> A(7)
        (6, 2, "C", 0), (7, 2, "A", 0), (8, 2, "B", 10),
        # u3: only two events -> no trigram
        (9, 3, "A", 0), (10, 3, "B", 5),
    ]
    ev = spark.createDataFrame(
        _ev_rows(seq),
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    out = {(r["prev2_type"], r["prev_type"], r["next_type"]): r
           for r in transition_matrix2(ev).collect()}
    exp = {("A", "B", "A"): 1, ("B", "A", "B"): 1, ("A", "B", "C"): 1,
           ("C", "A", "B"): 1}
    assert {k: v["n"] for k, v in out.items()} == exp
    # context (A, B) has mass 2 -> each row is 500000 micro
    assert out[("A", "B", "A")]["prob_micro"] == 500_000
    assert out[("A", "B", "C")]["prob_micro"] == 500_000
    assert out[("B", "A", "B")]["prob_micro"] == 1_000_000
    assert out[("C", "A", "B")]["prob_micro"] == 1_000_000


def test_posting_list_size_python_replay(spark):
    """Delta + Elias-gamma posting cost replayed in python; df banding
    drops hapaxes and over-frequent terms; duplicate in-doc occurrences
    collapse."""
    from document_quality_assessment_ocr_spark.operators.retrieval import (
        posting_list_size,
    )

    rows = [
        (0, "the apple banana apple"),
        (3, "the apple cherry"),
        (7, "the apple banana"),
        (9, "the cherry only once here banana"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["term"]: r for r in
           posting_list_size(df, min_df=2, max_df=3).collect()}

    posts = {}
    for did, t in rows:
        for w in set(t.split()):
            posts.setdefault(w, set()).add(did)
    bits = lambda x: x.bit_length() - 1  # noqa: E731
    gamma = lambda g: 2 * bits(g) + 1  # noqa: E731
    exp = {}
    for w, ids in posts.items():
        if not (2 <= len(ids) <= 3):
            continue  # 'the' df=4 over max_df; hapaxes under min_df
        s = sorted(ids)
        total = gamma(s[0] + 1) + sum(
            gamma(b - a) for a, b in zip(s, s[1:])
        )
        exp[w] = (len(ids), total, (total + 7) // 8)
    assert set(out) == set(exp) == {"apple", "banana", "cherry"}
    for w, (dfc, total, by) in exp.items():
        r = out[w]
        assert (r["df"], r["total_bits"], r["bytes_est"]) == (dfc, total, by), w


def test_embedding_dim_profile_python_replay(spark):
    """Truncated-micro per-dim stats replayed in python ints: min-shift
    mean on negative-sum dims, variance clamp on a constant dim."""
    from document_quality_assessment_ocr_spark.operators.similarity import (
        embedding_dim_profile,
    )

    vecs = [
        [-0.5, 0.25, 1.0],
        [-0.25, 0.25, -0.5],
        [-0.125, 0.25, 0.75],
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    out = {r["dim"]: r for r in
           embedding_dim_profile(df, scale=1_000_000).collect()}

    import math

    for dim in range(3):
        col = [int(math.trunc(v[dim] * 1_000_000.0)) for v in vecs]
        n = len(col)
        mn, mx, sv = min(col), max(col), sum(col)
        mean = (sv - n * mn) // n + mn
        svv = sum(c * c for c in col)
        var = max(svv // n - mean * mean, 0)
        r = out[dim]
        assert (r["n"], r["min_micro"], r["max_micro"]) == (n, mn, mx), dim
        assert r["mean_micro"] == mean, dim
        assert r["var_micro2"] == var, dim
    # dim 0 sums negative: the min-shift form must still floor correctly
    assert out[0]["mean_micro"] < 0
    # dim 1 is constant: variance clamps to exactly 0
    assert out[1]["var_micro2"] == 0 and out[1]["mean_micro"] == 250_000


def test_audio_quality_profile_real_wav(spark):
    """Real stdlib-wave path over the seeded catalog: silence payload is
    100% silent, the ramp clips at |x| >= 0.85, corrupt emits no row, and
    every row equals a direct wav_quality_values call."""
    from document_quality_assessment_ocr_spark.operators.multimodal import (
        audio_quality_profile,
        wav_quality_values,
    )
    from document_quality_assessment_ocr_spark.sources.fixtures import (
        build_wav_payloads,
        wav_payload_names,
    )

    cat = build_wav_payloads()
    names = sorted(wav_payload_names())
    pay = spark.createDataFrame(
        [(n, bytearray(cat[n])) for n in names], "media_ref string, png binary"
    )
    out = {r["media_ref"]: r for r in
           audio_quality_profile(pay, frame=512, use_fake_decoder=False).collect()}

    assert "corrupt_wav" not in out
    for n in names:
        if n == "corrupt_wav":
            continue
        nf, ns, nc, pk = wav_quality_values(cat[n], 512)
        r = out[n]
        assert (r["n_frames"], r["n_silent"], r["n_clipped"],
                r["peak_milli"]) == (nf, ns, nc, pk), n
        assert r["silence_micro"] == ns * 1_000_000 // max(nf, 1)
        assert r["clip_micro"] == nc * 1_000_000 // max(nf, 1)
    assert out["silence"]["silence_micro"] == 1_000_000
    assert out["silence"]["n_clipped"] == 0
    assert out["ramp"]["n_clipped"] > 0
    assert out["tone_1k_quiet"]["n_silent"] == 0  # rms ~0.035 > 0.02
    assert out["tone_440"]["peak_milli"] >= 790  # ~0.8 amplitude


def test_join_cardinality_audit_python_replay(spark):
    """Exact join-size estimate and heavy-key panel replayed in python;
    one-sided keys contribute prod=0; amplification vs the larger side."""
    from document_quality_assessment_ocr_spark.operators.profile import (
        join_cardinality_audit,
    )

    a_keys = ["x"] * 6 + ["y"] * 3 + ["z"] * 1 + ["only_a"] * 2
    b_keys = ["x"] * 4 + ["y"] * 5 + ["z"] * 1 + ["only_b"] * 7
    a = spark.createDataFrame([(k,) for k in a_keys], "k string")
    b = spark.createDataFrame([(k,) for k in b_keys], "k string")
    out = {r["key"]: r for r in join_cardinality_audit(a, b, "k", k=10).collect()}

    from collections import Counter

    ca, cb = Counter(a_keys), Counter(b_keys)
    keys = set(ca) | set(cb)
    prods = {k: ca.get(k, 0) * cb.get(k, 0) for k in keys}
    est = sum(prods.values())
    na, nb = len(a_keys), len(b_keys)
    assert set(out) == keys
    order = sorted(keys, key=lambda k: (-prods[k], k))
    assert [r["key"] for r in sorted(out.values(), key=lambda r: r["rank"])] == order
    for k in keys:
        r = out[k]
        assert (r["ca"], r["cb"], r["prod"]) == (ca.get(k, 0), cb.get(k, 0), prods[k])
        assert r["est_total"] == est
        assert r["amp_micro"] == est * 1_000_000 // max(na, nb)
        assert r["share_micro"] == prods[k] * 1_000_000 // max(est, 1)
    assert out["only_a"]["prod"] == 0 and out["only_b"]["prod"] == 0


def test_encoding_advisor_python_replay(spark):
    """Plain-vs-dict byte estimates replayed in python: a low-cardinality
    column wins dict, a unique column wins plain."""
    from document_quality_assessment_ocr_spark.operators.profile import (
        encoding_advisor,
    )

    rows = [(f"unique_value_{i:04d}", "us" if i % 2 else "eu", None)
            for i in range(50)]
    df = spark.createDataFrame(rows, "uid string, region string, nothing string")
    out = {r["column"]: r for r in
           encoding_advisor(df, ["uid", "region", "nothing"]).collect()}

    def replay(vals):
        from collections import Counter

        c = Counter("" if v is None else v for v in vals)
        n = sum(c.values())
        nd = len(c)
        plain = sum(len(v) * m for v, m in c.items())
        code_bits = max(nd - 1, 1).bit_length()
        dict_b = sum(len(v) for v in c) + (n * code_bits + 7) // 8
        return n, nd, plain, dict_b

    cols = {"uid": [r[0] for r in rows], "region": [r[1] for r in rows],
            "nothing": [r[2] for r in rows]}
    for c, vals in cols.items():
        n, nd, plain, dict_b = replay(vals)
        r = out[c]
        assert (r["n"], r["n_distinct"], r["plain_bytes"], r["dict_bytes"]) == (
            n, nd, plain, dict_b
        ), c
        winner = "dict" if dict_b < plain else "plain"
        assert r["winner"] == winner
        save = (plain - dict_b) * 1_000_000 // max(plain, 1) if dict_b < plain else 0
        assert r["save_micro"] == save
    assert out["region"]["winner"] == "dict"
    assert out["uid"]["winner"] == "plain"


def test_edge_reciprocity_python_replay(spark):
    """Reciprocity replayed by brute force on a known directed graph:
    duplicates collapse, self-loops drop, a reciprocated pair credits
    both endpoints, sinks surface out_deg=0 / recip 0."""
    from document_quality_assessment_ocr_spark.operators.graph import (
        edge_reciprocity,
    )

    raw = [
        ("a", "b"), ("b", "a"),          # reciprocated pair
        ("a", "c"), ("a", "c"),          # duplicate, unreturned
        ("c", "d"),                      # chain into sink d
        ("d", "d"),                      # self-loop dropped
        ("b", "c"), ("c", "b"),          # second reciprocated pair
    ]
    df = spark.createDataFrame(raw, "src string, dst string")
    out = {r["id"]: r for r in edge_reciprocity(df).collect()}

    e = {(s, d) for s, d in raw if s != d}
    nodes = {x for p in e for x in p}
    for n in sorted(nodes):
        outs = {d for s, d in e if s == n}
        ins = {s for s, d in e if d == n}
        nr = sum(1 for d in outs if (d, n) in e)
        r = out[n]
        assert (r["out_deg"], r["in_deg"], r["n_recip"]) == (
            len(outs), len(ins), nr
        ), n
        assert r["recip_micro"] == nr * 1_000_000 // max(len(outs), 1)
    assert out["a"]["n_recip"] == 1 and out["b"]["n_recip"] == 2
    assert out["d"]["out_deg"] == 0 and out["d"]["recip_micro"] == 0


def test_kcore_peel_python_replay(spark):
    """Bounded-round k-core peel replayed by brute force: a triangle
    core survives k=2 peeling, pendant chains fall off round by round,
    and survivors report their degree INSIDE the surviving set."""
    from document_quality_assessment_ocr_spark.operators.graph import kcore_peel

    # triangle a-b-c (+ chord b-d? no) with a pendant chain c-e-f
    raw = [
        ("a", "b"), ("b", "c"), ("c", "a"),   # 2-core triangle
        ("c", "e"), ("e", "f"),               # chain peels off
        ("g", "g"),                           # self-loop dropped
        ("a", "b"),                           # duplicate collapses
    ]
    df = spark.createDataFrame(raw, "src string, dst string")

    def replay(k, rounds):
        e = {tuple(sorted(p)) for p in raw if p[0] != p[1]}
        surv = {x for p in e for x in p}
        for _ in range(rounds):
            deg = {}
            for u, v in e:
                if u in surv and v in surv:
                    deg[u] = deg.get(u, 0) + 1
                    deg[v] = deg.get(v, 0) + 1
            surv = {n for n, d in deg.items() if d >= k}
        deg = {}
        for u, v in e:
            if u in surv and v in surv:
                deg[u] = deg.get(u, 0) + 1
                deg[v] = deg.get(v, 0) + 1
        return {n: d for n, d in deg.items() if d >= 1}

    for k, rounds in [(2, 1), (2, 3), (3, 2)]:
        out = {r["id"]: r["core_deg"]
               for r in kcore_peel(df, k=k, rounds=rounds).collect()}
        assert out == replay(k, rounds), (k, rounds)
    # the chain is gone after enough k=2 rounds; the triangle remains
    assert set(replay(2, 3)) == {"a", "b", "c"}

    import pytest as _pt
    with _pt.raises(ValueError):
        kcore_peel(df, k=0)
    with _pt.raises(ValueError):
        kcore_peel(df, rounds=0)


def test_degree_histogram_python_replay(spark):
    """Log2-bucket degree histogram replayed by brute force: duplicate
    and self-loop edges collapse, buckets are floor(log2(deg)) with
    exact integer lo_deg = 2^bucket."""
    from document_quality_assessment_ocr_spark.operators.graph import (
        degree_histogram,
    )

    hub = [("h", f"x{i}") for i in range(5)]  # deg(h)=5 → bucket 2
    raw = hub + [("x0", "x1"), ("x1", "x0"), ("z", "z")]
    df = spark.createDataFrame(raw, "src string, dst string")
    out = {r["bucket"]: r for r in degree_histogram(df).collect()}

    e = {tuple(sorted(p)) for p in raw if p[0] != p[1]}
    deg = {}
    for u, v in e:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    buckets = {}
    for d in deg.values():
        buckets.setdefault(d.bit_length() - 1, []).append(d)
    assert set(out) == set(buckets)
    for b, ds in buckets.items():
        r = out[b]
        assert r["lo_deg"] == 2 ** b
        assert (r["n_nodes"], r["min_deg"], r["max_deg"]) == (
            len(ds), min(ds), max(ds)
        )


def test_calibration_audit_python_replay(spark):
    """Calibration audit replayed through the shared classifier weights
    in pure python: shifted-milli bucketing, the length proxy label and
    the integer pos-rate all match; empty docs land in the raw-0
    bucket."""
    import hashlib

    from document_quality_assessment_ocr_spark.operators.classify import (
        OFFSET_MILLI,
        calibration_audit,
        classifier_weights,
    )

    docs = [
        (1, "alpha beta gamma delta " * 30),   # long → pos
        (2, "alpha beta"),
        (3, ""),                                # empty → raw-0 bucket
        (4, "zeta eta theta " * 5),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    bw, mt = 250, 80
    out = {r["bucket"]: r for r in
           calibration_audit(df, bucket_width_milli=bw, min_tokens=mt).collect()}

    w = classifier_weights(64, 7)

    def bucket_of(text):
        tk = [t for t in text.strip().lower().split() if t]
        grams = tk + [a + "\x01" + b for a, b in zip(tk, tk[1:])]
        if not grams:
            return OFFSET_MILLI // bw, False
        s = sum(
            w[int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % 64]
            for g in grams
        )
        return ((s + OFFSET_MILLI * len(grams)) // len(grams)) // bw, len(tk) >= mt

    exp = {}
    for _, text in docs:
        b, pos = bucket_of(text)
        n, p = exp.get(b, (0, 0))
        exp[b] = (n + 1, p + int(pos))
    assert set(out) == set(exp)
    for b, (n, p) in exp.items():
        r = out[b]
        assert (r["n_docs"], r["n_pos"]) == (n, p)
        assert r["pos_rate_micro"] == p * 1_000_000 // n
        assert r["lo_milli"] == b * bw - OFFSET_MILLI
    assert OFFSET_MILLI // bw in exp  # the empty doc's bucket


def test_tfidf_keywords_python_replay(spark):
    """Per-doc TF-IDF keywords replayed by brute force: fused integer
    score (tf·(N−df)·1000)//df, everywhere-terms and hapaxes (min_df)
    excluded, (score DESC, term ASC) tie-break, rk <= k."""
    from document_quality_assessment_ocr_spark.operators.retrieval import (
        tfidf_keywords,
    )

    docs = [
        (1, "apple apple banana cherry common"),
        (2, "banana cherry common dates"),
        (3, "apple cherry common eagle eagle eagle"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    k, min_df = 2, 2
    out = [(r["doc_id"], r["term"], r["tf"], r["score_milli"], r["rk"])
           for r in tfidf_keywords(df, k=k, min_df=min_df).collect()]

    n = len(docs)
    toks = {i: t.split() for i, t in docs}
    dfc = {}
    for i in toks:
        for t in set(toks[i]):
            dfc[t] = dfc.get(t, 0) + 1
    exp = []
    for i in sorted(toks):
        scored = []
        for t in set(toks[i]):
            if dfc[t] >= n or dfc[t] < min_df:
                continue
            tf = toks[i].count(t)
            scored.append((-(tf * (n - dfc[t]) * 1000 // dfc[t]), t, tf))
        scored.sort()
        for rk, (ns, t, tf) in enumerate(scored[:k], 1):
            exp.append((i, t, tf, -ns, rk))
    assert sorted(out) == sorted(exp)
    # 'common' is in every doc (idf 0) → never surfaces
    assert all(t != "common" for _, t, _, _, _ in out)


def test_gap_histogram_python_replay(spark):
    """Inter-event gap histogram replayed by brute force: per-user lag in
    integer microseconds, ties break on event_id, first events produce no
    gap, zero gaps land in bucket 0."""
    from datetime import datetime

    from document_quality_assessment_ocr_spark.operators.sessions import (
        gap_histogram,
    )

    t0 = datetime(2024, 1, 1)

    def at(us):
        return datetime(2024, 1, 1, 0, 0, us // 1_000_000, us % 1_000_000)

    rows = [
        (1, 1, at(0)), (2, 1, at(3)), (3, 1, at(3)),          # gaps 3, 0
        (4, 2, at(100)), (5, 2, at(1_000_100)),               # gap 1e6
        (6, 3, at(7)),                                         # no gap
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {r["bucket"]: r for r in gap_histogram(df).collect()}

    gaps = [3, 0, 1_000_000]
    exp = {}
    for g in gaps:
        b = max(g.bit_length() - 1, 0)
        exp.setdefault(b, []).append(g)
    assert set(out) == set(exp)
    for b, gs in exp.items():
        r = out[b]
        assert (r["n_gaps"], r["min_gap_us"], r["max_gap_us"]) == (
            len(gs), min(gs), max(gs)
        )
        assert r["lo_us"] == 2 ** b


def test_source_overlap_matrix_python_replay(spark):
    """Cross-source shingle overlap replayed by brute force: distinct
    word n-grams per source, pairwise shared counts, containment is
    min-normalized (small-in-big reads 1e6)."""
    from document_quality_assessment_ocr_spark.operators.decontam import (
        source_overlap_matrix,
    )

    docs = [
        (1, "a", "one two three four five six"),
        (2, "a", "seven eight nine ten eleven"),
        (3, "b", "one two three four five"),        # contained in a's first
        (4, "c", "totally different words here now"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    n = 3
    out = {(r["source_a"], r["source_b"]): r
           for r in source_overlap_matrix(df, n=n).collect()}

    def shingles(texts):
        s = set()
        for t in texts:
            tk = t.lower().split()
            s |= {" ".join(tk[i:i + n]) for i in range(len(tk) - n + 1)}
        return s

    by_src = {}
    for _, s, t in docs:
        by_src.setdefault(s, []).append(t)
    sets = {s: shingles(ts) for s, ts in by_src.items()}
    for sa in sets:
        for sb in sets:
            if sa >= sb:
                continue
            shared = len(sets[sa] & sets[sb])
            if shared == 0:
                assert (sa, sb) not in out
                continue
            r = out[(sa, sb)]
            assert (r["n_shared"], r["n_a"], r["n_b"]) == (
                shared, len(sets[sa]), len(sets[sb])
            )
            assert r["containment_micro"] == (
                shared * 1_000_000 // min(len(sets[sa]), len(sets[sb]))
            )
    # b's 3 shingles are all inside a → full containment
    assert out[("a", "b")]["containment_micro"] == 1_000_000


def test_prefix_compression_python_replay(spark):
    """Front-coding profile replayed by brute force: per-host sorted-run
    LCP with the cap, first row saves 0, NULL urls drop."""
    from document_quality_assessment_ocr_spark.operators.urls import (
        prefix_compression_profile,
    )

    rows = [
        ("h1", "http://h1/a/one"),
        ("h1", "http://h1/a/two"),
        ("h1", "http://h1/b"),
        ("h2", "x" * 100),
        ("h2", "x" * 100),        # duplicate: LCP capped at 64
        ("h2", None),             # dropped
    ]
    df = spark.createDataFrame(rows, "host string, url_norm string")
    cap = 64
    out = {r["host"]: r for r in
           prefix_compression_profile(df, cap=cap).collect()}

    def lcp(a, b):
        m = min(len(a), len(b), cap)
        i = 0
        while i < m and a[i] == b[i]:
            i += 1
        return i

    by_host = {}
    for h, u in rows:
        if u is not None:
            by_host.setdefault(h, []).append(u)
    for h, us in by_host.items():
        us = sorted(us)
        saved = sum(lcp(us[i - 1], us[i]) for i in range(1, len(us)))
        total = sum(len(u) for u in us)
        r = out[h]
        assert (r["n_urls"], r["total_chars"], r["saved_chars"]) == (
            len(us), total, saved
        )
        assert r["saved_micro"] == saved * 1_000_000 // max(total, 1)
    assert out["h2"]["saved_chars"] == 64  # the cap, not 100

    import pytest as _pt
    with _pt.raises(ValueError):
        prefix_compression_profile(df, cap=0)


def test_quality_length_joint_python_replay(spark):
    """Joint histogram replayed through the shared classifier weights:
    tok_bucket = floor-log2 token count (0 tokens → bucket 0), q_bucket
    = shifted-milli // width, counts per 2-D cell."""
    import hashlib

    from document_quality_assessment_ocr_spark.operators.classify import (
        OFFSET_MILLI,
        classifier_weights,
        quality_length_joint,
    )

    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta"),
        (3, ""),
        (4, "iota kappa " * 20),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    bw = 500
    out = {(r["tok_bucket"], r["q_bucket"]): r["n_docs"]
           for r in quality_length_joint(df, bucket_width_milli=bw).collect()}

    w = classifier_weights(64, 7)
    exp = {}
    for _, text in docs:
        tk = [t for t in text.strip().lower().split() if t]
        grams = tk + [a + "\x01" + b for a, b in zip(tk, tk[1:])]
        tb = max(len(tk).bit_length() - 1, 0)
        if grams:
            s = sum(
                w[int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % 64]
                for g in grams
            )
            qb = ((s + OFFSET_MILLI * len(grams)) // len(grams)) // bw
        else:
            qb = OFFSET_MILLI // bw
        exp[(tb, qb)] = exp.get((tb, qb), 0) + 1
    assert out == exp


def test_char_class_profile_python_replay(spark):
    """Char-class composition replayed by brute force: disjoint
    alpha/digit/ws/ctrl classes, 'other' is the remainder, micro ratios
    after the per-source sums."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        char_class_profile,
    )

    docs = [
        (1, "a", "Hello 123 world!"),
        (2, "a", "tabs\tand\nnewlines\x07bell"),
        (3, "b", "!!!???"),
        (4, "b", None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    out = {r["source"]: r for r in char_class_profile(df).collect()}

    import string
    ws = set(" \t\n\r\f\x0b")
    ctrl = {chr(c) for c in range(0x00, 0x09)} | {chr(c) for c in range(0x0E, 0x20)} | {"\x7f"}
    by_src = {}
    for _, s, t in docs:
        by_src.setdefault(s, []).append(t or "")
    for s, texts in by_src.items():
        text = "".join(texts)
        alpha = sum(1 for c in text if c.isascii() and c.isalpha())
        digit = sum(1 for c in text if c in string.digits)
        w = sum(1 for c in text if c in ws)
        c = sum(1 for c in text if c in ctrl)
        r = out[s]
        assert (r["total_chars"], r["alpha"], r["digit"], r["ws"], r["ctrl"]) == (
            len(text), alpha, digit, w, c
        ), s
        assert r["other"] == len(text) - alpha - digit - w - c
        assert r["alpha_micro"] == alpha * 1_000_000 // max(len(text), 1)
    # the bell char landed in ctrl, not other
    assert out["a"]["ctrl"] == 1


def test_anchor_diversity_python_replay(spark):
    """Anchor diversity replayed by brute force: stamped anchors read
    low diversity, varied anchors read high; empty host/anchor rows
    drop."""
    from document_quality_assessment_ocr_spark.operators.html import (
        anchor_diversity,
    )

    rows = [
        ("spam.net", "cheap pills"), ("spam.net", "cheap pills"),
        ("spam.net", "cheap pills"), ("spam.net", "cheap pills"),
        ("ok.org", "great article"), ("ok.org", "the source"),
        ("ok.org", "this analysis"),
        ("", "dropped"), ("x.com", ""),
    ]
    df = spark.createDataFrame(rows, "host string, anchor_text string")
    out = {r["host"]: r for r in anchor_diversity(df).collect()}

    assert set(out) == {"spam.net", "ok.org"}
    assert (out["spam.net"]["n_links"], out["spam.net"]["n_distinct"]) == (4, 1)
    assert out["spam.net"]["diversity_micro"] == 1_000_000 // 4
    assert (out["ok.org"]["n_links"], out["ok.org"]["n_distinct"]) == (3, 3)
    assert out["ok.org"]["diversity_micro"] == 1_000_000


def test_event_bursts_python_replay(spark):
    """Burst detector replayed by brute force: strictly-within-threshold
    same-type re-fires count, cross-type near events do not, first
    events have no predecessor."""
    from datetime import datetime

    from document_quality_assessment_ocr_spark.operators.sessions import (
        event_bursts,
    )

    def at(ms):
        return datetime(2024, 1, 1, 0, 0, ms // 1000, (ms % 1000) * 1000)

    rows = [
        (1, 1, at(0), "click"),
        (2, 1, at(500), "click"),      # burst (same type, 500ms)
        (3, 1, at(600), "view"),       # near but cross-type → no burst
        (4, 1, at(5000), "view"),      # 4400ms > 1000 → no burst
        (5, 2, at(0), "click"),        # first for user 2 → no prev
        (6, 2, at(999), "click"),      # burst (strictly < 1000)
        (7, 2, at(1999), "click"),     # exactly 1000 → NOT a burst
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {r["event_type"]: r for r in
           event_bursts(df, threshold_ms=1000).collect()}

    ck = out["click"]
    assert (ck["n_events"], ck["n_with_prev"], ck["n_bursts"]) == (5, 3, 2)
    assert ck["burst_micro"] == 2 * 1_000_000 // 3
    vw = out["view"]
    assert (vw["n_events"], vw["n_with_prev"], vw["n_bursts"]) == (2, 2, 0)

    import pytest as _pt
    with _pt.raises(ValueError):
        event_bursts(df, threshold_ms=0)


def test_props_stats_python_replay(spark):
    """JSON props rollup replayed by brute force: missing keys,
    malformed payloads and non-integer values count as missing; integer
    stats are exact; all-missing types stay int64 with 0 sentinels."""
    from datetime import datetime

    from document_quality_assessment_ocr_spark.operators.sessions import (
        props_stats,
    )

    t = datetime(2024, 1, 1)
    rows = [
        (1, 1, t, "click", '{"k": 5}'),
        (2, 1, t, "click", '{"k": -3}'),
        (3, 1, t, "click", '{"other": 1}'),   # missing key
        (4, 1, t, "view", "not json"),         # malformed
        (5, 1, t, "view", None),               # null props
        (6, 1, t, "view", '{"k": "abc"}'),     # non-integer value
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " props string",
    )
    out = {r["event_type"]: r for r in props_stats(df, key="k").collect()}

    ck = out["click"]
    assert (ck["n_events"], ck["n_missing"], ck["sum_v"], ck["min_v"],
            ck["max_v"]) == (3, 1, 2, -3, 5)
    vw = out["view"]
    assert (vw["n_events"], vw["n_missing"]) == (3, 3)
    assert (vw["sum_v"], vw["min_v"], vw["max_v"]) == (0, 0, 0)


def test_rendezvous_reshard_python_replay(spark):
    """HRW reshard matrix replayed in pure python (same md5 strings):
    every key lands in exactly one (from, to) cell, movement only to the
    NEW shard, moved fraction near 1/n_new."""
    import hashlib

    from document_quality_assessment_ocr_spark.operators.compaction import (
        rendezvous_reshard,
    )

    ids = list(range(300))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = {(r["from_shard"], r["to_shard"]): r
           for r in rendezvous_reshard(df, n_old=8, n_new=9).collect()}

    def pick(i, n):
        return max(
            (hashlib.md5(f"{i}|rv{s}".encode()).hexdigest() + "|" + str(s), s)
            for s in range(n)
        )[1]

    exp = {}
    for i in ids:
        cell = (pick(i, 8), pick(i, 9))
        exp[cell] = exp.get(cell, 0) + 1
    assert {k: v["n_docs"] for k, v in out.items()} == exp
    # HRW property: a key moves ONLY to the newly added shard
    for (f, t), r in out.items():
        assert r["moved"] == (f != t)
        if f != t:
            assert t == 8  # the new shard's index
    moved = sum(v for (f, t), v in exp.items() if f != t)
    assert 0 < moved < len(ids) // 4  # ~1/9, certainly far below 25%

    import pytest as _pt
    with _pt.raises(ValueError):
        rendezvous_reshard(df, n_old=0)


def test_wedge_closure_python_replay(spark):
    """Wedge closure on known graphs: a triangle closes fully (1e6), a
    star closes 0, a triangle+pendant gives the textbook ratio."""
    from document_quality_assessment_ocr_spark.operators.graph import wedge_closure

    def run(raw):
        df = spark.createDataFrame(raw, "src string, dst string")
        return wedge_closure(df).collect()[0]

    r = run([("a", "b"), ("b", "c"), ("c", "a")])
    assert (r["n_nodes"], r["n_edges"], r["wedges"], r["closed"]) == (3, 3, 3, 3)
    assert r["closure_micro"] == 1_000_000

    r = run([("h", "x"), ("h", "y"), ("h", "z")])
    assert (r["wedges"], r["closed"], r["closure_micro"]) == (3, 0, 0)

    # triangle + pendant d off c: wedges = 1+1+3+0 = 5 (c has deg 3), closed = 3
    r = run([("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")])
    assert (r["wedges"], r["closed"]) == (5, 3)
    assert r["closure_micro"] == 3 * 1_000_000 // 5


def test_url_depth_profile_python_replay(spark):
    """Depth × extension profile replayed by brute force on normalized
    paths: root is depth 1, extensions lowercase, no-extension rows read
    ''."""
    from document_quality_assessment_ocr_spark.operators.urls import (
        url_depth_profile,
    )

    rows = [
        ("h", "/"), ("h", "/a"), ("h", "/a/b"), ("h", "/a/b"),
        ("h", "/img/Photo.JPG"), ("h", "/deep/a/b/c/file.pdf"),
        ("", "/dropped"),
    ]
    df = spark.createDataFrame(rows, "host string, path string")
    out = {(r["host"], r["depth"], r["ext"]): r["n_urls"]
           for r in url_depth_profile(df).collect()}

    exp = {}
    import re
    for h, p in rows:
        if h == "":
            continue
        d = p.count("/")
        m = re.search(r"\.([A-Za-z0-9]{1,5})$", p)
        e = m.group(1).lower() if m else ""
        exp[(h, d, e)] = exp.get((h, d, e), 0) + 1
    assert out == exp
    assert out[("h", 2, "jpg")] == 1 and out[("h", 5, "pdf")] == 1


def test_two_hop_reach_python_replay(spark):
    """Two-hop reach replayed by brute force, including the hub cap:
    neighbors always count; 2-hop-only nodes count iff their middle
    node's degree is within the cap."""
    from document_quality_assessment_ocr_spark.operators.graph import two_hop_reach

    # path a-b-c-d plus hub h connected to many leaves and to a
    raw = [("a", "b"), ("b", "c"), ("c", "d"), ("h", "a")] + [
        ("h", f"l{i}") for i in range(5)
    ]
    df = spark.createDataFrame(raw, "src string, dst string")

    def replay(cap):
        e = {tuple(sorted(p)) for p in raw}
        adj = {}
        for u, v in e:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        out = {}
        for n in adj:
            reach = set(adj[n])
            for m in adj[n]:
                if len(adj[m]) <= cap:
                    reach |= adj[m] - {n}
            out[n] = (len(adj[n]), len(reach))
        return out

    for cap in (64, 2):
        got = {r["id"]: (r["deg"], r["n_2hop"])
               for r in two_hop_reach(df, max_mid_degree=cap).collect()}
        assert got == replay(cap), cap
    # with cap=2 the hub (deg 6) relays nothing: b sees {a,c,d} ∪ via a {h}
    got2 = {r["id"]: r["n_2hop"] for r in two_hop_reach(df, max_mid_degree=2).collect()}
    assert got2["b"] == 4          # a, c, d, h — a (deg 2) still relays h
    assert got2["l0"] == 1         # hub capped: leaf sees only the hub

    import pytest as _pt
    with _pt.raises(ValueError):
        two_hop_reach(df, max_mid_degree=0)


def test_field_consistency_python_replay(spark):
    """Ingestion validator replayed by brute force: matching lengths
    pass, truncated text mismatches, NULL text counts separately and
    compares as length 0, NULL length is always a mismatch."""
    from document_quality_assessment_ocr_spark.operators.profile import (
        field_consistency_audit,
    )

    rows = [
        (1, "a", "hello", 5),        # ok
        (2, "a", "hello", 10),       # mismatch (truncated text)
        (3, "a", None, 0),           # null text, length 0 → ok
        (4, "b", "x", None),         # null length → mismatch
        (5, "b", None, 3),           # null text vs 3 → mismatch
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string, n_chars long"
    )
    out = {r["source"]: r for r in field_consistency_audit(df).collect()}
    a, b = out["a"], out["b"]
    assert (a["n_docs"], a["n_null_text"], a["n_mismatch"]) == (3, 1, 1)
    assert a["mismatch_micro"] == 1_000_000 // 3
    assert (b["n_docs"], b["n_null_text"], b["n_mismatch"]) == (2, 1, 2)


def test_source_surprisal_python_replay(spark):
    """Per-source surprisal replayed in pure python with the shared
    whole-bit model: corpus-global counts, per-source integer
    centi-bit means."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        source_surprisal,
    )

    docs = [
        (1, "a", "the the the the rare"),
        (2, "a", "the the common common"),
        (3, "b", "unique tokens entirely here"),
        (4, "c", ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    out = {r["source"]: r for r in source_surprisal(df).collect()}

    toks = {}
    all_toks = []
    for _, s, t in docs:
        tk = t.split()
        toks.setdefault(s, []).append(tk)
        all_toks += tk
    counts = {t: all_toks.count(t) for t in set(all_toks)}
    n_total = len(all_toks)
    for s, docs_tk in toks.items():
        flat = [t for tk in docs_tk for t in tk]
        sum_bits = sum((n_total // counts[t]).bit_length() - 1 for t in flat)
        r = out[s]
        assert (r["n_docs"], r["n_tokens"], r["sum_bits"]) == (
            len(docs_tk), len(flat), sum_bits
        ), s
        assert r["avg_centibits"] == sum_bits * 100 // max(len(flat), 1)
    assert out["c"]["n_tokens"] == 0 and out["c"]["avg_centibits"] == 0
    # rarer-token source scores higher
    assert out["b"]["avg_centibits"] > out["a"]["avg_centibits"]


def test_l_diversity_audit_python_replay(spark):
    """l-diversity replayed by brute force: cohort sizes, distinct
    sensitive counts, both gates; NULLs merge with ''."""
    from document_quality_assessment_ocr_spark.operators.privacy import (
        l_diversity_audit,
    )

    rows = [
        ("en", "web", "x"), ("en", "web", "x"), ("en", "web", "y"),
        ("en", "web", "z"), ("en", "web", "x"),      # k=5, l=3
        ("de", "web", "x"), ("de", "web", "x"),      # k=2, l=1
        (None, "books", None), ("", "books", ""),    # NULL==''; k=2, l=1
    ]
    df = spark.createDataFrame(rows, "lang string, source string, s string")
    out = {(r["lang"], r["source"]): r
           for r in l_diversity_audit(df, ("lang", "source"), "s",
                                      k=3, l=2).collect()}
    r = out[("en", "web")]
    assert (r["group_size"], r["l_distinct"], r["k_ok"], r["l_ok"]) == (
        5, 3, True, True
    )
    r = out[("de", "web")]
    assert (r["group_size"], r["l_distinct"], r["k_ok"], r["l_ok"]) == (
        2, 1, False, False
    )
    r = out[("", "books")]
    assert (r["group_size"], r["l_distinct"]) == (2, 1)


def test_boilerplate_share_python_replay(spark):
    """Templated-ness replayed by brute force: a shingle shared by >=
    min_df docs is common; short docs surface 0; the shared template
    reads high, original prose reads low."""
    from document_quality_assessment_ocr_spark.operators.quality import (
        boilerplate_share,
    )

    footer = "all rights reserved contact us today"
    docs = [
        (1, footer + " alpha beta gamma"),
        (2, footer + " delta epsilon zeta"),
        (3, footer + " eta theta iota"),
        (4, "completely original text with no shared template at all"),
        (5, "tiny"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    n, min_df = 5, 3
    out = {r["doc_id"]: r for r in
           boilerplate_share(df, n=n, min_df=min_df).collect()}

    sets = {}
    for i, t in docs:
        tk = t.lower().split()
        sets[i] = {" ".join(tk[j:j + n]) for j in range(len(tk) - n + 1)}
    dfc = {}
    for s in sets.values():
        for g in s:
            dfc[g] = dfc.get(g, 0) + 1
    for i, s in sets.items():
        common = sum(1 for g in s if dfc[g] >= min_df)
        r = out[i]
        assert (r["n_shingles"], r["n_common"]) == (len(s), common), i
        assert r["common_micro"] == common * 1_000_000 // max(len(s), 1)
    assert out[5]["n_shingles"] == 0 and out[5]["common_micro"] == 0
    assert out[1]["common_micro"] > 0 and out[4]["common_micro"] == 0


def test_annotator_agreement_python_replay(spark):
    """Cohen's kappa replayed in python ints: a perfect group (kappa 1.0),
    a mixed group, and a degenerate single-class group (pe=1 -> NULL)."""
    from document_quality_assessment_ocr_spark.operators.classify import (
        annotator_agreement,
    )

    rows = (
        # g=perfect: always agree across two classes
        [("perfect", "x", "x")] * 6 + [("perfect", "y", "y")] * 4
        # g=mixed: some agreement, some not
        + [("mixed", "x", "x")] * 5 + [("mixed", "x", "y")] * 3
        + [("mixed", "y", "y")] * 2 + [("mixed", "y", "x")] * 2
        # g=degenerate: one class only on both sides -> pe_micro == 1e6
        + [("degen", "z", "z")] * 3
    )
    df = spark.createDataFrame(rows, "source string, a string, b string")
    out = {r["source"]: r for r in
           annotator_agreement(df, "a", "b").collect()}

    for g in ("perfect", "mixed", "degen"):
        grp = [(a, b) for s, a, b in rows if s == g]
        n = len(grp)
        n_agree = sum(1 for a, b in grp if a == b)
        ma, mb = {}, {}
        for a, b in grp:
            ma[a] = ma.get(a, 0) + 1
            mb[b] = mb.get(b, 0) + 1
        pe_mass = sum(ma[k] * mb.get(k, 0) for k in ma)
        po = n_agree * 1_000_000 // n
        pe = pe_mass * 1_000_000 // (n * n)
        r = out[g]
        assert (r["n"], r["n_agree"], r["po_micro"], r["pe_micro"]) == (
            n, n_agree, po, pe), g
        if pe < 1_000_000:
            assert r["kappa"] == (po - pe) / (1_000_000 - pe), g
        else:
            assert r["kappa"] is None, g
    assert out["perfect"]["kappa"] == 1.0
    assert out["degen"]["kappa"] is None
    assert 0.0 < out["mixed"]["kappa"] < 1.0


def test_vocab_health_python_replay(spark):
    """Token mass / types / hapax / TTR replayed in python: a repetitive
    source scores low hapax share, a unique-token source scores 1e6."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        vocab_health_by_source,
    )

    rows = [
        ("rep", "the the the the cat cat"),
        ("rep", "the cat the cat"),
        ("noise", "qzx wvu plm okn"),
        ("noise", "ijb uhv ygc tfx"),
        ("empty", "   "),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r["source"]: r for r in vocab_health_by_source(df).collect()}

    agg = {}
    for s, t in rows:
        agg.setdefault(s, []).extend(t.lower().split())
    for s, toks in agg.items():
        c = {}
        for w in toks:
            c[w] = c.get(w, 0) + 1
        n_tok, n_typ = len(toks), len(c)
        n_hap = sum(1 for v in c.values() if v == 1)
        r = out[s]
        assert (r["n_tokens"], r["n_types"], r["n_hapax"]) == (
            n_tok, n_typ, n_hap), s
        assert r["ttr_micro"] == n_typ * 1_000_000 // max(n_tok, 1)
        assert r["hapax_micro"] == n_hap * 1_000_000 // max(n_typ, 1)
    assert out["empty"]["n_docs"] == 1 and out["empty"]["n_tokens"] == 0
    assert out["noise"]["hapax_micro"] == 1_000_000
    assert out["rep"]["hapax_micro"] < 500_000


def test_mirror_pairs_python_replay(spark):
    """Mirror detection: two hosts sharing paths pair up; a path carried
    by more hosts than the cap is pruned BEFORE pairing; min_shared
    filters; containment is min-normalized over the CAPPED sets."""
    from document_quality_assessment_ocr_spark.operators.urls import mirror_pairs

    rows = (
        [("m1.net", f"/p/{i}") for i in range(5)]
        + [("m2.net", f"/p/{i}") for i in range(4)]  # shares 4 with m1
        + [("m2.net", "/own")]
        + [("s1.org", "/u/1"), ("s2.org", "/u/2")]   # solo hosts
        # heavy path on 5 hosts > cap 4 -> pruned everywhere
        + [(h, "/common") for h in
           ("m1.net", "m2.net", "s1.org", "s2.org", "s3.org")]
        # duplicate (host, path) rows must collapse
        + [("m1.net", "/p/0")]
    )
    df = spark.createDataFrame(rows, "host string, path string")
    out = mirror_pairs(df, min_shared=2, max_hosts_per_path=4).collect()

    assert len(out) == 1
    r = out[0]
    # capped sets: m1 {p0..p4} (5), m2 {p0..p3, /own} (5); shared 4
    assert (r["host1"], r["host2"]) == ("m1.net", "m2.net")
    assert (r["shared_paths"], r["n_paths1"], r["n_paths2"]) == (4, 5, 5)
    assert r["containment_micro"] == 4 * 1_000_000 // 5
    # raising the cap admits /common -> s-hosts still below min_shared
    out2 = mirror_pairs(df, min_shared=2, max_hosts_per_path=10).collect()
    pairs2 = {(r["host1"], r["host2"]): r["shared_paths"] for r in out2}
    assert pairs2[("m1.net", "m2.net")] == 5  # /common now counts
    assert all(h1 < h2 for h1, h2 in pairs2)


def test_snapshot_churn_python_replay(spark):
    """Full-outer churn statuses replayed: added / removed / changed /
    unchanged per group; group label prefers the NEW side on moves."""
    from document_quality_assessment_ocr_spark.operators.compaction import (
        snapshot_churn,
    )

    old = [(1, "h1", "a"), (2, "h2", "a"), (3, "h3", "a"), (4, "h4", "b")]
    new = [(1, "h1", "a"),          # unchanged
           (2, "hX", "a"),          # changed
           (4, "h4", "a"),          # moved b -> a, unchanged content
           (5, "h5", "b")]          # added (doc 3 removed from 'a')
    df_o = spark.createDataFrame(old, "doc_id long, content_hash string, source string")
    df_n = spark.createDataFrame(new, "doc_id long, content_hash string, source string")
    out = {r["source"]: r for r in snapshot_churn(df_o, df_n).collect()}

    a = out["a"]
    # group 'a' rows: 1 unchanged, 2 changed, 3 removed, 4 moved-in unchanged
    assert (a["added"], a["removed"], a["changed"], a["unchanged"]) == (0, 1, 1, 2)
    assert (a["n_old"], a["n_new"]) == (4, 3)
    assert a["churn_micro"] == (0 + 1 + 1) * 1_000_000 // 4
    b = out["b"]
    assert (b["added"], b["removed"], b["changed"], b["unchanged"]) == (1, 0, 0, 0)
    assert (b["n_old"], b["n_new"]) == (0, 1)
    assert b["churn_micro"] == 1_000_000


def test_span_integrity_audit_python_replay(spark):
    """Overlap / gap / out-of-order flags replayed in python over
    hand-built span sequences, including a single-span doc (no pairs)."""
    from document_quality_assessment_ocr_spark.operators.profile import (
        span_integrity_audit,
    )

    rows = [
        # doc 1: clean back-to-back coverage
        (1, 0, 0, 100), (1, 1, 100, 50), (1, 2, 150, 50),
        # doc 2: overlap (span 1 starts inside span 0), then a gap
        (2, 0, 0, 120), (2, 1, 100, 50), (2, 2, 200, 10),
        # doc 3: out-of-order (offsets swapped)
        (3, 0, 100, 50), (3, 1, 0, 50),
        # doc 4: single span
        (4, 0, 10, 5),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, span_idx long, offset long, length long"
    )
    out = {r["doc_id"]: r for r in span_integrity_audit(df).collect()}

    docs = {}
    for d, i, o, ln in rows:
        docs.setdefault(d, []).append((i, o, ln))
    for d, sp in docs.items():
        sp.sort()
        ooo = ov = gap = 0
        for (_, po, pl), (_, o, _ln) in zip(sp, sp[1:]):
            ooo += o < po
            ov += o < po + pl
            gap += o > po + pl
        mass = sum(ln for _, _, ln in sp)
        extent = max(o + ln for _, o, ln in sp) - min(o for _, o, _ in sp)
        r = out[d]
        assert (r["n_spans"], r["n_out_of_order"], r["n_overlaps"],
                r["n_gaps"]) == (len(sp), ooo, ov, gap), d
        assert (r["span_mass"], r["extent"]) == (mass, extent), d
        assert r["coverage_micro"] == mass * 1_000_000 // max(extent, 1)
    assert out[1]["coverage_micro"] == 1_000_000
    assert out[2]["n_overlaps"] == 1 and out[2]["n_gaps"] == 1
    assert out[3]["n_out_of_order"] == 1 and out[3]["n_overlaps"] == 1
    assert out[4]["n_spans"] == 1 and out[4]["n_overlaps"] == 0


def test_ab_lift_report_python_replay(spark):
    """Exact means and float-op-order lift replayed; default control is
    the lexicographically first variant; explicit control overrides."""
    from document_quality_assessment_ocr_spark.operators.experiment import (
        ab_lift_report,
    )

    rows = [("a", 100), ("a", 200), ("a", 300),
            ("b", 250), ("b", 350),
            ("c", 0), ("c", 0)]
    df = spark.createDataFrame(rows, "variant string, metric long")
    out = {r["variant"]: r for r in ab_lift_report(df).collect()}

    sums = {"a": 600, "b": 600, "c": 0}
    ns = {"a": 3, "b": 2, "c": 2}
    cmean = sums["a"] / ns["a"]
    for v in ("a", "b", "c"):
        r = out[v]
        assert (r["n"], r["metric_sum"]) == (ns[v], sums[v])
        assert r["mean"] == sums[v] / ns[v]
        assert r["is_control"] == (v == "a")
        assert r["lift_vs_control"] == (sums[v] / ns[v]) / cmean - 1.0
    assert out["a"]["lift_vs_control"] == 0.0
    assert out["b"]["lift_vs_control"] == 0.5
    assert out["c"]["lift_vs_control"] == -1.0

    # zero-mean control -> lift NULL everywhere
    out_c = {r["variant"]: r for r in ab_lift_report(df, control="c").collect()}
    assert all(out_c[v]["lift_vs_control"] is None for v in ("a", "b", "c"))
    assert out_c["c"]["is_control"]


def test_compression_profile_python_replay(spark):
    """zlib profile replayed via the SHARED fn: repetitive text lands a
    much lower ratio than high-entropy text; empty text guards DIV."""
    import zlib

    from document_quality_assessment_ocr_spark.operators.quality import (
        compression_profile,
        zlib_profile_values,
    )

    noisy = " ".join(
        format(int.from_bytes(zlib.crc32(str(i).encode()).to_bytes(4, "big"),
                              "big"), "x")
        for i in range(200)
    )
    rows = [
        (1, "spam spam spam " * 200),
        (2, noisy),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in compression_profile(df).collect()}

    exp = zlib_profile_values([t for _, t in rows])
    for (d, _), (raw, comp) in zip(rows, exp):
        r = out[d]
        assert (r["raw_bytes"], r["comp_bytes"]) == (raw, comp), d
        assert r["ratio_micro"] == comp * 1_000_000 // max(raw, 1)
    assert out[1]["ratio_micro"] < out[2]["ratio_micro"]
    assert out[1]["ratio_micro"] < 100_000          # template junk collapses
    assert out[3]["raw_bytes"] == 0 and out[4]["raw_bytes"] == 0


def test_ks_drift_python_replay(spark):
    """Exact integer ECDF KS replayed in python; bucket DIV, argmax
    tie-break on smallest bucket, single double division."""
    from document_quality_assessment_ocr_spark.operators.experiment import ks_drift

    import pyspark.sql.functions as F

    rows = [(i, v) for i, v in enumerate(
        [10, 70, 70, 130, 200, 10, 75, 140, 150, 260, 300, 5])]
    df = spark.createDataFrame(rows, "id long, v long")
    out = ks_drift(df, F.col("id") % 2 == 0, "v", bucket_width=64).collect()
    assert len(out) == 1
    r = out[0]

    left = sorted(v // 64 for i, v in rows if i % 2 == 0)
    right = sorted(v // 64 for i, v in rows if i % 2 == 1)
    buckets = sorted(set(left) | set(right))
    na, nb = len(left), len(right)
    best = (-1, None)
    for b in buckets:
        ca = sum(1 for x in left if x <= b)
        cb = sum(1 for x in right if x <= b)
        d = abs(ca * nb - cb * na)
        if d > best[0]:
            best = (d, b)
    assert (r["n_left"], r["n_right"]) == (na, nb)
    assert r["d_num"] == best[0]
    assert r["at_bucket"] == best[1]
    assert r["ks_micro"] == (1_000_000 * best[0]) // (na * nb)
    assert r["ks"] == best[0] / (na * nb)

    import pytest as _pt
    with _pt.raises(ValueError):
        ks_drift(df, F.col("id") % 2 == 0, "v", bucket_width=0)


def test_poisson_bootstrap_python_replay(spark):
    """md5-uniform Poisson(1) weights, integer micro means, trimmed
    rank CI — replayed end-to-end in python."""
    import hashlib

    from document_quality_assessment_ocr_spark.operators.experiment import (
        POISSON1_CDF_MICRO,
        poisson_bootstrap_ci,
    )

    rows = [(f"d{i}", "g1" if i < 7 else "g2", (i * 13) % 50) for i in range(14)]
    df = spark.createDataFrame(rows, "doc_id string, source string, metric long")
    got = {r["source"]: r for r in poisson_bootstrap_ci(
        df, n_reps=8).collect()}

    def u(idx, rep):
        h = hashlib.md5(f"{idx}|boot{rep}".encode()).hexdigest()
        return int(h[:15], 16) % 1_000_000

    def w(uv):
        return sum(1 for t in POISSON1_CDF_MICRO if uv >= t)

    for g in ("g1", "g2"):
        members = [(i, x) for i, gg, x in rows if gg == g]
        n = len(members)
        point = (1_000_000 * sum(x for _, x in members)) // n
        means = []
        for rep in range(8):
            wn = ws = 0
            for idx, x in members:
                ww = w(u(idx, rep))
                wn += ww
                ws += ww * x
            if wn > 0:
                means.append((1_000_000 * ws) // wn)
        means.sort()
        r = got[g]
        assert (r["n"], r["point_micro"]) == (n, point)
        assert r["n_reps_valid"] == len(means)
        if len(means) >= 4:
            assert r["boot_lo_micro"] == means[1]
            assert r["boot_hi_micro"] == means[-2]

    import pytest as _pt
    with _pt.raises(ValueError):
        poisson_bootstrap_ci(df, n_reps=3)


def test_extract_tables(spark):
    """Header flag, attribute tolerance, ragged rows, inner-tag strip,
    no-table docs absent, lazy outer capture on nested tables."""
    from document_quality_assessment_ocr_spark.operators.html import extract_tables

    docs = [
        (1, '<table class="x"><tr><th>A</th><th> B </th></tr>'
            '<tr><td>1</td><td><b>2</b>\n3</td></tr>'
            '<tr><td>only</td></tr></table>'),
        (2, "<p>no table here</p>"),
        (3, "<table><tr><td>outer<table><tr><td>inner</td></tr>"
            "</table></td></tr></table>"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, html string")
    rows = extract_tables(df).collect()
    by = {(r["doc_id"], r["table_idx"], r["row_idx"]): r for r in rows}

    assert (2,) not in {(r["doc_id"],) for r in rows}
    h = by[(1, 1, 1)]
    assert h["is_header"] and h["n_cells"] == 2 and h["cells"] == "A|B"
    d1 = by[(1, 1, 2)]
    assert not d1["is_header"] and d1["cells"] == "1|2 3"
    assert by[(1, 1, 3)]["n_cells"] == 1
    # lazy outer match stops at the INNER </table>: one table, one row,
    # whose single cell swallowed the inner markup (tags stripped)
    doc3 = [r for r in rows if r["doc_id"] == 3]
    assert len(doc3) == 1 and doc3[0]["cells"] == "outerinner"


def test_kcenter_coreset(spark):
    """Greedy farthest-point replay on known geometry: seed is the
    smallest id, each round adds the argmax min-dist (tie-break smallest
    id), radius_after is monotone non-increasing."""
    from document_quality_assessment_ocr_spark.operators.similarity import (
        kcenter_coreset,
        quantize_embedding,
    )

    pts = {0: (0.0, 0.0), 1: (1.0, 0.0), 2: (10.0, 0.0), 3: (10.0, 10.0),
           4: (0.25, 0.25)}
    df = spark.createDataFrame(
        [(i, list(v)) for i, v in pts.items()],
        "vec_id long, embedding array<double>",
    )
    out = kcenter_coreset(df, k=3, scale=64).collect()
    assert [r["rank"] for r in out] == [0, 1, 2]

    q = {i: tuple(int(x * 64) for x in v) for i, v in pts.items()}

    def dist(a, b):
        return sum((x - y) ** 2 for x, y in zip(q[a], q[b]))

    centers = [0]
    md = {i: dist(i, 0) for i in q}
    expect = [(0, None)]
    for _ in range(2):
        far = max(q, key=lambda i: (md[i], -i))
        expect.append((far, md[far]))
        centers.append(far)
        md = {i: min(md[i], dist(i, far)) for i in q}
    radius_final = max(md.values())

    assert [(r["vec_id"], r["chosen_dist"]) for r in out] == expect
    ra = [r["radius_after"] for r in out]
    assert ra == sorted(ra, reverse=True)
    assert ra[-1] == radius_final
    assert ra[0] == expect[1][1] and ra[1] == expect[2][1]

    one = kcenter_coreset(df, k=1, scale=64).collect()
    assert len(one) == 1 and one[0]["vec_id"] == 0

    import pytest as _pt
    from pyspark.sql import functions as F

    with _pt.raises(ValueError):
        kcenter_coreset(df, k=0)
    with _pt.raises(ValueError):
        quantize_embedding(F.col("embedding"), scale=48)


def test_randomized_response_python_replay(spark):
    """Debiased Warner estimator: exact integer obs share, one double
    division; invalid designs rejected."""
    from document_quality_assessment_ocr_spark.operators.privacy import (
        randomized_response_estimate,
    )

    rows = [("a", 1)] * 6 + [("a", 0)] * 4 + [("b", 1)] * 1 + [("b", 0)] * 9
    df = spark.createDataFrame(rows, "source string, reported long")
    got = {r["source"]: r for r in randomized_response_estimate(
        df, keep_num=3, keep_den=4).collect()}

    for g, n, rep in (("a", 10, 6), ("b", 10, 1)):
        obs = (1_000_000 * rep) // n
        est = float(obs * 4 - 1_000_000) / 2_000_000.0
        r = got[g]
        assert (r["n"], r["n_reported"], r["obs_micro"]) == (n, rep, obs)
        assert r["est"] == est

    import pytest as _pt
    with _pt.raises(ValueError):
        randomized_response_estimate(df, keep_num=1, keep_den=2)
    with _pt.raises(ValueError):
        randomized_response_estimate(df, keep_num=5, keep_den=4)


def test_pca_project_python_replay(spark):
    """Quantized sufficient statistics → shared eigensolver → literal
    projection, replayed in python with the same left-to-right fold."""
    import numpy as np

    from document_quality_assessment_ocr_spark.operators.similarity import (
        pca_from_stats,
        pca_project,
    )

    rng = np.random.default_rng(7)
    X = rng.normal(scale=0.3, size=(40, 6))
    X[:, 0] *= 4.0  # dominant direction
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    out = pca_project(df, k=2, scale=1024).collect()
    assert [r["vec_id"] for r in out] == list(range(40))

    Q = np.trunc(X * 1024.0).astype(np.int64)
    n, s, G = Q.shape[0], Q.sum(axis=0), Q.T @ Q
    comps, offs = pca_from_stats(n, s.tolist(), G.reshape(-1).tolist(), k=2)
    for j, (v, off) in enumerate(zip(comps, offs), start=1):
        # sign rule: largest-|component| entry is positive
        assert v[int(np.argmax(np.abs(v)))] > 0
        for r in out:
            acc = 0.0
            for d in range(6):
                acc += float(Q[r["vec_id"], d]) * v[d]
            assert abs(r[f"pc{j}"] - (acc + off)) < 5e-7
    # dominant axis recovered: pc1 direction concentrates on dim 0
    assert abs(comps[0][0]) == max(abs(c) for c in comps[0])

    import pytest as _pt
    with _pt.raises(ValueError):
        pca_project(df, k=0)


def test_lang_confusion(spark):
    """Grid counts, on-grid marginals, recall micro, diagonal flags."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        lang_confusion,
    )

    en = "the cat and the dog is in it for a while and it is good"
    de = "der hund und die katze ist ein und das ist auf und der"
    rows = [("en", en), ("en", en), ("en", de), ("de", de), (None, en)]
    df = spark.createDataFrame(rows, "lang string, text string")
    out = {(r["label"], r["pred"]): r for r in lang_confusion(df).collect()}

    assert out[("en", "en")]["n"] == 2
    assert out[("en", "de")]["n"] == 1
    assert out[("de", "de")]["n"] == 1
    assert out[("", "en")]["n"] == 1
    r = out[("en", "en")]
    assert r["label_n"] == 3
    assert r["recall_micro"] == (1_000_000 * 2) // 3
    assert r["row_share_micro"] == (1_000_000 * 2) // 3
    assert r["is_correct"]
    assert not out[("en", "de")]["is_correct"]
    assert out[("de", "de")]["recall_micro"] == 1_000_000
    # coalesced NULL label never matches a real prediction
    assert not out[("", "en")]["is_correct"]


def test_text_segments(spark):
    """Boundary where block vocabularies diverge; short and empty docs."""
    from document_quality_assessment_ocr_spark.operators.chunking import (
        text_segments,
    )

    topic_a = "apple banana cherry"
    topic_b = "xylophone zebra quartz"
    docs = [
        (1, f"{topic_a} {topic_a} {topic_b}"),   # blocks: A|A|B
        (2, "one two"),                            # single block
        (3, ""),                                   # empty
        (4, f"{topic_a} {topic_a}"),               # identical blocks
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text_segments(df, w=3, threshold_micro=500_000).collect()}

    r1 = out[1]
    assert (r1["n_tokens"], r1["n_blocks"]) == (9, 3)
    # sims: (A,A)=1e6, (A,B)=0 -> one boundary at left block 2
    assert r1["n_boundaries"] == 1 and r1["boundaries"] == "2"
    assert r1["n_segments"] == 2 and r1["min_sim_micro"] == 0

    r2 = out[2]
    assert (r2["n_blocks"], r2["n_boundaries"], r2["n_segments"]) == (1, 0, 1)
    assert r2["min_sim_micro"] is None and r2["boundaries"] == ""

    r3 = out[3]
    assert (r3["n_blocks"], r3["n_segments"]) == (0, 0)

    r4 = out[4]
    assert r4["n_boundaries"] == 0 and r4["min_sim_micro"] == 1_000_000

    import pytest as _pt
    with _pt.raises(ValueError):
        text_segments(df, w=0)


def test_concentration_profile(spark):
    """Hand-computed HHI: shares 3/4 and 1/4 -> 625000 micro; monopoly
    group -> 1e6; NULL group/sub coalesce to ''."""
    from document_quality_assessment_ocr_spark.operators.profile import (
        concentration_profile,
    )

    rows = (
        [("a", "x")] * 3 + [("a", "y")] + [("b", "z")] * 2 + [(None, None)]
    )
    df = spark.createDataFrame(rows, "lang string, source string")
    out = {r["lang"]: r for r in concentration_profile(df).collect()}

    a = out["a"]
    assert (a["n_rows"], a["n_subs"]) == (4, 2)
    assert a["hhi_micro"] == (750_000**2) // 1_000_000 + (250_000**2) // 1_000_000
    assert (a["top_sub"], a["top_share_micro"]) == ("x", 750_000)
    b = out["b"]
    assert b["hhi_micro"] == 1_000_000 and b["n_subs"] == 1
    assert out[""]["top_sub"] == ""


def test_extract_entities(spark):
    """Typed rows with 1-based ordinals per type; docs without matches
    emit nothing; dict order is the emission contract."""
    from document_quality_assessment_ocr_spark.operators.scrub import (
        ENTITY_PATTERNS,
        extract_entities,
    )

    assert list(ENTITY_PATTERNS) == ["email", "ipv4", "phone"]
    docs = [
        (1, "mail a@b.com then c.d@e.org via 10.0.0.1 call +1234567890"),
        (2, "nothing to see"),
        (3, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = extract_entities(df).collect()
    assert all(r["doc_id"] == 1 for r in rows)
    got = [(r["etype"], r["pos"], r["value"]) for r in rows]
    assert got == [
        ("email", 1, "a@b.com"),
        ("email", 2, "c.d@e.org"),
        ("ipv4", 1, "10.0.0.1"),
        ("phone", 1, "+1234567890"),
    ]


def test_bitext_margin_mine(spark):
    """Python replay of the margin criterion: rounded cosines, (-cos,id)
    tie order, fixed mean fold; short right side -> NULL margin."""
    import math

    from document_quality_assessment_ocr_spark.operators.similarity import (
        bitext_margin_mine,
    )

    left = [(0, [1.0, 0.0, 0.0]), (2, [0.5, 0.5, 0.0])]
    right = [
        (1, [0.9, 0.1, 0.0]),
        (3, [0.1, 0.9, 0.0]),
        (5, [0.0, 0.0, 1.0]),
        (7, [0.4, 0.4, 0.1]),
        (9, [0.45, 0.45, 0.0]),
    ]
    schema = "vec_id long, embedding array<double>"
    ldf = spark.createDataFrame(left, schema)
    rdf = spark.createDataFrame(right, schema)
    out = {r["probe_id"]: r for r in bitext_margin_mine(ldf, rdf, k=4).collect()}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a) * sum(y * y for y in b))
        return round(num / den, 6)

    for pid, pv in left:
        scored = sorted(
            ((cos(pv, rv), rid) for rid, rv in right),
            key=lambda t: (-t[0], t[1]),
        )[:4]
        c = [s[0] for s in scored]
        mean = ((((0.0 + c[0]) + c[1]) + c[2]) + c[3]) / 4.0
        r = out[pid]
        assert r["match_id"] == scored[0][1]
        assert abs(r["cos"] - c[0]) < 2e-6
        assert abs(r["margin"] - round(c[0] / mean, 6)) < 2e-6
        assert r["accepted"] == (r["margin"] >= 1.05)

    short = bitext_margin_mine(ldf, rdf.limit(2), k=4).collect()
    assert all(r["margin"] is None and r["accepted"] is None for r in short)

    import pytest as _pt
    with _pt.raises(ValueError):
        bitext_margin_mine(ldf, rdf, k=0)



def test_banding_selectivity_python_replay(spark):
    """est_pairs/bucket stats replayed exactly from the engine's own
    signatures: c*(c-1)//2 per bucket is the per-band join's pair count."""
    import hashlib as _h

    from document_quality_assessment_ocr_spark.operators.dedup import (
        banding_selectivity,
        minhash_signatures,
    )

    texts = ["the quick brown fox jumps over the lazy dog today"] * 3 + [
        "pack my box with five dozen liquor jugs right now ok",
        "pack my box with five dozen liquor jugs right now ok",
        "sphinx of black quartz judge my vow and more words here",
        "how vexingly quick daft zebras jump over fences all day",
        "jived fox nymph grabs quick waltz in the park at noon",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {
        r["band"]: r.asDict()
        for r in banding_selectivity(
            df, n_hashes=16, bands=4, shingle="word"
        ).collect()
    }
    sigs = minhash_signatures(df, n_hashes=16, shingle="word").collect()
    n = len(sigs)
    for band in range(4):
        buckets = {}
        for s in sigs:
            key = _h.md5(
                "#".join(str(s[f"h{band * 4 + r:02d}"]) for r in range(4)).encode()
            ).hexdigest()
            buckets[key] = buckets.get(key, 0) + 1
        cs = list(buckets.values())
        est = sum(c * (c - 1) // 2 for c in cs)
        r = out[band]
        assert r["n_docs"] == n
        assert r["n_buckets"] == len(cs)
        assert r["singleton_buckets"] == sum(1 for c in cs if c == 1)
        assert r["max_bucket"] == max(cs)
        assert r["est_pairs"] == est
        assert r["rr_micro"] == est * 1_000_000 // (n * (n - 1) // 2)
    # the triple-dup group guarantees 3 pairs + the dup pair's 1 in every band
    assert all(out[b]["est_pairs"] >= 4 for b in range(4))


def test_isotropy_audit_python_replay(spark):
    """The sum-vector identity replayed with exact ints; n=1 edge NULLs."""
    from document_quality_assessment_ocr_spark.operators.similarity import (
        isotropy_audit,
    )

    vecs = [
        [0.5, 0.25, -0.75],
        [0.5, 0.3125, -0.75],
        [-1.0, 0.0, 0.5],
        [0.25, -0.5, 0.125],
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    r = isotropy_audit(df, scale=64).collect()[0]
    q = [[int(x * 64) for x in v] for v in vecs]
    n, dim = len(q), len(q[0])
    ssq = sum(sum(x * x for x in v) for v in q)
    s = [sum(v[d] for v in q) for d in range(dim)]
    s2 = sum(x * x for x in s)
    assert (r["n"], r["dim"]) == (n, dim)
    assert r["self_dot_sum"] == ssq
    assert r["pair_dot_sum"] == s2 - ssq
    assert r["avg_self_dot"] == round(ssq / n, 6) + 0.0
    assert r["avg_pair_dot"] == round((s2 - ssq) / (n * (n - 1)), 6) + 0.0
    aniso = ((s2 - ssq) / (n * (n - 1))) / (ssq / n)
    assert abs(r["anisotropy"] - aniso) < 1e-6

    one = isotropy_audit(df.limit(1), scale=64).collect()[0]
    assert one["n"] == 1
    assert one["avg_pair_dot"] is None and one["anisotropy"] is None


def test_cuped_lift_python_replay(spark):
    """theta and adjusted means replayed exactly; a y==x+effect design
    collapses residual variance so adjusted lift isolates the effect;
    constant covariate degrades to theta=0 (plain means)."""
    from document_quality_assessment_ocr_spark.operators.experiment import (
        cuped_lift,
    )

    rows = []
    for i in range(12):
        x = 100 + 7 * i
        arm = "treat" if i % 2 else "control"
        rows.append((arm, x + (30 if arm == "treat" else 0), x))
    df = spark.createDataFrame(rows, "variant string, metric long, covariate long")
    out = {r["variant"]: r.asDict() for r in cuped_lift(df).collect()}

    N = len(rows)
    sx = sum(r[2] for r in rows)
    sy = sum(r[1] for r in rows)
    sxy = sum(r[1] * r[2] for r in rows)
    sxx = sum(r[2] * r[2] for r in rows)
    theta = (N * sxy - sx * sy) / (N * sxx - sx * sx)
    xpool = sx / N
    for arm in ("control", "treat"):
        sub = [r for r in rows if r[0] == arm]
        n = len(sub)
        mean = sum(r[1] for r in sub) / n
        xm = sum(r[2] for r in sub) / n
        adj = mean - theta * (xm - xpool)
        assert out[arm]["n"] == n
        assert out[arm]["theta"] == theta
        assert out[arm]["adj_mean"] == adj
    assert out["control"]["is_control"] and not out["treat"]["is_control"]
    assert out["control"]["lift_adj"] == 0.0
    want = out["treat"]["adj_mean"] / out["control"]["adj_mean"] - 1.0
    assert out["treat"]["lift_adj"] == want
    # variance-reduction direction: the alternating assignment leaves a
    # +7 covariate imbalance between arms, so the RAW mean gap is 37;
    # the adjustment must pull the gap back toward the planted +30
    raw_gap = out["treat"]["mean"] - out["control"]["mean"]
    adj_gap = out["treat"]["adj_mean"] - out["control"]["adj_mean"]
    assert abs(adj_gap - 30.0) < abs(raw_gap - 30.0)

    const = df.withColumn("covariate", F.lit(5).cast("long"))
    out2 = {r["variant"]: r.asDict() for r in cuped_lift(const).collect()}
    assert out2["treat"]["theta"] == 0.0
    assert out2["treat"]["adj_mean"] == out2["treat"]["mean"]

    named = cuped_lift(df, control="treat").collect()
    assert [r["is_control"] for r in named] == [False, True]


def test_encoding_quality_profile(spark):
    """Planted mojibake pair / replacement char / C1 control each hit
    exactly their own channel; clean docs stay unflagged."""
    from document_quality_assessment_ocr_spark.operators.scrub import (
        encoding_quality_profile,
    )

    moji = "cafÃ© menu cafÃ©"  # 2 moji pairs
    repl = "lost � bytes �� here"  # 3 replacement chars
    ctrl = "ctrlchar"  # 1 C1 control
    rows = [
        (1, moji, "web"),
        (2, repl, "web"),
        (3, ctrl, "scan"),
        (4, "perfectly clean ascii text", "scan"),
        (5, None, "scan"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r.asDict() for r in encoding_quality_profile(df).collect()}
    web, scan = out["web"], out["scan"]
    assert (web["n_docs"], web["n_flagged"]) == (2, 2)
    assert (web["moji_pairs"], web["repl_chars"], web["c1_chars"]) == (2, 3, 0)
    assert (scan["n_docs"], scan["n_flagged"]) == (3, 1)
    assert (scan["moji_pairs"], scan["repl_chars"], scan["c1_chars"]) == (0, 0, 1)
    s1 = 2 * 1_000_000 // len(moji)
    s2 = 3 * 1_000_000 // len(repl)
    s3 = 1 * 1_000_000 // len(ctrl)
    assert web["mean_score_micro"] == (s1 + s2) // 2
    assert scan["mean_score_micro"] == s3 // 3


def test_quota_apportionment(spark):
    """Hamilton largest-remainder replay on known weights; sum(alloc) ==
    budget always; budget=0 and negative-budget guard."""
    from document_quality_assessment_ocr_spark.operators.sampling import (
        quota_apportionment,
    )

    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2
    df = spark.createDataFrame(rows, "source string")
    out = {r["source"]: r.asDict() for r in quota_apportionment(df, budget=7).collect()}
    # 7*5/10 = 3 rem 5; 7*3/10 = 2 rem 1; 7*2/10 = 1 rem 4 -> seat to a
    assert (out["a"]["quota_floor"], out["a"]["remainder"], out["a"]["alloc"]) == (3, 5, 4)
    assert (out["b"]["quota_floor"], out["b"]["alloc"]) == (2, 2)
    assert (out["c"]["quota_floor"], out["c"]["alloc"]) == (1, 1)
    assert sum(r["alloc"] for r in out.values()) == 7

    zero = quota_apportionment(df, budget=0).collect()
    assert sum(r["alloc"] for r in zero) == 0

    big = quota_apportionment(df, budget=1_000_003).collect()
    assert sum(r["alloc"] for r in big) == 1_000_003

    with pytest.raises(ValueError):
        quota_apportionment(df, budget=-1)


def test_benford_audit_python_replay(spark):
    """Zero-filled 9-digit grid, shares and TVD replayed exactly;
    non-positive values excluded."""
    from document_quality_assessment_ocr_spark.operators.profile import (
        BENFORD_MICRO,
        benford_audit,
    )

    vals_a = [1, 19, 123, 2, 25, 31, 4, 99, 100, 0]  # 0 excluded
    vals_b = [5, 55, 555, 5555, 6]
    rows = [("a", v) for v in vals_a] + [("b", v) for v in vals_b]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    out = benford_audit(df).collect()
    assert len(out) == 18  # 2 groups x 9 digits, zero-filled
    by = {(r["source"], r["digit"]): r.asDict() for r in out}
    for grp, vals in (("a", [v for v in vals_a if v >= 1]), ("b", vals_b)):
        n = len(vals)
        cnts = {d: 0 for d in range(1, 10)}
        for v in vals:
            cnts[int(str(v)[0])] += 1
        dev = sum(
            abs(cnts[d] * 1_000_000 - BENFORD_MICRO[d - 1] * n)
            for d in range(1, 10)
        )
        for d in range(1, 10):
            r = by[(grp, d)]
            assert r["cnt"] == cnts[d]
            assert r["n"] == n
            assert r["share_micro"] == cnts[d] * 1_000_000 // n
            assert r["exp_micro"] == BENFORD_MICRO[d - 1]
            assert r["tvd_micro"] == dev // (2 * n)
    # group b is all 5/6-leading: far from Benford, so higher TVD than a
    assert by[("b", 5)]["tvd_micro"] > by[("a", 1)]["tvd_micro"]


def test_scrub_effectiveness(spark):
    """Planted entities all removed -> after 0, removed_micro 10^6;
    entity-free corpus yields zero rows counts with clamped rates."""
    from document_quality_assessment_ocr_spark.operators.scrub import (
        scrub_effectiveness,
    )

    rows = [
        (1, "mail bob@example.com and 10.0.0.1 plus +141555501234"),
        (2, "two mails a@b.io c@d.org"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["etype"]: r.asDict() for r in scrub_effectiveness(df).collect()}
    assert set(out) == {"email", "ipv4", "phone"}
    assert out["email"]["before_cnt"] == 3
    assert out["ipv4"]["before_cnt"] == 1
    assert out["phone"]["before_cnt"] == 1
    for e in out.values():
        assert e["after_cnt"] == 0
        assert e["docs_with_residual"] == 0
        assert e["removed_micro"] == 1_000_000

    clean = spark.createDataFrame([(1, "nothing here")], "doc_id long, text string")
    out2 = {r["etype"]: r.asDict() for r in scrub_effectiveness(clean).collect()}
    for e in out2.values():
        assert (e["before_cnt"], e["after_cnt"], e["removed_micro"]) == (0, 0, 0)


def test_zipf_fit_python_replay(spark):
    """Floor-log2 frequency buckets and the sign-split integer slope
    replayed in python on a tiny corpus."""
    from document_quality_assessment_ocr_spark.operators.profile import zipf_fit

    docs = spark.createDataFrame(
        [("a a a a b b c d",), ("a a a a b b c e",)], "text string"
    )
    # freqs: a=8, b=4, c=2, d=1, e=1 -> buckets 3,2,1,0 with n_terms 1,1,1,2
    rows = {r["bucket"]: r for r in zipf_fit(docs).collect()}
    assert {b: rows[b]["n_terms"] for b in rows} == {0: 2, 1: 1, 2: 1, 3: 1}
    assert {b: rows[b]["log2_terms"] for b in rows} == {0: 1, 1: 0, 2: 0, 3: 0}
    # k=4 sx=6 sy=1 sxy=0 sxx=14: num=0*4-6=-6, den=56-36=20 -> -300 milli
    assert all(r["slope_milli"] == -300 for r in rows.values())


def test_chisq_independence_python_replay(spark):
    """Per-cell chi-square contributions replayed with exact integer
    marginals and the fixed-op-order double step."""
    from document_quality_assessment_ocr_spark.operators.profile import (
        chisq_independence,
    )

    rows = [("s1", "en")] * 30 + [("s1", "de")] * 10 + \
           [("s2", "en")] * 20 + [("s2", "de")] * 40
    df = spark.createDataFrame(rows, "source string, lang string")
    out = {(r["source"], r["lang"]): r for r in chisq_independence(df).collect()}
    cell = out[("s1", "en")]
    assert (cell["o"], cell["r_total"], cell["c_total"], cell["n"]) == (30, 40, 50, 100)
    assert cell["expected_micro"] == 40 * 50 * 1_000_000 // 100
    diff = 30 * 100 - 40 * 50  # = 1000
    exp = int(float(diff) * float(diff) / float(40 * 50 * 100) * 1e6)
    assert cell["chi2_micro"] == exp
    assert len(out) == 4


def test_mad_outlier_audit_python_replay(spark):
    """Binned median/MAD and the k-MAD fence replayed in python; the
    outlier-free group reports 0 via the left-join coalesce."""
    from document_quality_assessment_ocr_spark.operators.profile import (
        mad_outlier_audit,
    )

    vals = [100] * 5 + [130] * 4 + [200] * 2 + [900]  # bins 3,4,6,28
    rows = [("s1", v) for v in vals] + [("s2", 64)] * 3
    df = spark.createDataFrame(rows, "source string, n_chars long")
    out = {r["source"]: r for r in mad_outlier_audit(df, bin_width=32).collect()}
    s1 = out["s1"]
    # bins: 3 x5, 4 x4, 6 x2, 28 x1 (n=12) -> median bin 3 (cum 5*2<12? 10<12 -> next)
    # cum at bin 3 = 5 -> 10 < 12; bin 4 cum 9 -> 18 >= 12 -> median 4
    assert (s1["n"], s1["median_bin"]) == (12, 4)
    # devs: |3-4|=1 x5, 0 x4, 2 x2, 24 x1 -> cum 0:4 (8<12), 1:9 (18>=12) -> mad 1
    assert s1["mad_bin"] == 1
    # fence: |bin-4| > 3 -> only bin 28 (1 row)
    assert s1["n_outliers"] == 1
    assert (out["s2"]["median_bin"], out["s2"]["mad_bin"], out["s2"]["n_outliers"]) \
        == (2, 0, 0)


def test_pareto_frontier_cells_python_replay(spark):
    """Weak-dominance staircase replayed: a cell is off the frontier iff
    some other cell is >= on both axes (and differs) — one surviving y
    per x column, decreasing in y as x grows."""
    from document_quality_assessment_ocr_spark.operators.curriculum import (
        pareto_frontier_cells,
    )

    cells = [(5, 1), (5, 3), (3, 3), (3, 4), (1, 9), (1, 2), (5, 3)]
    df = spark.createDataFrame(cells, "xb long, yb long")
    out = {(r["x_bucket"], r["y_bucket"]): r
           for r in pareto_frontier_cells(df, "xb", "yb").collect()}
    assert out[(5, 3)]["cnt"] == 2
    exp = {(5, 1): False,   # same-x column: (5,3) beats it
           (5, 3): True,
           (3, 3): False,   # (5,3) is >= on both
           (3, 4): True,
           (1, 9): True,
           (1, 2): False}
    assert {k: v["on_frontier"] for k, v in out.items()} == exp


def test_year_coverage_python_replay(spark):
    """Word-bounded 4-digit year extraction with repeats counted; shares
    normalize within group; 3-digit and glued numbers never match."""
    from document_quality_assessment_ocr_spark.operators.profile import year_coverage

    docs = spark.createDataFrame(
        [
            ("s1", "born 1999 and again 1999 then 2024"),
            ("s1", "in 2024; not 199 nor x2024y nor 21000"),
            ("s2", "nothing here"),
        ],
        "source string, text string",
    )
    out = {(r["source"], r["year"]): r for r in year_coverage(docs).collect()}
    assert {k: v["cnt"] for k, v in out.items()} == {
        ("s1", 1999): 2, ("s1", 2024): 2,
    }
    assert out[("s1", 1999)]["group_total"] == 4
    assert out[("s1", 1999)]["share_micro"] == 500_000

def test_bitext_margin_fast_path_matches_hof(spark):
    """The r6 matmul-shortlist rewrite of bitext_margin_mine must emit
    byte-identical rows to the cosine() Column-HOF brute force it replaced
    — including on engineered ROUND(·,6) ties broken by neighbor id."""
    import numpy as np

    from pyspark.sql import functions as F
    from document_quality_assessment_ocr_spark.operators.similarity import (
        bitext_margin_mine,
        cosine,
    )

    rng = np.random.default_rng(213)
    d = 16
    base = rng.normal(size=(40, d))
    rows = []
    rid = 1
    for b in base:
        # clones of the same direction -> identical cosines vs every probe
        # (rounded ties resolved purely by id), plus jittered near-ties
        for scale in (1.0, 2.0, 0.5):
            rows.append((rid, (b * scale).tolist()))
            rid += 2
        rows.append((rid, (b + rng.normal(size=d) * 1e-7).tolist()))
        rid += 2
    right = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probes = [(2 * i, base[i % len(base)].tolist()) for i in range(12)]
    left = spark.createDataFrame(probes, "vec_id long, embedding array<double>")

    fast = bitext_margin_mine(left, right, k=4, accept=1.05).collect()

    # reference: the pre-r6 HOF cross-join scoring feeding the same merge
    pr = left.select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    scored = right.alias("c").join(F.broadcast(pr), F.lit(True)).select(
        "probe_id",
        F.col("c.vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("probe_vec"), F.col("c.embedding")), 6).alias("cos"),
    )
    item = F.struct(
        (-F.col("cos")).alias("nc"),
        F.col("neighbor_id").alias("neighbor_id"),
        F.col("cos").alias("cos"),
    )
    topk = lambda c: F.slice(F.sort_array(F.collect_list(c)), 1, 4)
    lvl1 = scored.groupBy(
        "probe_id", F.pmod(F.hash("neighbor_id"), F.lit(32)).alias("b")
    ).agg(topk(item).alias("top"))
    merged = (
        lvl1.select("probe_id", F.explode("top").alias("t"))
        .groupBy("probe_id")
        .agg(topk(F.col("t")).alias("top"))
    )
    csum = "0.0D"
    for j in range(1, 5):
        csum = f"({csum} + top[{j - 1}].cos)"
    margin = F.expr(
        f"CASE WHEN size(top) = 4 THEN "
        f"round(top[0].cos / ({csum} / CAST(4 AS DOUBLE)), 6) + 0.0D END"
    )
    ref = merged.select(
        "probe_id",
        F.expr("top[0].neighbor_id").cast("long").alias("match_id"),
        F.expr("top[0].cos + 0.0D").alias("cos"),
        margin.alias("margin"),
        (margin >= F.lit(1.05)).alias("accepted"),
    ).orderBy("probe_id").collect()

    assert len(fast) == len(ref)
    for a, b in zip(fast, ref):
        assert a["probe_id"] == b["probe_id"]
        assert a["match_id"] == b["match_id"], (a, b)
        assert a["cos"] == b["cos"], (a, b)  # bit-identical, not approx
        assert a["margin"] == b["margin"], (a, b)
        assert a["accepted"] == b["accepted"]
