"""Composite training-data curation plan over a documents table.

The canonical pre-training data flow, composed from this repo's operators:

    exact dedup (normalized-text fingerprint, keep min id)
      → density band (boilerplate strip)
      → quality threshold
      → language allowlist
      → MinHash-LSH near-dup demotion (keep the smallest id per LSH cluster)

Pure Column expressions + md5 hashing end-to-end → the whole composite has an
exact DuckDB oracle (q19). Shuffle profile: fingerprint groupBy, shingle
groupBy, LSH band self-join — each keyed and bounded; no cross join anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint, text_density
from ..operators.dedup import minhash_lsh_pairs
from ..operators.textstats import lang_id, quality_score


def curate_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_density: float = 1.0,
    max_density: float = 80.0,
    min_quality: float = 0.5,
    languages: tuple[str, ...] = ("en",),
    lsh_hashes: int = 8,
    lsh_bands: int = 4,
) -> DataFrame:
    """documents → (doc_id, kept, drop_reason). Every doc appears once with
    its fate — auditable curation, not silent filtering."""
    d = docs.select(F.col(id_col), F.col(text_col))

    # 1. exact dedup: keep min id per fingerprint
    fp = d.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
    keepers = fp.groupBy("fp").agg(F.min(id_col).alias("keep_id"))
    d = (
        fp.join(keepers, "fp")
        .select(F.col(id_col), (F.col(id_col) == F.col("keep_id")).alias("is_first"))
        .join(d, id_col)
    )

    dens = text_density(F.col(text_col))
    qual = quality_score(F.col(text_col))
    lang = lang_id(F.col(text_col))
    lang_ok = lang.isin(list(languages))

    # 2. near-dup demotion: within each LSH candidate cluster keep min id
    pairs = minhash_lsh_pairs(
        docs.select(F.col(id_col), F.col(text_col)),
        id_col=id_col,
        text_col=text_col,
        n_hashes=lsh_hashes,
        bands=lsh_bands,
    )
    demoted = pairs.select(F.col("id_b").alias(id_col)).distinct().withColumn(
        "near_dup", F.lit(True)
    )
    d = d.join(demoted, id_col, "left").withColumn(
        "near_dup", F.coalesce(F.col("near_dup"), F.lit(False))
    )

    reason = (
        F.when(~F.col("is_first"), F.lit("exact_duplicate"))
        .when((dens < F.lit(min_density)) | (dens > F.lit(max_density)), F.lit("density"))
        .when(qual < F.lit(min_quality), F.lit("quality"))
        .when(~lang_ok, F.lit("language"))
        .when(F.col("near_dup"), F.lit("near_duplicate"))
        .otherwise(F.lit(""))
    )
    return d.select(
        F.col(id_col),
        (reason == F.lit("")).alias("kept"),
        reason.alias("drop_reason"),
    )


def curate_documents_v2(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 20,
    min_keep_ratio: float = 0.5,
    max_dup_gram_char_frac: float = 0.2,
    decontam_n: int = 5,
    bloom_words: int = 64,
    bloom_k: int = 3,
) -> DataFrame:
    """Second-generation curation composite, chained over INTERMEDIATE
    outputs (not the raw text):

        chunk-level exact dedup (global first-occurrence-wins boilerplate
        strip, 20-word chunks)
          → repetition filter on the CLEANED text (duplicated-2-gram
            character fraction, Gopher A1.1)
          → benchmark decontamination of the CLEANED text against the eval
            set's raw 5-gram shingles, Bloom-prefiltered

    Every doc appears once with its fate and the metrics that decided it —
    first matching reason wins, in the order boilerplate → contaminated →
    repetition.

    Scale shape (100 TB): stage 1 is two algebraic hash aggregates (winner
    per distinct chunk, reassembly per doc — operators/dedup.chunk_dedup);
    stage 2 re-uses the per-doc partitioning for its two-level gram
    aggregate; stage 3 never shuffles the corpus — the eval Bloom bitmap
    (≤``bloom_words`` rows) and the distinct eval shingle set broadcast, so
    the cleaned corpus is probed map-side and only Bloom survivors reach
    the exact broadcast join. The final assembly joins ride the doc_id
    hash partitioning established by stage 1.

    Output: (doc_id, n_total, n_kept, keep_ratio, dup_gram_char_frac,
    contaminated, kept, drop_reason).
    """
    from ..operators.bloom import bloom_build, bloom_probe
    from ..operators.decontam import shingle_hashes
    from ..operators.dedup import chunk_dedup
    from ..operators.quality import top_ngram_stats

    # 1. boilerplate strip: global chunk dedup over the training slice only
    cleaned = chunk_dedup(train, id_col, text_col, chunk_words)

    # 2. repetition metrics over what SURVIVED the strip
    grams = top_ngram_stats(
        cleaned.select(id_col, F.col("clean_text")),
        n=2,
        id_col=id_col,
        text_col="clean_text",
    ).select(id_col, "dup_gram_char_frac")

    # 3. decontamination: cleaned-text 5-grams vs the eval set's raw text
    tr_sh = shingle_hashes(
        cleaned.select(id_col, F.col("clean_text")), decontam_n, id_col, "clean_text"
    )
    ev_sh = (
        shingle_hashes(eval_set, decontam_n, id_col, text_col)
        .select("shingle")
        .distinct()
    )
    bloom = bloom_build(ev_sh, "shingle", bloom_words, bloom_k)
    candidates = bloom_probe(tr_sh, "shingle", bloom, bloom_words, bloom_k).where(
        F.col("bloom_maybe")
    )
    contaminated = (
        candidates.join(F.broadcast(ev_sh), "shingle", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )

    keep_ratio = F.col("n_kept").cast("double") / F.col("n_total").cast("double")
    out = (
        cleaned.join(grams, id_col, "left")
        .join(contaminated, id_col, "left")
        .select(
            F.col(id_col),
            "n_total",
            "n_kept",
            keep_ratio.alias("keep_ratio"),
            F.coalesce("dup_gram_char_frac", F.lit(0.0)).alias("dup_gram_char_frac"),
            F.coalesce("contaminated", F.lit(False)).alias("contaminated"),
        )
    )
    reason = (
        F.when(F.col("keep_ratio") < F.lit(min_keep_ratio), F.lit("boilerplate"))
        .when(F.col("contaminated"), F.lit("contaminated"))
        .when(
            F.col("dup_gram_char_frac") > F.lit(max_dup_gram_char_frac),
            F.lit("repetition"),
        )
        .otherwise(F.lit(""))
    )
    return out.select(
        "*",
        (reason == F.lit("")).alias("kept"),
        reason.alias("drop_reason"),
    )


def curate_documents_v4(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    languages: tuple[str, ...] = ("en",),
    lsh_hashes: int = 16,
    lsh_bands: int = 4,
    shingle_ngram: int = 5,
) -> DataFrame:
    """Curation composite v4 — the FineWeb-shape recipe (Penedo et al.
    2024) over already-extracted text, chaining the full quality family::

        language gate (stopword-profile lang-ID)
          → Gopher document rules (Rae 2021 Table A1; reason 'gopher:<rule>')
          → C4 line cleaning + page gates (Raffel 2020; kept lines become
            the document's clean_text)
          → MinHash-LSH word-shingle near-dup demotion of the CLEAN text,
            ranked only among gate survivors (a rejected doc must not
            shadow a clean duplicate)
          → PII scrub (email/IP/phone placeholders) of what ships

    First matching reason wins; every doc appears once with its fate.

    Plan shape: stages 1–3 fuse into ONE map-side projection (the quality
    operators share column builders — ``gopher_cols``/``c4_cols`` — so no
    per-stage join-backs exist); the dedup stage is the MinHash banding
    pipeline (one shingle exchange; the demotion set is derived from
    band-bucket minima — no pair self-join, see inline note) over the
    survivor subset only; the demotion set (near-dup ids, tiny by
    construction) comes back via one left join that AQE turns into a
    broadcast. PII scrubbing and the fate fold are map-side. At 100 TB
    nothing here shuffles payload text except the survivors' shingle
    stream, which word-shingling already shrinks 5–10×.

    Output: (id, lang, fate, kept, n_pii, final_text) — final_text is the
    scrubbed clean text for kept docs, NULL otherwise.
    """
    from ..functions.text import WS_CLASS
    from ..operators.dedup import _band_buckets
    from ..operators.quality import c4_cols, gopher_cols
    from ..operators.scrub import EMAIL, IPV4, PHONE
    from ..operators.textstats import lang_id

    txt = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.filter(
        F.split(F.trim(txt), WS_CLASS + "+"), lambda x: x != F.lit("")
    )
    base = docs.select(
        F.col(id_col),
        txt.alias("_t"),
        toks.alias("tk"),
        F.split(txt, "\n").alias("ls"),
        lang_id(F.col(text_col)).alias("lang"),
    )
    g = gopher_cols()
    c4 = c4_cols()
    pre_fate = (
        F.when(~F.col("lang").isin(*languages), F.lit("language"))
        .when(g["reason"].isNotNull(), F.concat(F.lit("gopher:"), g["reason"]))
        .when(~c4["doc_keep"], F.lit("c4"))
    )
    # lineage barrier: pre_fate/clean_text fold the whole lang-ID + gopher
    # + C4 battery, and Catalyst's predicate/alias substitution re-inlines
    # those expression trees into every downstream reference (the survivor
    # filter alone re-embedded the synth+tokenize subtree ~20×; the r6 sf1
    # plan dump showed the fused shingle stage at 17.9 s vs 2.8 s for st
    # alone). An Exchange cannot stop alias substitution, so materialize:
    # localCheckpoint (the iterative-op idiom — eager, per-execution, no
    # cross-run state; ~50k short rows) computes st ONCE and every branch
    # (survivor filter → banding, fate join-back, scrub/n_pii projection)
    # reads the materialized columns.
    st = base.select(
        F.col(id_col),
        F.col("lang"),
        pre_fate.alias("pre_fate"),
        c4["clean_text"].alias("clean_text"),
    ).localCheckpoint()
    survivors = st.where(F.col("pre_fate").isNull()).select(
        F.col(id_col), F.col("clean_text").alias(text_col)
    )
    # demotion set == DISTINCT id_b of minhash_lsh_pairs(survivors) ==
    # every band-bucket member that is not its bucket's minimum id (a doc
    # is some pair's id_b iff a lower id shares one of its buckets) — so
    # skip the quadratic pair emission entirely and derive it from the
    # shared banding stage (r6; the pair-join form re-paid O(Σ bucket²)
    # rows on clustered corpora for a set of ≤ |survivors| ids)
    bk = _band_buckets(
        survivors, id_col, text_col, lsh_hashes, lsh_bands, shingle_ngram, "word"
    )
    mins = bk.groupBy("band", "key").agg(F.min(id_col).alias("_mn"))
    demoted = (
        bk.join(mins, ["band", "key"])
        .where(F.col(id_col) > F.col("_mn"))
        .select(id_col)
        .distinct()
        .withColumn("near_dup", F.lit(True))
    )
    out = st.join(demoted, id_col, "left")
    fate = F.coalesce(
        F.col("pre_fate"),
        F.when(F.col("near_dup"), F.lit("near_duplicate")).otherwise(F.lit("keep")),
    )
    ct = F.col("clean_text")
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(ct, EMAIL, "<EMAIL>"), IPV4, "<IP>"),
        PHONE,
        "<PHONE>",
    )
    n_pii = (
        F.size(F.regexp_extract_all(ct, F.lit(EMAIL), F.lit(0)))
        + F.size(F.regexp_extract_all(ct, F.lit(IPV4), F.lit(0)))
        + F.size(F.regexp_extract_all(ct, F.lit(PHONE), F.lit(0)))
    ).cast("long")
    return out.select(
        F.col(id_col),
        F.col("lang"),
        fate.alias("fate"),
        (fate == F.lit("keep")).alias("kept"),
        n_pii.alias("n_pii"),
        F.when(fate == F.lit("keep"), scrubbed).alias("final_text"),
    )


def curate_documents_v3(
    docs_html: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    max_boiler_frac: float = 0.7,
    min_tokens: int = 10,
) -> DataFrame:
    """Curation composite v3 — the WEB pipeline end-to-end: raw HTML →
    DOM-heuristic main-content extraction → Unicode/whitespace
    normalization → structural gates → exact first-occurrence-wins dedup
    of the CLEANED main text. First matching reason wins::

        empty → boilerplate → too_short → duplicate → keep

    Dedup ranks only among documents that survived the earlier gates
    (rejected docs must not shadow a clean duplicate), keyed on
    md5(clean_text) with the lowest id winning — an algebraic min per
    fingerprint, no window.

    Plan shape: the HTML stage costs one doc_id exchange; normalization
    and gating are map-side; dedup adds one fingerprint aggregate + a
    co-partitioned join-back. Output:
    (id_col, fate, n_tokens, boiler_frac, clean_text).
    """
    from ..functions.text import token_count
    from ..operators.html import extract_main_html
    from ..operators.scrub import normalize_text

    # checkpoint the extraction: `clean` is a projection OF `main`, so the
    # join below otherwise re-runs the whole HTML block battery on both
    # sides (the q93 alias-substitution lesson — measured as the two
    # 28-36s stages of q79 at the 10x set)
    main = extract_main_html(docs_html, id_col, html_col).localCheckpoint()
    clean = normalize_text(main, id_col, "main_text").select(id_col, "clean_text")
    m = main.join(clean, id_col)
    n_toks = token_count(F.col("clean_text"))
    total = (F.col("content_chars") + F.col("boiler_chars")).cast("double")
    boiler_frac = F.when(
        total > 0, F.col("boiler_chars").cast("double") / total
    ).otherwise(F.lit(0.0))
    pre = (
        F.when(
            (F.col("n_content") == 0) | (F.col("clean_text") == ""), "empty"
        )
        .when(boiler_frac > F.lit(float(max_boiler_frac)), "boilerplate")
        .when(n_toks < F.lit(int(min_tokens)), "too_short")
    )
    sig = m.select(
        F.col(id_col),
        n_toks.alias("n_tokens"),
        boiler_frac.alias("boiler_frac"),
        F.col("clean_text"),
        pre.alias("pre_fate"),
        F.md5(F.col("clean_text")).alias("fp"),
    )
    winners = (
        sig.where(F.col("pre_fate").isNull())
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"))
    )
    out = sig.join(winners, "fp", "left")
    fate = F.coalesce(
        F.col("pre_fate"),
        F.when(F.col(id_col) != F.col("keep_id"), "duplicate").otherwise("keep"),
    )
    return out.select(
        F.col(id_col),
        fate.alias("fate"),
        F.col("n_tokens"),
        F.col("boiler_frac"),
        F.col("clean_text"),
    )
