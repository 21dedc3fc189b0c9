"""Benchmark decontamination — n-gram overlap between a training corpus and
a (much smaller) evaluation set.

The standard pre-training hygiene step (GPT-3 appendix C / PaLM §7): a
training document is *contaminated* if it shares at least one word n-gram
with any benchmark document. Spark-first shape:

* Both sides reduce to **distinct (id, shingle-hash) pairs** — md5 of the
  space-joined lowercase word n-gram, so the oracle's DuckDB twin is
  bit-identical and the shuffle carries 32-byte hashes, never text.
* The eval side is tiny by construction (benchmarks are thousands of docs
  against billions), so the overlap join is a **broadcast hash join** —
  the 100 TB training scan never shuffles; each task probes the broadcast
  set and emits only matching pairs. ``F.broadcast`` pins the hint; AQE
  would pick it anyway from runtime stats.
* Output is one row per contaminated training doc with the count of
  distinct shared shingles — the signal thresholded for drop/flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .quality import _words, ngrams_from_tokens


def shingle_hashes(
    docs: DataFrame, n: int = 5, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct (id, md5(word n-gram)) pairs per document. Tokens are
    materialized by their own projection so the n element_at references per
    gram hit an attribute, not n re-tokenizations (quality.ngrams_from_tokens)."""
    return docs.select(
        F.col(id_col), _words(F.col(text_col)).alias("_toks")
    ).select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.transform(ngrams_from_tokens(F.col("_toks"), n), F.md5)
            )
        ).alias("shingle"),
    )


def contamination_report(
    train: DataFrame,
    eval_set: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Training docs sharing ≥1 word n-gram with the eval set →
    (doc_id, n_shared_shingles), n_shared = distinct shared shingle hashes.

    The eval shingle set is broadcast; the train side streams through it
    with no shuffle of the corpus. The final per-doc count groups by
    ``doc_id`` over matched pairs only (bounded by eval-set size × overlap,
    not corpus size)."""
    train_sh = shingle_hashes(train, n, id_col, text_col)
    eval_sh = (
        shingle_hashes(eval_set, n, id_col, text_col)
        .select("shingle")
        .distinct()
    )
    matched = train_sh.join(F.broadcast(eval_sh), "shingle", "inner")
    return matched.groupBy(id_col).agg(
        F.count("shingle").alias("n_shared_shingles")
    )


def fuzzy_contamination_report(
    train: DataFrame,
    eval_set: DataFrame,
    n_hashes: int = 16,
    bands: int = 4,
    ngram: int = 5,
    min_match: int = 8,
    shingle: str = "word",
    seed: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """FUZZY decontamination — near-duplicate (not exact-n-gram) overlap
    between training corpus and eval set, the MinHash analog of
    :func:`contamination_report` (the Dolma / NemoCurator "fuzzy dedup
    against eval" hygiene pass).  A training doc is flagged when its
    MinHash signature agrees with an eval doc's on at least ``min_match``
    of ``n_hashes`` permutations — an unbiased Jaccard estimate
    ``n_match/n_hashes`` — with candidates found by banded LSH, never by
    scoring the cross product.

    Scale shape: both signature passes are the one-md5-per-shingle
    aggregate of :func:`minhash_signatures`; the eval side (band keys AND
    signatures) is tiny and broadcast twice, so the training corpus never
    shuffles for either the candidate join or the agreement join — the
    only corpus exchange is the signature groupBy itself.

    Output: (doc_id, eval_id, n_match, est_jaccard) for candidates with
    ``n_match >= min_match``.
    """
    from .dedup import minhash_signatures

    assert n_hashes % bands == 0
    rows = n_hashes // bands
    ts = minhash_signatures(
        train, id_col, text_col, n_hashes, ngram, seed=seed, shingle=shingle
    )
    es = minhash_signatures(
        eval_set, id_col, text_col, n_hashes, ngram, seed=seed, shingle=shingle
    )

    def bucketize(sig: DataFrame, out_id: str) -> DataFrame:
        band_cols = []
        for b in range(bands):
            parts = [F.col(f"h{b * rows + r:02d}") for r in range(rows)]
            band_cols.append(
                F.struct(
                    F.lit(b).alias("band"),
                    F.md5(F.concat_ws("#", *parts)).alias("key"),
                )
            )
        return sig.select(
            F.col(id_col).alias(out_id), F.explode(F.array(*band_cols)).alias("bk")
        ).select(out_id, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    cand = (
        bucketize(ts, "doc_id")
        .join(F.broadcast(bucketize(es, "eval_id")), ["band", "key"])
        .select("doc_id", "eval_id")
        .distinct()
    )
    hcols = [f"h{i:02d}" for i in range(n_hashes)]
    t = ts.select(F.col(id_col).alias("doc_id"), *[F.col(h).alias(f"t_{h}") for h in hcols])
    e = es.select(F.col(id_col).alias("eval_id"), *[F.col(h).alias(f"e_{h}") for h in hcols])
    n_match = sum(
        (F.col(f"t_{h}") == F.col(f"e_{h}")).cast("long") for h in hcols
    ).alias("n_match")
    return (
        cand.join(t, "doc_id")
        .join(F.broadcast(e), "eval_id")
        .select("doc_id", "eval_id", n_match)
        .where(F.col("n_match") >= F.lit(int(min_match)))
        .select(
            "doc_id",
            "eval_id",
            "n_match",
            (F.col("n_match") / F.lit(float(n_hashes))).alias("est_jaccard"),
        )
    )


def source_overlap_matrix(
    docs: DataFrame,
    n: int = 5,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise cross-source n-gram overlap — the "which corpora leaked
    into each other" matrix run before mixing sources into one training
    set (a crawl that re-scraped a books dump shows up here long before
    per-doc dedup finds the pairs).

    Each source reduces to its DISTINCT shingle-hash set (md5 of the
    space-joined lowercase word n-gram — the module's shared contract);
    the matrix is a self-equi-join on the hash. Fan-out per hash is
    bounded by the number of sources carrying it (the grouping-key
    cardinality, never corpus size), and output is at most
    |sources|²/2 rows. ``containment_micro = n_shared·1e6 DIV
    min(n_a, n_b)`` — asymmetric-size-safe (a small corpus fully
    contained in a big one reads 1e6, where Jaccard would read ~0).

    Output: (source_a, source_b, n_shared, n_a, n_b, containment_micro)
    with source_a < source_b.
    """
    sh = (
        docs.select(
            F.coalesce(F.col(source_col), F.lit("")).alias("src"),
            _words(F.col(text_col)).alias("_toks"),
        )
        .select(
            "src",
            F.explode(
                F.array_distinct(
                    F.transform(ngrams_from_tokens(F.col("_toks"), n), F.md5)
                )
            ).alias("shingle"),
        )
        # explicit not-null guard BEFORE the distinct: the self-join legs
        # get isnotnull(src/shingle) pushed below their copy of the
        # DISTINCT while the sizes aggregate does not, so the two canonical
        # forms built the corpus-wide distinct exchange twice (97 MB each
        # at the 10x set). Both columns are non-null by construction
        # (coalesce'd src, md5 of non-null grams) — the filter only makes
        # every consumer's subtree identical so ReusedExchange unifies them.
        .where(F.col("src").isNotNull() & F.col("shingle").isNotNull())
        .distinct()
    )
    sizes = sh.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("n_sh"))
    a = sh.select(F.col("src").alias("source_a"), "shingle")
    b = sh.select(F.col("src").alias("source_b"), "shingle")
    pairs = (
        a.join(b, "shingle")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    return (
        pairs.join(
            F.broadcast(sizes.select(F.col("src").alias("source_a"),
                                     F.col("n_sh").alias("n_a"))),
            "source_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("src").alias("source_b"),
                                     F.col("n_sh").alias("n_b"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            F.expr("(n_shared * 1000000L) DIV greatest(least(n_a, n_b), 1L)")
            .cast("long")
            .alias("containment_micro"),
        )
    )
