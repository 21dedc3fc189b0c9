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
