"""Positional phrase search over the whitespace token stream.

The contamination-forensics / template-detection primitive: find every
document containing an exact n-token phrase, with match counts and the
first match position. (The reference has no search surface — this is
part of the LLM-curation operator family layered on the same corpus;
cf. `/root/reference/src/document_assessor/` which scores documents but
never indexes them.)

Spark-first design — the postings NEVER self-join at corpus scale:

1. tokens are posexploded from the shared whitespace tokenizer
   (`textstats._tokens`, the same normalization every dedup/LM operator
   uses) into (doc, pos, token);
2. a literal ``IN (<phrase terms>)`` filter runs map-side — Catalyst
   folds it into the scan stage, so only postings of the handful of
   phrase terms survive;
3. ONE hash exchange regroups those postings per document, collecting a
   sorted position array per distinct term (arrays are per-doc-bounded);
4. adjacency is pure array arithmetic: anchor positions ``p`` of term 0
   survive iff ``p + i`` appears in term *i*'s array for every *i* —
   ``F.filter`` + ``array_contains``, no join, no window.

At 100 TB the exchange carries one row per (phrase-term hit), worst
case the document frequency of the *commonest* phrase term; the corpus
itself never shuffles. ``positional_postings`` exposes step 1-2's
relation for callers that want to persist a reusable positional index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import _tokens


def positional_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    terms: list[str] | None = None,
) -> DataFrame:
    """(id_col, pos, tok) positional postings; ``terms`` pre-filters
    map-side (pass the union of phrase vocabularies when probing many
    phrases against one persisted index)."""
    out = docs.select(
        F.col(id_col),
        F.posexplode(_tokens(F.col(text_col))).alias("pos", "tok"),
    )
    if terms is not None:
        out = out.where(F.col("tok").isin(sorted(set(terms))))
    return out.select(id_col, F.col("pos").cast("long").alias("pos"), "tok")


def phrase_search(
    docs: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-phrase matches: (id_col, n_matches, first_pos), one row per
    document containing the phrase at least once; positions 0-based."""
    if not phrase:
        raise ValueError("phrase must have at least one token")
    terms = [t.lower() for t in phrase]
    posts = positional_postings(docs, id_col, text_col, terms=terms)

    names: dict[str, str] = {}
    aggs = []
    for j, t in enumerate(sorted(set(terms))):
        nm = f"_p{j}"
        names[t] = nm
        aggs.append(
            F.sort_array(
                F.collect_list(F.when(F.col("tok") == F.lit(t), F.col("pos")))
            ).alias(nm)
        )
    per_doc = posts.groupBy(id_col).agg(*aggs)

    # adjacency as a nested filter chain over the SORTED anchor array:
    # p survives iff (p + i) appears in term i's position array for all i
    match = names[terms[0]]
    for i, t in enumerate(terms[1:], start=1):
        match = f"filter({match}, p{i} -> array_contains({names[t]}, p{i} + {i}L))"
    return (
        per_doc.select(
            F.col(id_col),
            F.expr(f"size({match})").cast("long").alias("n_matches"),
            F.expr(f"element_at({match}, 1)").cast("long").alias("first_pos"),
        )
        .where(F.col("n_matches") > 0)
    )
