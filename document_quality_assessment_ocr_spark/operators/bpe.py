"""Distributed BPE-merge training (Sennrich et al. 2016) — the tokenizer
TRAINER the corpus-scale pipeline needs, not just the tokenizer.

Classic BPE on word types: count adjacent symbol pairs weighted by word
frequency, merge the most frequent pair everywhere, repeat. The
distributed shape:

* the training table is the WORD-TYPE table (one row per distinct word +
  count) — zipf-bounded, tiny next to the corpus; building it is one
  hash aggregate over the corpus and the only corpus-sized step;
* each merge round is ONE pair-count aggregate over the word table plus
  a single-row ``limit(1)`` argmax collect (TakeOrderedAndProject — a
  bounded driver transfer, not a sort);
* the chosen merge applies to every word's symbol array as an
  array-local left-to-right fold (``F.aggregate`` — no UDF, no shuffle);
  the table persists between rounds so round k+1 reads materialized
  symbols, not a k-deep recomputation.

Tie-breaks are total: (count DESC, left ASC, right ASC) — integer counts
make every round's argmax deterministic, which is what lets
``bpe_python`` (shared by tests AND the DuckDB oracle generator)
reproduce the merge table exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import WS_CLASS

MERGES_SCHEMA = "step int, left string, right string, pair_count long"


def word_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus → word-type table (word, cnt). The one corpus-sized pass."""
    toks = F.filter(
        F.split(
            F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), WS_CLASS + "+"
        ),
        lambda x: x != F.lit(""),
    )
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _chars(word):
    return F.transform(
        F.sequence(F.lit(1), F.length(word)), lambda i: F.substring(word, i, 1)
    )


def _apply_merge(syms, left: str, right: str):
    """Left-to-right non-overlapping replacement of the adjacent pair
    (left, right) with the merged symbol — pure array fold."""
    merged = left + right
    acc0 = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc, s):
        return (
            F.when(
                acc["pend"].isNull(),
                F.struct(acc["out"].alias("out"), s.alias("pend")),
            )
            .when(
                (acc["pend"] == F.lit(left)) & (s == F.lit(right)),
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["pend"])).alias("out"),
                    s.alias("pend"),
                )
            )
        )

    return F.aggregate(
        syms,
        acc0,
        step,
        lambda acc: F.when(acc["pend"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pend"]))
        ),
    )


def train_bpe(
    spark: SparkSession,
    wc: DataFrame,
    n_merges: int = 8,
    min_count: int = 2,
    driver_side: bool = False,
) -> DataFrame:
    """Word-type table → merge table (step, left, right, pair_count).

    Two execution modes with byte-identical output (equality-tested):

    * distributed (default): one pair-count aggregate + 1-row argmax
      collect per round — corpus-size-independent per round, but a real
      32k-merge vocab pays 32k sequential Spark jobs of JVM latency;
    * ``driver_side=True``: ONE Spark job collects the zipf-bounded
      word-type table (the corpus-sized work is already done by
      ``word_counts``; distinct word types grow ~O(corpus^0.7) and a
      100 TB web corpus's type table is tens of millions of rows — it
      fits the driver that already holds broadcast vocabularies), then
      ``bpe_python`` — the SAME function the tests and the DuckDB
      oracle generator call — runs every merge round in-process.
      Preferred for production vocab sizes.

    Driver transfers are bounded: one 1-row collect per round
    (distributed) or one word-type-table collect total (driver-side).
    Distributed rounds materialize via ``localCheckpoint`` — persist()
    alone caches DATA but leaves the LOGICAL plan k folds deep after k
    rounds, and Catalyst re-analysis of the nested fold expressions OOMs
    the driver near ~30 merges; checkpointing truncates lineage so every
    round plans against a flat scan.  (localCheckpoint is
    non-fault-tolerant: a lost executor fails the round — acceptable for
    the bounded word-type table; production vocab training should use
    ``driver_side=True`` anyway.)
    """
    if driver_side:
        counts = {
            r["word"]: int(r["cnt"]) for r in wc.select("word", "cnt").collect()
        }
        return spark.createDataFrame(
            bpe_python(counts, n_merges=n_merges, min_count=min_count),
            MERGES_SCHEMA,
        )
    df = wc.select("word", "cnt", _chars(F.col("word")).alias("syms")).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    try:
        for step_i in range(int(n_merges)):
            pair = F.arrays_zip(
                F.slice("syms", 1, F.size("syms") - 1),
                F.slice("syms", 2, F.size("syms") - 1),
            )
            pairs = (
                df.where(F.size("syms") >= 2)
                .select(F.explode(pair).alias("p"), "cnt")
                .select(
                    F.col("p.0").alias("l"), F.col("p.1").alias("r"), "cnt"
                )
                .groupBy("l", "r")
                .agg(F.sum("cnt").alias("c"))
            )
            top = (
                pairs.orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
                .limit(1)
                .collect()
            )
            if not top or int(top[0]["c"]) < int(min_count):
                break
            l, r, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
            merges.append((step_i, l, r, c))
            nxt = df.select(
                "word", "cnt", _apply_merge(F.col("syms"), l, r).alias("syms")
            ).localCheckpoint()
            df.unpersist()
            df = nxt
    finally:
        df.unpersist()
    return spark.createDataFrame(merges, MERGES_SCHEMA)


def bpe_python(wc: dict[str, int], n_merges: int = 8, min_count: int = 2):
    """Pure-python reference trainer — identical pair counting, argmax
    tie-break and left-to-right merge application. Shared by the unit
    tests AND the DuckDB oracle generator (the oracle-literal technique:
    the merge table it produces is embedded as VALUES)."""
    syms = {w: list(w) for w in wc}
    merges = []
    for step_i in range(int(n_merges)):
        pc: dict[tuple[str, str], int] = {}
        for w, c in wc.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] = pc.get((s[i], s[i + 1]), 0) + c
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if c < int(min_count):
            break
        merges.append((step_i, l, r, c))
        merged = l + r
        for w, s in syms.items():
            out, pend = [], None
            for ch in s:
                if pend is None:
                    pend = ch
                elif pend == l and ch == r:
                    out.append(merged)
                    pend = None
                else:
                    out.append(pend)
                    pend = ch
            if pend is not None:
                out.append(pend)
            syms[w] = out
    return merges


def segment_words(words, merges):
    """Pure-python segmentation of each word under an ordered merge list —
    the twin of `apply_bpe`'s fold chain (oracle generator + tests)."""
    out = {}
    for w in words:
        s = list(w)
        for l, r in merges:
            merged, res, pend = l + r, [], None
            for ch in s:
                if pend is None:
                    pend = ch
                elif pend == l and ch == r:
                    res.append(merged)
                    pend = None
                else:
                    res.append(pend)
                    pend = ch
            if pend is not None:
                res.append(pend)
            s = res
        out[w] = " ".join(s)
    return out


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize the corpus with a trained merge list: the VOCABULARY is
    segmented once (distinct words → K chained array folds) and the
    result broadcast-joins back to the positional token stream — the
    corpus never pays per-token segmentation, only the zipf-bounded
    word-type table does.

    ``merges`` is the ordered (left, right) list (bounded — collect it
    from ``train_bpe``'s output). Output: (id_col, pos, word, seg_text)
    with ``seg_text`` the space-joined subword segments.
    """
    toks_arr = F.filter(
        F.split(
            F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), WS_CLASS + "+"
        ),
        lambda x: x != F.lit(""),
    )
    toks = docs.select(
        F.col(id_col), F.posexplode(toks_arr).alias("pos", "word")
    ).select(F.col(id_col), F.col("pos").cast("int").alias("pos"), "word")
    syms = _chars(F.col("word"))
    for l, r in merges:
        syms = _apply_merge(syms, l, r)
    seg = toks.select("word").distinct().select(
        "word", F.array_join(syms, " ").alias("seg_text")
    )
    return toks.join(F.broadcast(seg), "word").select(
        id_col, "pos", "word", "seg_text"
    )
