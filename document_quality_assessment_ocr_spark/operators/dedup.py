"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All hashing is md5-based (bit-identical in Spark and DuckDB) so every
operator has an exact SQL oracle. Scale notes per operator below; the common
theme: one shuffle per logical step, candidate generation before any
quadratic work, and skew-safe bucket joins (LSH buckets are bounded by
banding, never a full cross join).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import WS_CLASS, char_ngrams, fingerprint

#: modulus of the universal-hash permutation family (Mersenne prime 2^31−1):
#: coefficients and reduced shingle hashes stay < 2^31, so a·h+b < 2^62 never
#: overflows int64 on either engine
MERSENNE31 = (1 << 31) - 1


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's parallelism when the input
    arrives in fewer partitions — single-file single-row-group parquet (the
    test tables' shape) yields ONE non-empty scan task, serializing every
    per-row-heavy first stage (shingling: one md5 per shingle) on one core.
    Repartitioning a few-MB id+text table is ~ms; the unlocked map
    parallelism is the win (optimization guide §2.5, unsplittable input).
    Scale-adaptive (defaultParallelism), no-op on already-parallel input.
    Parallelism is judged by the LEAF FILES' row-group count, not the
    nominal split count — a 1-row-group file reports 32 empty splits
    under a small maxPartitionBytes/minPartitionNum and one task does all
    the work (tables.effective_scan_parallelism)."""
    from ..sources.tables import effective_scan_parallelism

    n = df.sparkSession.sparkContext.defaultParallelism
    if effective_scan_parallelism(df) >= n:
        return df
    return df.repartition(n)


def minhash_coeffs(n_hashes: int, seed: int = 1) -> list[tuple[int, int]]:
    """Seeded (a_i, b_i) pairs of the permutation family — shared verbatim by
    the Spark operator and the DuckDB oracle SQL builder."""
    rng = np.random.default_rng(seed)
    return [
        (int(rng.integers(1, MERSENNE31)), int(rng.integers(0, MERSENNE31)))
        for _ in range(n_hashes)
    ]


def shingle_hash_expr(g_col: str = "g"):
    """Shingle → 60-bit integer: first 15 hex chars of ONE md5, parsed base-16
    (DuckDB twin: ``CAST('0x' || SUBSTR(MD5(g),1,15) AS BIGINT)``), reduced
    mod 2^31−1."""
    h = F.expr(f"cast(conv(substr(md5({g_col}), 1, 15), 16, 10) as bigint)")
    return F.pmod(h, F.lit(MERSENNE31))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate removal by normalized-text fingerprint: keep the
    smallest id per group. One hash-aggregate shuffle; at 100 TB bucket the
    table by fingerprint to make this a shuffle-free partial aggregate."""
    return (
        docs.select(fingerprint(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def _gram_array(
    docs: DataFrame, id_col: str, text_col: str, ngram: int, shingle: str
) -> DataFrame:
    """(id, gs: array<string>) — the per-doc shingle array, the shared
    tokenization of the minhash family. Word mode materializes the token
    array in its own projection so the per-gram lambda only touches a
    column reference — split/lower run once per document, not once per
    shingle."""
    docs = ensure_parallelism(docs)
    if shingle == "char":
        return docs.select(
            F.col(id_col), char_ngrams(F.col(text_col), ngram).alias("gs")
        )
    if shingle != "word":
        raise ValueError(f"shingle must be 'char' or 'word', got {shingle!r}")
    toks = F.filter(
        F.split(
            F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), WS_CLASS + "+"
        ),
        lambda x: x != F.lit(""),
    )
    base = docs.select(F.col(id_col), toks.alias("tk"))
    grams = F.when(
        F.size("tk") >= ngram,
        F.transform(
            F.sequence(F.lit(1), F.size("tk") - ngram + 1),
            lambda i: F.array_join(F.slice(F.col("tk"), i, ngram), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return base.select(F.col(id_col), grams.alias("gs"))


def _shingle_df(
    docs: DataFrame, id_col: str, text_col: str, ngram: int, shingle: str
) -> DataFrame:
    """(id, g) shingle stream — ``shingle='char'`` (character n-grams, the
    fine-grained default) or ``'word'`` (space-joined word n-grams, the
    RefinedWeb-style production mode: ~5-10× fewer shingles → ~5-10× fewer
    md5s, the dominant cost of the minhash family on real text)."""
    return _gram_array(docs, id_col, text_col, ngram, shingle).select(
        F.col(id_col), F.explode("gs").alias("g")
    )


def _shingle_sets(
    docs: DataFrame, id_col: str, text_col: str, ngram: int, shingle: str
) -> DataFrame:
    """(id, gs: array<string>) with gs DISTINCT per doc, ``localCheckpoint``-ed.

    The exact-verify chains (Jaccard / containment) need the DISTINCT
    (id, g) set; distinctness of (id, g) is PER-DOCUMENT when ids are
    unique, so ``array_distinct`` computes it doc-locally and the
    corpus-wide DISTINCT hash exchange disappears outright (guide §2.4) —
    set sizes become a map-side ``F.size`` instead of a grouped count.
    The narrow array table is checkpointed once because every verify
    consumer (sizes + both intersection-join legs) reads it (the r6
    tokenize-once idiom; materializing the EXPLODED distinct stream
    instead measured as a net loss — 285 MB deserialized × 3 reads).

    Assumes unique ids (one row per document) — the same contract the
    signature pass and the DuckDB twin's ``DISTINCT doc_id, g`` rely on."""
    return (
        _gram_array(docs, id_col, text_col, ngram, shingle)
        .select(F.col(id_col), F.array_distinct("gs").alias("gs"))
        .localCheckpoint()
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    ngram: int = 5,
    seed: int = 1,
    shingle: str = "char",
    with_gram_sets: bool = False,
) -> DataFrame:
    """MinHash signatures over character n-gram shingles.

    The shingle is hashed ONCE (md5 → 60-bit int, mod 2^31−1); permutation i
    is the universal-hash map ``(a_i·h + b_i) mod (2^31−1)`` with seeded
    coefficients, and the signature element is the MIN over shingles — a
    valid minwise family at one md5 per shingle instead of one per
    (shingle × permutation) (the r01 form burned 8–16 md5s per shingle; this
    is the dominant cost of the dedup family on real text). Engine-portable:
    the DuckDB oracle parses the same 15 hex chars and applies the same
    coefficients.

    Shuffle profile (r6): ONE ``mapInPandas`` pass computes every
    signature doc-locally — no shingle ever materializes as a row, no
    shuffle at all. The python path is bit-identical BY CONSTRUCTION:
    ``hashlib.md5`` is the same md5 the JVM/DuckDB compute, the
    15-hex-char parse and the affine maps are exact integer arithmetic,
    and the normalization (lower, ASCII-whitespace collapse, code-point
    substring slicing) mirrors the Column expressions on the ASCII
    corpora the cross-engine contract already assumes (the DuckDB oracle
    shares the same LOWER/regex semantics class; CHECKS is the drift
    detector, and the signature-parity unit test pins the two forms
    equal). Measured: the explode+HashAggregate form generated ~48M rows
    at the sf1 8/4 char shape (19.3 s isolated); this pass is ~2-3 s.
    The Column building blocks (``shingle_hash_expr``, ``_shingle_df``)
    remain the documented oracle twins and serve the other shingle
    consumers.

    ``with_gram_sets=True`` adds a ``gs`` column: the doc-locally DISTINCT
    shingle STRINGS (first-occurrence order — dict.fromkeys, matching
    ``array_distinct``) the signatures were computed from. The verify
    chains (Jaccard/containment) need exactly this set, and the strings
    are already in hand here — one python pass serves both, instead of a
    python signature pass plus a separate JVM tokenize pass (r6)."""
    import hashlib
    import re as _re

    import pandas as pd
    from pyspark.sql import types as T

    coeffs = minhash_coeffs(n_hashes, seed)
    if shingle not in ("char", "word"):
        raise ValueError(f"shingle must be 'char' or 'word', got {shingle!r}")
    M = MERSENNE31
    ng = int(ngram)
    mode = shingle
    ws_re = _re.compile("[ \t\n\r\f\x0b]+")
    A = np.array([a for a, b in coeffs], dtype=np.int64)[:, None]
    B = np.array([b for a, b in coeffs], dtype=np.int64)[:, None]

    id_field = docs.schema[id_col]
    gs_fields = (
        [T.StructField("gs", T.ArrayType(T.StringType()))] if with_gram_sets else []
    )
    schema = T.StructType(
        [id_field]
        + gs_fields
        + [T.StructField(f"h{i:02d}", T.LongType()) for i in range(n_hashes)]
    )
    cols = (
        [id_field.name]
        + (["gs"] if with_gram_sets else [])
        + [f"h{i:02d}" for i in range(n_hashes)]
    )
    want_gs = bool(with_gram_sets)

    def gen(batches):
        md5 = hashlib.md5
        for pdf in batches:
            rows = []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                t = ws_re.sub(" ", (txt or "").lower())
                if mode == "char":
                    L = len(t) - ng + 1
                    if L <= 0:
                        continue
                    strs = [t[j : j + ng] for j in range(L)]
                else:
                    toks = [x for x in t.strip(" ").split(" ") if x]
                    L = len(toks) - ng + 1
                    if L <= 0:
                        continue
                    strs = [" ".join(toks[j : j + ng]) for j in range(L)]
                hs = [
                    int(md5(g.encode("utf-8")).hexdigest()[:15], 16) % M
                    for g in strs
                ]
                hm = np.array(hs, dtype=np.int64)[None, :]
                sig = ((A * hm + B) % M).min(axis=1)
                if want_gs:
                    rows.append(
                        (did, list(dict.fromkeys(strs)), *[int(x) for x in sig])
                    )
                else:
                    rows.append((did, *[int(x) for x in sig]))
            yield pd.DataFrame(rows, columns=cols)

    return ensure_parallelism(docs.select(id_col, text_col)).mapInPandas(gen, schema)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    ngram: int = 5,
    shingle: str = "char",
    _sig: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded LSH over MinHash signatures.

    rows_per_band = n_hashes/bands; docs agreeing on ALL rows of any band
    become a candidate pair. Self-join is per band-bucket (skew-bounded:
    a bucket only holds near-identical docs), pairs deduped with id<id2.
    """
    assert n_hashes % bands == 0
    buckets = _band_buckets(
        docs, id_col, text_col, n_hashes, bands, ngram, shingle, sig=_sig
    )
    # explicit hash repartition on the join key: the bucket table is a few
    # MB of keys, so AQE coalesces its shuffle to 1-2 partitions — but the
    # JOIN OUTPUT below is quadratic per bucket (AQE cannot see that), and
    # the pair emission then runs on 2 cores. An explicit repartition is
    # never coalesced and the self-join reuses the partitioning on both
    # sides (no extra exchange).
    buckets = buckets.repartition("band", "key")
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.band") == F.col(f"b.band"))
            & (F.col(f"a.key") == F.col(f"b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def _band_buckets(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int,
    bands: int,
    ngram: int,
    shingle: str = "char",
    sig: DataFrame | None = None,
) -> DataFrame:
    """(id, band, key) LSH band-bucket membership — the shared banding
    stage of :func:`minhash_lsh_pairs` (pair emission) and
    :func:`duplicate_clusters` (star-contracted connectivity). The band-key
    expression is the q214 cross-engine contract (md5 of '#'-joined
    signature ints) — never fork it.

    The signature table is ``localCheckpoint``-ed (|docs| rows of
    n_hashes+1 longs — tiny): the band self-join downstream reads the
    bucket subtree from BOTH sides and exchange reuse does not unify the
    two mapInPandas signature passes, so without the barrier every LSH
    consumer paid the python md5 pass twice (measured ~20-25 s of
    executor time per pass at the 10x table set)."""
    rows = n_hashes // bands
    if sig is None:
        sig = minhash_signatures(
            docs, id_col, text_col, n_hashes, ngram, shingle=shingle
        ).localCheckpoint()
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"h{b * rows + r:02d}") for r in range(rows)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("#", *parts)).alias("key"))
        )
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 5,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
    max_doc_freq: int | None = None,
    shingle: str = "char",
    _sets: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity.

    jaccard = inter/(|a|+|b|-inter) over DISTINCT (id, shingle) sets.

    ``candidates`` — a (id_a, id_b) pair DataFrame (id_a < id_b), e.g. the
    output of :func:`minhash_lsh_pairs`. With it, the intersection is
    computed PER CANDIDATE PAIR via two id-keyed equi-joins (pair → a-side
    shingles → match b-side on (id, shingle)) — no shingle-keyed self-join at
    all, so work is proportional to the candidate pairs' shingle mass, never
    quadratic in a posting list. Jaccard values stay EXACT (set sizes use
    the full shingle sets). This is the 100 TB path: LSH prunes, this ranks.

    Without ``candidates`` the full co-shingle self-join runs — the
    oracle-checkable twin for test scale; at a web-corpus threshold it
    reproduces nearly all pairs (r01 measured 99.5% of all-pairs) and is a
    deliberate non-goal at scale.

    ``max_doc_freq`` — optional stop-shingle pruning for the self-join form:
    shingles appearing in more docs than this are excluded from the
    INTERSECTION join (sizes stay exact, so jaccard becomes a lower bound).
    Bounds the posting-list blowup when LSH candidates are unavailable.
    """
    sets = (
        _sets
        if _sets is not None
        else _shingle_sets(docs, id_col, text_col, ngram, shingle)
    )
    sh = sets.select(F.col(id_col), F.explode("gs").alias("g"))
    sizes = sets.select(F.col(id_col), F.size("gs").alias("sz"))
    if candidates is not None:
        cand = candidates.select("id_a", "id_b")
        a_sh = cand.join(sh, cand["id_a"] == sh[id_col]).select("id_a", "id_b", "g")
        b_sh = sh.select(F.col(id_col).alias("_idb"), F.col("g").alias("_gb"))
        inter = (
            a_sh.join(b_sh, (a_sh["id_b"] == b_sh["_idb"]) & (a_sh["g"] == b_sh["_gb"]))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        sh_j = sh
        if max_doc_freq is not None:
            rare = (
                sh.groupBy("g")
                .agg(F.count(F.lit(1)).alias("df"))
                .filter(F.col("df") <= max_doc_freq)
                .select("g")
            )
            sh_j = sh.join(rare, "g", "left_semi")
        a, b = sh_j.alias("a"), sh_j.alias("b")
        inter = (
            a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    out = (
        inter.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
    )
    return out.filter(F.col("jaccard") >= F.lit(threshold)).select(
        "id_a", "id_b", "jaccard"
    )


def simhash64(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """SimHash over whitespace tokens: bit k of the hash is the sign of
    Σ_tokens (±1 by bit k of md5(token)). Bits come from md5 hex nibbles via
    arithmetic (strpos/floor/mod) — reproducible in DuckDB for the oracle.

    One explode + one groupBy; the bit sums fold into a single HashAggregate.
    """
    assert bits % 4 == 0
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), WS_CLASS + "+"),
                lambda x: x != F.lit(""),
            )
        ).alias("tok"),
    ).select(
        # hoist md5 into ONE projection — the per-bit expressions below read
        # nibbles from it instead of re-hashing the token `bits` times
        # (Catalyst CSE is not guaranteed across aggregate expressions)
        F.col(id_col),
        F.md5("tok").alias("h"),
    )
    bit_sums = []
    for k in range(bits):
        nib = F.expr(
            f"locate(substr(h, {k // 4 + 1}, 1), '0123456789abcdef') - 1"
        )
        bit = F.floor(nib / F.lit(2 ** (3 - k % 4))) % 2
        bit_sums.append(
            F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"s{k:02d}")
        )
    sums = toks.groupBy(id_col).agg(*bit_sums)
    acc = F.lit(0).cast("long")
    for k in range(bits):
        acc = acc + F.when(F.col(f"s{k:02d}") > 0, F.lit(2 ** (bits - 1 - k)).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sums.select(F.col(id_col), acc.alias("simhash"))


def duplicate_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    bands: int = 4,
    ngram: int = 5,
    candidates: DataFrame | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the candidate-pair
    graph → every document gets its component's minimum id as ``cluster_id``
    and an ``is_cluster_head`` keep flag — the operator that turns pair lists
    into the keep/drop decision a dedup pipeline actually applies.

    Iterative min-label propagation with POINTER JUMPING and a driver
    convergence loop (the Spark idiom for iterative graph algorithms): each
    round every vertex takes the min of its own and its neighbours' labels,
    then path-halves (label ← label(label)), so convergence needs
    O(log diameter) rounds instead of O(diameter) — chain-shaped components
    (banded LSH at low thresholds produces them) stop being pathological.
    Labels only decrease and are bounded below, so the loop terminates; each
    round is two hash joins + one min-aggregate on the vertex id.
    ``max_iter`` is a backstop only.

    Each round ``localCheckpoint(eager=True)``s the new labels — the other
    half of the iterative idiom: without it the composed round plans grow
    linearly deep and the ANALYZER cost (not execution — blocks were fully
    cached) is re-paid by every downstream action (measured: ~9 s to plan a
    count over 500 cached rows after ~10 rounds; flat after truncation).
    One eager job per round was already being paid by the convergence
    aggregate, so truncation is free. On clusters with executor churn,
    swap in reliable ``checkpoint()`` with a checkpoint dir — localCheckpoint
    blocks die with their executor.

    ``candidates`` defaults to the same banded-LSH connectivity as
    :func:`minhash_lsh_pairs` on the same parameters — but STAR-CONTRACTED:
    a band bucket's members are mutually connected (a clique), and for
    connected components a clique and a star on the bucket minimum have
    exactly the same components, so the default path feeds the loop
    (bucket_min ↔ member) edges — O(|docs|·bands) of them — instead of the
    O(Σ bucket²) pair list (the r6 sf1 probe measured 89.0M distinct pairs
    from 50k docs at the 8/4 char shape; the star set is ≤ 200k). Cluster
    output is provably identical; callers that need the PAIRS still get
    them from :func:`minhash_lsh_pairs`, and an explicit ``candidates``
    DataFrame is used as given. Singleton documents cluster to
    themselves."""
    if candidates is not None:
        pairs = candidates
    else:
        bk = _band_buckets(docs, id_col, text_col, n_hashes, bands, ngram)
        hubs = (
            bk.groupBy("band", "key")
            .agg(F.min(id_col).alias("hub"), F.count(F.lit(1)).alias("_c"))
            .where(F.col("_c") > 1)
            .select("band", "key", "hub")
        )
        pairs = (
            bk.join(hubs, ["band", "key"])
            .where(F.col(id_col) != F.col("hub"))
            .select(F.col("hub").alias("id_a"), F.col(id_col).alias("id_b"))
            .distinct()
        )
    # cap the loop's partition counts (scale-adaptive): the per-round
    # tables are a few MB, but the union/join legs inherit the candidate
    # chain's partitioning (measured 160-192 tasks per round at the 10x
    # set), and every tiny task re-pays scheduling + broadcast-relation
    # unpack — ~260 ms of fixed cost per task dominating the round.
    # coalesce (no shuffle) bounds it at the session's core count.
    ncap = docs.sparkSession.sparkContext.defaultParallelism
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionAll(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .coalesce(ncap)
        .persist()
    )
    labels = docs.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("label")
    ).localCheckpoint(eager=True)
    prev_sum = None
    try:
        for _ in range(max_iter):
            # broadcast the label table (|V| rows of two longs — bounded by
            # the vertex count, far under the broadcast cap for any corpus
            # this single-box loop serves): the big cached edge set is then
            # NEVER re-shuffled — each round is one map-side pass over edges
            # plus a partial-aggregated groupBy whose shuffle is ≤ |V| rows
            # per partition (pre-broadcast, every round sort-merge-shuffled
            # the full edge set twice)
            msgs = edges.join(F.broadcast(labels), edges["dst"] == labels["id"]).select(
                F.col("src").alias("id"), F.col("label")
            )
            stepped = (
                labels.unionAll(msgs)
                .groupBy("id")
                .agg(F.min("label").alias("label"))
                .persist()
            )
            # pointer jumping: follow one hop of the label chain (labels are
            # vertex ids, so label(label) always resolves); stepped is
            # persisted because BOTH sides of the jump join read it — without
            # the persist the edges pass above runs twice per round
            jump = stepped.select(
                F.col("id").alias("_jid"), F.col("label").alias("_jlabel")
            )
            # eager localCheckpoint: materializes this round AND truncates
            # the logical plan so analyzer cost stays O(1) per round (see
            # docstring); old round blocks are freed by the ContextCleaner
            new_labels = (
                stepped.join(F.broadcast(jump), stepped["label"] == jump["_jid"])
                .select("id", F.least("label", "_jlabel").alias("label"))
                .coalesce(ncap)
            ).localCheckpoint(eager=True)
            stepped.unpersist()
            # labels only decrease, so an unchanged sum ⇔ a fixpoint — one
            # aggregate action per round instead of a join + count
            cur_sum = new_labels.agg(
                F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
            ).collect()[0]["s"]
            labels = new_labels
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
        return labels.select(
            F.col("id").alias(id_col),
            F.col("label").alias("cluster_id"),
            (F.col("id") == F.col("label")).alias("is_cluster_head"),
        )
    finally:
        edges.unpersist()


def dedup_last_wins(df: DataFrame, key: str, seq: str) -> DataFrame:
    """Generic last-wins dedup (reference evaluator.py:55-57 semantics) via
    max_by aggregation — single shuffle, no window sort."""
    others = [c for c in df.columns if c != key]
    return (
        df.groupBy(key)
        .agg(F.max_by(F.struct(*others), F.col(seq)).alias("v"))
        .select(key, *[F.col(f"v.{c}").alias(c) for c in others])
    )


def chunk_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 20,
) -> DataFrame:
    """Paragraph/chunk-level exact dedup, first-occurrence-wins
    (RefinedWeb-style boilerplate removal; no reference analog —
    training-data addition per the task brief).

    Each document is split into fixed-width word chunks (a stand-in for
    paragraphs on corpora whose paragraph breaks did not survive
    extraction), every chunk is hashed, only the globally FIRST occurrence
    of each distinct chunk survives — "first" by total order
    ``(doc_id, chunk_idx)`` — and survivors are reassembled in document
    order.

    Output: ``id_col, n_total, n_kept, clean_text`` — one row per input
    document (documents whose every chunk is boilerplate keep a row with
    ``n_kept = 0`` and empty text).

    Scale shape (100 TB): the winner per distinct chunk is an **algebraic
    min-struct aggregate** — map-side partial combine shrinks the shuffle
    to one row per distinct chunk per map task, and because the chunk text
    is carried inside the min struct (identical across a hash group) there
    is **no join back to the exploded table**. Reassembly is one more hash
    aggregate on ``doc_id`` (``sort_array(collect_list)`` — no window) and
    the final per-doc left join rides the same doc_id partitioning. No
    step is quadratic; per-group state is bounded by document length.
    """
    cw = chunk_words
    toks = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("w")
    ).select(
        id_col,
        "w",
        # ≥1 so empty documents keep exactly one (empty) chunk instead of
        # producing a descending sequence(1,0)
        F.greatest(F.ceil(F.size("w") / cw), F.lit(1)).cast("int").alias("nch"),
    )
    chunks = toks.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.col("nch")),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("w"), (i - F.lit(1)) * cw + F.lit(1), F.lit(cw))
                ),
            )
        ).alias("chunk_idx", "chunk"),
    )
    # winner per distinct chunk: min over the (doc_id, chunk_idx, chunk)
    # struct — chunk is constant within an md5 group, so the struct min IS
    # the first occurrence, text included
    winners = (
        chunks.groupBy(F.md5("chunk").alias("h"))
        .agg(F.min(F.struct(id_col, "chunk_idx", "chunk")).alias("win"))
        .select("win.*")
    )
    assembled = winners.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("chunk_idx", "chunk"))),
                lambda s: s["chunk"],
            ),
        ).alias("clean_text"),
    )
    per_doc = toks.select(id_col, F.col("nch").cast("long").alias("n_total"))
    return per_doc.join(assembled, id_col, "left").select(
        id_col,
        "n_total",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


def dedup_keep_best(
    docs: DataFrame,
    clusters: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Collapse each near-duplicate cluster to ONE representative — the
    member with the highest ``score_col`` (ties → smallest id), the
    standard keep-longest curation policy applied on top of
    ``duplicate_clusters``.

    Output: (cluster_id, keep_id, best_<score_col>, n_members).

    Scale shape: the winner is an algebraic min-struct aggregate over
    ``(-score, id)`` — one hash exchange on ``cluster_id`` after the id
    join, map-side combine, no window, no per-cluster sort."""
    joined = docs.select(F.col(id_col), F.col(score_col)).join(
        clusters.select(id_col, "cluster_id"), id_col
    )
    return (
        joined.groupBy("cluster_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col(score_col)).alias("negs"), F.col(id_col).alias("kid")
                )
            ).alias("w"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .select(
            "cluster_id",
            F.col("w.kid").alias("keep_id"),
            (-F.col("w.negs")).alias(f"best_{score_col}"),
            "n_members",
        )
    )


def exact_substring_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
) -> DataFrame:
    """Cross-document exact-substring removal (the ExactSubstr recipe of
    Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better", re-expressed relationally): every ``window``-token span that
    occurs more than once ANYWHERE in the corpus is removed from every
    document containing it; the surviving tokens reassemble in order.

    Suffix arrays don't distribute; the relational equivalent does:

    1. map-side: slide a ``window``-token hash over each document
       (md5 of the space-joined span — engine-portable). The O(w·n)
       map-side string build LOOKS like the cost center but is not on
       the JVM: a rolling-polynomial alternative (one md5 per token +
       per-window dot products over literal power vectors) measured
       4× SLOWER at w=50 and 1.5× slower at w=8 — 200-term arithmetic
       expression chains fall out of whole-stage codegen while md5 runs
       intrinsic over one contiguous string (measurement in BENCH.md
       round 3; the rejected variant also showed a two-BIGINT compound
       join key costing 3× a single string key through the dup join);
    2. ONE hash aggregate finds globally duplicated window keys
       (map-side combine shrinks the shuffle to distinct keys);
    3. duplicated (doc, start) positions collect back per document —
       reusing the doc-keyed partitioning — and coverage + reassembly
       are array-local Column expressions (per-doc bounded, no UDF).

    Documents shorter than ``window`` tokens are never touched. Output:
    (id_col, n_tokens, n_dup_windows, n_removed, clean_text).
    """
    w = int(window)
    toks = F.filter(
        F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), WS_CLASS + "+"),
        lambda x: x != F.lit(""),
    )
    base = docs.select(F.col(id_col), toks.alias("a")).withColumn(
        "n", F.size("a").cast("long")
    )
    starts = F.when(
        F.col("n") >= w, F.sequence(F.lit(0).cast("long"), F.col("n") - w)
    ).otherwise(F.array().cast("array<long>"))
    wins = base.select(
        F.col(id_col),
        F.explode(starts).alias("s"),
        F.col("a"),
    ).select(
        F.col(id_col),
        "s",
        F.md5(
            F.array_join(F.slice("a", F.col("s").cast("int") + 1, w), " ")
        ).alias("h"),
    )
    dup = wins.groupBy("h").agg(F.count(F.lit(1)).alias("c")).where(F.col("c") > 1)
    doc_starts = (
        wins.join(dup.select("h"), "h")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("s")).alias("dws"))
    )
    j = base.join(doc_starts, id_col, "left").withColumn(
        "dws", F.coalesce(F.col("dws"), F.array().cast("array<long>"))
    )
    covered = lambda i: F.exists(
        "dws", lambda s: (s <= i) & (i < s + F.lit(w))
    )
    kept = F.filter(
        F.transform("a", lambda x, i: F.when(~covered(i.cast("long")), x)),
        lambda x: x.isNotNull(),
    )
    return j.select(
        F.col(id_col),
        F.col("n").alias("n_tokens"),
        F.size("dws").cast("long").alias("n_dup_windows"),
        (F.col("n") - F.size(kept)).cast("long").alias("n_removed"),
        F.array_join(kept, " ").alias("clean_text"),
    )


def soft_dedup_weights(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    bands: int = 4,
    ngram: int = 5,
    candidates: DataFrame | None = None,
    clusters: DataFrame | None = None,
) -> DataFrame:
    """Soft deduplication (the SoftDeDup idea — down-weight duplicates in
    the training mix instead of dropping them): every document keeps
    ``weight_nano = 1e9 DIV |cluster|`` so each near-duplicate CLUSTER
    contributes ~one document's worth of gradient mass, preserving
    diversity inside the cluster that hard dedup would throw away.

    Pure composition over :func:`duplicate_clusters` plus one cluster-size
    aggregate and a cluster-keyed equi-join (cluster ids are a shrunken
    key space; AQE broadcasts the size side when small). Integer division
    of non-negative operands is exact and identical on both engines (the
    CLAUDE.md DIV invariant) — no float weights, so the oracle
    hash-matches bitwise; consumers renormalize downstream with the
    mixture machinery (operators/sampling.py).

    Output: (id_col, cluster_id, cluster_size, weight_nano).
    """
    # ``clusters`` lets a caller supply a persisted q31 assignment (same
    # banding contract) so composites don't re-pay the iterative CC loop —
    # the q134 artifact pattern; default recomputes, identical values.
    if clusters is None:
        clusters = duplicate_clusters(
            docs, id_col, text_col, n_hashes, bands, ngram, candidates
        )
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return clusters.join(sizes, "cluster_id").select(
        F.col(id_col),
        "cluster_id",
        "cluster_size",
        F.expr("1000000000 DIV cluster_size").cast("long").alias("weight_nano"),
    )


def corpus_line_dedup(
    docs: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CORPUS-level exact line dedup (CCNet's shard-paragraph dedup /
    RefinedWeb's line-frequency filter): drop every line whose exact bytes
    occur in >= ``min_docs`` DISTINCT documents — navigation menus, cookie
    banners, footers — the boilerplate a within-document pass
    (:func:`quality.dedup_lines_within_doc`) cannot see. Blank or
    whitespace-only lines are document structure, never dropped.

    Exact spec (the oracle mirrors it): lines = split on ``\\n``; a line is
    boilerplate iff ``trim(line) != ''`` and its md5 appears under >=
    ``min_docs`` distinct ids; every instance of a boilerplate line drops
    (including repeats inside one document); kept lines reassemble in
    original order joined by ``\\n``.

    Scale shape: one line-hash aggregate (map-side combined; the HAVING
    keeps only hashes seen in >= min_docs docs, so the surviving table is
    the corpus's boilerplate mass — tiny relative to 100 TB and the
    natural broadcast side of the tag join, which AQE picks), then one
    doc-keyed aggregate for reassembly. Never a window over the corpus;
    cost is linear in total lines.

    Output: (id_col, n_lines, n_removed, clean_text).
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
            "ln0", "line"
        ),
    ).select(F.col(id_col), (F.col("ln0") + 1).alias("ln"), "line")
    boiler = (
        lines.where(F.trim(F.col("line")) != F.lit(""))
        .groupBy(F.md5("line").alias("lh"))
        .agg(F.countDistinct(id_col).alias("df"))
        .where(F.col("df") >= F.lit(int(min_docs)))
        .select("lh")
    )
    tagged = lines.join(
        boiler, F.md5(F.col("line")) == boiler["lh"], "left"
    ).select(
        F.col(id_col),
        "ln",
        "line",
        F.col("lh").isNotNull().alias("drop"),
    )
    kept = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(
                    ~F.col("drop"), F.struct(F.col("ln"), F.col("line"))
                )
            )
        ),
        lambda x: x["line"],
    )
    return tagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.when(F.col("drop"), 1).otherwise(0)).cast("long").alias("n_removed"),
        F.array_join(kept, "\n").alias("clean_text"),
    )


def simhash_near_dup_pairs(
    docs: DataFrame,
    bits: int = 48,
    bands: int = 4,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate TEXT pairs via banded SimHash — the Hamming-space
    analog of MinHash-LSH and the text twin of multimodal's pHash band
    join. Signatures from :func:`simhash64` (non-negative, < 2^bits, so
    integer div/mod band extraction is exact on both engines); a pair is a
    candidate iff ANY of the ``bands`` equal-width bit-slices matches
    (pigeonhole: every pair with Hamming distance <= bands-1 shares at
    least one slice, so recall is EXACT for ``max_hamming <= bands-1``);
    candidates verify with one integer popcount.

    Scale shape: candidate generation is a bucket equi-join on (band,
    slice-value) — never all-pairs; the verify is a codegen
    bit_count(xor) on the joined longs, no arrays, no UDF. One exchange
    for the band join, one aggregate for pair dedup. Slice width governs
    the random-collision rate (expected n²/2^(bits/bands) stray
    candidates per band — hence the 12-bit default slices, not 8); run
    AFTER exact dedup so identical-doc clusters don't make one slice
    value hot, the same discipline as LSH bands.

    Output: (doc_a, doc_b, hamming), doc_a < doc_b.
    """
    assert bits % bands == 0
    band_bits = bits // bands
    sig = simhash64(docs, id_col, text_col, bits)
    slices = F.array(
        *[
            F.struct(
                F.lit(k).alias("band"),
                F.expr(f"simhash DIV {1 << (k * band_bits)}")
                .cast("long")
                .__mod__(F.lit(1 << band_bits).cast("long"))
                .alias("bv"),
            )
            for k in range(bands)
        ]
    )
    b = sig.select(
        F.col(id_col).alias("_id"), F.col("simhash").alias("_h"), F.explode(slices).alias("s")
    ).select("_id", "_h", F.col("s.band").alias("band"), F.col("s.bv").alias("bv"))
    # explicit hash repartition on the join key (the minhash_lsh_pairs
    # lesson): the slice table is a few MB so AQE coalesces its shuffle to
    # a handful of partitions, but the join OUTPUT below is quadratic per
    # bucket — the partition COUNT must be pinned too (a column-only
    # repartition is still AQE-coalescible), scale-adaptive from the
    # session; the self-join reuses the partitioning on both sides (one
    # exchange, and the simhash pass itself runs once per join, not per
    # side)
    b = b.repartition(
        2 * docs.sparkSession.sparkContext.defaultParallelism, "band", "bv"
    )
    left = b.select(
        F.col("_id").alias("doc_a"), F.col("_h").alias("ha"), "band", "bv"
    )
    right = b.select(
        F.col("_id").alias("doc_b"), F.col("_h").alias("hb"), "band", "bv"
    )
    cand = (
        left.join(right, ["band", "bv"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ha", "hb")
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long")
    return cand.select("doc_a", "doc_b", ham.alias("hamming")).where(
        F.col("hamming") <= F.lit(int(max_hamming))
    )


def dedup_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    bands: int = 4,
    ngram: int = 5,
    candidates: DataFrame | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """Dedup AUDIT rollup — the cluster-size histogram every curation run
    publishes next to its keep/drop decision (how much of the corpus is
    duplicated, and in what clump sizes): one row per observed cluster
    size with the cluster count, total docs riding in clusters of that
    size, and the docs dedup would remove (all but each cluster's head).

    ``n_docs``/``n_removed`` are products of two grouped counts — integer
    multiplication, never a surfaced SUM (the HUGEINT dtype trap class).

    Scale shape: two tiny aggregates stacked on
    :func:`duplicate_clusters`'s component output — the first keyed by
    cluster id (bounded by doc count, map-side combined), the second by
    size (bounded by the largest clump). The corpus itself does no new
    work beyond the clustering it already paid for.

    Output: (cluster_size, n_clusters, n_docs, n_removed).
    """
    comp = duplicate_clusters(
        docs, id_col, text_col, n_hashes, bands, ngram, candidates, max_iter
    )
    sizes = comp.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
            ((F.col("cluster_size") - F.lit(1)) * F.col("n_clusters")).alias(
                "n_removed"
            ),
        )
    )


def incremental_dedup_flags(
    new_docs: DataFrame,
    base_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    ngram: int = 5,
    min_match: int = 12,
    shingle: str = "word",
    seed: int = 1,
) -> DataFrame:
    """Incremental ingestion dedup — flag each NEW document against the
    EXISTING corpus (the CCNet/Dolma "new shard vs index" shape, where
    re-clustering the whole corpus per shard is off the table): banded
    LSH proposes (new bands ⋈ base bands), signature agreement disposes
    (``n_match/n_hashes`` Jaccard estimate, as in fuzzy decontam), and a
    min-struct argmax rolls candidates up to ONE verdict row per new doc.

    Scale shape: per-doc MinHash is row-local, so the base side's band
    keys and signatures are compute-once artifacts a real deployment
    persists and the shard job only *reads* — the joins here are plain
    equi-joins on (band, key) and id; the new shard (normally ≪ corpus)
    is the small side everywhere, and the rollup is one hash aggregate
    keyed by the new doc id. No window, no collect, nothing quadratic.

    Output: one row per new doc — (id_col, n_candidates, best_match_id,
    best_agree_milli, is_dup); docs with no candidates row out with
    zeros/NULL and is_dup = false.

    ``id_col`` contract: ids must be castable to BIGINT — the winner's
    ``best_match_id`` surfaces as a long (the q123 oracle twin hashes an
    integer column). String-keyed corpora should pre-map ids to a dense
    integer surrogate (or md5-fold them) before calling.
    """
    assert n_hashes % bands == 0
    rows = n_hashes // bands
    # both signature tables are checkpointed (r6, the _band_buckets rule):
    # each side is read twice — bucketize for the band join AND the
    # signature-column select for agreement counting — and exchange reuse
    # does not unify mapInPandas passes, so without the barrier the python
    # md5 pass ran 4x (measured ~13-21 s of executor wait per pass at the
    # 10x set). |docs| rows of n_hashes+1 longs — tiny.
    ns = minhash_signatures(
        new_docs, id_col, text_col, n_hashes, ngram, seed=seed, shingle=shingle
    ).localCheckpoint()
    bs = minhash_signatures(
        base_docs, id_col, text_col, n_hashes, ngram, seed=seed, shingle=shingle
    ).localCheckpoint()

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
        bucketize(ns, "_new_id")
        .join(bucketize(bs, "_base_id"), ["band", "key"])
        .select("_new_id", "_base_id")
        .distinct()
    )
    hcols = [f"h{i:02d}" for i in range(n_hashes)]
    n = ns.select(
        F.col(id_col).alias("_new_id"), *[F.col(h).alias(f"n_{h}") for h in hcols]
    )
    b = bs.select(
        F.col(id_col).alias("_base_id"), *[F.col(h).alias(f"b_{h}") for h in hcols]
    )
    n_match = sum(
        (F.col(f"n_{h}") == F.col(f"b_{h}")).cast("long") for h in hcols
    ).alias("n_match")
    agree = (
        cand.join(n, "_new_id")
        .join(b, "_base_id")
        .select("_new_id", "_base_id", n_match)
        .select(
            "_new_id",
            "_base_id",
            F.expr(f"(1000L * n_match) DIV {int(n_hashes)}").alias("agree_milli"),
        )
    )
    best = agree.groupBy("_new_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.min(
            F.struct(
                (-F.col("agree_milli")).alias("nega"),
                F.col("_base_id").alias("bid"),
            )
        ).alias("_w"),
    )
    thr = (1000 * int(min_match)) // int(n_hashes)
    return (
        new_docs.select(F.col(id_col))
        .join(best.withColumnRenamed("_new_id", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_candidates"), F.lit(0)).cast("long").alias(
                "n_candidates"
            ),
            # surfaced AS-IS: the id_col contract is type-agnostic (string
            # doc ids are common); a long cast here NULLed non-numeric ids
            F.col("_w.bid").alias("best_match_id"),
            (-F.col("_w.nega")).cast("long").alias("best_agree_milli"),
            F.coalesce(-F.col("_w.nega") >= F.lit(thr), F.lit(False)).alias(
                "is_dup"
            ),
        )
    )


def fragment_stitch(
    frags: DataFrame,
    k: int = 8,
    key_cap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Crawl-fragment stitching: find ordered pairs (A, B) where A's LAST
    ``k`` tokens equal B's FIRST ``k`` tokens — the overlapping-fragment
    shape that chunked crawls, pagination, and truncated re-fetches leave
    behind, where the fix is to splice fragments back into one document
    rather than near-dup-drop one of them.

    Candidates come from an equi-join of tail-boundary md5 keys against
    head-boundary md5 keys (one md5 per side per fragment — row-local).
    Boundary keys occurring more than ``key_cap`` times on their side are
    dropped ENTIRELY before the join (both sides): a high-frequency
    boundary is boilerplate (cookie banners, footers), not a stitch
    seam, and capping it bounds the join's per-key fanout at
    ``key_cap²`` — the same skew discipline as the stop-gram handling.
    Fragments shorter than ``k`` tokens carry no boundary and drop out.

    Scale shape: two row-local projections, two key-frequency hash
    aggregates (each ≤ one row per distinct boundary), one equi-join on
    md5 keys with capped fanout. No windows, no collect, nothing
    quadratic in corpus size.

    Output: (left_id, right_id, boundary_md5) — left's tail == right's
    head; self-pairs excluded.
    """
    from ..functions.text import WS_CLASS

    toks = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), WS_CLASS + "+"),
        lambda x: x != F.lit(""),
    )
    g = frags.select(F.col(id_col), toks.alias("tk")).where(
        F.size("tk") >= int(k)
    )
    # both boundary keys in ONE checkpointed pass: heads/tails and both
    # frequency caps read this table, and without the barrier each of the
    # four branches re-tokenized the corpus — with the size(tk) filter
    # pushed below any upstream repartition onto the raw scan tasks
    # (filters push through an Exchange; a checkpoint is the barrier that
    # holds). |frags| rows of (id, two md5s) — narrow by construction.
    bounds = g.select(
        F.col(id_col),
        F.md5(F.array_join(F.slice("tk", 1, int(k)), " ")).alias("hkey"),
        F.md5(
            F.array_join(
                F.expr(f"slice(tk, size(tk) - {int(k)} + 1, {int(k)})"), " "
            )
        ).alias("tkey"),
    ).localCheckpoint()
    heads = bounds.select(
        F.col(id_col).alias("right_id"), F.col("hkey").alias("bkey")
    )
    tails = bounds.select(
        F.col(id_col).alias("left_id"), F.col("tkey").alias("bkey")
    )
    hc = (
        heads.groupBy("bkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") <= int(key_cap))
        .select("bkey")
    )
    tc = (
        tails.groupBy("bkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") <= int(key_cap))
        .select("bkey")
    )
    return (
        tails.join(heads, "bkey")
        .join(hc, "bkey")
        .join(tc, "bkey")
        .where(F.col("left_id") != F.col("right_id"))
        .select("left_id", "right_id", F.col("bkey").alias("boundary_md5"))
    )


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    ngram: int = 5,
    shingle: str = "word",
    min_cont_micro: int = 600_000,
) -> DataFrame:
    """ASYMMETRIC containment near-dup pairs — the quote/excerpt/boilerplate
    detector Jaccard misses: a 200-word doc fully embedded in a 5000-word
    doc has Jaccard |A|/|B| ≈ 0.04 (invisible to q10/q25) but containment
    |A∩B|/|A| = 1.0 (Broder 1997's second resemblance measure; the
    "small-in-big" dedup pass of news-wire and forum-quote corpora).

    Candidates come from the SAME banded MinHash LSH as the Jaccard
    family (:func:`minhash_lsh_pairs` — containment-specific LSH needs
    asymmetric sketches; banding at low-ish band width is the standard
    recall floor and keeps ONE signature pipeline for both measures),
    then the EXACT containment of the smaller shingle set in the larger
    is computed per candidate pair via the pair-keyed intersection joins
    of :func:`ngram_jaccard_pairs` (work ∝ candidate shingle mass, never
    a posting-list self-join).

    FIXED-POINT: ``cont_micro = (inter·10⁶) DIV min(|A|,|B|)`` — all
    operands non-negative int64, so Spark ``DIV`` == DuckDB ``//``.

    Output: (id_a, id_b, sz_a, sz_b, inter, cont_micro, small_side)
    with id_a < id_b, filtered to ``cont_micro >= min_cont_micro``;
    ``small_side`` names the contained document ('a' on size ties — the
    deterministic tie-break).
    """
    # ONE fused python pass computes signatures AND the distinct shingle
    # sets (the strings are in hand while hashing), checkpointed once —
    # instead of a python signature pass plus a separate JVM tokenize
    # pass with its own checkpoint (r6)
    fused = minhash_signatures(
        docs, id_col, text_col, n_hashes, ngram, shingle=shingle,
        with_gram_sets=True,
    ).localCheckpoint()
    cand = minhash_lsh_pairs(
        docs, id_col, text_col, n_hashes, bands, ngram, shingle=shingle,
        _sig=fused.drop("gs"),
    )
    sets = fused.select(F.col(id_col), "gs")
    sh = sets.select(F.col(id_col), F.explode("gs").alias("g"))
    sizes = sets.select(F.col(id_col), F.size("gs").cast("long").alias("sz"))
    a_sh = cand.join(sh, cand["id_a"] == sh[id_col]).select("id_a", "id_b", "g")
    b_sh = sh.select(F.col(id_col).alias("_idb"), F.col("g").alias("_gb"))
    inter = (
        a_sh.join(b_sh, (a_sh["id_b"] == b_sh["_idb"]) & (a_sh["g"] == b_sh["_gb"]))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    out = (
        inter.join(
            sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("sz", "sz_a"),
            "id_a",
        )
        .join(
            sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("sz", "sz_b"),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            "sz_a",
            "sz_b",
            "inter",
            F.expr("(inter * 1000000L) DIV greatest(least(sz_a, sz_b), 1L)")
            .cast("long")
            .alias("cont_micro"),
            F.when(F.col("sz_a") <= F.col("sz_b"), F.lit("a"))
            .otherwise(F.lit("b"))
            .alias("small_side"),
        )
    )
    return out.where(F.col("cont_micro") >= F.lit(int(min_cont_micro)))


def banding_selectivity(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    ngram: int = 5,
    shingle: str = "word",
) -> DataFrame:
    """Pre-run banding-selectivity planner: the candidate-pair volume a
    banded LSH self-join WOULD emit, computed from bucket counts alone —
    no pair is ever materialized.

    The q186 lesson as a first-class operator: a pair-emitting query's
    cost is governed by banding selectivity, so before launching the
    join over a new corpus, audit each band's bucket histogram. A bucket
    of ``c`` signatures contributes exactly ``c·(c−1)/2`` candidate
    pairs, so ``est_pairs = Σ c·(c−1) DIV 2`` per band is the EXACT pair
    count of ``minhash_lsh_pairs``' per-band join (before the cross-band
    DISTINCT), and ``max_bucket`` is the hot key AQE's skew handling (or
    salting) would have to absorb. ``rr_micro`` is the record-linkage
    reduction ratio — emitted pairs per million possible pairs
    ``n·(n−1)/2``.

    Exactness: every surfaced quantity is a non-negative BIGINT count or
    a non-negative integer DIV (Spark ``DIV`` == DuckDB ``//``).
    Overflow: ``est_pairs·10⁶`` caps the corpus at ~9.2e12 candidate
    pairs per band — past that the banding is unusable anyway (the
    planner's whole point is to reject such shapes before the join).

    Scale shape: the signature aggregate (one exchange, the same one the
    real join pays) → ONE map-side-combined count per (band, key) → ONE
    |bands|-row rollup. Output is |bands| rows: (band, n_docs,
    n_buckets, singleton_buckets, max_bucket, est_pairs, rr_micro),
    ordered by band.
    """
    assert n_hashes % bands == 0
    rows = n_hashes // bands
    sig = minhash_signatures(
        docs, id_col, text_col, n_hashes, ngram, shingle=shingle
    )
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"h{b * rows + r:02d}") for r in range(rows)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("#", *parts)).alias("key"),
            )
        )
    buckets = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    counts = buckets.groupBy("band", "key").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per_band = counts.groupBy("band").agg(
        F.sum("c").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("singleton_buckets"),
        F.max("c").cast("long").alias("max_bucket"),
        F.sum(F.expr("(c * (c - 1)) DIV 2")).cast("long").alias("est_pairs"),
    )
    return per_band.select(
        F.col("band").cast("long").alias("band"),
        "n_docs",
        "n_buckets",
        "singleton_buckets",
        "max_bucket",
        "est_pairs",
        F.expr(
            "CASE WHEN n_docs >= 2 THEN (est_pairs * 1000000L) "
            "DIV ((n_docs * (n_docs - 1)) DIV 2) ELSE 0L END"
        )
        .cast("long")
        .alias("rr_micro"),
    ).orderBy("band")
