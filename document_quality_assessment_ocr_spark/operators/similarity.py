"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline (native higher-order
functions, SQL-checkable against DuckDB's list_cosine_similarity); the scale
path is random-hyperplane LSH bucketing, which cuts the candidate set from
|corpus| to one bucket before exact scoring.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _seq_fold_dot(A: "np.ndarray", B: "np.ndarray") -> "np.ndarray":
    """Row-wise dot product with the SAME left-to-right float64 fold order
    as the :func:`_dot` Column HOF — ``((0 + a0·b0) + a1·b1) + …`` —
    vectorized ACROSS rows, sequential ACROSS dims. IEEE-754 double ops are
    deterministic given the order, so values are bit-identical to the
    Column form and to the DuckDB oracle's LIST_DOT_PRODUCT (np.dot/BLAS
    would pairwise-sum and drift a ulp on near-ties — the argmin/threshold
    killers)."""
    acc = np.zeros(A.shape[0], dtype=np.float64)
    for d in range(A.shape[1]):
        acc += A[:, d] * B[:, d]
    return acc


def pair_cosine_udf():
    """Arrow-vectorized pair cosine — bit-identical to
    ``_dot(a,b)/sqrt(_dot(a,a)*_dot(b,b))`` (same fold order via
    :func:`_seq_fold_dot`, same single sqrt/divide) but ~50× faster than
    the interpreted HOF on the quadratic pair-join paths: Spark HOFs are
    CodegenFallback, so every zip_with+aggregate pays per-element boxing;
    at the SemDeDup/D4 scale contract (cells ~128 rows, pairs linear in N)
    the pair join evaluates millions of cosines and the HOF was the wall
    (round-4 sf1 probe). Rounding stays JVM-side (``F.round`` is HALF_UP;
    ``np.round`` is banker's — never round inside the UDF)."""

    @F.pandas_udf("double")
    def _pc(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.array(a.tolist(), dtype=np.float64)
        B = np.array(b.tolist(), dtype=np.float64)
        if A.size == 0:
            return pd.Series(np.zeros(0, dtype=np.float64))
        num = _seq_fold_dot(A, B)
        den = np.sqrt(_seq_fold_dot(A, A) * _seq_fold_dot(B, B))
        return pd.Series(num / den)

    return _pc


def cosine(a, b):
    """Cosine similarity between two array<float/double> columns — native
    Column expression (JVM-side, codegen)."""
    return _dot(a, b) / F.sqrt(_dot(a, a) * _dot(b, b))


def cosine_topk_bruteforce(
    emb: DataFrame,
    probe_ids: list,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fanout: int = 32,
) -> DataFrame:
    """Exact top-k neighbours for a probe set: broadcast the probes, score
    every corpus row, TWO-LEVEL top-k merge.

    Level 1 buckets neighbours by ``pmod(hash(id), fanout)`` and keeps each
    bucket's top-k, so no single task ever sorts a probe's entire scored
    corpus (the single-reducer window this replaces was the r01 scale flag);
    level 2 merges ≤ fanout·k survivors per probe. Exact by construction:
    the global top-k is a subset of the per-bucket top-ks, and the shared
    (−cos, neighbor_id) struct order makes ties deterministic."""
    probes = emb.filter(F.col(id_col).isin(probe_ids)).select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    scored = (
        emb.alias("c")
        .join(F.broadcast(probes), F.col("probe_id") != F.col(f"c.{id_col}"))
        .select(
            "probe_id",
            F.col(f"c.{id_col}").alias("neighbor_id"),
            F.round(cosine(F.col("probe_vec"), F.col(f"c.{vec_col}")), 6).alias("cos"),
        )
    )
    item = F.struct(
        (-F.col("cos")).alias("nc"),
        F.col("neighbor_id").alias("neighbor_id"),
        F.col("cos").alias("cos"),
    )
    topk = lambda c: F.slice(F.sort_array(F.collect_list(c)), 1, k)
    lvl1 = scored.groupBy(
        "probe_id", F.pmod(F.hash("neighbor_id"), F.lit(fanout)).alias("b")
    ).agg(topk(item).alias("top"))
    merged = (
        lvl1.select("probe_id", F.explode("top").alias("t"))
        .groupBy("probe_id")
        .agg(topk(F.col("t")).alias("top"))
    )
    return merged.select("probe_id", F.posexplode("top").alias("r", "t")).select(
        "probe_id",
        F.col("t.neighbor_id").alias("neighbor_id"),
        F.col("t.cos").alias("cos"),
        (F.col("r") + 1).cast("int").alias("rank"),
    )


def hyperplane_lsh_buckets(
    emb: DataFrame,
    dim: int,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane (SimHash-for-vectors) bucket id per row.

    The plane matrix is generated driver-side from a seed. Two
    bit-identical executors, chosen by panel size (r6, measured at the
    10x table set): WIDE panels (n_planes·dim ≥ 2048, e.g. q146's 48×64)
    ride an Arrow pandas UDF — the aggregate/zip_with HOFs are
    CodegenFallback and per-element boxing dominates there
    (q146 5.8 → 2.5 s) — while NARROW panels (the 12-plane default)
    keep the folded Column expression: the UDF's python-worker round
    trip costs more than 12 cheap HOFs, and bucket-join consumers
    (q23/q30) evaluate the projection from two plan branches
    (measured +1-2 s UDF there). Equality of the two forms:
    :func:`_seq_fold_dot` reproduces the HOF's left-to-right float64
    fold exactly, ``d > 0`` is the same IEEE comparison, and the 2^p
    accumulation is exact integer arithmetic (parity unit test pins
    them equal)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    if n_planes * dim < 2048:
        acc = F.lit(0).cast("long")
        for p in range(n_planes):
            dot = _dot(_lit_vec(planes[p]), F.col(vec_col))
            acc = acc + F.when(dot > 0, F.lit(2**p).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        return emb.select(F.col(id_col), F.col(vec_col), acc.alias("bucket"))

    P = planes

    @F.pandas_udf("long")
    def _bucket(vs: pd.Series) -> pd.Series:
        X = np.array(vs.tolist(), dtype=np.float64)
        if X.size == 0:
            return pd.Series(np.zeros(0, dtype=np.int64))
        acc = np.zeros(X.shape[0], dtype=np.int64)
        for p in range(len(P)):
            d = _seq_fold_dot(X, np.broadcast_to(P[p], X.shape))
            acc += np.where(d > 0, np.int64(1) << p, 0).astype(np.int64)
        return pd.Series(acc)

    return emb.select(
        F.col(id_col), F.col(vec_col), _bucket(F.col(vec_col)).alias("bucket")
    )


def embedding_near_dups(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket candidates (vectors
    agreeing on every hyperplane sign), exact cosine filter at ``threshold``.
    The bucket self-join bounds the candidate set — never a cross join; at
    corpus scale it is a co-partitioned hash join on bucket id."""
    b = hyperplane_lsh_buckets(emb, dim, n_planes, seed, id_col, vec_col)
    a, c = b.alias("a"), b.alias("b")
    pairs = a.join(
        c,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.round(cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6).alias("cos"),
    )
    return pairs.filter(F.col("cos") >= F.lit(float(threshold)))


def scaled_n_centroids(
    n_rows: int, target_cell: int = 128, floor: int = 16, cap: int = 256
) -> int:
    """Cluster count that TRACKS corpus size — the SemDeDup/D4/prototype
    scale contract made executable. A fixed k makes the within-cell pair
    join O(N²/k), i.e. quadratic in corpus size: the round-4 sf1 probe
    measured q111 at 41× wall for 10× rows with k=16 frozen. Holding the
    target cell occupancy constant (``n_rows // target_cell``) keeps the
    quadratic bounded per cell and the total pair count linear in N.

    The SHARED deterministic rule: the engine queries and the DuckDB
    oracle builders both call THIS on their own row count, so the seeded
    centroid literals stay twins. ``floor`` preserves the historical k=16
    at every gated SF (≤ 2176 rows ⇒ 16 — sf0.001/0.01/0.1 results are
    byte-identical to the fixed-k era). ``cap`` bounds the driver-side
    k-means sample, the prototype-lookup literal, and the DuckDB oracle's
    k unrolled distance terms (the engine's Arrow-vectorized assignment
    itself is O(k·dim) numpy per batch and doesn't care); past the cap a
    real deployment raises it with a broadcast centroid table — the cap is
    a literal-size guard, not an algorithmic limit."""
    return int(min(cap, max(floor, n_rows // target_cell)))


def scaled_sample_rows(n_centroids: int, per_centroid: int = 8, floor: int = 512) -> int:
    """k-means sample size paired with :func:`scaled_n_centroids` — at
    least ``per_centroid`` sample vectors per centroid, never below the
    historical 512 (so the floor-k regime samples identically to the
    fixed-k era). Driver-side cost is the sample's numpy k-means: bounded
    by ``8 * cap`` rows regardless of corpus size."""
    return int(max(floor, per_centroid * n_centroids))


def _lit_vec(vec) -> "F.Column":
    """array<double> literal column parsed as ONE expression: per-element
    ``F.lit`` costs one py4j round trip each (a k x d centroid panel is
    ~10k calls — measured 5.9 s of the q107 build). ``CAST('<repr>' AS
    DOUBLE)`` parses with Java Double.parseDouble, exact on python's
    shortest round-trip repr, so the folded literals are bit-identical
    to ``F.lit(float(x))``."""
    return F.expr(
        "array(" + ",".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in vec) + ")"
    )


def _lit_mat(mat) -> "F.Column":
    """array<array<double>> literal column — the matrix form of
    :func:`_lit_vec` (one parsed expression for the whole panel)."""
    rows = ",".join(
        "array(" + ",".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in c) + ")"
        for c in mat
    )
    return F.expr(f"array({rows})")


def _kmeans_lite(sample: np.ndarray, k: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Tiny driver-side k-means (numpy) for the IVF coarse quantizer.

    The assignment pass is CHUNKED over sample rows (r6): the one-shot
    ``(n, k, d)`` broadcast temp was ~100 MB per iteration at the scaled
    sf1 shape and allocation-bound (measured 1.31 s → 0.36 s chunked).
    Per-(i, j) arithmetic — ``((x−c)² ).sum(-1)``, argmin, per-cluster
    mean — is untouched, so the centroids are BIT-IDENTICAL to the
    original form (np.array_equal-verified); the floats these centroids
    contribute to the generated oracle SQL literals cannot move."""
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), size=min(k, len(sample)), replace=False)].copy()
    n = len(sample)
    assign = np.empty(n, dtype=np.int64)
    chunk = 128
    for _ in range(iters):
        for s in range(0, n, chunk):
            e = min(n, s + chunk)
            d = ((sample[s:e, None, :] - cents[None, :, :]) ** 2).sum(-1)
            assign[s:e] = d.argmin(1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                cents[c] = sample[m].mean(0)
    return cents


def _kmeans_cells(
    emb: DataFrame,
    n_centroids: int,
    sample_rows: int,
    seed: int,
    id_col: str,
    vec_col: str,
    checkpoint: bool = True,
):
    """Seeded driver-side k-means coarse quantizer + Arrow-vectorized cell
    assignment — shared by ``ivf_topk``/``semdedup``/``prototype_prune``/
    ``d4_prune``/``cluster_holdout_split``. Returns (centroids, assigned DF
    with a ``cell`` column)."""
    sample = np.array(
        [r[vec_col] for r in emb.orderBy(id_col).limit(sample_rows).collect()],
        dtype=np.float64,
    )
    cents = _kmeans_lite(sample, n_centroids, seed=seed)

    # Arrow-vectorized assignment: K unrolled Column aggregate trees stall
    # the analyzer for minutes at the scaled K≈150, and Spark HOFs are
    # CodegenFallback anyway (per-element boxing measured ~22 s per pass at
    # 20k×156×64 in the round-4 sf1 probe — and the D4 plan evaluates
    # `assigned` three times). The pandas UDF computes the identical
    # argmin over ||x||² − 2c·x + ||c||² (||x||² constant per row → drop):
    # _seq_fold_dot keeps the HOF's exact float64 fold order, ||c||² is the
    # same np (c·c).sum() the oracle builders embed as literals, and
    # np.argmin's first-occurrence tie rule is LIST_INDEXOF(LIST_MIN)'s.
    c2 = np.array([float((c * c).sum()) for c in cents], dtype=np.float64)

    @F.pandas_udf("int")
    def _cell(vs: pd.Series) -> pd.Series:
        X = np.array(vs.tolist(), dtype=np.float64)
        if X.size == 0:
            return pd.Series(np.zeros(0, dtype=np.int32))
        D = np.empty((X.shape[0], len(cents)), dtype=np.float64)
        for j in range(len(cents)):
            D[:, j] = -2.0 * _seq_fold_dot(X, np.broadcast_to(cents[j], X.shape)) + c2[j]
        return pd.Series(np.argmin(D, axis=1).astype(np.int32))

    # localCheckpoint (default): SemDeDup/D4/IVF read `assigned` from 2-3
    # plan branches; materializing it once per execution drops the
    # repeated scan + Arrow assignment passes (r6; no cross-run state —
    # each call builds a fresh checkpoint). Single-branch consumers
    # (prototype_prune, holdout split, silhouette) pass checkpoint=False:
    # for them the materialization is pure overhead.
    assigned = emb.select(
        F.col(id_col), F.col(vec_col), _cell(F.col(vec_col)).alias("cell")
    )
    if checkpoint:
        assigned = assigned.localCheckpoint()
    return cents, assigned


def _celldrop_ids(
    assigned: DataFrame, tau: float, id_col: str, vec_col: str
) -> DataFrame:
    """Distinct ids having a LOWER-id same-cell witness at
    ``ROUND(cos,6) >= tau`` — the shared SemDeDup/D4 stage-1 drop set,
    byte-identical to the pair-join + :func:`pair_cosine_udf` +
    ``F.round(·,6) >= tau`` form it replaces (r6 rewrite) but never
    materializing a pair row.

    Per cell (``applyInPandas``; quadratic in cell size only, the
    published algorithm's own trade): fast float64-matmul cosines give
    each row's max over lower-id members; rows with max ≥ boundary+3e-9
    are definite drops (the exact sequential-fold cosine can differ from
    the matmul value by ≪1e-9), rows with max < boundary−1e-8 are
    definite keeps, and only rows in the narrow band are re-scored with
    :func:`_seq_fold_dot` and resolved with Java-HALF_UP decimal
    quantization (the exact F.round contract; Spark rounds the SHORTEST
    double repr, which ``Decimal(repr(c))`` reproduces). The band is
    empty unless a cosine lands within ~1e-9 of the decimal boundary
    ``tau − 5e-7``."""
    from decimal import ROUND_HALF_UP, Decimal

    tdec = Decimal(repr(float(tau)))
    bdec = tdec - Decimal("0.0000005")
    b = float(bdec)
    q6 = Decimal("0.000001")

    def per_cell(pdf):
        m = len(pdf)
        if m < 2:
            return pdf.iloc[0:0][[id_col]]
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        C = np.array(pdf[vec_col].tolist(), dtype=np.float64)[order]
        dd = _seq_fold_dot(C, C)
        norm = np.sqrt(dd)
        dropped = np.zeros(m, dtype=bool)
        chunk = max(16, int(4_000_000 // m))
        cols = np.arange(m)
        uncertain = []
        for s in range(1, m, chunk):
            e = min(m, s + chunk)
            Sf = (C[s:e] @ C.T) / (norm[s:e, None] * norm[None, :])
            mask = cols[None, :] < np.arange(s, e)[:, None]
            mx = np.where(mask, Sf, -np.inf).max(axis=1)
            dropped[s:e] = mx >= b + 3e-9
            for xi in np.nonzero((mx >= b - 1e-8) & (mx < b + 3e-9))[0]:
                x = s + xi
                ys = np.nonzero((Sf[xi, :x] >= b - 1e-8))[0]
                uncertain.append((x, ys))
        for x, ys in uncertain:
            if dropped[x]:
                continue
            ex = _seq_fold_dot(np.broadcast_to(C[x], (ys.size, C.shape[1])), C[ys])
            ex = ex / np.sqrt(dd[x] * dd[ys])
            for c in ex:
                if Decimal(repr(float(c))).quantize(q6, rounding=ROUND_HALF_UP) >= tdec:
                    dropped[x] = True
                    break
        return pd.DataFrame({id_col: ids[dropped]})

    return (
        assigned.select(id_col, vec_col, "cell")
        .groupBy("cell")
        .applyInPandas(per_cell, schema=f"{id_col} long")
    )


def semdedup(
    emb: DataFrame,
    tau: float = 0.99,
    n_centroids: int = 16,
    sample_rows: int = 512,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup by cluster-then-prune —
    k-means cells bound the comparison scope, and inside a cell a vector is
    dropped when a LOWER-id member sits at cosine ≥ ``tau`` (keep-first,
    deterministic; no connected components needed because every dropped
    row names a kept lower-id witness... the minimum id per near-clique
    always survives).

    Scale shape: the pair join is WITHIN-cell only (hash-partitioned by
    cell id) — quadratic in cell size, never in corpus size, which is the
    published algorithm's own trade (cluster count tracks corpus size so
    cells stay bounded). Cosine is rounded to 6 places before the
    threshold — the cross-engine float contract.

    Output: (id_col, cell, kept).
    """
    _, assigned = _kmeans_cells(
        emb, n_centroids, sample_rows, seed, id_col, vec_col
    )
    dropped = _celldrop_ids(assigned, tau, id_col, vec_col).withColumn(
        "_drop", F.lit(True)
    )
    return assigned.join(dropped, id_col, "left").select(
        F.col(id_col),
        F.col("cell"),
        F.col("_drop").isNull().alias("kept"),
    )


def ivf_topk(
    emb: DataFrame,
    probe_ids: list,
    dim: int,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
    sample_rows: int = 512,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: a driver-side k-means coarse quantizer (trained
    on a deterministic sample) assigns every vector to its nearest centroid
    via native Column expressions; probes search their ``n_probe`` nearest
    cells only. At corpus scale: centroids are broadcast literals (the list
    is tiny), cell assignment is a codegen projection, and the candidate join
    is hash-partitioned by cell id — candidate count drops by ~n_centroids/
    n_probe versus brute force."""
    cents, assigned = _kmeans_cells(
        emb, n_centroids, sample_rows, seed, id_col, vec_col
    )
    probes = assigned.filter(F.col(id_col).isin(probe_ids)).collect()
    # n_probe nearest cells per probe, computed driver-side from centroids
    probe_cells = []
    for r in probes:
        v = np.array(r[vec_col], dtype=np.float64)
        order = np.argsort(((cents - v) ** 2).sum(1))[:n_probe]
        for c in order:
            probe_cells.append((r[id_col], list(r[vec_col]), int(c)))
    pdf = emb.sparkSession.createDataFrame(
        probe_cells, f"probe_id long, probe_vec array<double>, cell int"
    )
    cands = assigned.alias("c").join(
        F.broadcast(pdf),
        (F.col("c.cell") == pdf["cell"]) & (pdf["probe_id"] != F.col(f"c.{id_col}")),
    )
    scored = cands.select(
        "probe_id",
        F.col(f"c.{id_col}").alias("neighbor_id"),
        F.round(cosine(F.col("probe_vec"), F.col(f"c.{vec_col}")), 6).alias("cos"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cos", "rank")
    )


def cosine_topk_filtered(
    emb: DataFrame,
    probe_ids: list,
    filter_col: str,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fanout: int = 32,
) -> DataFrame:
    """Filtered vector search: exact top-k among only the rows whose
    ``filter_col`` equals the probe's own value (the metadata-filtered ANN
    every retrieval stack needs — post-filtering a plain top-k instead can
    return < k or even zero survivors).

    The filter is applied PRE-scoring as a join predicate, so selective
    filters cut the scored set proportionally — at scale, partition the
    corpus by the filter column and the scan prunes to matching partitions
    before any vector math. Same two-level merge as the unfiltered path
    (no single-reducer window)."""
    probes = emb.filter(F.col(id_col).isin(probe_ids)).select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("probe_vec"),
        F.col(filter_col).alias("_pf"),
    )
    scored = (
        emb.alias("c")
        .join(
            F.broadcast(probes),
            (F.col("probe_id") != F.col(f"c.{id_col}"))
            & (F.col(f"c.{filter_col}") == F.col("_pf")),
        )
        .select(
            "probe_id",
            F.col(f"c.{id_col}").alias("neighbor_id"),
            F.round(cosine(F.col("probe_vec"), F.col(f"c.{vec_col}")), 6).alias("cos"),
        )
    )
    item = F.struct(
        (-F.col("cos")).alias("nc"),
        F.col("neighbor_id").alias("neighbor_id"),
        F.col("cos").alias("cos"),
    )
    topk = lambda c: F.slice(F.sort_array(F.collect_list(c)), 1, k)  # noqa: E731
    lvl1 = scored.groupBy(
        "probe_id", F.pmod(F.hash("neighbor_id"), F.lit(fanout)).alias("b")
    ).agg(topk(item).alias("top"))
    merged = (
        lvl1.select("probe_id", F.explode("top").alias("t"))
        .groupBy("probe_id")
        .agg(topk(F.col("t")).alias("top"))
    )
    return merged.select("probe_id", F.posexplode("top").alias("r", "t")).select(
        "probe_id",
        F.col("t.neighbor_id").alias("neighbor_id"),
        F.col("t.cos").alias("cos"),
        (F.col("r") + 1).cast("int").alias("rank"),
    )


def pq_codebooks(
    sample: np.ndarray, m: int, ks: int, seed: int = 42
) -> list[np.ndarray]:
    """Per-subspace product-quantization codebooks: the sample is split into
    ``m`` contiguous sub-vectors and each subspace trains its own seeded
    k-means (``ks`` centroids). Deterministic given (sample, m, ks, seed)."""
    sub = sample.shape[1] // m
    return [
        _kmeans_lite(sample[:, j * sub : (j + 1) * sub], ks, seed=seed + j)
        for j in range(m)
    ]


def pq_topk(
    emb: DataFrame,
    probe_ids: list,
    dim: int,
    k: int = 5,
    m: int = 4,
    ks: int = 16,
    sample_rows: int = 512,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fanout: int = 32,
) -> DataFrame:
    """Product-quantization ANN (ADC): the corpus is compressed to ``m``
    byte-sized codes per vector, probes scan the CODES with a per-probe
    lookup table — the memory-bounded scale path that complements LSH/IVF
    pruning (Jégou et al., "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011).

    Spark-first shape: codebooks are driver-side seeded k-means on a bounded
    sample; code assignment is a pure codegen projection (argmin over
    −2c·x+|c|² per subspace — no UDF); each probe's m×ks distance lookup
    table is a literal array, so the scan reads m ints per corpus row
    instead of ``dim`` floats. At 100 TB the encoded table is ~dim·4/m×
    smaller than the raw vectors and can be cached/bucketed; the top-k is
    the same two-level merge as :func:`cosine_topk_bruteforce` (no
    single-reducer window). Approximate distances are asymmetric L2² —
    exact re-ranking of the survivors (k ≪ corpus) can follow at will.

    Output: (probe_id, neighbor_id, approx_dist, rank)."""
    sub = dim // m
    sample = np.array(
        [r[vec_col] for r in emb.orderBy(id_col).limit(sample_rows).collect()],
        dtype=np.float64,
    )
    books = pq_codebooks(sample, m, ks, seed)

    def code_expr(j: int):
        sl = F.slice(F.col(vec_col), j * sub + 1, sub)
        dists = [
            -2.0 * _dot(_lit_vec(c), sl)
            + float((c * c).sum())
            for c in books[j]
        ]
        arr = F.array(*dists)
        return (F.array_position(arr, F.array_min(arr)) - 1).cast("int")

    enc = emb.select(
        F.col(id_col), *[code_expr(j).alias(f"c{j}") for j in range(m)]
    )

    probes = emb.filter(F.col(id_col).isin(probe_ids)).collect()
    luts = []  # (probe_id, lut_0 .. lut_{m-1}) with lut_j a ks-list of L2²
    for r in probes:
        v = np.array(r[vec_col], dtype=np.float64)
        luts.append(
            (int(r[id_col]),)
            + tuple(
                [float(x) for x in ((books[j] - v[j * sub : (j + 1) * sub]) ** 2).sum(1)]
                for j in range(m)
            )
        )
    lut_schema = "probe_id long, " + ", ".join(
        f"lut{j} array<double>" for j in range(m)
    )
    lut_df = emb.sparkSession.createDataFrame(luts, lut_schema)

    # ONE scan of the encoded table regardless of probe-panel size: the
    # (tiny) LUT table broadcasts and each corpus row evaluates every probe's
    # table lookup in the same pass
    adist = F.lit(0.0).cast("double")
    for j in range(m):
        adist = adist + F.element_at(F.col(f"lut{j}"), F.col(f"c{j}") + 1)
    scored = (
        enc.join(F.broadcast(lut_df), F.col("probe_id") != F.col(id_col))
        .select(
            "probe_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(adist, 6).alias("approx_dist"),
        )
    )

    item = F.struct(
        F.col("approx_dist").alias("d"),
        F.col("neighbor_id").alias("neighbor_id"),
    )
    topk = lambda c: F.slice(F.sort_array(F.collect_list(c)), 1, k)  # noqa: E731
    lvl1 = scored.groupBy(
        "probe_id", F.pmod(F.hash("neighbor_id"), F.lit(fanout)).alias("b")
    ).agg(topk(item).alias("top"))
    merged = (
        lvl1.select("probe_id", F.explode("top").alias("t"))
        .groupBy("probe_id")
        .agg(topk(F.col("t")).alias("top"))
    )
    return merged.select("probe_id", F.posexplode("top").alias("r", "t")).select(
        "probe_id",
        F.col("t.neighbor_id").alias("neighbor_id"),
        F.col("t.d").alias("approx_dist"),
        (F.col("r") + 1).cast("int").alias("rank"),
    )


def pq_topk_refined(
    emb: DataFrame,
    probe_ids: list,
    dim: int,
    k: int = 5,
    refine_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **pq_kwargs,
) -> DataFrame:
    """PQ + exact refinement: the ADC scan shortlists ``k·refine_factor``
    candidates per probe from the COMPRESSED codes, then only those few
    rows fetch their raw vectors for an exact cosine re-rank — the standard
    two-phase ANN serving shape (compressed scan bounds recall cost, exact
    re-rank restores precision on a candidate set that is O(k), not
    O(corpus)).

    Scale shape: the candidate set (probes × k·refine_factor rows) is
    broadcast into ONE join against the raw-vector table — the full
    corpus is only ever read through the code scan; the final top-k
    windows over ≤ k·refine_factor rows per probe."""
    cand = pq_topk(
        emb, probe_ids, dim, k=k * refine_factor,
        id_col=id_col, vec_col=vec_col, **pq_kwargs,
    ).select("probe_id", "neighbor_id")
    probes = emb.filter(F.col(id_col).isin(probe_ids)).select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    exact = (
        emb.join(
            F.broadcast(cand), F.col(id_col) == F.col("neighbor_id")
        )
        .join(F.broadcast(probes), "probe_id")
        .select(
            "probe_id",
            "neighbor_id",
            F.round(cosine(F.col("probe_vec"), F.col(vec_col)), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cos", "rank")
    )


def random_projection(
    emb: DataFrame,
    dim: int,
    out_dim: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson–Lindenstrauss random projection: a seeded Gaussian matrix
    R/√d′ folded into literal Column expressions — one codegen projection,
    zero shuffle, no UDF. Pairwise distances are preserved within
    O(√(log n / d′)) (JL lemma), so downstream dedup/ANN can run on the
    d′-dim output at dim/d′× less memory and shuffle volume.

    Output: (id_col, p00..p{out_dim-1}) — scalar columns, each rounded to
    6 dp so the DuckDB twin hashes identically."""
    rng = np.random.default_rng(seed)
    R = rng.standard_normal((out_dim, dim)) / np.sqrt(out_dim)
    cols = [
        F.round(
            _dot(_lit_vec(R[j]), F.col(vec_col)), 6
        ).alias(f"p{j:02d}")
        for j in range(out_dim)
    ]
    return emb.select(F.col(id_col), *cols)


def sq_int8(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Int8 scalar quantization audit: per-vector symmetric scale
    (max|x|/127), deterministic floor(x/s + 0.5) rounding (identical on
    both engines — no banker's-rounding ambiguity), and the exact L2
    reconstruction error. At 100 TB this is the 4× storage/shuffle
    compression step before ANN indexing; emitting the error makes the
    accuracy cost measurable per vector rather than assumed.

    Output: (id_col, scale, max_code, recon_err) — pure codegen, zero
    shuffle."""
    v = F.col(vec_col)
    scale = (F.array_max(F.transform(v, F.abs)) / F.lit(127.0)).alias("_s")
    with_s = emb.select(F.col(id_col), v.alias("_v"), scale)
    s = F.col("_s")
    code = lambda x: F.floor(x / s + F.lit(0.5))  # noqa: E731
    diff = F.transform(F.col("_v"), lambda x: x - code(x) * s)
    err = F.sqrt(_dot(diff, diff))
    max_code = F.array_max(
        F.transform(F.col("_v"), lambda x: F.abs(code(x).cast("int")))
    )
    zero = s == F.lit(0.0)
    return with_s.select(
        F.col(id_col),
        F.round(s, 9).alias("scale"),
        F.when(zero, F.lit(0)).otherwise(max_code).cast("int").alias("max_code"),
        F.when(zero, F.lit(0.0)).otherwise(F.round(err, 6)).alias("recon_err"),
    )


def cosine_topk_lsh(
    emb: DataFrame,
    probe_ids: list,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_bits: int = 0,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the probe's LSH bucket,
    then exact cosine + window top-k. At corpus scale the bucket join is a
    co-partitioned hash join on bucket id; recall is tuned by n_planes AND by
    ``multiprobe_bits`` — the probe additionally searches every bucket at
    Hamming distance 1 obtained by flipping one of its first
    ``multiprobe_bits`` plane signs (classic multi-probe LSH: near misses on
    a single hyperplane are the dominant false-negative mode). Candidate
    volume grows linearly in probes×buckets, never quadratically."""
    b = hyperplane_lsh_buckets(emb, dim, n_planes, seed, id_col, vec_col)
    probes = b.filter(F.col(id_col).isin(probe_ids)).select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("probe_vec"),
        F.col("bucket").alias("probe_bucket"),
    )
    if multiprobe_bits > 0:
        variants = F.array(
            F.col("probe_bucket"),
            *[
                F.col("probe_bucket").bitwiseXOR(F.lit(1 << i).cast("long"))
                for i in range(min(multiprobe_bits, n_planes))
            ],
        )
        probes = probes.select(
            "probe_id", "probe_vec", F.explode(variants).alias("probe_bucket")
        )
    cands = b.alias("c").join(
        F.broadcast(probes),
        (F.col("probe_bucket") == F.col("c.bucket"))
        & (F.col("probe_id") != F.col(f"c.{id_col}")),
    )
    scored = cands.select(
        "probe_id",
        F.col(f"c.{id_col}").alias("neighbor_id"),
        F.round(cosine(F.col("probe_vec"), F.col(f"c.{vec_col}")), 6).alias("cos"),
    )
    if multiprobe_bits > 0:
        # a neighbour can land in several probed buckets — dedup before rank
        scored = scored.dropDuplicates(["probe_id", "neighbor_id"])
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cos", "rank")
    )


def prototype_prune(
    emb: DataFrame,
    keep_pct: int = 60,
    n_centroids: int = 16,
    sample_rows: int = 512,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SSL-prototype pruning (Sorscher et al. 2022, "Beyond neural scaling
    laws"): rank every vector by cosine to its k-means cell centroid (the
    cell's "prototype") and keep only the HARDEST ``keep_pct`` percent per
    cell — the examples farthest from the prototype, which the paper shows
    beat random pruning when data is abundant. The easy/prototypical mass
    near each centroid is what gets dropped.

    Determinism contract: the same seeded driver-side k-means as
    ``ivf_topk``/``semdedup`` (:func:`_kmeans_cells` — centroids become
    Column literals), cosine rounded to 6 places before ranking, ties by
    id ascending; per-cell keep count is integer arithmetic
    ``greatest(1, n*keep_pct DIV 100)`` (non-negative DIV — exact on both
    engines).

    Scale shape: centroid assignment and the prototype cosine are pure
    codegen projections (zero shuffle); the rank is a window PARTITIONED
    BY cell — one hash exchange, parallel across cells, never a global
    sort. Cell sizes stay bounded because cluster count tracks corpus
    size (the SemDeDup/IVF trade); a hot cell is a centroid-count tuning
    problem, not a plan problem.

    Output: (id_col, cell, cos_proto, rank, kept).
    """
    cents, assigned = _kmeans_cells(
        emb, n_centroids, sample_rows, seed, id_col, vec_col, checkpoint=False
    )
    protos = _lit_mat(cents)
    scored = assigned.select(
        F.col(id_col),
        "cell",
        # Arrow pair cosine (bit-identical to the cosine() HOF — see
        # pair_cosine_udf): the interpreted CodegenFallback HOF re-paid
        # per-element boxing on every row (r6)
        F.round(
            pair_cosine_udf()(F.col(vec_col), F.element_at(protos, F.col("cell") + 1)), 6
        ).alias("cos_proto"),
    )
    w = Window.partitionBy("cell").orderBy(
        F.col("cos_proto").asc(), F.col(id_col).asc()
    )
    n = F.count(F.lit(1)).over(Window.partitionBy("cell")).cast("long")
    n_keep = F.greatest(
        F.lit(1).cast("long"),
        F.floor((n * F.lit(int(keep_pct))) / F.lit(100)).cast("long"),
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn("kept", F.col("rank") <= n_keep)
        .select(id_col, "cell", "cos_proto", "rank", "kept")
    )


def d4_prune(
    emb: DataFrame,
    tau: float = 0.99,
    keep_pct: int = 60,
    n_centroids: int = 16,
    sample_rows: int = 512,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """D4 (Tirumala et al. 2023, "D4: Improving LLM Pretraining via Document
    De-Duplication and Diversification"): SemDeDup first (drop near-exact
    semantic duplicates at cosine >= ``tau``), then SSL-prototype pruning
    over the SURVIVORS (drop the most prototypical ``100-keep_pct`` percent
    per cluster).  Documented deviation from the paper: both stages share
    ONE clustering (the paper re-clusters the deduped set) — re-clustering
    would make the stage-2 centroids depend on the stage-1 output, forcing
    the oracle builder to replay stage 1 driver-side; sharing the cells
    keeps both stages bit-exact against literal centroids and is the same
    trade SemDeDup itself makes on cluster reuse.

    Determinism contract: the shared seeded k-means of
    :func:`_kmeans_cells`; cosine rounded to 6 places before the threshold
    and before ranking; ties by id ascending; per-cell keep count
    ``greatest(1, n_survivors*keep_pct DIV 100)`` on non-negative ints.

    Scale shape: stage 1 is the SemDeDup within-cell pair join (quadratic
    in cell size only); stage 2 adds one window partitioned by cell over
    the survivor rows — both hash-partition on the cell id, so AQE can
    reuse the exchange.  Centroids and prototypes are broadcast literals.

    Output (survivors of stage 1 only): (id_col, cell, cos_proto, rank,
    kept) — ``kept`` is the final D4 keep set.
    """
    cents, assigned = _kmeans_cells(
        emb, n_centroids, sample_rows, seed, id_col, vec_col
    )
    dropped = _celldrop_ids(assigned, tau, id_col, vec_col).withColumn(
        "_dup", F.lit(True)
    )
    protos = _lit_mat(cents)
    survivors = (
        assigned.join(dropped, id_col, "left")
        .where(F.col("_dup").isNull())
        .select(
            F.col(id_col),
            "cell",
            F.round(
                pair_cosine_udf()(
                    F.col(vec_col), F.element_at(protos, F.col("cell") + 1)
                ),
                6,
            ).alias("cos_proto"),
        )
    )
    w = Window.partitionBy("cell").orderBy(
        F.col("cos_proto").asc(), F.col(id_col).asc()
    )
    n = F.count(F.lit(1)).over(Window.partitionBy("cell")).cast("long")
    n_keep = F.greatest(
        F.lit(1).cast("long"),
        F.floor((n * F.lit(int(keep_pct))) / F.lit(100)).cast("long"),
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn("kept", F.col("rank") <= n_keep)
        .select(id_col, "cell", "cos_proto", "rank", "kept")
    )


def hard_negative_mine(
    emb: DataFrame,
    anchor_ids: list,
    k: int = 5,
    dup_tau: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    fanout: int = 32,
) -> DataFrame:
    """Hard-negative mining for contrastive training (the in-batch-negatives
    refinement of Karpukhin 2020 DPR / SimCSE practice): for each anchor,
    the top-``k`` highest-cosine corpus rows whose ``label_col`` DIFFERS
    from the anchor's — the negatives the model is most likely to confuse —
    excluding rows at cosine >= ``dup_tau`` (near-identical vectors across
    labels are presumed mislabeled duplicates, the classic false-negative
    trap in mined triplets).

    Determinism: cosine rounded to 6 places, ties by neighbor id via the
    shared (−cos, id) struct order.

    Scale shape: the anchor panel broadcasts, the corpus is scanned ONCE
    with the label predicate fused into the join, and the merge is the
    same two-level top-k as :func:`cosine_topk_bruteforce` — per-bucket
    top-k then a ≤ fanout·k merge, never a single-reducer sort.

    Output: (anchor_id, neighbor_id, neg_label, cos, rank).
    """
    anchors = emb.filter(F.col(id_col).isin(anchor_ids)).select(
        F.col(id_col).alias("anchor_id"),
        F.col(vec_col).alias("anchor_vec"),
        F.col(label_col).alias("anchor_label"),
    )
    cos6 = F.round(cosine(F.col("anchor_vec"), F.col(f"c.{vec_col}")), 6)
    scored = (
        emb.alias("c")
        .join(
            F.broadcast(anchors),
            F.col("anchor_label") != F.col(f"c.{label_col}"),
        )
        .select(
            "anchor_id",
            F.col(f"c.{id_col}").alias("neighbor_id"),
            F.col(f"c.{label_col}").alias("neg_label"),
            cos6.alias("cos"),
        )
        .where(F.col("cos") < F.lit(float(dup_tau)))
    )
    item = F.struct(
        (-F.col("cos")).alias("nc"),
        F.col("neighbor_id").alias("neighbor_id"),
        F.col("neg_label").alias("neg_label"),
        F.col("cos").alias("cos"),
    )
    topk = lambda c: F.slice(F.sort_array(F.collect_list(c)), 1, k)
    lvl1 = scored.groupBy(
        "anchor_id", F.pmod(F.hash("neighbor_id"), F.lit(fanout)).alias("b")
    ).agg(topk(item).alias("top"))
    merged = (
        lvl1.select("anchor_id", F.explode("top").alias("t"))
        .groupBy("anchor_id")
        .agg(topk(F.col("t")).alias("top"))
    )
    return merged.select("anchor_id", F.posexplode("top").alias("r", "t")).select(
        "anchor_id",
        F.col("t.neighbor_id").alias("neighbor_id"),
        F.col("t.neg_label").alias("neg_label"),
        F.col("t.cos").alias("cos"),
        (F.col("r") + 1).cast("int").alias("rank"),
    )


def cluster_holdout_split(
    emb: DataFrame,
    boundaries=(("train", 0.9), ("val", 0.95)),
    default_split: str = "test",
    n_centroids: int = 16,
    sample_rows: int = 512,
    seed: int = 42,
    salt: int = 101,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Leakage-safe train/val/test splits by CLUSTER holdout: near-duplicate
    and paraphrase mass concentrates inside k-means cells (the SemDeDup
    premise), so hashing the CELL id — not the row id — into the split
    intervals guarantees no near-dup pair ever straddles train and eval,
    the contamination mode row-hash splits (q96) cannot prevent.

    Honest trade: proportions are lumpy at small cluster counts (a 16-cell
    corpus quantizes the 90/5/5 target to multiples of whole cells); at
    corpus scale cluster count grows with the data and the md5-uniform
    proportions converge, which is exactly the regime that needs the
    guarantee.  Same seeded centroids/argmin as IVF/SemDeDup, same
    md5-uniform as every sampler here — fully oracle-checkable.

    Scale shape: centroid assignment is a codegen projection (literal
    centroids) and the split is a pure predicate on md5(cell) — zero
    shuffle end to end.

    Output: (id_col, cell, split).
    """
    from .sampling import assign_splits

    _, assigned = _kmeans_cells(
        emb, n_centroids, sample_rows, seed, id_col, vec_col, checkpoint=False
    )
    return assign_splits(
        assigned.select(F.col(id_col), "cell"),
        boundaries,
        default_split,
        id_col="cell",
        salt=salt,
    ).select(id_col, "cell", "split")


def binary_sig_topk(
    emb: DataFrame,
    probe_ids: list,
    dim: int,
    k: int = 5,
    n_planes: int = 48,
    rerank: int = 24,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fanout: int = 32,
) -> DataFrame:
    """Binary sign-sketch retrieval: rank by Hamming distance over packed
    sign-bit signatures, exact-cosine rerank of the survivors -- the
    64x-compression ANN path (one BIGINT per vector instead of ``dim``
    floats) used when even int8 vectors are too big to shuffle.

    Stage 1 reuses :func:`hyperplane_lsh_buckets`'s seeded plane matrix
    (``n_planes`` <= 62 keeps the packed signature non-negative, dodging
    the engines' two's-complement ``bit_count`` ambiguity); the Hamming
    distance ``bit_count(sig XOR probe_sig)`` is an unbiased monotone
    estimator of the angular distance (Charikar 2002 SimHash). Stage 2
    keeps each probe's ``rerank`` Hamming-nearest survivors via the
    q13-style TWO-LEVEL top-k merge (per-bucket top-m, then merge <=
    fanout*m -- no task ever sorts a probe's whole scored corpus), joins
    the <= |probes|*rerank survivors back for their full vectors, and
    ranks by exact cosine inside a window bounded by ``rerank`` rows.

    At 100 TB the corpus never moves: signatures are one codegen
    projection riding the scan, the probe panel broadcasts, and only
    survivor ids (a few KB) are joined back for vectors.

    Output: (probe_id, neighbor_id, hd, cos, rank) -- hd BIGINT, cos
    rounded to 6dp, rank 1..k by (cos DESC, neighbor_id ASC).
    """
    assert 1 <= n_planes <= 62
    sigs = hyperplane_lsh_buckets(
        emb, dim, n_planes, seed, id_col, vec_col
    ).withColumnRenamed("bucket", "sig")
    probes = sigs.filter(F.col(id_col).isin(probe_ids)).select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("probe_vec"),
        F.col("sig").alias("psig"),
    )
    scored = (
        sigs.alias("c")
        .join(
            F.broadcast(probes.select("probe_id", "psig")),
            F.col("probe_id") != F.col(f"c.{id_col}"),
        )
        .select(
            "probe_id",
            F.col(f"c.{id_col}").alias("neighbor_id"),
            F.bit_count(F.col("c.sig").bitwiseXOR(F.col("psig")))
            .cast("long")
            .alias("hd"),
        )
    )
    item = F.struct(
        F.col("hd").alias("hd"), F.col("neighbor_id").alias("neighbor_id")
    )
    topm = lambda c: F.slice(F.sort_array(F.collect_list(c)), 1, rerank)  # noqa: E731
    lvl1 = scored.groupBy(
        "probe_id", F.pmod(F.hash("neighbor_id"), F.lit(fanout)).alias("b")
    ).agg(topm(item).alias("top"))
    survivors = (
        lvl1.select("probe_id", F.explode("top").alias("t"))
        .groupBy("probe_id")
        .agg(topm(F.col("t")).alias("top"))
        .select("probe_id", F.explode("top").alias("t"))
        .select("probe_id", F.col("t.neighbor_id").alias("neighbor_id"), F.col("t.hd").alias("hd"))
    )
    reranked = (
        emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
        .join(F.broadcast(survivors), "neighbor_id")
        .join(F.broadcast(probes.select("probe_id", "probe_vec")), "probe_id")
        .select(
            "probe_id",
            "neighbor_id",
            "hd",
            F.round(cosine(F.col("probe_vec"), F.col("nv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        reranked.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "hd", "cos", "rank")
    )


def matryoshka_topk(
    emb: DataFrame,
    probe_ids: list,
    dim: int,
    d_pre: int = 16,
    k: int = 5,
    rerank: int = 24,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fanout: int = 32,
) -> DataFrame:
    """Matryoshka two-stage retrieval (Kusupati et al. 2022, "Matryoshka
    Representation Learning"): rank candidates by cosine over the FIRST
    ``d_pre`` dimensions only (MRL-trained embeddings front-load the
    information, so a short prefix is a cheap coarse scorer), then
    exact-cosine rerank of each probe's ``rerank`` survivors at full
    dimension.

    Same harness as :func:`binary_sig_topk`: the coarse stage keeps
    survivors via the q13-style TWO-LEVEL top-m merge (per-bucket top-m
    by (ccos DESC, id ASC) encoded as a descending struct sort, then
    merge <= fanout*rerank) — no task ever sorts a probe's whole scored
    corpus — and only survivor ids join back for full vectors. Coarse
    scores are ROUND(·, 6) + 0e0 on BOTH engines (the +0.0 collapses any
    -0.0 from rounding a tiny negative cosine — IEEE -0.0 + 0.0 = +0.0 —
    so the surfaced doubles hash identically).

    At 100 TB the full vectors are read once-narrow for the prefix slice
    (column pruning cannot split an array, but the slice happens at scan
    time in the same projection) and shuffled never: probes broadcast,
    survivors (KBs) broadcast back.

    Output: (probe_id, neighbor_id, ccos, cos, rank) — rank 1..k by
    (cos DESC, neighbor_id ASC).
    """
    assert 1 <= d_pre <= dim
    corpus = emb.select(
        F.col(id_col),
        F.slice(F.col(vec_col), 1, d_pre).alias("pv"),
    )
    probes = emb.filter(F.col(id_col).isin(probe_ids)).select(
        F.col(id_col).alias("probe_id"),
        F.slice(F.col(vec_col), 1, d_pre).alias("ppv"),
        F.col(vec_col).alias("pfull"),
    )
    scored = (
        corpus.alias("c")
        .join(
            F.broadcast(probes.select("probe_id", "ppv")),
            F.col("probe_id") != F.col(f"c.{id_col}"),
        )
        .select(
            "probe_id",
            F.col(f"c.{id_col}").alias("neighbor_id"),
            (F.round(cosine(F.col("ppv"), F.col("pv")), 6) + F.lit(0.0)).alias(
                "ccos"
            ),
        )
    )
    # descending struct sort: (ccos DESC, id ASC) == (ccos, -id) sorted DESC
    item = F.struct(
        F.col("ccos").alias("ccos"),
        (-F.col("neighbor_id")).alias("nid"),
        F.col("neighbor_id").alias("neighbor_id"),
    )
    topm = lambda c: F.slice(  # noqa: E731
        F.sort_array(F.collect_list(c), asc=False), 1, rerank
    )
    lvl1 = scored.groupBy(
        "probe_id", F.pmod(F.hash("neighbor_id"), F.lit(fanout)).alias("b")
    ).agg(topm(item).alias("top"))
    survivors = (
        lvl1.select("probe_id", F.explode("top").alias("t"))
        .groupBy("probe_id")
        .agg(topm(F.col("t")).alias("top"))
        .select("probe_id", F.explode("top").alias("t"))
        .select(
            "probe_id",
            F.col("t.neighbor_id").alias("neighbor_id"),
            F.col("t.ccos").alias("ccos"),
        )
    )
    reranked = (
        emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
        .join(F.broadcast(survivors), "neighbor_id")
        .join(F.broadcast(probes.select("probe_id", "pfull")), "probe_id")
        .select(
            "probe_id",
            "neighbor_id",
            "ccos",
            (F.round(cosine(F.col("pfull"), F.col("nv")), 6) + F.lit(0.0)).alias(
                "cos"
            ),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        reranked.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "ccos", "cos", "rank")
    )


def embedding_dim_profile(
    emb: DataFrame,
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-dimension embedding-corpus profile — the embedding-health
    dashboard (dead dims, dominant dims, range drift after a re-embed)
    an ANN index build checks before trusting a new encoder drop:
    min/max/mean and variance per coordinate.

    FIXED-POINT: values become micro-units by TRUNCATION toward zero
    (Spark ``CAST(v·10⁶ AS LONG)`` == DuckDB ``CAST(TRUNC(v·10⁶) AS
    BIGINT)`` — the fp32→fp64 promotion and the product are identical
    IEEE on both engines, and truncation, unlike ROUND, has one
    cross-engine semantics). The mean uses the min-shift form
    ``(Σv − n·min) DIV n + min`` so the division operand is non-negative
    by construction (Σv alone can be negative — the DIV/`//` floor trap);
    variance is ``GREATEST(Σv² DIV n − mean², 0)`` in micro² units (the
    integer floors can land 1 below zero on a constant dim; the clamp
    restores the mathematical var ≥ 0). int64 bounds: |v_micro| ≤ 10⁶·|v|,
    so Σv² stays inside int64 up to ~10⁷ unit-norm rows per dim — drop
    ``scale`` to 10³ for corpus-scale runs (bounds shift by 10⁶).

    Shape: one posexplode projection (rows × dims), ONE dim-keyed
    aggregate with map-side combine — output is |dims| rows. No joins,
    no windows.
    """
    s = float(int(scale))
    vm = (F.col("v").cast("double") * F.lit(s)).cast("long")
    ex = emb.select(F.posexplode(F.col(vec_col)).alias("dim", "v")).select(
        F.col("dim").cast("int").alias("dim"), vm.alias("vm")
    )
    return (
        ex.groupBy("dim")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("vm").cast("long").alias("sv"),
            F.sum(F.col("vm") * F.col("vm")).cast("long").alias("svv"),
            F.min("vm").cast("long").alias("min_micro"),
            F.max("vm").cast("long").alias("max_micro"),
        )
        .select(
            "dim",
            "n",
            "min_micro",
            "max_micro",
            F.expr("((sv - n * min_micro) DIV greatest(n, 1L)) + min_micro")
            .cast("long")
            .alias("mean_micro"),
            F.expr(
                "greatest(svv DIV greatest(n, 1L) - "
                "(((sv - n * min_micro) DIV greatest(n, 1L)) + min_micro) * "
                "(((sv - n * min_micro) DIV greatest(n, 1L)) + min_micro), 0L)"
            )
            .cast("long")
            .alias("var_micro2"),
        )
    )


def quantize_embedding(vec, scale: int = 64):
    """Integer-quantize an array<float> embedding: each dim becomes
    ``CAST(CAST(x AS DOUBLE) * scale AS LONG)`` — the fp32→fp64 promotion
    is exact, ``scale`` must be a power of two so the product is exact,
    and the final cast TRUNCATES toward zero, which is the one portable
    float→int path (Spark CAST AS LONG == DuckDB CAST(TRUNC(x) AS
    BIGINT); q168 contract).  Quantized distances are then pure BIGINT
    arithmetic — order-independent, bit-identical on both engines."""
    if scale & (scale - 1) != 0 or scale <= 0:
        raise ValueError("scale must be a positive power of two")
    return F.transform(
        vec, lambda x: (x.cast("double") * F.lit(float(scale))).cast("long")
    )


def _qdist(q, center_lits):
    """Exact squared L2 between a quantized array<long> column and a
    Python list of ints (the collected center), as one zip_with fold."""
    lit_arr = F.array(*[F.lit(int(v)).cast("long") for v in center_lits])
    return F.aggregate(
        F.zip_with(q, lit_arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def kcenter_coreset(
    emb: DataFrame,
    k: int = 4,
    scale: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985 farthest-point
    traversal — the classic coverage-guarantee coreset for data
    selection): seed with the smallest id, then repeatedly add the point
    farthest from the chosen set.  The selected centers are the diverse
    subsample; the final max-min distance is the 2-approximation
    coverage radius.

    Exactness: distances are squared L2 over ``quantize_embedding``
    integer vectors — pure BIGINT, so the argmax (tie-break: smallest
    id) is bit-identical on both engines and the whole loop is
    hash-gated, not approximately checked.

    Output: k rows (rank, vec_id, chosen_dist, radius_after) where
    ``chosen_dist`` is the max-min distance that made this point the
    farthest (NULL for the rank-0 seed) and ``radius_after`` is the
    coverage radius once this center joins the set — a monotone
    non-increasing sequence ending at the k-center radius.

    At 100 TB: the quantized projection is localCheckpointed ONCE (the
    hits_fixed lineage contract — k rounds must not re-derive the
    upstream), then each round is one map-side ``least`` update against
    a LITERAL center vector plus one 1-row argmax collect — k driver
    round-trips, zero exchanges beyond the aggregates, candidate set
    never leaves its partitions.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    base = emb.select(
        F.col(id_col).cast("long").alias("vid"),
        quantize_embedding(F.col(vec_col), scale).alias("q"),
    ).localCheckpoint(eager=True)

    seed = base.orderBy("vid").limit(1).collect()[0]
    centers = [(0, int(seed["vid"]), None)]  # (rank, vid, chosen_dist)
    cur = base.select("vid", "q", _qdist(F.col("q"), seed["q"]).alias("md"))

    radius_after = []
    chosen_vecs = None
    for r in range(1, k):
        top = (
            cur.groupBy()
            .agg(
                F.min(
                    F.struct((-F.col("md")).alias("neg"), F.col("vid").alias("vid"))
                ).alias("w")
            )
            .select(
                (-F.col("w.neg")).cast("long").alias("md"), F.col("w.vid").alias("vid")
            )
            .collect()[0]
        )
        radius_after.append(int(top["md"]))
        chosen = base.where(F.col("vid") == int(top["vid"])).collect()[0]
        centers.append((r, int(top["vid"]), int(top["md"])))
        cur = cur.select(
            "vid",
            "q",
            F.least(F.col("md"), _qdist(F.col("q"), chosen["q"])).alias("md"),
        )
    final = cur.groupBy().agg(F.max("md").cast("long").alias("mx")).collect()[0]
    radius_after.append(int(final["mx"]))

    spark = emb.sparkSession
    rows = [
        (int(rank), int(vid), cd if cd is None else int(cd), int(radius_after[rank]))
        for rank, vid, cd in centers
    ]
    return spark.createDataFrame(
        rows, "rank long, vec_id long, chosen_dist long, radius_after long"
    ).orderBy("rank")


def pca_from_stats(n: int, s, gram, k: int = 2):
    """Top-k principal directions from EXACT integer sufficient
    statistics: row count ``n``, dimension-sum vector ``s`` and Gram
    matrix ``gram`` of the integer-quantized embeddings.  The scatter
    matrix ``M = n·G − s·sᵀ`` (n² × covariance) is built from exact
    BIGINTs, so engine and oracle hand the SAME float64 matrix to the
    same eigensolver — determinism by shared inputs + shared function
    (the oracle-literal contract; similarity.pq_codebooks class).

    Sign rule: each eigenvector's largest-|component| entry is made
    positive (argmax of abs, first index on ties) — eigenvectors are
    only defined up to sign and the rule pins one deterministically.

    Returns (components, offsets): ``components[j]`` is the j-th
    direction (descending eigenvalue) as a float list; ``offsets[j]`` =
    ``−(s·v_j)/n`` so a row's centered projection is ``q·v_j +
    offsets[j]``.
    """
    sv = np.asarray(s, dtype=np.int64)
    G = np.asarray(gram, dtype=np.int64).reshape(len(sv), len(sv))
    M = (int(n) * G - np.outer(sv, sv)).astype(np.float64)
    _, vecs = np.linalg.eigh(M)
    comps, offs = [], []
    for j in range(1, k + 1):
        v = vecs[:, -j].copy()
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append([float(x) for x in v])
        offs.append(-float(np.dot(sv.astype(np.float64), v)) / float(n))
    return comps, offs


def pca_project(
    emb: DataFrame,
    k: int = 2,
    scale: int = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact-statistics PCA projection of an embedding column — the
    whitening/2-D-map preprocessing stage of embedding curation
    pipelines (SemDeDup-style cluster maps, drift plots).

    Sufficient statistics are computed DISTRIBUTED and EXACTLY: an
    Arrow-batched mapInPandas pass emits one (count, Σq, Σqqᵀ) partial
    per batch via int64 matmul (quantized values ≤ ``scale``, so a
    10^12-row corpus stays < 2^63 per cell), a posexplode+sum collapses
    the partials to 1+d+d² cells, and ONE driver collect (bounded by the
    DIMENSION, never the corpus — the q124 sketch-bounded class) feeds
    :func:`pca_from_stats`.  The projection is then a map-side
    `_dot`-fold against literal component vectors — bit-identical to the
    oracle's LIST_DOT_PRODUCT, ROUND(·,6)+0.0 guarded (q148).

    Output: (id_col, pc1..pck) ordered by id.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    q = emb.select(
        F.col(id_col).cast("long").alias("vid"),
        quantize_embedding(F.col(vec_col), scale).alias("q"),
    )

    def _partials(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = np.stack(pdf["q"].to_numpy()).astype(np.int64)
            yield pd.DataFrame(
                {
                    "n": [int(Q.shape[0])],
                    "s": [Q.sum(axis=0).tolist()],
                    "g": [(Q.T @ Q).reshape(-1).tolist()],
                }
            )

    part = q.select("q").mapInPandas(
        _partials, "n long, s array<long>, g array<long>"
    )
    cells = (
        part.select(
            F.posexplode(
                F.concat(F.array(F.col("n")), F.col("s"), F.col("g"))
            ).alias("idx", "val")
        )
        .groupBy("idx")
        .agg(F.sum("val").cast("long").alias("v"))
        .collect()
    )
    flat = {r["idx"]: r["v"] for r in cells}
    # solve 1 + d + d² = len(flat) for the dimension
    d = int(round(((4 * (len(flat) - 1) + 1) ** 0.5 - 1) / 2))
    n = flat[0]
    s = [flat[1 + i] for i in range(d)]
    gram = [flat[1 + d + i] for i in range(d * d)]
    comps, offs = pca_from_stats(n, s, gram, k=k)

    qd = F.transform(F.col("q"), lambda x: x.cast("double"))
    cols = [F.col("vid").alias(id_col)]
    for j in range(k):
        vlit = _lit_vec(comps[j])
        pc = F.round(_dot(qd, vlit) + F.lit(float(offs[j])), 6) + F.lit(0.0)
        cols.append(pc.alias(f"pc{j + 1}"))
    return q.select(*cols).orderBy(id_col)


def bitext_margin_mine(
    left: DataFrame,
    right: DataFrame,
    k: int = 4,
    accept: float = 1.05,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fanout: int = 32,
) -> DataFrame:
    """Margin-criterion parallel-pair mining (Artetxe & Schwenk 2019,
    the LASER/CCMatrix rule): a left probe matches its nearest right
    neighbour only when the top cosine clearly beats the local
    neighbourhood — ``margin = cos1 / mean(top-k cos)`` — which kills
    hubness false positives that a bare threshold accepts.

    ``left`` must be a BOUNDED probe panel (an md5-picked or banded
    slice — the q13 broadcast-probe contract); ``right`` is the full
    candidate side, scored map-side against the broadcast panel with the
    exact two-level top-k merge.  cosines are ROUND(·,6) BEFORE ranking
    (the q13 tie discipline, broken by neighbour id), the mean is the
    fixed fold ``(((c1+c2)+c3)+c4)/k``, and margin/accepted are NULL
    when the right side has fewer than k rows.

    Scale shape (the r6 rewrite — results unchanged): the |probes|×|right|
    score matrix never runs through JVM expressions. The probe panel is
    collected (bounded contract) and a ``mapInPandas`` over the candidate
    side computes BLAS-matmul cosines, keeps per-batch per-probe top-k
    shortlists with a 1.5e-6 safety margin (covering the 1e-6 ROUND
    granularity + fp drift, so no rounded-rank contender is ever cut),
    and re-scores ONLY the shortlist with :func:`_seq_fold_dot` — the
    emitted cosines are bit-identical to the ``cosine()`` Column HOF while
    the quadratic bulk rides cache-blocked float64 matmul (measured ~40×
    at 10k probes × 100k candidates; the HOF form was 216 s at that
    shape). Ties beyond k survive because the batch-level cut keeps every
    exact cosine within 1.1e-6 of the k-th — a superset of the rounded
    top-k — and the unchanged two-level struct merge resolves (−cos, id)
    order exactly as before.

    Output: (probe_id, match_id, cos, margin, accepted) ordered by
    probe_id.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    probes = left.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    prows = probes.collect()
    spark = right.sparkSession
    if not prows:
        scored = spark.createDataFrame(
            [], "probe_id long, neighbor_id long, cos double"
        )
    else:
        P = np.array([r["probe_vec"] for r in prows], dtype=np.float64)
        pids = np.array([r["probe_id"] for r in prows], dtype=np.int64)
        ddp = _seq_fold_dot(P, P)  # exact probe self-dots (shared by both phases)
        kk = int(k)
        bc = spark.sparkContext.broadcast((P, pids, ddp))

        def _score(batches):
            Pm, pid_arr, ddp_arr = bc.value
            p = Pm.shape[0]
            # ~32 MB fast-score matrix per chunk regardless of panel size
            chunk = max(16, int(4_000_000 // max(1, p)))
            for pdf in batches:
                m = len(pdf)
                if m == 0:
                    continue
                C = np.array(pdf["_v"].tolist(), dtype=np.float64)
                cid = pdf["_i"].to_numpy(dtype=np.int64)
                ddc = _seq_fold_dot(C, C)
                sel_p, sel_c = [], []
                for s in range(0, m, chunk):
                    Cc = C[s : s + chunk]
                    mc = Cc.shape[0]
                    Sf = (Pm @ Cc.T) / np.sqrt(
                        ddp_arr[:, None] * ddc[None, s : s + chunk]
                    )
                    kc = min(kk, mc)
                    thr = np.partition(Sf, mc - kc, axis=1)[:, mc - kc]
                    pi, ci = np.nonzero(Sf >= thr[:, None] - 1.5e-6)
                    sel_p.append(pi)
                    sel_c.append(ci + s)
                pi = np.concatenate(sel_p)
                ci = np.concatenate(sel_c)
                # exact sequential-fold re-score of the shortlist only
                cos = _seq_fold_dot(Pm[pi], C[ci]) / np.sqrt(ddp_arr[pi] * ddc[ci])
                # batch-level cut: keep every exact cosine within 1.1e-6 of
                # the probe's k-th largest (superset of the ROUND(·,6) top-k)
                order = np.lexsort((cos, pi))
                spi = pi[order]
                starts = np.flatnonzero(np.r_[True, spi[1:] != spi[:-1]])
                ends = np.r_[starts[1:], spi.size]
                lens = ends - starts
                thr_b = cos[order][ends - np.minimum(kk, lens)]
                keep_sorted = cos[order] >= (
                    np.repeat(thr_b, lens) - 1.1e-6
                )
                keep = np.zeros(pi.size, dtype=bool)
                keep[order] = keep_sorted
                yield pd.DataFrame(
                    {
                        "probe_id": pid_arr[pi[keep]],
                        "neighbor_id": cid[ci[keep]],
                        "cos": cos[keep],
                    }
                )

        n_slices = max(
            spark.sparkContext.defaultParallelism, right.rdd.getNumPartitions()
        )
        scored = (
            right.select(
                F.col(id_col).cast("long").alias("_i"), F.col(vec_col).alias("_v")
            )
            .repartition(n_slices)
            .mapInPandas(_score, "probe_id long, neighbor_id long, cos double")
        )
    scored = scored.select(
        "probe_id", "neighbor_id", F.round(F.col("cos"), 6).alias("cos")
    )
    item = F.struct(
        (-F.col("cos")).alias("nc"),
        F.col("neighbor_id").alias("neighbor_id"),
        F.col("cos").alias("cos"),
    )
    topk = lambda c: F.slice(F.sort_array(F.collect_list(c)), 1, k)
    lvl1 = scored.groupBy(
        "probe_id", F.pmod(F.hash("neighbor_id"), F.lit(fanout)).alias("b")
    ).agg(topk(item).alias("top"))
    merged = (
        lvl1.select("probe_id", F.explode("top").alias("t"))
        .groupBy("probe_id")
        .agg(topk(F.col("t")).alias("top"))
    )
    csum = "0.0D"
    for j in range(1, k + 1):
        csum = f"({csum} + top[{j - 1}].cos)"
    margin = F.expr(
        f"CASE WHEN size(top) = {k} THEN "
        f"round(top[0].cos / ({csum} / CAST({k} AS DOUBLE)), 6) + 0.0D END"
    )
    return merged.select(
        "probe_id",
        F.expr("top[0].neighbor_id").cast("long").alias("match_id"),
        F.expr("top[0].cos + 0.0D").alias("cos"),
        margin.alias("margin"),
        (margin >= F.lit(float(accept))).alias("accepted"),
    ).orderBy("probe_id")


def isotropy_audit(
    embs: DataFrame,
    vec_col: str = "embedding",
    scale: int = 64,
) -> DataFrame:
    """Embedding isotropy audit — the exact mean pairwise dot product of
    the whole corpus WITHOUT materializing a single pair, via the
    sum-vector identity ``Σ_{i≠j} qᵢ·qⱼ = ‖Σq‖² − Σ‖q‖²``.

    Anisotropic embedding spaces (Ethayarajh 2019) squeeze cosines into
    a narrow cone, which silently recalibrates every SemDeDup/D4/ANN
    threshold — so before trusting a τ, measure the cone:
    ``anisotropy = avg_pair_dot / avg_self_dot`` (≈0 for an isotropic
    cloud, →1 as vectors collapse onto one direction).

    Exactness: vectors ride :func:`quantize_embedding` (q168 portable
    truncation), so the per-dim sums, ‖Σq‖², and Σ‖q‖² are exact
    BIGINTs on both engines; the three surfaced doubles are divisions of
    those integers in a fixed op order, rounded once (±0.0-guarded).
    Overflow: per-dim ``s² ≤ (n·scale)²`` caps n at ~4.7e7 rows at
    scale=64 — past that, run over the standard md5 fixed-rate audit
    panel (the q201 class; the statistic is a mean, panels suffice).

    Scale shape: one ×dim posexplode fanning a map-side-combined
    aggregate to |dim| grid rows, then a 1-row rollup — the corpus is
    read once and nothing but the grid ever shuffles. Output: ONE row
    (n, dim, self_dot_sum, pair_dot_sum, avg_self_dot, avg_pair_dot,
    anisotropy).
    """
    return isotropy_from_grid(isotropy_grid(embs, vec_col, scale))


def isotropy_grid(
    embs: DataFrame, vec_col: str = "embedding", scale: int = 64
) -> DataFrame:
    """The per-dim (dim, s, ssq, cnt) sufficient-statistic grid of
    :func:`isotropy_audit` — ALGEBRAIC (every column adds across
    shards/batches), so it doubles as the streaming twin's partial
    (``streaming/drift.stream_isotropy``)."""
    q = embs.select(quantize_embedding(F.col(vec_col), scale).alias("q"))
    return (
        q.select(F.posexplode("q").alias("dim", "v"))
        .groupBy("dim")
        .agg(
            F.sum("v").cast("long").alias("s"),
            F.sum(F.col("v") * F.col("v")).cast("long").alias("ssq"),
            F.count(F.lit(1)).cast("long").alias("cnt"),
        )
    )


def isotropy_from_grid(per_dim: DataFrame) -> DataFrame:
    """The grid→statistic stage of :func:`isotropy_audit`, SHARED with
    the streaming twin: identical rollup + fixed-order divisions over a
    batch-built or incrementally merged grid — stream == batch
    row-for-row."""
    row = per_dim.agg(
        F.max("cnt").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("dim"),
        F.sum("ssq").cast("long").alias("self_dot_sum"),
        F.sum(F.col("s") * F.col("s")).cast("long").alias("s2"),
    )
    pair_num = (F.col("s2") - F.col("self_dot_sum")).cast("long")
    avg_self = F.col("self_dot_sum").cast("double") / F.col("n").cast("double")
    avg_pair = pair_num.cast("double") / (
        (F.col("n") * (F.col("n") - F.lit(1))).cast("double")
    )
    return row.select(
        "n",
        "dim",
        "self_dot_sum",
        pair_num.alias("pair_dot_sum"),
        (F.round(avg_self, 6) + F.lit(0.0)).alias("avg_self_dot"),
        F.when(F.col("n") >= 2, F.round(avg_pair, 6) + F.lit(0.0)).alias(
            "avg_pair_dot"
        ),
        F.when(
            (F.col("n") >= 2) & (F.col("self_dot_sum") > 0),
            F.round(avg_pair / avg_self, 6) + F.lit(0.0),
        ).alias("anisotropy"),
    )


def mmr_rerank(
    emb: DataFrame,
    probe_ids: list,
    k: int = 8,
    lambda_micro: int = 700000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance diversification (Carbonell & Goldstein
    1998) over each probe's exact top-k candidates — the re-rank that
    keeps a retrieval-training batch from being k near-copies of the
    same neighbourhood: greedily pick 3 of the k candidates maximizing
    ``lambda*relevance - (1-lambda)*max_sim_to_already_selected``.

    INTEGER-exact selection: relevance and pairwise-candidate cosines
    round to 6 dp (the bit-identical q13 cosine) then truncate to micro
    longs (CAST toward zero == DuckDB TRUNC — the q168 portable path;
    scores may go negative but are only COMPARED, never divided), so
    each greedy argmax is a (-score, id) min-struct with deterministic
    ties.  The three rounds are UNROLLED — the m=3 fixed depth is the
    scale contract (each round is one grid-bounded aggregate).

    Scale shape: candidate generation is cosine_topk_bruteforce's
    two-level merge (the only corpus-sized stage); everything after
    runs on the |probes|*k candidate panel — the k^2 pairwise-cosine
    self-join and the per-round argmax aggregates are panel-bounded,
    with |probes|-row selection tables broadcast back.

    Output: (probe_id, round, neighbor_id, rel_micro, score_micro)
    ordered by (probe_id, round); round 1's score is lambda*rel
    (nothing selected yet, penalty 0).
    """
    lam = int(lambda_micro)
    com = 1_000_000 - lam
    cands = cosine_topk_bruteforce(emb, probe_ids, k, id_col, vec_col)
    rel = cands.select(
        "probe_id",
        "neighbor_id",
        (F.col("cos") * F.lit(1000000).cast("double"))
        .cast("long")
        .alias("rel"),
    )
    cv = rel.join(
        emb.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")
        ),
        "neighbor_id",
    )
    a = cv.select(
        "probe_id", F.col("neighbor_id").alias("ia"), F.col("nv").alias("va")
    )
    b = cv.select(
        "probe_id", F.col("neighbor_id").alias("ib"), F.col("nv").alias("vb")
    )
    pw = (
        a.join(b, "probe_id")
        .where(F.col("ia") != F.col("ib"))
        .select(
            "probe_id",
            "ia",
            "ib",
            (
                F.round(cosine(F.col("va"), F.col("vb")), 6)
                * F.lit(1000000).cast("double")
            )
            .cast("long")
            .alias("sim"),
        )
    )

    def argmax(df, score_col):
        w = F.min(
            F.struct(
                (-F.col(score_col)).alias("ns"),
                F.col("neighbor_id").alias("id"),
                F.col("rel").alias("rel"),
                F.col(score_col).alias("sc"),
            )
        ).alias("w")
        return df.groupBy("probe_id").agg(w)

    s1 = argmax(rel.withColumn("score", F.lit(lam) * F.col("rel")), "score").select(
        "probe_id",
        F.col("w.id").alias("sel1"),
        F.col("w.rel").alias("rel1"),
        F.col("w.sc").alias("score1"),
    )
    sc2 = (
        rel.alias("r")
        .join(F.broadcast(s1), "probe_id")
        .where(F.col("neighbor_id") != F.col("sel1"))
        .join(
            pw.select(
                F.col("probe_id").alias("pp"),
                F.col("ia").alias("pa"),
                F.col("ib").alias("pb"),
                "sim",
            ),
            (F.col("pp") == F.col("probe_id"))
            & (F.col("pa") == F.col("neighbor_id"))
            & (F.col("pb") == F.col("sel1")),
        )
        .select(
            "probe_id",
            "neighbor_id",
            "rel",
            (F.lit(lam) * F.col("rel") - F.lit(com) * F.col("sim")).alias(
                "score"
            ),
        )
    )
    s2 = argmax(sc2, "score").select(
        "probe_id",
        F.col("w.id").alias("sel2"),
        F.col("w.rel").alias("rel2"),
        F.col("w.sc").alias("score2"),
    )
    sc3 = (
        rel.join(F.broadcast(s1.select("probe_id", "sel1")), "probe_id")
        .join(F.broadcast(s2.select("probe_id", "sel2")), "probe_id")
        .where(
            (F.col("neighbor_id") != F.col("sel1"))
            & (F.col("neighbor_id") != F.col("sel2"))
        )
        .join(
            pw.select(
                F.col("probe_id").alias("pp1"),
                F.col("ia").alias("pa1"),
                F.col("ib").alias("pb1"),
                F.col("sim").alias("sim1"),
            ),
            (F.col("pp1") == F.col("probe_id"))
            & (F.col("pa1") == F.col("neighbor_id"))
            & (F.col("pb1") == F.col("sel1")),
        )
        .join(
            pw.select(
                F.col("probe_id").alias("pp2"),
                F.col("ia").alias("pa2"),
                F.col("ib").alias("pb2"),
                F.col("sim").alias("sim2"),
            ),
            (F.col("pp2") == F.col("probe_id"))
            & (F.col("pa2") == F.col("neighbor_id"))
            & (F.col("pb2") == F.col("sel2")),
        )
        .select(
            "probe_id",
            "neighbor_id",
            "rel",
            (
                F.lit(lam) * F.col("rel")
                - F.lit(com) * F.greatest(F.col("sim1"), F.col("sim2"))
            ).alias("score"),
        )
    )
    s3 = argmax(sc3, "score").select(
        "probe_id",
        F.col("w.id").alias("sel3"),
        F.col("w.rel").alias("rel3"),
        F.col("w.sc").alias("score3"),
    )
    rounds = [
        s1.select(
            "probe_id",
            F.lit(1).cast("int").alias("round"),
            F.col("sel1").alias("neighbor_id"),
            F.col("rel1").cast("long").alias("rel_micro"),
            F.col("score1").cast("long").alias("score_micro"),
        ),
        s2.select(
            "probe_id",
            F.lit(2).cast("int").alias("round"),
            F.col("sel2").alias("neighbor_id"),
            F.col("rel2").cast("long").alias("rel_micro"),
            F.col("score2").cast("long").alias("score_micro"),
        ),
        s3.select(
            "probe_id",
            F.lit(3).cast("int").alias("round"),
            F.col("sel3").alias("neighbor_id"),
            F.col("rel3").cast("long").alias("rel_micro"),
            F.col("score3").cast("long").alias("score_micro"),
        ),
    ]
    out = rounds[0]
    for r in rounds[1:]:
        out = out.unionByName(r)
    return out.orderBy("probe_id", "round")


def centroid_drift_grid(
    embs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 64,
    tag: str = "cd",
) -> DataFrame:
    """The (half, dim, s, cnt) sufficient-statistic grid of
    :func:`centroid_drift`: rows split into two halves by the
    deterministic md5-mod pick (tag ``cd`` — registry entry), embeddings
    integer-quantized (q168 TRUNC contract), one ×dim posexplode and one
    hash aggregate.  ALGEBRAIC (every column adds across shards /
    micro-batches), so it doubles as the streaming twin's partial
    (``streaming/drift.stream_centroid_drift``)."""
    from .augment import _md5_mod

    q = embs.select(
        _md5_mod(F.col(id_col), tag, F.lit(2)).cast("long").alias("half"),
        quantize_embedding(F.col(vec_col), scale).alias("q"),
    )
    return (
        q.select("half", F.posexplode("q").alias("dim", "v"))
        .groupBy("half", "dim")
        .agg(
            F.sum("v").cast("long").alias("s"),
            F.count(F.lit(1)).cast("long").alias("cnt"),
        )
    )


def centroid_drift_from_grid(grid: DataFrame, scale: int = 64) -> DataFrame:
    """The grid→panel stage of :func:`centroid_drift`, SHARED with the
    streaming twin (the isotropy_from_grid contract): pivot the two
    halves onto one row per dim, then min-shift integer means —
    quantized dims live in [-scale, scale], so ``s + scale·cnt`` is
    non-negative by construction and ``mean_micro = (s + scale·c)·10^6
    DIV c − scale·10^6`` keeps every division DIV-safe (the
    mw_domain_weights rule).  Drift is the difference of the two
    already-truncated micro means — deterministic on both engines.

    Overflow: |s + scale·c| <= 2·scale·n; the 10^6 scale caps n at
    ~7e10 rows per half at scale=64.

    Output: (dim, c0, c1, mean0_micro, mean1_micro, drift_micro,
    abs_drift_micro) ordered by dim — a |dim|-row panel."""
    sc = int(scale)
    piv = grid.groupBy("dim").agg(
        F.sum(F.when(F.col("half") == 0, F.col("s")).otherwise(0))
        .cast("long")
        .alias("s0"),
        F.sum(F.when(F.col("half") == 0, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("c0"),
        F.sum(F.when(F.col("half") == 1, F.col("s")).otherwise(0))
        .cast("long")
        .alias("s1"),
        F.sum(F.when(F.col("half") == 1, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("c1"),
    )
    m0 = (
        f"((s0 + {sc}L * c0) * 1000000L) DIV greatest(c0, 1L)"
        f" - {sc * 1_000_000}L"
    )
    m1 = (
        f"((s1 + {sc}L * c1) * 1000000L) DIV greatest(c1, 1L)"
        f" - {sc * 1_000_000}L"
    )
    return (
        piv.select(
            F.col("dim").cast("long").alias("dim"),
            "c0",
            "c1",
            F.expr(m0).cast("long").alias("mean0_micro"),
            F.expr(m1).cast("long").alias("mean1_micro"),
        )
        .select(
            "dim",
            "c0",
            "c1",
            "mean0_micro",
            "mean1_micro",
            (F.col("mean0_micro") - F.col("mean1_micro"))
            .cast("long")
            .alias("drift_micro"),
            F.abs(F.col("mean0_micro") - F.col("mean1_micro"))
            .cast("long")
            .alias("abs_drift_micro"),
        )
        .orderBy("dim")
    )


def centroid_drift(
    embs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 64,
    tag: str = "cd",
) -> DataFrame:
    """Per-dimension embedding centroid drift between two deterministic
    halves of a corpus — the embedding-space distribution monitor that
    complements the isotropy audit (q215: global shape) and KS drift
    (q202: scalar metrics): did the new crawl shift the embedding
    centroid, and along which dimensions?

    Pure composition: ``centroid_drift_from_grid(centroid_drift_grid(…))``
    — the grid is the only corpus-sized aggregate (map-side combined),
    the panel is |dim| rows, and the grid's algebraic columns power the
    streaming twin unchanged.
    """
    return centroid_drift_from_grid(
        centroid_drift_grid(embs, id_col, vec_col, scale, tag), scale
    )


def silhouette_audit(
    embs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 64,
    n_centroids: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Simplified-silhouette cluster-quality audit over the shared k-means
    cells — pair-free and exact: for every point, the mean SQUARED L2
    distance to each cluster's members comes from the three per-cluster
    sufficient statistics ``(n_c, Σq_c, Σ‖q‖²_c)`` via

        Σ_{j∈c} ‖q_i − q_j‖² = n_c·‖q_i‖² + Σ‖q‖²_c − 2·q_i·Σq_c

    (the q215 isotropy identity, per cluster) — exact BIGINT over
    q168-quantized vectors, never a pairwise join. ``a(i)`` is the
    own-cluster mean over the OTHER members (the self term contributes 0,
    so the denominator is ``n_own − 1``); ``b(i)`` is the minimum over
    foreign clusters of ``D(i,c)/n_c`` selected by the bit-identical
    double key (ties → smaller cell id, np.argmin first-occurrence ==
    the oracle's ROW_NUMBER (key, cell) order); the silhouette
    ``s = (b − a) / max(a, b)`` is ONE fixed-order double expression over
    exact integers (the q241/q243 Pearson-class contract) truncated to
    micro units (q168 portable path) so per-cluster SUMS are order-free
    BIGINTs. Singleton clusters and max(a,b)=0 take s=0 by convention
    (documented deviation from undefined; both engines share the CASE).

    Clustering: the SAME deterministic seeded-sample k-means +
    Arrow-vectorized assignment every SemDeDup-family operator uses
    (:func:`_kmeans_cells`, k from :func:`scaled_n_centroids`) — the
    oracle builder re-derives identical centroids and replays assignment
    with centroid literals (q17 class).

    Scale shape: one ×dim posexplode feeding a map-side-combined
    (cell, dim) grid (k·d rows — bounded by 256·dim), ONE bounded collect
    of that grid (the centroid-panel class), then a single mapInPandas
    pass computing all k distances per batch by int64 matmul (the q207
    PCA technique) and a final k-row aggregate. Nothing pairwise, nothing
    corpus-sized shuffles twice. Overflow: ``D·n ≤ (2n·dim·scale²)·n``
    caps n at ~2e5 rows at dim 64 / scale 64 for the exact-BIGINT double
    keys' integer inputs; past that drop scale to 16 or audit the md5
    fixed-rate panel (q201 class — silhouette is a mean-shaped statistic,
    panels suffice).

    Output: one row per cell — (cell, n_points, n_positive, sum_s_micro).
    """
    from pyspark.sql import types as T

    n = embs.count()
    if n == 0:
        # empty embeddings input: an empty audit grid with the declared
        # schema instead of an opaque crash in the k-means sample
        # (r5 ADVICE)
        return embs.sparkSession.createDataFrame(
            [],
            "cell long, n_points long, n_positive long, sum_s_micro long",
        )
    k = n_centroids if n_centroids is not None else scaled_n_centroids(n)
    # checkpoint=True (r6 revision): the grid-collect jobs and the per-cell
    # matmul pass each re-ran the Arrow assignment (three evaluations
    # measured in the stage profile) — silhouette is NOT single-branch
    cents, assigned = _kmeans_cells(
        embs, k, scaled_sample_rows(k), seed, id_col, vec_col
    )
    aq = assigned.select(
        F.col(id_col),
        F.col("cell"),
        quantize_embedding(F.col(vec_col), scale).alias("q"),
    )
    # per-cluster sufficient statistics: (cell, dim) sums + (cell) n, Σ‖q‖²
    g = (
        aq.select("cell", F.posexplode("q").alias("dim", "v"))
        .groupBy("cell", "dim")
        .agg(F.sum("v").alias("s"), F.sum(F.col("v") * F.col("v")).alias("ssq"))
    )
    rows = g.collect()  # bounded: k·dim cells (the centroid-panel class)
    if not rows:
        # empty embeddings input: return an empty grid with the declared
        # schema instead of an opaque max()-of-empty crash (r5 ADVICE)
        return embs.sparkSession.createDataFrame(
            [],
            "cell long, n_points long, n_positive long, sum_s_micro long",
        )
    dim = 1 + max(r["dim"] for r in rows)
    kk = len(cents)
    sq = np.zeros((kk, dim), dtype=np.int64)
    s2 = np.zeros(kk, dtype=np.int64)
    for r in rows:
        sq[r["cell"], r["dim"]] = r["s"]
        s2[r["cell"]] += r["ssq"]
    nc = np.zeros(kk, dtype=np.int64)
    for r in aq.groupBy("cell").count().collect():
        nc[r["cell"]] = r["count"]

    schema = T.StructType(
        [
            T.StructField("cell", T.IntegerType()),
            T.StructField("s_micro", T.LongType()),
            T.StructField("positive", T.BooleanType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.array(pdf["q"].tolist(), dtype=np.int64)
            own = pdf["cell"].to_numpy().astype(np.int64)
            p2 = (Q * Q).sum(axis=1)
            dots = Q @ sq.T  # exact int64: |q|≤scale, |Σq|≤n·scale
            D = nc[None, :] * p2[:, None] + s2[None, :] - 2 * dots
            # empty cells (k-means cell with no members) never appear in
            # the oracle's (cell, dim) grid — exclude them here too
            # instead of dividing by zero
            safe_nc = np.maximum(nc, 1)
            key = D.astype(np.float64) / safe_nc[None, :].astype(np.float64)
            key[:, nc == 0] = np.inf
            n_own = nc[own]
            a = np.where(
                n_own > 1,
                D[np.arange(len(own)), own].astype(np.float64)
                / np.maximum(n_own - 1, 1).astype(np.float64),
                0.0,
            )
            masked = key.copy()
            masked[np.arange(len(own)), own] = np.inf
            b = masked.min(axis=1)  # np.min ties keep value; selection by
            # value only — identical doubles on both engines
            mx = np.maximum(a, b)
            ok = (n_own > 1) & (mx > 0.0) & np.isfinite(b)
            with np.errstate(invalid="ignore", divide="ignore"):
                s = np.where(ok, (b - a) / np.where(ok, mx, 1.0), 0.0)
            s_micro = np.trunc(s * 1.0e6).astype(np.int64)
            yield pd.DataFrame(
                {"cell": own.astype(np.int32), "s_micro": s_micro,
                 "positive": ok & (s > 0.0)}
            )

    per_point = aq.mapInPandas(gen, schema)
    return (
        per_point.groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.sum(F.when(F.col("positive"), 1).otherwise(0)).cast("long").alias("n_positive"),
            F.sum("s_micro").cast("long").alias("sum_s_micro"),
        )
        .orderBy("cell")
        .select(F.col("cell").cast("long").alias("cell"), "n_points",
                "n_positive", "sum_s_micro")
    )
