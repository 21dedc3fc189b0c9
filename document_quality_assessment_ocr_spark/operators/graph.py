"""Iterative graph analytics over document-relation edges (near-duplicate
graphs, citation/link graphs) — PageRank in FIXED-POINT integer arithmetic.

Floating-point PageRank cannot pass a bit-exact cross-engine gate: the
per-node contribution sum is order-dependent in IEEE. Ranks here are
integers in units of 1/SCALE (default nano-ranks): contributions use
integer division, damping is (85·x) DIV 100 — every operation is exact and
associative, so Spark and the DuckDB oracle agree to the last bit, and the
result is stable across retries/partitionings (determinism is a
checkpoint-resume requirement, not a nicety).

Scale shape: each iteration is one join (edges ⋈ ranks, co-partitioned on
src) + one hash aggregate on dst + a left join back to the node table —
the standard Pregel-as-dataframes step. The iteration count is fixed and
small (driver loop, no convergence collect); lineage is truncated per
iteration only by Spark's AQE plan reuse — for production-scale counts
checkpoint every ~5 iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000


def pagerank_fixed(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 3,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """Fixed-point PageRank. ``nodes``: one row per vertex (``id_col``);
    ``edges``: directed (src, dst). Dangling mass is dropped (simplified
    variant) identically on both engines. Output: (id_col, pr) with pr in
    1/SCALE units, BIGINT."""
    deg = edges.groupBy(src_col).agg(F.count(F.lit(1)).alias("outdeg"))
    base = (SCALE * (damp_den - damp_num)) // damp_den
    r = nodes.select(F.col(id_col), F.lit(SCALE).cast("long").alias("pr"))
    for _ in range(iters):
        contrib = (
            edges.join(r, edges[src_col] == r[id_col])
            .join(deg, src_col)
            .select(
                F.col(dst_col).alias(id_col),
                F.expr("pr DIV outdeg").alias("c"),
            )
        )
        sums = contrib.groupBy(id_col).agg(F.sum("c").alias("m"))
        r = nodes.join(sums, id_col, "left").select(
            F.col(id_col),
            (
                F.lit(base).cast("long")
                + F.expr(f"({damp_num} * coalesce(m, 0)) DIV {damp_den}")
            ).alias("pr"),
        )
    return r


BT_SCALE = 1_000_000  # strengths in micro-units
BT_NUM = 1_000_000_000_000  # 10^12 fixed-point numerator (fits BIGINT)


def bt_strength(
    pairs: DataFrame,
    iters: int = 3,
    winner_col: str = "winner_id",
    loser_col: str = "loser_id",
) -> DataFrame:
    """Bradley–Terry preference-strength fitting by the MM algorithm
    (Hunter 2004, "MM algorithms for generalized Bradley-Terry models"):
    given (winner, loser) comparison rows — DPO/RLHF preference pairs,
    LLM-judge A/B verdicts, annotator battles — fit per-item strengths
    s_i with the update  s_i ← W_i / Σ_j n_ij/(s_i+s_j)  over the items
    each i was compared against.

    FIXED-POINT, like :func:`pagerank_fixed` and for the same reason:
    the denominator sum is order-dependent in IEEE floats, so bit-exact
    cross-engine/retry determinism requires integers. Strengths are
    micro-units (s₀ = BT_SCALE); each term is ``(n_ij·BT_NUM) DIV
    (s_i+s_j)`` and the update is ``(W_i·BT_NUM) DIV max(D_i, 1)`` —
    magnitudes stay ≤ ~10^13, far inside BIGINT. Items that never won
    fix at 0 strength after round one (the MM fixpoint for W_i = 0);
    iteration count is fixed and small — no convergence collect. The
    unnormalized update is used (BT strengths are scale-free).

    Scale shape: comparisons collapse ONCE into an unordered-pair edge
    table (n_ij) and a per-item win table (W_i) — two hash aggregates
    over the pair stream; each round is then one broadcast-or-shuffle
    join of edges against the (item-cardinality, tiny) strength table +
    one hash aggregate back to items. Cost per round is O(edges), not
    O(comparisons).

    Output: (item_id, n_wins, n_games, strength_micro) — BIGINTs.
    """
    w = F.col(winner_col).cast("long")
    l = F.col(loser_col).cast("long")
    lo, hi = F.least(w, l), F.greatest(w, l)
    edges = (
        pairs.select(lo.alias("i"), hi.alias("j"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ij"))
    )
    wins = pairs.select(w.alias("item_id")).groupBy("item_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_wins")
    )
    items = (
        pairs.select(w.alias("item_id"))
        .union(pairs.select(l.alias("item_id")))
        .groupBy("item_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_games"))
        .join(wins, "item_id", "left")
        .select(
            "item_id",
            F.coalesce("n_wins", F.lit(0)).cast("long").alias("n_wins"),
            "n_games",
        )
    )
    # Lineage truncation (the q31 CC-loop invariant): edges/items are
    # item/pair-cardinality — tiny next to the comparison stream — so an
    # eager localCheckpoint materializes them ONCE; without it every MM
    # round re-derives the full upstream pair synthesis and the plan
    # grows O(iters) deep (19 exchanges at iters=3, measured in PLANS.md
    # before this cut).
    items = items.localCheckpoint(eager=True)
    directed = (
        edges.select(F.col("i").alias("a"), F.col("j").alias("b"), "n_ij")
        .union(
            edges.select(F.col("j").alias("a"), F.col("i").alias("b"), "n_ij")
        )
        .localCheckpoint(eager=True)
    )
    s = items.select("item_id", F.lit(BT_SCALE).cast("long").alias("s"))
    for _ in range(int(iters)):
        si = s.select(F.col("item_id").alias("a"), F.col("s").alias("sa"))
        sj = s.select(F.col("item_id").alias("b"), F.col("s").alias("sb"))
        d = (
            directed.join(si, "a")
            .join(sj, "b")
            .select(
                F.col("a").alias("item_id"),
                F.expr(f"(n_ij * {BT_NUM}L) DIV greatest(sa + sb, 1L)").alias(
                    "t"
                ),
            )
            .groupBy("item_id")
            .agg(F.sum("t").cast("long").alias("d"))
        )
        s = (
            items.join(d, "item_id", "left")
            .select(
                "item_id",
                F.expr(
                    f"(n_wins * {BT_NUM}L) DIV greatest(coalesce(d, 0L), 1L)"
                ).alias("s"),
            )
            .localCheckpoint(eager=True)
        )
    return items.join(s, "item_id").select(
        "item_id", "n_wins", "n_games", F.col("s").alias("strength_micro")
    )


HITS_SCALE = 1_000_000  # hub/auth scores in micro-units


def hits_fixed(
    edges: DataFrame,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999, "Authoritative sources
    in a hyperlinked environment") in FIXED-POINT integer arithmetic —
    the companion signal to :func:`pagerank_fixed` for link-graph
    quality weighting: a page's hub score measures how well it points at
    authorities, its authority score how well hubs point at it.

    Per round, in classic order: ``a_j = sum over i->j of h_i`` then
    ``h_i = sum over i->j of NEW a_j``, with each side MAX-normalized to
    HITS_SCALE micro-units after its update (``(x*SCALE) DIV max`` —
    classic HITS L2-normalizes, but a square root has no exact integer
    form, and max-normalization preserves the ranking fixpoint while
    keeping every op associative/exact for the bit-identical cross-engine
    gate; the deviation is documented here like kernels.py's). Edge
    multiplicity counts as weight (same convention as the q131 PageRank
    edges). Integer magnitudes: post-normalization scores are <= SCALE,
    so a raw sum is <= degree*SCALE — with micro-units that's inside
    BIGINT for any degree < 2^43.

    Scale shape: the raw edge stream collapses ONCE to weighted unique
    edges (n_ij·h is exactly the duplicate-edge sum in integers, so the
    collapse is a free algebraic rewrite — the q143 BT discipline), and
    that collapsed table is eagerly ``localCheckpoint``-ed so no round
    re-derives the upstream edge synthesis. Each round is then two
    (edges >< scores) equi-joins + two hash aggregates + two 1-row max
    aggregates broadcast back — O(unique edges) per round, a fixed small
    round count, no convergence collect; per-round ``localCheckpoint``
    truncates the iteration lineage (the q31/q143 discipline). Nodes
    that never receive mass surface 0.

    Output: (id, hub_micro, auth_micro) — BIGINTs.
    """
    if int(iters) < 1:
        raise ValueError("iters must be >= 1 (authority needs one pass)")
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    h = nodes.select("id", F.lit(HITS_SCALE).cast("long").alias("h"))
    a = None
    for _ in range(int(iters)):
        ar = (
            e.join(h.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("w") * F.col("h")).cast("long").alias("raw"))
        )
        amax = ar.agg(F.max("raw").alias("mx"))
        a = ar.crossJoin(F.broadcast(amax)).select(
            F.col("dst").alias("id"),
            F.expr(f"(raw * {HITS_SCALE}L) DIV greatest(mx, 1L)").alias("a"),
        ).localCheckpoint(eager=True)
        hr = (
            e.join(a.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.sum(F.col("w") * F.col("a")).cast("long").alias("raw"))
        )
        hmax = hr.agg(F.max("raw").alias("mx"))
        h = hr.crossJoin(F.broadcast(hmax)).select(
            F.col("src").alias("id"),
            F.expr(f"(raw * {HITS_SCALE}L) DIV greatest(mx, 1L)").alias("h"),
        ).localCheckpoint(eager=True)
    return (
        nodes.join(h, "id", "left")
        .join(a, "id", "left")
        .select(
            "id",
            F.coalesce("h", F.lit(0)).cast("long").alias("hub_micro"),
            F.coalesce("a", F.lit(0)).cast("long").alias("auth_micro"),
        )
    )


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle counts via DEGREE ORIENTATION (the node-iterator
    of Schank & Wagner 2005 / Suri & Vassilvitskii 2011's MapReduce
    variant) — the local clustering signal link-graph curation uses to
    separate organically-linked hosts from link-farm cliques (farms are
    triangle-dense for their degree).

    Edges are undirected-ized (LEAST/GREATEST canonical form, direction
    and multiplicity dropped), then every edge is ORIENTED from its
    lower-(degree, id) endpoint to the higher one. Each wedge (a→b, a→c,
    key(b) < key(c)) is checked against the oriented edge set for the
    closing edge b→c. Orientation bounds per-node wedge fan-out by
    O(sqrt(m)) regardless of raw degree — the hub that breaks the naive
    node-iterator (a 10⁶-degree host would emit 10¹² wedges) emits none
    here, because hubs are wedge TARGETS, never wedge centers.

    The (degree, id) order travels as a zero-padded sortable string key
    (``LPAD(degree, 20, '0') || '|' || id`` — identical lexicographic
    semantics cross-engine for non-negative degrees), so the wedge
    inequality and the closing-edge equi-join use ONE key column.

    Scale shape: one distinct on canonical edges, one degree aggregate
    broadcast-joined back (host-graph degree table is node-bounded), one
    self-join on wedge centers (skew-bounded by orientation), one
    equi-join against oriented edges, then a corner-union count. All
    integers; no iteration.

    Output: (id, degree, tri) — one row per node of the undirected
    graph, ``tri`` = triangles the node participates in (0 included).
    """
    # Collapse to canonical unique edges ONCE and truncate lineage (the
    # hits_fixed contract): `und` is read three times below (degree
    # union x2, orientation join) and `oriented` three more — without
    # the checkpoint an expensive upstream (q186 feeds the MinHash-LSH
    # pair chain in here) re-executes per reference (measured 101 s ->
    # ~20 s at sf0.1).
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    deg = (
        und.select(F.col("u").alias("id"))
        .union(und.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    key = F.concat(
        F.lpad(F.col("degree").cast("string"), 20, "0"), F.lit("|"), F.col("id")
    )
    keyed = deg.select("id", "degree", key.alias("k"))
    ku = keyed.select(F.col("id").alias("u"), F.col("k").alias("ku"))
    kv = keyed.select(F.col("id").alias("v"), F.col("k").alias("kv"))
    oriented = (
        und.join(ku, "u")
        .join(kv, "v")
        .select(
            F.when(F.col("ku") < F.col("kv"), F.col("ku")).otherwise(F.col("kv")).alias("ks"),
            F.when(F.col("ku") < F.col("kv"), F.col("kv")).otherwise(F.col("ku")).alias("kd"),
        )
    )
    w1 = oriented.select(F.col("ks").alias("a"), F.col("kd").alias("b"))
    w2 = oriented.select(F.col("ks").alias("a"), F.col("kd").alias("c"))
    wedges = w1.join(w2, "a").where(F.col("b") < F.col("c"))
    closing = oriented.select(F.col("ks").alias("b"), F.col("kd").alias("c"))
    tri = wedges.join(closing, ["b", "c"])
    corners = (
        tri.select(F.col("a").alias("k"))
        .union(tri.select(F.col("b").alias("k")))
        .union(tri.select(F.col("c").alias("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("tri"))
    )
    return keyed.join(corners, "k", "left").select(
        "id",
        "degree",
        F.coalesce("tri", F.lit(0)).cast("long").alias("tri"),
    )


def edge_reciprocity(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node link reciprocity over the DIRECTED unique-edge graph —
    the link-exchange / mutual-citation detector (organic link graphs
    are mostly asymmetric; paid link rings reciprocate): for each node,
    out-degree, in-degree, and how many of its out-edges are returned
    (src→dst AND dst→src both present).

    Duplicate directed edges collapse first (multiplicity is q131's
    weight concern, not reciprocity's); self-loops are dropped. A
    reciprocated pair contributes 1 to BOTH endpoints' ``n_recip``.
    FIXED-POINT: ``recip_micro = n_recip·10⁶ DIV out_deg`` (non-negative;
    0-out-degree nodes surface 0).

    Shape: one DISTINCT on directed edges, ONE self-join on the swapped
    key (equi-join on both columns — never theta), three node-bounded
    degree aggregates left-joined onto the node table. No iteration.

    Output: (id, out_deg, in_deg, n_recip, recip_micro).
    """
    e = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .where(F.col("s") != F.col("d"))
        .distinct()
    )
    rev = e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    recip = e.join(rev, ["s", "d"]).groupBy(F.col("s").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_recip")
    )
    outd = e.groupBy(F.col("s").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("out_deg")
    )
    ind = e.groupBy(F.col("d").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("in_deg")
    )
    nodes = outd.select("id").union(ind.select("id")).distinct()
    return (
        nodes.join(outd, "id", "left")
        .join(ind, "id", "left")
        .join(recip, "id", "left")
        .select(
            "id",
            F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
            F.coalesce("n_recip", F.lit(0)).cast("long").alias("n_recip"),
            F.expr(
                "(coalesce(n_recip, 0L) * 1000000L) DIV "
                "greatest(coalesce(out_deg, 0L), 1L)"
            )
            .cast("long")
            .alias("recip_micro"),
        )
    )


def kcore_peel(
    edges: DataFrame,
    k: int = 2,
    rounds: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Bounded-round k-core peel over the UNDIRECTED unique-edge graph —
    the dense-subgraph extractor (a link farm's core survives peeling;
    organic periphery nodes with < k neighbours fall off): each round
    removes every node whose current degree is below ``k``, degrees are
    recomputed over the survivors, and after ``rounds`` rounds the
    survivors are returned with their degree INSIDE the surviving set.

    BOUNDED-ROUND semantics (like ``hits_fixed``'s fixed iteration
    count): this is the state after exactly ``rounds`` peels, not the
    converged core — convergence needs O(peel depth) rounds and a real
    deployment picks ``rounds`` from the degeneracy it expects. Every
    quantity is a non-negative integer count, so the DuckDB oracle twin
    (unrolled ``AS MATERIALIZED`` CTEs) matches bit-for-bit.

    Shape: directed duplicates and self-loops collapse ONCE to canonical
    undirected edges (+ localCheckpoint — the q143 lesson: never let
    per-round lineage re-derive the upstream edge synthesis); each round
    is two semijoins (both endpoints surviving) + one node-bounded hash
    aggregate. No collect, no convergence test — driver loop length is
    the constant ``rounds``.

    Output: (id, core_deg) for survivors only, core_deg >= 1.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    a, b = F.col(src_col), F.col(dst_col)
    und = (
        edges.where(a != b)
        .select(
            F.least(a, b).alias("u"),
            F.greatest(a, b).alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _deg(surv: DataFrame | None) -> DataFrame:
        e = und
        if surv is not None:
            e = (
                e.join(surv.select(F.col("id").alias("u")), "u", "left_semi")
                .join(surv.select(F.col("id").alias("v")), "v", "left_semi")
            )
        ends = e.select(F.col("u").alias("id")).unionAll(
            e.select(F.col("v").alias("id"))
        )
        return ends.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("deg"))

    surv = None
    for _ in range(int(rounds)):
        surv = _deg(surv).where(F.col("deg") >= F.lit(int(k))).select("id")
    return _deg(surv).where(F.col("deg") >= F.lit(1)).select(
        "id", F.col("deg").alias("core_deg")
    )


def degree_histogram(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Log2-bucketed degree distribution of the undirected unique-edge
    graph — the power-law-tail audit a 100 TB join consults before
    paying: bucket ``b`` holds nodes with degree in [2^b, 2^(b+1)), so a
    heavy bucket at high ``b`` is the hub-skew warning (salt or broadcast
    before joining on that key).

    floor(log2(deg)) is the shared fixed-point idiom ``LENGTH(BIN(deg))
    - 1`` (q67 surprisal lesson) — exact integers on both engines, no
    float log anywhere.

    Shape: one DISTINCT edge collapse, one node-bounded degree
    aggregate, one bucket rollup of at most 64 rows. Output:
    (bucket, lo_deg, n_nodes, min_deg, max_deg) ordered by bucket.
    """
    a, b = F.col(src_col), F.col(dst_col)
    und = (
        edges.where(a != b)
        .select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("id"))
        .unionAll(und.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    bucket = (F.length(F.bin(F.col("deg"))) - F.lit(1)).cast("long")
    return (
        deg.select(bucket.alias("bucket"), "deg")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min("deg").cast("long").alias("min_deg"),
            F.max("deg").cast("long").alias("max_deg"),
        )
        .select(
            "bucket",
            F.expr("SHIFTLEFT(1L, CAST(bucket AS INT))").alias("lo_deg"),
            "n_nodes",
            "min_deg",
            "max_deg",
        )
        .orderBy("bucket")
    )


def two_hop_reach(
    edges: DataFrame,
    max_mid_degree: int = 64,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Two-hop neighborhood size per node — the crawl-frontier expansion
    estimate (how many NEW hosts a one-hop-deeper crawl from each seed
    would reach) and the friends-of-friends fan-out audit.

    ``n_2hop`` counts distinct nodes reachable in ≤ 2 hops over the
    undirected unique-edge graph, excluding the node itself. HUB CAP
    (the scale contract): only nodes with degree ≤ ``max_mid_degree``
    relay paths as the MIDDLE node — an uncapped wedge join is
    O(Σ deg²), and one 10⁶-degree hub alone would emit 10¹² pairs; the
    cap bounds per-mid fan-out at cap² while endpoints of any degree
    still get counted (their own neighbors are never capped). Real
    deployments sweep the cap like a quantile knob; reach through
    super-hubs is deliberately NOT estimated (it approaches |V| and
    says nothing about the frontier).

    Shape: one canonical-undirected collapse, one degree aggregate, one
    wedge equi-join through capped mids, a distinct on (src, reached),
    one count per node. No iteration.

    Output: (id, deg, n_2hop) — every node of the graph, n_2hop ≥ deg
    is NOT guaranteed (capped mids can hide 2-hop-only nodes, never
    1-hop ones).
    """
    if max_mid_degree < 1:
        raise ValueError("max_mid_degree must be >= 1")
    a, b = F.col(src_col), F.col(dst_col)
    und = (
        edges.where(a != b)
        .select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .distinct()
    )
    # eager localCheckpoint (the triangle_count/q160 idiom): deg, both
    # wedge legs and the 1-hop reach leg all read `sym` — without the
    # barrier the upstream edge synthesis + distinct collapse re-derives
    # per branch (4x)
    sym = (
        und.unionAll(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .select(F.col("u").alias("s"), F.col("v").alias("d"))
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy(F.col("s").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    mids = deg.where(F.col("deg") <= F.lit(int(max_mid_degree))).select(
        F.col("id").alias("m")
    )
    e1 = sym.select(F.col("s"), F.col("d").alias("m"))
    e2 = sym.select(F.col("s").alias("m"), F.col("d").alias("r"))
    two = (
        e1.join(mids, "m", "left_semi")
        .join(e2, "m")
        .where(F.col("s") != F.col("r"))
        .select("s", "r")
    )
    reach = (
        sym.select("s", F.col("d").alias("r"))
        .unionAll(two)
        .distinct()
        .groupBy(F.col("s").alias("id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_2hop"))
    )
    return deg.join(reach, "id", "left").select(
        "id",
        "deg",
        F.coalesce("n_2hop", F.lit(0)).cast("long").alias("n_2hop"),
    )


def wedge_closure(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Global clustering coefficient (wedge closure) of the undirected
    unique-edge graph, in fixed-point micro — the one-number transitivity
    audit: on a near-duplicate pair graph, low closure means the banding
    is producing chains (A~B~C but not A~C — verify-threshold too loose
    or bands too coarse); a healthy dup graph is triangle-dense because
    near-duplication is (approximately) transitive.

    closure = closed wedges / all wedges = 3·triangles / Σ deg·(deg−1)/2.
    Everything derives from :func:`triangle_count`'s (id, degree, tri)
    in one rollup: ``closed = Σ tri`` (each triangle counted at its 3
    corners — exactly the closed-wedge count), ``wedges =
    Σ deg·(deg−1) DIV 2`` (the product is even, so the truncating DIV is
    exact), ``n_edges = Σ deg DIV 2``. All integers; closure in micro.

    Output: ONE row (n_nodes, n_edges, wedges, closed, closure_micro).
    """
    tc = triangle_count(edges, src_col=src_col, dst_col=dst_col)
    return tc.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.expr("SUM(degree) DIV 2").cast("long").alias("n_edges"),
        F.sum(F.expr("(degree * (degree - 1)) DIV 2"))
        .cast("long")
        .alias("wedges"),
        F.sum("tri").cast("long").alias("closed"),
    ).select(
        "n_nodes",
        "n_edges",
        "wedges",
        "closed",
        F.expr("(closed * 1000000L) DIV greatest(wedges, 1L)")
        .cast("long")
        .alias("closure_micro"),
    )


def cocitation_pairs(
    links: DataFrame,
    doc_col: str = "doc_id",
    host_col: str = "host",
    cap: int = 16,
    min_support: int = 2,
) -> DataFrame:
    """Host co-citation graph: two hosts are co-cited when the SAME
    document links to both (Small 1973's co-citation measure applied to
    the web-link graph) — the bipartite doc->host incidence projected
    onto host pairs.  Strongly co-cited hosts are topical siblings, and
    at curation time a co-citation clique is often one spam network.

    Scale contract (the q196 mirror-pairs lesson): pair fan-out happens
    inside a PER-DOCUMENT capped array, never a join — each document's
    distinct linked hosts collapse to one sorted array sliced to
    ``cap``, so the explode emits <= cap^2 rows per document
    regardless of outlink skew.  The cap keeps the lexicographically
    smallest hosts, making it deterministic on both engines.

    Output: (host_a, host_b, n_docs) for pairs with
    ``n_docs >= min_support``, host_a < host_b, ordered by
    (n_docs desc, host_a, host_b) via an ordinary sort on the
    support-filtered aggregate (pair-grid sized, not corpus sized).
    """
    hs = (
        links.select(
            F.col(doc_col).alias("d"),
            F.coalesce(F.col(host_col), F.lit("")).alias("h"),
        )
        .where(F.col("h") != "")
        .distinct()
    )
    arr = hs.groupBy("d").agg(
        F.slice(F.sort_array(F.collect_list("h")), 1, int(cap)).alias("hs")
    )
    pairs = (
        arr.select(F.explode("hs").alias("a"), "hs")
        .select("a", F.explode("hs").alias("b"))
        .where(F.col("a") < F.col("b"))
    )
    return (
        pairs.groupBy(
            F.col("a").alias("host_a"), F.col("b").alias("host_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .where(F.col("n_docs") >= int(min_support))
        .orderBy(F.desc("n_docs"), "host_a", "host_b")
    )


def degree_assortativity(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_buckets: int = 16,
) -> DataFrame:
    """Log-degree assortativity of a directed graph — do high-out-degree
    hosts link to high-in-degree hosts?  The hub-structure audit that
    tells a crawl scheduler whether the link graph is hub-and-spoke
    (negative association) or core-periphery (positive) before it trusts
    degree-based priors.

    Computed as the bucketed rank concordance (shared
    operators/experiment.rank_concordance machinery — zero pair
    enumeration) between floor-log2(out-degree of src) and
    floor-log2(in-degree of dst) across DISTINCT edges; log buckets
    (the LENGTH(BIN(d))-1 idiom) because raw degrees are Zipf-spread.

    Scale shape: one edge dedup aggregate, two degree aggregates
    (host-domain-bounded — broadcast back onto edges), then the
    concordance core's grid pipeline.  Nothing quadratic anywhere.

    Output: one row (n_rows, concordant, discordant,
    concordance_micro) — n_rows = |unique edges|.
    """
    from .experiment import rank_concordance

    e = edges.select(
        F.col(src_col).cast("string").alias("s"),
        F.col(dst_col).cast("string").alias("d"),
    ).distinct()
    od = e.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("odeg"))
    idg = e.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("ideg"))
    j = (
        e.join(F.broadcast(od), "s")
        .join(F.broadcast(idg), "d")
        .select(
            (F.length(F.bin(F.col("odeg"))) - 1).cast("long").alias("lb_od"),
            (F.length(F.bin(F.col("ideg"))) - 1).cast("long").alias("lb_id"),
        )
    )
    return rank_concordance(
        j, "lb_od", "lb_id", x_width=1, y_width=1, n_buckets=n_buckets
    )


def label_propagation_fixed(
    edges: DataFrame,
    rounds: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-round SYNCHRONOUS label propagation (Raghavan 2007's LPA
    with deterministic tie-breaks) — the cheap community detector for
    host/dup graphs that complements connected components (q31: same
    label iff ANY path) by splitting weakly-joined blobs: each round,
    every node adopts the most common label among its DISTINCT
    neighbors, ties broken by MIN label.  A fixed round count (no
    convergence collect) with synchronous updates and total tie order
    makes the result deterministic and engine-portable — the oracle
    unrolls the same rounds in SQL; classic LPA's random order /
    random ties are deliberately replaced (the hits_fixed
    deviation-documentation contract).

    Scale shape: the raw edge stream collapses ONCE to distinct
    undirected neighbor pairs and is eagerly localCheckpoint-ed (the
    q143/hits lineage rule — no round re-derives the synthesis); each
    round is one (edges >< labels) equi-join, one (node, label) vote
    aggregate, and one (-votes, label) min-struct argmax — O(edges) per
    round, O(rounds) total, no windows, no collects.  Self-loops drop;
    isolated nodes keep their own id as label.

    Output: (node, label) ordered by node — node's community
    representative after ``rounds`` synchronous sweeps.
    """
    if int(rounds) < 1:
        raise ValueError("rounds must be >= 1")
    direct = edges.select(
        F.col(src_col).cast("string").alias("u"),
        F.col(dst_col).cast("string").alias("v"),
    ).where(F.col("u") != F.col("v"))
    und = (
        direct.union(direct.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = und.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(int(rounds)):
        votes = (
            und.join(
                labels.withColumnRenamed("node", "v"), "v"
            )
            .groupBy(F.col("u").alias("node"), "label")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )
        labels = (
            votes.groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).cast("long").alias("nc"),
                        F.col("label").alias("label"),
                    )
                ).alias("w")
            )
            .select("node", F.col("w.label").alias("label"))
            .localCheckpoint(eager=True)
        )
    return labels.orderBy("node")


def local_clustering(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node local clustering coefficient — triangles over possible
    wedges, ``cc = 2·tri / (deg·(deg−1))`` — the normalized link-farm
    signal that makes q160's raw triangle counts comparable across
    degrees (a 4-triangle node is a clique at degree 4 and noise at
    degree 400).

    Pure composition over :func:`triangle_count` (same orientation-
    bounded plan; zero new exchanges) plus one exact micro ratio:
    ``cc_micro = (2·tri·10^6) DIV (deg·(deg−1))`` — non-negative DIV
    (tri and degree are counts), degree < 2 yields 0 (tri is 0 there).
    Overflow: tri <= deg², so 2·tri·10^6 caps degree at ~2e6 — the
    mega-hub case where the coefficient is pre-bucketed anyway (same
    rule both engines).

    Output: (id, degree, tri, cc_micro) ordered by id.
    """
    t = triangle_count(edges, src_col, dst_col)
    return t.select(
        "id",
        "degree",
        "tri",
        F.expr(
            "(2L * tri * 1000000L)"
            " DIV greatest(degree * (degree - 1L), 1L)"
        )
        .cast("long")
        .alias("cc_micro"),
    ).orderBy("id")


def partition_conductance(
    edges: DataFrame,
    groups: int = 4,
    tag: str = "cond",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Conductance of a deterministic node partition — the graph-cut
    quality score (cut edges over the smaller side's volume) that says
    whether a proposed sharding of a link graph would ship most edges
    cross-shard: φ(S) = cut(S) / min(vol(S), vol(V∖S)), low φ = the
    partition respects community structure, φ→1 = it slices through it.

    Partition = md5-mod of the node id (``tag`` in the md5 registry) —
    deterministic, corpus-independent, the same assignment a hash-
    sharded storage layout would use (so the number IS the cross-shard
    traffic estimate).  Graph: DISTINCT canonical undirected edges
    (self-loops dropped upstream), collapsed ONCE and localCheckpointed
    before the two passes (the q186 lineage lesson — the edge synthesis
    is expensive and read twice).

    EXACT BIGINT: vol = endpoint-explode count, a cut edge counts for
    BOTH its groups, ``conductance_micro = cut·10⁶ DIV
    max(min(vol, 2E − vol), 1)`` — all non-negative.

    Output: (grp, vol, cut_edges, n_edges, conductance_micro) ordered
    by grp.
    """
    from .augment import _md5_mod

    und = (
        edges.where(F.col(src_col) != F.col(dst_col))
        .select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .distinct()
        .localCheckpoint()
    )
    g = und.select(
        _md5_mod(F.col("a"), tag, F.lit(int(groups))).cast("long").alias(
            "ga"
        ),
        _md5_mod(F.col("b"), tag, F.lit(int(groups))).cast("long").alias(
            "gb"
        ),
    )
    tot = g.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    vol = (
        g.select(F.col("ga").alias("grp"))
        .unionByName(g.select(F.col("gb").alias("grp")))
        .groupBy("grp")
        .agg(F.count(F.lit(1)).cast("long").alias("vol"))
    )
    cutg = g.where(F.col("ga") != F.col("gb"))
    cut = (
        cutg.select(F.col("ga").alias("grp"))
        .unionByName(cutg.select(F.col("gb").alias("grp")))
        .groupBy("grp")
        .agg(F.count(F.lit(1)).cast("long").alias("cut_edges"))
    )
    return (
        vol.join(cut, "grp", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "grp",
            "vol",
            F.coalesce("cut_edges", F.lit(0).cast("long")).alias(
                "cut_edges"
            ),
            "n_edges",
            F.expr(
                "(coalesce(cut_edges, 0L) * 1000000L)"
                " DIV greatest(least(vol, 2L * n_edges - vol), 1L)"
            )
            .cast("long")
            .alias("conductance_micro"),
        )
        .orderBy("grp")
    )


def partition_modularity(
    edges: DataFrame,
    groups: int = 4,
    tag: str = "cond",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Newman modularity of the same md5-mod node partition
    :func:`partition_conductance` scores — the companion number: where
    conductance says "how much traffic crosses MY shard boundary",
    modularity says how much better than CHANCE the whole partition
    keeps edges internal (Q > 0: respects communities; Q ≈ 0: no better
    than random; Q < 0: anti-correlated).

    EXACT-INTEGER identity: Q = Σ_g (e_gg/m − (vol_g/2m)²) is scaled by
    4m² so every per-group contribution is the BIGINT
    ``q_num = 4·m·e_gg − vol_g²`` and ``q_micro = Σ q_num·10⁶ DIV 4m²``
    — one fixed-point division at the very end, everything upstream
    exact (overflow cap: Σq_num·10⁶ needs m ≤ ~1.5e6 distinct edges;
    past that pre-scale both terms DIV 2^k, documented estimator).

    Same graph contract as conductance: DISTINCT canonical undirected
    edges, self-loops dropped, collapsed once + localCheckpoint.
    e_gg = within-group edges; vol_g counts BOTH endpoints.

    Output: (grp, vol, within_edges, q_num) per group ordered by grp,
    plus the partition-level ``q_micro`` repeated on every row (grid
    window — the zone-map-audit class).
    """
    from .augment import _md5_mod

    und = (
        edges.where(F.col(src_col) != F.col(dst_col))
        .select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .distinct()
        .localCheckpoint()
    )
    g = und.select(
        _md5_mod(F.col("a"), tag, F.lit(int(groups))).cast("long").alias(
            "ga"
        ),
        _md5_mod(F.col("b"), tag, F.lit(int(groups))).cast("long").alias(
            "gb"
        ),
    )
    tot = g.agg(F.count(F.lit(1)).cast("long").alias("m"))
    vol = (
        g.select(F.col("ga").alias("grp"))
        .unionByName(g.select(F.col("gb").alias("grp")))
        .groupBy("grp")
        .agg(F.count(F.lit(1)).cast("long").alias("vol"))
    )
    within = (
        g.where(F.col("ga") == F.col("gb"))
        .groupBy(F.col("ga").alias("grp"))
        .agg(F.count(F.lit(1)).cast("long").alias("within_edges"))
    )
    per = (
        vol.join(within, "grp", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "grp",
            "vol",
            F.coalesce("within_edges", F.lit(0).cast("long")).alias(
                "within_edges"
            ),
            "m",
            (
                F.lit(4).cast("long")
                * F.col("m")
                * F.coalesce("within_edges", F.lit(0).cast("long"))
                - F.col("vol") * F.col("vol")
            )
            .cast("long")
            .alias("q_num"),
        )
    )
    return (
        per.select(
            "grp",
            "vol",
            "within_edges",
            "q_num",
            # Q can be negative (anti-correlated partition) and Spark DIV
            # truncates while DuckDB // floors — min-shift by 4m² (Q >= -1
            # always, since Σvol² <= (Σvol)² = 4m²) so the divided operand
            # is non-negative by construction (the mw_domain_weights rule)
            F.expr(
                "((sum(q_num) over () + 4L * m * m) * 1000000L)"
                " DIV greatest(4L * m * m, 1L) - 1000000L"
            )
            .cast("long")
            .alias("q_micro"),
        )
        .orderBy("grp")
    )
