"""Training-data operator tests: dedup family, similarity search, text stats.
Small in-memory frames; numpy oracles where the math is nontrivial."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs away fast"),
        (2, "the quick brown fox jumps over the lazy dog and runs away fast"),  # exact dup
        (3, "the quick brown fox jumps over the lazy dog and walks away fast"),  # near dup
        (4, "der hund läuft und der mann ist nicht da mit dem auto zu haus"),
        (5, "completely different content about spark query engines and shuffles"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    from document_quality_assessment_ocr_spark.operators.dedup import exact_dedup

    out = {r["keep_id"]: r["n_dups"] for r in exact_dedup(docs).collect()}
    assert out[1] == 2  # docs 1,2 collapse; keep min id
    assert out[3] == 1 and out[4] == 1


def test_minhash_near_dup_similarity(docs):
    from document_quality_assessment_ocr_spark.operators.dedup import minhash_signatures

    sig = {r["doc_id"]: [r[f"h{i:02d}"] for i in range(16)] for r in
           minhash_signatures(docs, n_hashes=16).collect()}
    assert sig[1] == sig[2]  # identical text → identical signature
    agree_near = sum(a == b for a, b in zip(sig[1], sig[3]))
    agree_far = sum(a == b for a, b in zip(sig[1], sig[5]))
    assert agree_near > agree_far  # near-dup agrees on more minhashes
    assert 6 not in sig  # empty text → no shingles → absent


def test_lsh_pairs_finds_duplicates(docs):
    from document_quality_assessment_ocr_spark.operators.dedup import minhash_lsh_pairs

    pairs = {(r["id_a"], r["id_b"]) for r in
             minhash_lsh_pairs(docs, n_hashes=16, bands=8).collect()}
    assert (1, 2) in pairs
    assert (1, 3) in pairs or (2, 3) in pairs  # near-dup caught by some band
    assert (1, 5) not in pairs and (4, 5) not in pairs


def test_ngram_jaccard_exact_value(docs):
    from document_quality_assessment_ocr_spark.operators.dedup import ngram_jaccard_pairs

    out = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           ngram_jaccard_pairs(docs, threshold=0.0).collect()}
    assert out[(1, 2)] == pytest.approx(1.0)

    # numpy oracle for the (1,3) pair
    def shingles(t):
        t = " ".join(t.lower().split())
        return {t[i : i + 5] for i in range(len(t) - 4)}

    a = shingles("the quick brown fox jumps over the lazy dog and runs away fast")
    b = shingles("the quick brown fox jumps over the lazy dog and walks away fast")
    expect = len(a & b) / len(a | b)
    assert out[(1, 3)] == pytest.approx(expect, rel=1e-9)


def test_ngram_jaccard_candidates_path(docs, spark):
    """The scale path (candidates pair-join) must return exactly the full
    self-join's values restricted to the candidate pairs."""
    from document_quality_assessment_ocr_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    full = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
            ngram_jaccard_pairs(docs, threshold=0.0).collect()}
    cand = minhash_lsh_pairs(docs, n_hashes=16, bands=8)
    cand_pairs = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           ngram_jaccard_pairs(docs, threshold=0.0, candidates=cand).collect()}
    assert set(got) == {p for p in cand_pairs if p in full}  # zero-inter pairs drop
    for p, v in got.items():
        assert v == pytest.approx(full[p], rel=1e-12)


def test_ngram_jaccard_doc_freq_cap(docs):
    """Stop-shingle pruning keeps identical-pair jaccard a lower bound and
    leaves unique-shingle pairs untouched."""
    from document_quality_assessment_ocr_spark.operators.dedup import ngram_jaccard_pairs

    full = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
            ngram_jaccard_pairs(docs, threshold=0.0).collect()}
    capped = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
              ngram_jaccard_pairs(docs, threshold=0.0, max_doc_freq=2).collect()}
    assert set(capped) <= set(full)
    for p, v in capped.items():
        assert v <= full[p] + 1e-12


def test_simhash_hamming_locality(docs):
    from document_quality_assessment_ocr_spark.operators.dedup import simhash64

    sh = {r["doc_id"]: r["simhash"] for r in simhash64(docs, bits=32).collect()}
    assert sh[1] == sh[2]
    ham_near = bin(sh[1] ^ sh[3]).count("1")
    ham_far = bin(sh[1] ^ sh[5]).count("1")
    assert ham_near < ham_far


def test_dedup_last_wins_generic(spark):
    from document_quality_assessment_ocr_spark.operators.dedup import dedup_last_wins

    df = spark.createDataFrame(
        [("a", 1, "old"), ("a", 5, "new"), ("b", 2, "only")],
        "k string, seq long, v string",
    )
    out = {r["k"]: r["v"] for r in dedup_last_wins(df, "k", "seq").collect()}
    assert out == {"a": "new", "b": "only"}


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(3)
    base = rng.standard_normal((30, 8))
    base[7] = base[0] + 0.01 * rng.standard_normal(8)  # near neighbour of 0
    rows = [(i, [float(x) for x in base[i]]) for i in range(30)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), base


def test_cosine_topk_bruteforce_vs_numpy(emb):
    from document_quality_assessment_ocr_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    df, base = emb
    out = [
        (r["neighbor_id"], r["rank"])
        for r in cosine_topk_bruteforce(df, [0], k=3).orderBy("rank").collect()
    ]
    norms = base / np.linalg.norm(base, axis=1, keepdims=True)
    cos = norms @ norms[0]
    cos[0] = -2
    expect = list(np.argsort(-np.round(cos, 6), kind="stable")[:3])
    assert [n for n, _ in out] == [int(x) for x in expect]
    assert out[0][0] == 7  # the planted near neighbour ranks first


def test_lsh_topk_recalls_planted_neighbor(emb):
    from document_quality_assessment_ocr_spark.operators.similarity import cosine_topk_lsh

    df, _ = emb
    out = cosine_topk_lsh(df, [0], dim=8, k=3, n_planes=4).collect()
    # vec 7 is nearly collinear with vec 0 → same bucket with high prob for
    # 4 planes; assert the mechanism returns it as top hit when bucketed
    got = [(r["neighbor_id"], r["rank"]) for r in out]
    if got:  # bucket can legitimately be a singleton for some seeds
        assert got[0][0] == 7


def test_ivf_topk_recalls_planted_neighbor(emb):
    from document_quality_assessment_ocr_spark.operators.similarity import ivf_topk

    df, _ = emb
    out = ivf_topk(df, [0], dim=8, k=3, n_centroids=4, n_probe=2).collect()
    got = [(r["neighbor_id"], r["rank"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert got and got[0][0] == 7  # planted near-neighbour of vec 0


def test_doc_stats_and_lang_id(spark):
    from document_quality_assessment_ocr_spark.operators.textstats import doc_stats

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog sat in a house for a while that day " * 4),
            (2, "der mann und die frau sind nicht mit dem auto zu haus " * 4),
            (3, "xyzzy plugh"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in doc_stats(df).collect()}
    assert out[1]["lang_pred"] == "en"
    assert out[2]["lang_pred"] == "de"
    assert out[3]["lang_pred"] == "und"
    assert out[1]["n_tokens"] == 14 * 4
    assert 0.0 <= out[1]["quality"] <= 1.0


def test_rolling_fingerprints_windows(spark):
    from document_quality_assessment_ocr_spark.operators.textstats import (
        rolling_fingerprints,
    )

    df = spark.createDataFrame(
        [(1, "a" * 100), (2, "short"), (3, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in rolling_fingerprints(df).collect()}
    assert out[1]["n_windows"] == (100 - 32) // 16 + 1
    assert out[1]["min_fp"] is not None
    assert out[2]["n_windows"] == 0 and out[2]["min_fp"] is None
    assert out[3]["n_windows"] == 0


def test_sql_registered_kernels(spark, small_corpus_dir):
    from document_quality_assessment_ocr_spark.functions.register import (
        register_sql_functions,
    )
    from document_quality_assessment_ocr_spark.sources import tables

    register_sql_functions(spark)
    _, pay = tables.read_corpus(spark, small_corpus_dir)
    pay.createOrReplaceTempView("payloads_v")
    rows = spark.sql(
        """SELECT media_ref, score_media(png, media_ref) AS ms,
                  estimate_dpi(png) AS est
           FROM payloads_v WHERE media_ref = 'ok_clean'"""
    ).collect()
    assert len(rows) == 1
    ms = rows[0]["ms"]
    assert ms["error"] is None and ms["lap_var"] > 50
    assert rows[0]["est"] > 72


def test_sessionize_plan_single_exchange(spark):
    """The window pair and the per-session aggregate must share ONE
    hash exchange on user_id (HashPartitioning(user_id) satisfies the
    (user_id, session_idx) clustering)."""
    import datetime as dt

    from document_quality_assessment_ocr_spark.operators.sessions import sessionize

    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1, 1.0)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    plan = sessionize(ev)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_cosine_topk_plan_has_no_window(emb):
    """Two-level top-k merge replaced the per-probe window: the plan must
    contain partial aggregation and no Window node."""
    from document_quality_assessment_ocr_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    df, _ = emb
    plan = cosine_topk_bruteforce(df, probe_ids=[0, 1], k=3)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "partial" in plan.lower() or "ObjectHashAggregate" in plan, plan


def test_lsh_multiprobe_superset_recall(emb):
    """Multi-probe searches a superset of the single-probe bucket: its top-1
    similarity can never be worse, and a neighbour reachable through two
    probed buckets is ranked exactly once."""
    from document_quality_assessment_ocr_spark.operators.similarity import cosine_topk_lsh

    df, _ = emb
    single = cosine_topk_lsh(df, [0, 1, 2], dim=8, k=5, n_planes=4).collect()
    multi = cosine_topk_lsh(
        df, [0, 1, 2], dim=8, k=5, n_planes=4, multiprobe_bits=3
    ).collect()

    def top1(rows):
        out = {}
        for r in rows:
            if r["rank"] == 1:
                out[r["probe_id"]] = r["cos"]
        return out

    s1, m1 = top1(single), top1(multi)
    for pid, cos in s1.items():
        assert m1[pid] >= cos - 1e-12, pid
    # no duplicate (probe, neighbor) rows survive the dedup
    seen = [(r["probe_id"], r["neighbor_id"]) for r in multi]
    assert len(seen) == len(set(seen))
    # candidate pool strictly grows for at least one probe on this corpus
    assert len(multi) >= len(single)


def test_parquet_filter_pushdown(spark):
    """Predicates and projections must reach the parquet scan: the physical
    plan advertises PushedFilters and a pruned ReadSchema."""
    d = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("lang") == "en")
        .select("doc_id", "n_chars")
    )
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan, plan
    assert "doc_id" in plan and "text" not in plan.split("ReadSchema")[1][:200], plan


def test_duplicate_clusters_union_find(spark):
    """Iterative min-label propagation == python union-find on the same
    candidate pairs; singletons cluster to themselves."""
    from document_quality_assessment_ocr_spark.operators.dedup import (
        duplicate_clusters,
        minhash_lsh_pairs,
    )

    rows = [(i, t) for i, t in [
        (1, "aaa bbb ccc ddd eee fff ggg hhh iii jjj"),
        (2, "aaa bbb ccc ddd eee fff ggg hhh iii jjj"),
        (3, "aaa bbb ccc ddd eee fff ggg hhh iii jjk"),
        (4, "totally different words in this one here"),
        (5, "totally different words in this one here"),
        (6, "a singleton document unlike all the others"),
    ]]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = [(r["id_a"], r["id_b"]) for r in
             minhash_lsh_pairs(docs, n_hashes=16, bands=8).collect()]

    parent = {i: i for i, _ in rows}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {i: find(i) for i, _ in rows}

    got = {r["doc_id"]: (r["cluster_id"], r["is_cluster_head"]) for r in
           duplicate_clusters(docs, n_hashes=16, bands=8).collect()}
    assert {k: v[0] for k, v in got.items()} == expect
    for k, (cid, head) in got.items():
        assert head == (k == cid)
    assert got[6] == (6, True)  # singleton


def test_pq_topk_vs_numpy_adc(emb):
    """PQ ADC result equals the numpy re-computation of the same codebooks,
    codes and lookup tables — and the plan is window-free (two-level merge)."""
    from document_quality_assessment_ocr_spark.operators.similarity import (
        pq_codebooks,
        pq_topk,
    )

    df, base = emb
    q = pq_topk(df, [0], dim=8, k=3, m=2, ks=4, sample_rows=30)
    out = [(r["neighbor_id"], r["approx_dist"]) for r in q.orderBy("rank").collect()]

    books = pq_codebooks(base[np.argsort(np.arange(30))][:30], m=2, ks=4, seed=42)
    codes = np.stack(
        [((base[:, j * 4 : (j + 1) * 4, None] - books[j].T[None]) ** 2).sum(1).argmin(1)
         for j in range(2)],
        axis=1,
    )
    lut = [((books[j] - base[0, j * 4 : (j + 1) * 4]) ** 2).sum(1) for j in range(2)]
    adist = np.round(lut[0][codes[:, 0]] + lut[1][codes[:, 1]], 6)
    adist[0] = np.inf  # probe excluded
    order = sorted(range(30), key=lambda i: (adist[i], i))[:3]
    assert [n for n, _ in out] == order
    assert out[0][1] == pytest.approx(adist[order[0]])
    # planted near-neighbour of vec 0 should be nearest in code space too
    assert out[0][0] == 7
    assert "Window" not in q._jdf.queryExecution().executedPlan().toString()


def test_random_projection_preserves_distances(emb):
    """JL sanity: projected pairwise distances correlate with the originals
    (loose bound — d'=4 on 8-dim input), and the op is a pure projection
    (no Exchange in the plan)."""
    from document_quality_assessment_ocr_spark.operators.similarity import (
        random_projection,
    )

    df, base = emb
    q = random_projection(df, dim=8, out_dim=4)
    rows = {r["vec_id"]: [r[f"p{j:02d}"] for j in range(4)] for r in q.collect()}
    P = np.array([rows[i] for i in range(30)])
    d_orig = np.linalg.norm(base[:10, None] - base[None, :10], axis=2).ravel()
    d_proj = np.linalg.norm(P[:10, None] - P[None, :10], axis=2).ravel()
    mask = d_orig > 0
    corr = np.corrcoef(d_orig[mask], d_proj[mask])[0, 1]
    assert corr > 0.5
    assert "Exchange" not in q._jdf.queryExecution().executedPlan().toString()


def test_sq_int8_numpy_parity_and_zero_vector(spark):
    from document_quality_assessment_ocr_spark.operators.similarity import sq_int8

    rng = np.random.default_rng(5)
    vecs = [[float(x) for x in rng.standard_normal(8)] for _ in range(4)]
    vecs.append([0.0] * 8)  # zero vector → scale 0, no div-by-zero blowup
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    out = {r["vec_id"]: r for r in sq_int8(df).collect()}
    for i, v in enumerate(vecs[:4]):
        a = np.array(v)
        s = np.abs(a).max() / 127.0
        codes = np.floor(a / s + 0.5)
        assert out[i]["scale"] == pytest.approx(s, abs=1e-9)
        assert out[i]["max_code"] == int(np.abs(codes).max())
        assert out[i]["recon_err"] == pytest.approx(
            float(np.sqrt(((a - codes * s) ** 2).sum())), abs=1e-6
        )
        assert out[i]["max_code"] <= 127
    assert out[4]["scale"] == 0.0 and out[4]["recon_err"] == 0.0
    assert out[4]["max_code"] == 0


def test_pack_offsets_matches_global_scan(spark):
    """Two-level distributed prefix sum == the naive global running sum,
    including empty docs, id gaps, and boundary straddles — and no
    single-partition Window in the plan."""
    from document_quality_assessment_ocr_spark.operators.packing import pack_offsets

    rows = [(1, 3), (2, 0), (5, 10), (9, 4), (10, 0), (40, 7), (41, 1)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = {r["doc_id"]: r for r in pack_offsets(df, seq_len=8, n_buckets=3).collect()}

    acc = 0
    for did, n in rows:  # already in doc_id order
        r = out[did]
        assert r["start_token"] == acc, did
        assert r["end_token"] == acc + n
        assert r["first_seq"] == acc // 8
        exp_last = (acc + n - 1) // 8 if n > 0 else acc // 8
        assert r["last_seq"] == exp_last
        assert r["straddles"] == (exp_last > acc // 8)
        acc += n

    plan = (
        pack_offsets(df, seq_len=8, n_buckets=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the window must be partitioned by the range bucket — a global
    # ORDER BY window (single reducer) would have no _bucket partition spec
    import re

    assert "Window" in plan
    assert re.search(r"windowspecdefinition\(_bucket#\d+L?,", plan)


def test_pq_refined_recalls_planted_neighbor(emb):
    """Exact re-rank of the ADC shortlist surfaces the planted near
    neighbour with its TRUE cosine (not the quantized distance)."""
    from document_quality_assessment_ocr_spark.operators.similarity import (
        pq_topk_refined,
    )

    df, base = emb
    out = (
        pq_topk_refined(df, [0], dim=8, k=3, refine_factor=4, m=2, ks=4,
                        sample_rows=30)
        .orderBy("rank")
        .collect()
    )
    assert out[0]["neighbor_id"] == 7
    norms = base / np.linalg.norm(base, axis=1, keepdims=True)
    assert out[0]["cos"] == pytest.approx(round(float(norms[7] @ norms[0]), 6))


def test_salted_join_identical_results(spark):
    """Salted equi-join == plain join for inner and left, including
    unmatched-left rows and a hot key with many matches; the join key is
    (key, salt) so the hot key spreads over n_salts reducers."""
    from document_quality_assessment_ocr_spark.operators.salting import salted_join

    left = spark.createDataFrame(
        [("hot", i) for i in range(50)] + [("cold", 0), ("missing", 9)],
        "k string, lv long",
    )
    right = spark.createDataFrame(
        [("hot", "a"), ("hot", "b"), ("cold", "c"), ("orphan", "z")],
        "k string, rv string",
    )
    for how in ("inner", "left"):
        exp = {tuple(r) for r in left.join(right, "k", how).collect()}
        got = {tuple(r) for r in salted_join(left, right, "k", n_salts=4, how=how).collect()}
        assert got == exp, how

    plan = (
        salted_join(left, right, "k", n_salts=4)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "_salt" in plan  # the salt really is part of the join key

    with pytest.raises(ValueError):
        salted_join(left, right, "k", how="full")


def test_pagerank_fixed_vs_python(spark):
    """Fixed-point PageRank equals an integer-arithmetic python replay,
    including dangling nodes and isolated nodes."""
    from document_quality_assessment_ocr_spark.operators.graph import (
        SCALE,
        pagerank_fixed,
    )

    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    edge_list = [(0, 1), (1, 2), (2, 0), (0, 2), (3, 0)]  # 4 isolated
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r["id"]: r["pr"] for r in pagerank_fixed(nodes, edges, iters=3).collect()}

    deg = {}
    for s, _ in edge_list:
        deg[s] = deg.get(s, 0) + 1
    r = {i: SCALE for i in range(5)}
    for _ in range(3):
        m = {i: 0 for i in range(5)}
        for s, d in edge_list:
            m[d] += r[s] // deg[s]
        r = {i: 150000000 + (85 * m[i]) // 100 for i in range(5)}
    assert got == r
    assert got[4] == 150000000  # isolated node holds the base rank


def test_image_ahash_perceptual_properties(spark):
    """aHash is invariant to brightness scaling (threshold at own mean),
    distinguishes different structures, and reports decode errors as data."""
    import numpy as np

    from document_quality_assessment_ocr_spark import png as P
    from document_quality_assessment_ocr_spark.operators.multimodal import (
        ahash64,
        ahash_hex,
        image_ahash,
    )

    rng = np.random.default_rng(9)
    a = (rng.random((64, 64)) * 200).astype(np.uint8)  # headroom: +40 won't clip
    brighter = (a + 40).astype(np.uint8)
    other = (rng.random((64, 64)) * 200).astype(np.uint8)
    assert ahash64(a) == ahash64(brighter)
    assert ahash64(a) != ahash64(other)

    rows = [
        ("ok", bytearray(P.encode_gray(a))),
        ("bad", bytearray(b"not a png")),
    ]
    df = spark.createDataFrame(rows, "media_ref string, png binary")
    out = {r["media_ref"]: r for r in image_ahash(df).collect()}
    assert out["ok"]["phash"] == ahash_hex(a) and out["ok"]["error"] is None
    assert int(out["ok"]["phash"], 16) & 0xFFFFFFFFFFFFFFFF == ahash64(a) & 0xFFFFFFFFFFFFFFFF
    assert out["bad"]["phash"] is None and out["bad"]["error"]


def test_interval_bucket_join_equals_naive(spark):
    """Bucketed interval join == the naive BETWEEN join, including
    multi-bucket-spanning intervals, boundary timestamps, and key misses."""
    from document_quality_assessment_ocr_spark.operators.intervals import (
        interval_bucket_join,
    )

    intervals = spark.createDataFrame(
        [(1, 10, 250, "a"), (1, 300, 310, "b"), (2, 0, 1000, "c")],
        "k long, lo long, hi long, tag string",
    )
    points = spark.createDataFrame(
        [(1, 10), (1, 250), (1, 260), (1, 305), (2, 999), (3, 50)],
        "k long, t long",
    )
    got = {
        (r["k"], r["t"], r["tag"])
        for r in interval_bucket_join(
            points, intervals, "k", "t", "lo", "hi", bucket_width=100
        ).collect()
    }
    naive = {
        (r["k"], r["t"], r["tag"])
        for r in points.join(
            intervals,
            (points["k"] == intervals["k"])
            & (points["t"] >= intervals["lo"])
            & (points["t"] <= intervals["hi"]),
        )
        .select(points["k"], "t", "tag")
        .collect()
    }
    assert got == naive
    assert (1, 10, "a") in got and (1, 250, "a") in got  # inclusive bounds
    assert (1, 260, "a") not in got and not any(k == 3 for k, _, _ in got)


def test_length_bucketed_batches(spark):
    """Bucket and batch coordinates: dense per-bucket indices in id order,
    pos bounded by batch size, pad waste bounded by the bucket width."""
    from document_quality_assessment_ocr_spark.operators.packing import (
        length_bucketed_batches,
    )

    rows = [(i, n) for i, n in enumerate([5, 70, 12, 65, 130, 8, 63, 64])]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = {r["doc_id"]: r for r in
           length_bucketed_batches(df, batch_size=2, bucket_width=64).collect()}
    # bucket 0: ids 0,2,5,6 (n<64) → batches [0,0,1,1]; bucket 1: 1,3,7; bucket 2: 4
    assert [out[i]["bucket"] for i in (0, 2, 5, 6)] == [0, 0, 0, 0]
    assert [(out[i]["batch_idx"], out[i]["pos_in_batch"]) for i in (0, 2, 5, 6)] == [
        (0, 0), (0, 1), (1, 0), (1, 1)
    ]
    assert out[7]["bucket"] == 1 and out[4]["bucket"] == 2
    assert [(out[i]["batch_idx"], out[i]["pos_in_batch"]) for i in (1, 3, 7)] == [
        (0, 0), (0, 1), (1, 0)
    ]


def test_semdedup_keep_first(spark):
    """Near-identical vectors collapse to the lowest id; distant vectors
    survive; determinism does not depend on cluster boundaries for exact
    duplicates (same vector → same cell by construction)."""
    import numpy as np

    from document_quality_assessment_ocr_spark.operators.similarity import semdedup

    rng = np.random.default_rng(3)
    base = rng.normal(size=8).tolist()
    far = (-np.array(base)).tolist()
    rows = [
        (0, base),
        (1, base),                                   # exact dup of 0 → dropped
        (2, (np.array(base) * 1.001).tolist()),      # near dup of 0 → dropped
        (3, far),                                    # anti-parallel → kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in
           semdedup(df, tau=0.999, n_centroids=2, sample_rows=4).collect()}
    assert out[0]["kept"] and out[3]["kept"]
    assert not out[1]["kept"] and not out[2]["kept"]
    assert out[0]["cell"] == out[1]["cell"]


def test_chunk_manifest_full_lineage(spark):
    """Every document's tokens land somewhere (per-doc slices sum to
    n_tokens, contiguous from offset 0); every training sequence is tiled
    exactly [0, seq_len) by its slices except the ragged last one; empty
    docs never appear."""
    from document_quality_assessment_ocr_spark.operators.packing import (
        chunk_manifest,
    )

    rows = [(1, 3), (2, 0), (5, 10), (9, 4), (10, 0), (40, 7), (41, 1)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = chunk_manifest(df, seq_len=8, n_buckets=3).collect()

    by_doc, by_seq = {}, {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
        by_seq.setdefault(r["seq_id"], []).append(r)

    total = sum(n for _, n in rows)
    assert 2 not in by_doc and 10 not in by_doc  # empty docs absent
    for did, n in rows:
        if n == 0:
            continue
        slices = sorted(by_doc[did], key=lambda r: r["doc_offset"])
        assert slices[0]["doc_offset"] == 0
        acc = 0
        for s in slices:  # contiguous, no gaps or overlaps
            assert s["doc_offset"] == acc and s["n_slice"] >= 1
            acc += s["n_slice"]
        assert acc == n

    last_seq = (total - 1) // 8
    assert set(by_seq) == set(range(last_seq + 1))  # no empty sequences
    for sid, slices in by_seq.items():
        slices.sort(key=lambda r: r["seq_offset"])
        assert slices[0]["seq_offset"] == 0
        acc = 0
        for s in slices:  # sequence tiled without gaps
            assert s["seq_offset"] == acc
            acc += s["n_slice"]
        assert acc == (8 if sid < last_seq else total - 8 * last_seq)


def test_bm25_fixed_point_matches_python(spark):
    """Engine scores equal a pure-python evaluation of the same integer
    rational (RSJ milli-idf × micro-unit tf norm), and ranking breaks
    ties by doc_id ascending."""
    from document_quality_assessment_ocr_spark.operators.retrieval import (
        BM25_DEN_DL,
        BM25_DEN_TF,
        BM25_DEN_TOTAL,
        BM25_NUM_C,
        IDF_MILLI,
        MICRO,
        bm25_search,
    )

    corpus = {
        1: "spark shuffles data across the cluster",
        2: "spark spark spark everywhere in the logs",
        3: "the cluster runs a big spark job on data",
        4: "completely unrelated prose about gardens",
        5: "data data data and more data in the cluster",
    }
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    queries = {7: ["shuffles", "gardens"], 8: ["spark", "prose"]}
    out = bm25_search(df, queries, k=3, salt_buckets=2).collect()

    toks = {d: t.split() for d, t in corpus.items()}
    n_docs = len(toks)
    total = sum(len(t) for t in toks.values())
    exp = {}
    for qid, terms in queries.items():
        scores = {}
        for d, tk in toks.items():
            s, hit = 0, False
            for term in terms:
                tf = tk.count(term)
                if tf == 0:
                    continue
                hit = True
                dfx = sum(term in t for t in toks.values())
                idf = (n_docs - dfx) * IDF_MILLI // dfx
                den = (BM25_DEN_TF * tf * total + BM25_DEN_TOTAL * total
                       + BM25_DEN_DL * len(tk) * n_docs)
                s += idf * ((BM25_NUM_C * tf * total * MICRO) // den)
            if hit:  # engine emits a row for any doc containing a panel term
                scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        for rank, (d, s) in enumerate(ranked, 1):
            exp[(qid, d)] = (s, rank)

    got = {(r["query_id"], r["doc_id"]): (r["score_fx"], r["rank"]) for r in out}
    assert got == exp
    assert any(s for s, _ in exp.values())  # panel is not score-degenerate


def test_soft_dedup_weights_split_cluster_mass(docs):
    """Docs 1/2/3 form one near-dup cluster → each keeps 1e9 DIV 3;
    singletons keep the full 1e9; cluster mass is preserved (±rounding)."""
    from document_quality_assessment_ocr_spark.operators.dedup import (
        soft_dedup_weights,
    )

    out = {r["doc_id"]: r for r in
           soft_dedup_weights(docs, n_hashes=8, bands=4).collect()}
    assert len(out) == 6
    cluster = {out[d]["cluster_id"] for d in (1, 2, 3)}
    assert cluster == {out[1]["cluster_id"]}  # one shared cluster
    for d in (1, 2, 3):
        assert out[d]["cluster_size"] == 3
        assert out[d]["weight_nano"] == 1_000_000_000 // 3
    for d in (4, 5, 6):
        assert out[d]["cluster_size"] == 1
        assert out[d]["weight_nano"] == 1_000_000_000


def _py_winnow(text, k=5, w=4):
    import hashlib

    tk = text.lower().split()
    grams = [
        hashlib.md5(" ".join(tk[i : i + k]).encode()).hexdigest()
        for i in range(max(len(tk) - k + 1, 0))
    ]
    if not grams:
        return set()
    wins = max(len(grams) - w + 1, 1)
    return {min(grams[j : j + w]) for j in range(wins)}


def test_winnow_fingerprints_match_python(spark):
    """Engine fingerprint sets equal the pure-python winnowing replay,
    including the short-doc degenerations (< k tokens → none; < k+w-1
    tokens → min over the few grams present)."""
    from document_quality_assessment_ocr_spark.operators.winnow import (
        winnow_fingerprints,
    )

    corpus = {
        1: "the quick brown fox jumps over the lazy dog again and again",
        2: "too short",
        3: "",
        4: "one two three four five",  # exactly k tokens → 1 gram
        5: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    }
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    out = winnow_fingerprints(df, k=5, w=4).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    exp = {d: _py_winnow(t) for d, t in corpus.items() if _py_winnow(t)}
    assert got == exp


def test_winnow_overlap_guarantee_and_cap(spark):
    """A shared run of >= k+w-1 tokens is always witnessed by >= 1 shared
    fingerprint regardless of position (the winnowing guarantee); a
    boilerplate fingerprint in > max_df docs emits no pairs by itself."""
    from document_quality_assessment_ocr_spark.operators.winnow import (
        winnow_overlap_pairs,
    )

    shared = "zebra yonder xylophone wombat vulture unicorn tapir salmon"  # 8 = k+w-1
    rows = [
        (1, "intro words here first " + shared + " tail one"),
        (2, "completely different opening prose " + shared),
        (3, "unrelated text about gardens and ponds and fountains flowing"),
    ]
    # 5 docs sharing ONLY a boilerplate phrase, capped out by max_df=3
    boiler = "subscribe to our newsletter for updates every single week"
    rows += [(10 + i, f"filler{i} " + boiler) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in winnow_overlap_pairs(
            df, k=5, w=4, min_shared=1, max_df=3
        ).collect()
    }
    assert any(p == (1, 2) for p in out)  # guarantee: insertion-shifted match
    assert all({a, b} <= {1, 2} for a, b in out)  # boiler capped, no 10+ pairs


def _py_chunks(text, divisor=16):
    import hashlib

    tk = text.lower().split()
    if not tk:
        return []
    starts = [0] + [
        i
        for i in range(1, len(tk))
        if int(hashlib.md5(tk[i].encode()).hexdigest()[:4], 16) % divisor == 0
    ]
    out = []
    for j, s in enumerate(starts):
        e = starts[j + 1] if j + 1 < len(starts) else len(tk)
        out.append(
            (j, e - s, hashlib.md5(" ".join(tk[s:e]).encode()).hexdigest())
        )
    return out


def test_content_chunks_match_python_and_resync(spark):
    """Engine chunks equal the pure-python CDC replay; inserting tokens
    mid-document preserves every chunk hash outside the edited chunk
    (the re-synchronization property fixed grids lack)."""
    from document_quality_assessment_ocr_spark.operators.chunking import (
        content_chunks,
    )

    base = " ".join(f"tok{i}" for i in range(200))
    edited = " ".join(
        ["tok%d" % i for i in range(100)]
        + ["INSERTED", "WORDS", "HERE"]
        + ["tok%d" % i for i in range(100, 200)]
    )
    corpus = {1: base, 2: edited, 3: "", 4: "single"}
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    got = {}
    for r in content_chunks(df).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["n_tokens"], r["chunk_hash"])
        )
    for d in got:
        got[d].sort()
    exp = {d: _py_chunks(t) for d, t in corpus.items() if t.split()}
    assert got == exp
    h1 = {h for _, _, h in exp[1]}
    h2 = {h for _, _, h in exp[2]}
    assert len(h1) > 4
    assert len(h1 - h2) <= 1  # only the edited chunk's hash changed
    assert len(h2 - h1) <= 2  # its replacement(s)


def test_chunk_dup_profile_counts(spark):
    """n_occ counts occurrences across AND within docs; n_docs is
    distinct; singletons drop under min_occ=2."""
    from document_quality_assessment_ocr_spark.operators.chunking import (
        chunk_dup_profile,
        content_chunks,
    )

    a = " ".join(f"w{i}" for i in range(60))
    corpus = {1: a, 2: a + " unique tail of doc two only", 3: a + " " + a}
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    prof = {r["chunk_hash"]: r for r in chunk_dup_profile(df).collect()}
    ch = content_chunks(df).collect()
    from collections import Counter

    occ = Counter(r["chunk_hash"] for r in ch)
    docs = {}
    for r in ch:
        docs.setdefault(r["chunk_hash"], set()).add(r["doc_id"])
    for h, c in occ.items():
        if c >= 2:
            assert prof[h]["n_occ"] == c and prof[h]["n_docs"] == len(docs[h])
        else:
            assert h not in prof
    assert prof  # the shared prefix chunks repeat


def test_rrf_fuse_matches_python(spark):
    """Fused scores equal the hand-computed 1e6 // (60 + rank) sum over
    both systems; single-system docs still surface; ties break by doc_id."""
    from document_quality_assessment_ocr_spark.operators.retrieval import (
        MICRO,
        RRF_K,
        bm25_search,
        hash_dot_topk,
        rrf_fuse,
    )

    corpus = {
        1: "spark shuffles data across the cluster nodes quickly",
        2: "spark spark spark everywhere in the execution logs",
        3: "the cluster runs a big spark job on shared data",
        4: "completely unrelated prose about gardens and fountains",
        5: "data data data and more data in the warehouse",
    }
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    qs = {7: ["spark", "data"], 8: ["gardens", "cluster"]}
    a = bm25_search(df, qs, k=4, salt_buckets=2)
    b = hash_dot_topk(df, qs, dim=16, k=4, salt_buckets=2)
    ra = {(r["query_id"], r["doc_id"]): r["rank"] for r in a.collect()}
    rb = {(r["query_id"], r["doc_id"]): r["rank"] for r in b.collect()}
    exp_fx = {}
    for key, rank in list(ra.items()) + list(rb.items()):
        exp_fx[key] = exp_fx.get(key, 0) + MICRO // (RRF_K + rank)
    out = rrf_fuse([a, b], k=10, salt_buckets=2).collect()
    got_fx = {(r["query_id"], r["doc_id"]): r["rrf_fx"] for r in out}
    assert got_fx == exp_fx
    for qid in (7, 8):  # rank is the (rrf_fx DESC, doc_id ASC) total order
        rows = sorted(
            (r for r in out if r["query_id"] == qid), key=lambda r: r["rank"]
        )
        assert [
            (r["doc_id"]) for r in rows
        ] == [
            d
            for _, d in sorted(
                ((-(got_fx[(qid, d)]), d) for q, d in got_fx if q == qid)
            )
        ]


def test_prototype_prune(spark):
    """Per-cell keep count is GREATEST(1, n*pct//100); the kept set is
    exactly the hardest (lowest rounded cosine-to-centroid) rows with ties
    by id — verified against a python brute-force replay on the same
    seeded centroids."""
    import numpy as np

    from document_quality_assessment_ocr_spark.operators.similarity import (
        _kmeans_lite,
        prototype_prune,
    )

    rng = np.random.default_rng(11)
    rows = [(i, rng.normal(size=6).tolist()) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r for r in
           prototype_prune(df, keep_pct=50, n_centroids=3, sample_rows=40).collect()}

    vecs = np.array([v for _, v in rows])
    cents = _kmeans_lite(vecs[:40], 3, seed=42)
    d2 = -2.0 * vecs @ cents.T + (cents * cents).sum(1)[None, :]
    cell = d2.argmin(1)
    cos = np.round(
        (vecs * cents[cell]).sum(1)
        / np.sqrt((vecs * vecs).sum(1) * (cents[cell] ** 2).sum(1)),
        6,
    )
    for c in set(cell.tolist()):
        ids = sorted(np.where(cell == c)[0].tolist(), key=lambda i: (cos[i], i))
        n_keep = max(1, len(ids) * 50 // 100)
        for r, i in enumerate(ids):
            assert got[i]["cell"] == c
            assert got[i]["rank"] == r + 1
            assert got[i]["kept"] == (r + 1 <= n_keep)
    kept_n = sum(1 for r in got.values() if r["kept"])
    assert 0 < kept_n < len(rows)


def test_domain_quality_shrunk(spark):
    """Exact fixed-point replay of the shrinkage arithmetic; a small domain
    with the same per-doc scores as a large one sits strictly closer to the
    prior (score 0); empty docs contribute exactly the prior."""
    from document_quality_assessment_ocr_spark.operators.classify import (
        OFFSET_MILLI,
        PRIOR_NANO,
        SCALE,
        classifier_weights,
        domain_quality_shrunk,
    )
    import hashlib

    def py_score_nano(text, n_buckets=64, seed=7):
        w = classifier_weights(n_buckets, seed)
        tk = [t for t in text.lower().strip().split() if t]
        grams = tk + ["\x01".join(p) for p in zip(tk, tk[1:])]
        if not grams:
            return PRIOR_NANO
        gs = sum(
            w[int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % n_buckets]
            for g in grams
        )
        return ((gs + OFFSET_MILLI * len(grams)) * 1_000_000) // len(grams)

    rows = (
        [(f"big", f"alpha beta gamma delta word{i}") for i in range(30)]
        + [("small", "alpha beta gamma delta word0")] * 3
        + [("empty", "   ")]
    )
    df = spark.createDataFrame(
        [(s, t) for s, t in rows], "source string, text string"
    )
    out = {r["source"]: r for r in domain_quality_shrunk(df, prior_docs=20).collect()}
    exp = {}
    for s in ("big", "small", "empty"):
        ns = [py_score_nano(t) for src, t in rows if src == s]
        exp[s] = (sum(ns) + 20 * PRIOR_NANO) // (len(ns) + 20)
    for s in exp:
        assert out[s]["shrunk_nano"] == exp[s], s
        assert out[s]["shrunk_score"] == (exp[s] - PRIOR_NANO) / 1e9
    assert out["empty"]["shrunk_nano"] == PRIOR_NANO  # pure prior
    # same mean inputs, fewer docs -> strictly closer to the prior
    d_small = abs(out["small"]["shrunk_nano"] - PRIOR_NANO)
    # big domain has varied words; just check ordering vs its own unshrunk mean
    mean_big = sum(py_score_nano(t) for s, t in rows if s == "big") // 30
    assert abs(out["big"]["shrunk_nano"] - PRIOR_NANO) <= abs(mean_big - PRIOR_NANO)
    assert d_small >= 0


def test_ngram_novelty(spark):
    """Shared trigrams lower novelty symmetrically; a fully unique doc
    scores 1.0; short (<n tokens) docs surface (0, 0, 0.0); within-doc
    repeated grams count once."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        ngram_novelty,
    )

    shared = "the quick brown fox"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} alpha beta gamma delta"),
            (2, f"{shared} epsilon zeta eta theta"),
            (3, "completely novel text with unique words here"),
            (4, "too short"),
            (5, f"{shared} {shared} alpha beta gamma delta"),  # repeats collapse
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(docs, n=3).collect()}
    assert out[3]["novelty"] == 1.0 and out[3]["n_unique"] == out[3]["n_distinct"]
    assert out[4] == (4, 0, 0, 0.0)
    # doc1: 8 tokens -> 6 distinct trigrams; the leading two are shared
    # with docs 2 and 5, the remaining four are shared with doc 5 (its
    # suffix repeats doc1's) -> nothing corpus-unique
    assert out[1]["n_distinct"] == 6 and out[1]["n_unique"] == 0
    assert out[1]["novelty"] == 0.0
    # doc2: shares only the leading two trigrams -> 4 unique of 6
    assert out[2]["n_distinct"] == 6 and out[2]["novelty"] == 4 / 6
    # doc5's within-doc repeats of the shared trigrams count once; its
    # bridging grams ('fox the quick', ...) are its own
    assert out[5]["n_distinct"] == 8 and out[5]["n_unique"] == 2


def test_fim_split(spark):
    """Reconstruction: prefix/middle/suffix tokens re-join to the
    whitespace-normalized doc for EVERY row; <2-token docs never split;
    rate=0 passthrough; deterministic replay."""
    from document_quality_assessment_ocr_spark.operators.augment import fim_split

    docs = spark.createDataFrame(
        [
            (i, f"tok{i} alpha beta gamma delta epsilon zeta " * 2)
            for i in range(20)
        ]
        + [(100, "single"), (101, "  "), (102, None)],
        "doc_id long, text string",
    )
    out = fim_split(docs, fim_rate=1.0, salt=13).collect()
    texts = {r["doc_id"]: (r[1] or "") for r in docs.collect()}
    for r in out:
        norm = " ".join((texts[r["doc_id"]] or "").split())
        parts = [p for p in (r["prefix"], r["middle"], r["suffix"]) if p]
        assert " ".join(parts) == norm, r["doc_id"]
        if r["n_tokens"] >= 2:
            assert r["fim"]
        else:
            assert not r["fim"] and r["middle"] == "" and r["suffix"] == ""
    # at rate=1 with random cuts, SOME doc must have a non-empty middle
    assert any(r["middle"] for r in out)
    # rate=0: untouched passthrough
    none = fim_split(docs, fim_rate=0.0, salt=13).collect()
    assert all(not r["fim"] and r["middle"] == "" == r["suffix"] for r in none)
    # replay-stable
    again = fim_split(docs, fim_rate=1.0, salt=13).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_d4_prune(spark):
    """Stage-1 == semdedup keep set; stage-2 ranks run 1..n per cell over
    survivors only; keep count is max(1, n*pct//100) hardest-first."""
    from document_quality_assessment_ocr_spark.operators.similarity import (
        d4_prune,
        semdedup,
    )

    # cluster A: 6 near-identical directions (mutual cos >= .99) → only the
    # min id survives dedup; cluster B: 4 spread directions (cos < .99)
    rows = [(i, [10.0 + i * 0.001, 0.1 * (i % 2)]) for i in range(6)]
    rows += [
        (10, [0.0, 1.0]),
        (11, [0.5, 1.0]),
        (12, [1.0, 1.0]),
        (13, [1.0, 0.45]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(tau=0.99, n_centroids=2, sample_rows=512, seed=42)
    out = d4_prune(emb, keep_pct=50, **kw).collect()
    sd = {r["vec_id"] for r in semdedup(emb, **kw).collect() if r["kept"]}
    assert {r["vec_id"] for r in out} == sd
    by_cell = {}
    for r in out:
        by_cell.setdefault(r["cell"], []).append(r)
    for cell, rs in by_cell.items():
        n = len(rs)
        assert sorted(r["rank"] for r in rs) == list(range(1, n + 1))
        n_keep = max(1, n * 50 // 100)
        # hardest (lowest cos_proto, id tiebreak) are the kept ones
        srt = sorted(rs, key=lambda r: (r["cos_proto"], r["vec_id"]))
        assert [r["kept"] for r in srt] == [True] * n_keep + [False] * (n - n_keep)
    # the 6-clone cluster collapsed to one survivor, which must be kept
    a_cell = [r for r in out if r["vec_id"] < 6]
    assert len(a_cell) == 1 and a_cell[0]["kept"]


def test_k_anonymize(spark):
    """Cohorts below k get every quasi value redacted; group_size is the
    true cohort size; NULL merges with '' per the COALESCE contract."""
    from document_quality_assessment_ocr_spark.operators.privacy import k_anonymize

    rows = (
        [(i, "en", "web") for i in range(5)]
        + [(10, "de", "web"), (11, "de", "web")]
        + [(20, None, "pdf"), (21, "", "pdf"), (22, "", "pdf")]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    out = {r["doc_id"]: r for r in k_anonymize(df, ["lang", "source"], k=3).collect()}
    assert all(
        out[i]["lang"] == "en" and not out[i]["suppressed"] and out[i]["group_size"] == 5
        for i in range(5)
    )
    assert out[10]["lang"] == "<redacted>" == out[10]["source"] and out[10]["suppressed"]
    # NULL lang coalesces into the ''-lang cohort → size 3 → NOT suppressed
    assert out[20]["group_size"] == 3 and not out[20]["suppressed"] and out[20]["lang"] == ""


def test_hard_negative_mine(spark):
    """Python brute-force replay: per anchor, top-k different-label
    neighbors by (cos desc, id), after dropping cos >= dup_tau."""
    import numpy as np

    from document_quality_assessment_ocr_spark.operators.similarity import (
        hard_negative_mine,
    )

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(30, 4))
    labels = [i % 3 for i in range(30)]
    # a cross-label near-duplicate of anchor 0 → must be tau-guarded out
    vecs[29] = vecs[0] * 1.0001
    labels[29] = 1
    rows = [(i, [float(x) for x in vecs[i]], labels[i]) for i in range(30)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = hard_negative_mine(emb, anchor_ids=[0, 4], k=3, dup_tau=0.99).collect()
    got = {
        (r["anchor_id"], r["rank"]): (r["neighbor_id"], r["neg_label"], r["cos"])
        for r in out
    }
    for a in (0, 4):
        cand = []
        for j in range(30):
            if labels[j] == labels[a]:
                continue
            c = round(
                float(
                    vecs[a] @ vecs[j]
                    / np.sqrt((vecs[a] @ vecs[a]) * (vecs[j] @ vecs[j]))
                ),
                6,
            )
            if c < 0.99:
                cand.append((-c, j, labels[j], c))
        cand.sort()
        for rk, (_, j, lab, c) in enumerate(cand[:3], start=1):
            assert got[(a, rk)] == (j, lab, c), (a, rk)
    assert all(r["neighbor_id"] != 29 for r in out if r["anchor_id"] == 0)


def test_fuzzy_decontam(spark):
    """A near-duplicate train/eval pair (one token changed out of many)
    is flagged with high agreement; an unrelated doc is not; est_jaccard
    is exactly n_match/n_hashes."""
    from document_quality_assessment_ocr_spark.operators.decontam import (
        fuzzy_contamination_report,
    )

    base = " ".join(f"w{i}" for i in range(60))
    near = " ".join(("CHANGED" if i == 30 else f"w{i}") for i in range(60))
    other = " ".join(f"z{i}" for i in range(60))
    train = spark.createDataFrame(
        [(1, near), (2, other), (3, base)], "doc_id long, text string"
    )
    eval_set = spark.createDataFrame([(100, base)], "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in fuzzy_contamination_report(
            train, eval_set, n_hashes=16, bands=4, ngram=5, min_match=8
        ).collect()
    }
    assert 3 in out and out[3]["n_match"] == 16 and out[3]["est_jaccard"] == 1.0
    assert 1 in out and 8 <= out[1]["n_match"] < 16
    assert out[1]["est_jaccard"] == out[1]["n_match"] / 16.0
    assert 2 not in out


def test_cluster_holdout_split(spark):
    """All members of a cell share one split (the leakage guarantee);
    splits come from the boundary names; assignment is replay-stable."""
    import numpy as np

    from document_quality_assessment_ocr_spark.operators.similarity import (
        cluster_holdout_split,
    )

    rng = np.random.default_rng(3)
    centers = np.array([[5.0, 0.0], [0.0, 5.0], [-5.0, -5.0], [5.0, 5.0]])
    rows = [
        (i, [float(x) for x in centers[i % 4] + rng.normal(scale=0.1, size=2)])
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cluster_holdout_split(emb, n_centroids=4, salt=101).collect()
    per_cell = {}
    for r in out:
        per_cell.setdefault(r["cell"], set()).add(r["split"])
        assert r["split"] in {"train", "val", "test"}
    assert all(len(s) == 1 for s in per_cell.values())
    again = cluster_holdout_split(emb, n_centroids=4, salt=101).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_flesch_readability(spark):
    """Hand-computed fixed-point scores; clamps for empty/zero-sentence
    docs; all-int64 output."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        flesch_readability,
    )

    docs = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran!"),
            (2, "no sentence marks here"),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in flesch_readability(docs).collect()}
    # doc 1: words=6, sents=2 ('.', '!'), syllables: e,a,a,e,o,a = 6
    r = out[1]
    assert (r["n_words"], r["n_sents"], r["n_syll"]) == (6, 2, 6)
    assert r["flesch_milli"] == 206835 - (1015 * 6) // 2 - (84600 * 6) // 6
    # doc 2: 4 words, 0 sents -> S clamps to 1; syll: o,e,e,e,e,e,e = vowel groups
    r2 = out[2]
    assert r2["n_sents"] == 0
    assert r2["flesch_milli"] == 206835 - (1015 * 4) // 1 - (84600 * r2["n_syll"]) // 4
    # empty/null: W clamps to 1, zero syllables
    for d in (3, 4):
        assert out[d]["flesch_milli"] == 206835 - 1015


def test_dedup_report(spark):
    """Histogram accounts for every doc exactly once; a known duplicate
    pair and triple land in the right size buckets; n_removed is the
    all-but-head count."""
    from document_quality_assessment_ocr_spark.operators.dedup import dedup_report

    txt = "the quick brown fox jumps over the lazy dog again and again"
    other = "completely different words that share nothing with the fox"
    docs = spark.createDataFrame(
        [(1, txt), (2, txt), (3, txt), (10, other), (11, other), (20, "lone wolf page unseen")],
        "doc_id long, text string",
    )
    out = {r["cluster_size"]: r for r in dedup_report(docs, n_hashes=8, bands=4).collect()}
    assert out[3]["n_clusters"] == 1 and out[3]["n_docs"] == 3 and out[3]["n_removed"] == 2
    assert out[2]["n_clusters"] == 1 and out[2]["n_removed"] == 1
    assert out[1]["n_clusters"] == 1 and out[1]["n_removed"] == 0
    assert sum(r["n_docs"] for r in out.values()) == 6


def test_window_chunks(spark):
    """Every token covered, overlap = window - stride, last chunk short,
    empty docs emit nothing; reconstruction via stride-prefixes."""
    from document_quality_assessment_ocr_spark.operators.chunking import window_chunks

    text = " ".join(f"t{i}" for i in range(25))
    docs = spark.createDataFrame(
        [(1, text), (2, "a b c"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = [r for r in window_chunks(docs, window=10, stride=7).collect()]
    d1 = sorted((r for r in out if r["doc_id"] == 1), key=lambda r: r["chunk_idx"])
    # n=25, w=10, s=7 -> n_chunks = 1 + ceil(15/7) = 1 + 3 = 4
    assert [r["start_tok"] for r in d1] == [1, 8, 15, 22]
    assert [r["n_chunk_tokens"] for r in d1] == [10, 10, 10, 4]
    assert d1[0]["chunk_text"].split() == [f"t{i}" for i in range(10)]
    assert d1[3]["chunk_text"].split() == [f"t{i}" for i in range(21, 25)]
    # doc 2: 3 tokens < window -> exactly one whole-doc chunk
    d2 = [r for r in out if r["doc_id"] == 2]
    assert len(d2) == 1 and d2[0]["chunk_text"] == "a b c"
    assert not [r for r in out if r["doc_id"] in (3, 4)]


def test_recall_at_k(spark):
    """Hand-built rankings: full overlap -> 1.0; partial -> n/k; a probe
    the approx index missed entirely still rows out at 0.0; denominator
    follows the exact side when it has < k rows."""
    from document_quality_assessment_ocr_spark.operators.retrieval import recall_at_k

    exact = spark.createDataFrame(
        [(1, n, r) for r, n in enumerate([10, 11, 12], 1)]
        + [(2, n, r) for r, n in enumerate([20, 21], 1)]
        + [(3, n, r) for r, n in enumerate([30, 31, 32], 1)],
        "probe_id long, neighbor_id long, rank int",
    )
    approx = spark.createDataFrame(
        [(1, 10, 1), (1, 12, 2), (1, 99, 3), (2, 20, 1), (2, 21, 2)],
        "probe_id long, neighbor_id long, rank int",
    )
    out = {r["probe_id"]: r for r in recall_at_k(approx, exact, k=3).collect()}
    assert out[1]["n_hit"] == 2 and out[1]["n_exact"] == 3 and out[1]["recall"] == 2 / 3
    assert out[2]["n_hit"] == 2 and out[2]["n_exact"] == 2 and out[2]["recall"] == 1.0
    assert out[3]["n_hit"] == 0 and out[3]["recall"] == 0.0


def test_quantile_harmonize(spark):
    """Hand-built ECDFs (bucket width 10): the reference maps to itself
    (identity), a coarser source maps onto the matching ref quantiles,
    and a source whose first bucket sits BELOW the ref's first cumulative
    fraction falls back to the ref minimum bucket."""
    from document_quality_assessment_ocr_spark.operators.experiment import (
        quantile_harmonize,
    )

    rows = (
        [("A", v) for v in (0, 10, 20, 30)]
        + [("B", v) for v in (5, 6, 25, 35)]
        + [("D", v) for v in (0, 10, 20, 30, 40)]
    )
    docs = spark.createDataFrame(rows, "src string, v long")
    out = {
        (r["src"], r["bucket"]): r
        for r in quantile_harmonize(docs, "v", "src", "A", bucket_width=10).collect()
    }
    # identity on the reference
    for b in (0, 1, 2, 3):
        assert out[("A", b)]["mapped_ref_bucket"] == b
    # B: bucket 0 holds 2/4 -> ref bucket 1; 2 -> 2; 3 -> 3
    assert out[("B", 0)]["n"] == 2 and out[("B", 0)]["mapped_ref_bucket"] == 1
    assert out[("B", 2)]["mapped_ref_bucket"] == 2
    assert out[("B", 3)]["mapped_ref_bucket"] == 3
    # D bucket 0: cum 1/5 < ref's first 1/4 -> fallback to ref min (0)
    assert out[("D", 0)]["mapped_ref_bucket"] == 0
    # D bucket 1: cum 2/5 -> largest ref cum <= is 1/4 -> bucket 0
    assert out[("D", 1)]["mapped_ref_bucket"] == 0
    assert out[("D", 4)]["cum_n"] == 5 and out[("D", 4)]["mapped_ref_bucket"] == 3


def test_cocitation_pairs(spark):
    """Pairs counted per co-linking doc with host_a < host_b; support
    filter drops singletons; the per-doc cap keeps only the lexicographic
    prefix so capped hosts never pair."""
    from document_quality_assessment_ocr_spark.operators.graph import (
        cocitation_pairs,
    )

    rows = (
        [(1, h) for h in ("a", "b", "c")]
        + [(2, h) for h in ("b", "c")]
        + [(3, h) for h in ("a", "c", "c")]  # dup host collapses
        + [(4, "x"), (5, "")]
    )
    links = spark.createDataFrame(rows, "doc_id long, host string")
    out = [
        (r["host_a"], r["host_b"], r["n_docs"])
        for r in cocitation_pairs(links, cap=16, min_support=2).collect()
    ]
    assert out == [("a", "c", 2), ("b", "c", 2)]
    # cap=2 caps doc 1 to (a, b), so (a, c) drops to support 1 and
    # nothing survives the filter
    capped = cocitation_pairs(links, cap=2, min_support=2).collect()
    assert capped == []
    # ... and at support 1 the capped pairs are exactly (a,b) + (a,c) + (b,c)x1
    cap1 = cocitation_pairs(links, cap=2, min_support=1).collect()
    assert sorted((r["host_a"], r["host_b"], r["n_docs"]) for r in cap1) == [
        ("a", "b", 1),
        ("a", "c", 1),
        ("b", "c", 1),
    ]


def test_vocab_coverage_curve(spark):
    """Known counts x:4 y:2 z:1 w:1 -> power-of-two panel rows with exact
    integer coverage; ties rank token-ascending (w before z)."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        vocab_coverage_curve,
    )

    docs = spark.createDataFrame(
        [(1, "x x x x y"), (2, "y z w")],
        "doc_id long, text string",
    )
    # counts: x4 y2 z1 w1; total_tokens 8, total_terms 4
    out = {r["k"]: r for r in vocab_coverage_curve(docs, k_max=4).collect()}
    assert sorted(out) == [1, 2, 4]
    assert out[1]["kth_cnt"] == 4 and out[1]["coverage_micro"] == 500000
    assert out[2]["kth_cnt"] == 2 and out[2]["coverage_micro"] == 750000
    assert out[4]["coverage_micro"] == 1000000
    assert out[4]["total_terms"] == 4 and out[4]["vocab_frac_micro"] == 1000000
    assert out[1]["vocab_frac_micro"] == 250000


def test_term_burstiness(spark):
    """cf/df in micro: a repeats within docs (burst 2.0), b spreads
    (1.0), c is single-doc bursty (2.0); ties order token-ascending."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        term_burstiness,
    )

    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b"), (3, "c c")],
        "doc_id long, text string",
    )
    out = [
        (r["rank"], r["term"], r["cf"], r["df"], r["burst_micro"])
        for r in term_burstiness(docs, k=3).collect()
    ]
    assert out == [
        (1, "a", 4, 2, 2000000),
        (2, "b", 2, 2, 1000000),
        (3, "c", 2, 1, 2000000),
    ]


def test_gini_by_group(spark):
    """Hand-computed Gini: [10,10,20,40] -> 0.3125; equal masses -> 0."""
    from document_quality_assessment_ocr_spark.operators.profile import (
        gini_by_group,
    )

    docs = spark.createDataFrame(
        [
            (1, "s", 10),
            (2, "s", 10),
            (3, "s", 20),
            (4, "s", 40),
            (5, "t", 5),
            (6, "t", 5),
        ],
        "doc_id long, source string, n_chars long",
    )
    out = {r["source"]: r for r in gini_by_group(docs).collect()}
    # s: S1 = 10*1+10*2+20*3+40*4 = 250, S0 = 80, n = 4
    #    gini = (500 - 400) / 320 = 0.3125
    assert out["s"]["n_docs"] == 4 and out["s"]["total_mass"] == 80
    assert out["s"]["gini_micro"] == 312500
    assert out["t"]["gini_micro"] == 0


def test_rfm_segments(spark):
    """Fixed-edge buckets: u2 owns the corpus max (r=0); u1 trails by
    10 days (r-bucket 3); milli-values truncate per event."""
    import datetime as dt

    from document_quality_assessment_ocr_spark.operators.sessions import (
        rfm_segments,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 101, t0, "view", 1.5),
        (2, 101, t0 + dt.timedelta(hours=1), "view", 1.5),
        (3, 102, t0 + dt.timedelta(days=10), "buy", 0.5),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    out = {
        (r["r_bucket"], r["f_bucket"], r["m_bucket"]): r
        for r in rfm_segments(ev).collect()
    }
    # u1: r_days=10 -> bucket 3; f = log2floor(2) = 1; m = log2floor(3000) = 11
    # u2: r_days=0 -> bucket 0; f = 0; m = log2floor(500) = 8
    assert out[(3, 1, 11)]["n_users"] == 1
    assert out[(3, 1, 11)]["sum_value_milli"] == 3000
    assert out[(0, 0, 8)]["n_users"] == 1
    assert out[(0, 0, 8)]["sum_events"] == 1


def test_stickiness(spark):
    """u1 active 2 days, u2 one day, one 7-day period: DAU sum 3 over
    2 active days x 2 actives -> 750000 micro."""
    import datetime as dt

    from document_quality_assessment_ocr_spark.operators.sessions import (
        stickiness,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0, "a", 0.0),
        (2, 2, t0 + dt.timedelta(hours=2), "a", 0.0),
        (3, 1, t0 + dt.timedelta(days=1), "a", 0.0),
        (4, 1, t0 + dt.timedelta(days=1, hours=3), "a", 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    out = stickiness(ev, period_days=7).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_active_days"] == 2 and r["sum_dau"] == 3 and r["pau"] == 2
    assert r["stickiness_micro"] == 750000


def test_rank_concordance(spark):
    """3 concordant rows + 1 that's discordant with two and y-tied with
    one: P=3, Q=2, ties excluded -> 600000 micro."""
    from document_quality_assessment_ocr_spark.operators.experiment import (
        rank_concordance,
    )

    df = spark.createDataFrame(
        [(0, 0), (1, 1), (2, 2), (3, 0)], "x long, y long"
    )
    r = rank_concordance(df, "x", "y", x_width=1, y_width=1, n_buckets=16).collect()[0]
    assert r["n_rows"] == 4
    assert r["concordant"] == 3 and r["discordant"] == 2
    assert r["concordance_micro"] == 600000


def test_filter_attribution(spark):
    """Three crafted docs: one clean, one failing ONLY word_count, one
    failing word_count AND stopwords (first-fail = word_count)."""
    from document_quality_assessment_ocr_spark.operators.quality import (
        filter_attribution,
    )

    good = " ".join(["the", "and", "that", "with"] * 15)  # 60 words
    short = " ".join(["the", "and", "that", "with"] * 3)  # 12 words
    short_nostop = " ".join(["cat", "dog", "fox"] * 4)  # 12 words, 0 stops
    docs = spark.createDataFrame(
        [(1, good), (2, short), (3, short_nostop)],
        "doc_id long, text string",
    )
    out = {r["gate"]: r for r in filter_attribution(docs).collect()}
    assert len(out) == 7
    assert out["word_count"]["n_docs"] == 3
    assert out["word_count"]["n_rejected"] == 2
    assert out["word_count"]["n_fail"] == 2
    assert out["word_count"]["n_first_fail"] == 2
    assert out["word_count"]["n_unique_fail"] == 1  # doc 2 only
    assert out["stopwords"]["n_fail"] == 1  # doc 3
    assert out["stopwords"]["n_first_fail"] == 0  # word_count wins
    assert out["stopwords"]["n_unique_fail"] == 0
    # first-fail shares partition the rejected docs exactly
    assert sum(r["n_first_fail"] for r in out.values()) == 2


def test_degree_assortativity(spark):
    """Star + chain: hand-checkable degree buckets; result bounded and
    deterministic; n_rows = unique edges after dedup."""
    from document_quality_assessment_ocr_spark.operators.graph import (
        degree_assortativity,
    )

    edges = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("a", "z"), ("b", "x"), ("b", "x"), ("c", "x")],
        "src string, dst string",
    )
    r = degree_assortativity(edges).collect()[0]
    # unique edges: a->x a->y a->z b->x c->x  (b->x dup removed)
    assert r["n_rows"] == 5
    # out-degs: a=3 b=1 c=1; in-degs: x=3 y=1 z=1
    # log2 buckets: deg3->1, deg1->0
    # edge (b1,b2): a->x (1,1) a->y (1,0) a->z (1,0) b->x (0,1) c->x (0,1)
    # concordant pairs: cell(1,1) vs strictly-smaller cell(0,0): none -> P = 0
    # discordant: cell(1,0)x2 vs (0,1)x2 -> 4
    assert r["concordant"] == 0 and r["discordant"] == 4
    assert r["concordance_micro"] == 0


def test_winsorized_mean(spark):
    """10 values 1..9 + outlier 1000: p10/p90 clamp tames the tail."""
    from document_quality_assessment_ocr_spark.operators.profile import (
        winsorized_mean,
    )

    vals = [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000]
    docs = spark.createDataFrame(
        [(i, "s", v) for i, v in enumerate(vals)],
        "doc_id long, source string, n_chars long",
    )
    r = winsorized_mean(docs, "n_chars", "source").collect()[0]
    # n=10: lo rank = ceil(10*10/100)=1 -> lo=1; hi rank = ceil(900/100)=9 -> hi=9
    assert r["lo"] == 1 and r["hi"] == 9
    # clamped: 1..9 stay, 1000 -> 9; mass = 45 + 9 = 54
    assert r["winsorized_mass"] == 54
    assert r["winsorized_mean_micro"] == 5400000


def test_mmr_rerank(spark):
    """Greedy diversification: probe 0 pulls the relevance winner first,
    then skips the near-duplicate of it in round 2 when lambda favors
    diversity; all vectors hand-chosen in 2-D."""
    from document_quality_assessment_ocr_spark.operators.similarity import (
        mmr_rerank,
    )

    # probe = (1, 0). cands: id1 (1, 0.01) rel~1.0; id2 (1, 0.02) near-dup
    # of id1; id3 (0.6, 0.8) diverse, lower rel.
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.01]),
        (2, [1.0, 0.02]),
        (3, [0.6, 0.8]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        (r["probe_id"], r["round"]): r["neighbor_id"]
        for r in mmr_rerank(
            emb, probe_ids=[0], k=3, lambda_micro=100000
        ).collect()
    }
    assert out[(0, 1)] == 1  # pure relevance
    # round 2 at lambda=0.1: id2's near-dup penalty (~1.0 sim to id1)
    # dwarfs its relevance edge; id3 (sim ~0.61) wins on diversity
    assert out[(0, 2)] == 3
    assert out[(0, 3)] == 2


def test_ndcg_and_mrr(spark):
    """Hand-built rankings: approx finds exact-2 at rank 1 and exact-1
    at rank 3 (k=3) — nDCG and MRR verified against a python replay of
    the shared integer-discount math; a miss-everything probe reads 0."""
    import math

    from document_quality_assessment_ocr_spark.operators.retrieval import (
        mrr_at_k,
        ndcg_at_k,
        ndcg_discounts_micro,
    )

    k = 3
    # exact top-3 for probe 0: 10, 11, 12 (ranks 1..3)
    exact = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3), (7, 30, 1)],
        "probe_id long, neighbor_id long, rank long",
    )
    # approx for probe 0: 11 @1, 99 @2, 10 @3; probe 7 misses entirely
    approx = spark.createDataFrame(
        [(0, 11, 1), (0, 99, 2), (0, 10, 3), (7, 40, 1)],
        "probe_id long, neighbor_id long, rank long",
    )
    d = ndcg_discounts_micro(k)
    assert d == [round(1e6 / math.log2(i + 1)) for i in range(1, k + 1)]
    nd = {r["probe_id"]: r for r in ndcg_at_k(approx, exact, k=k).collect()}
    # rel: 10 -> 3, 11 -> 2, 12 -> 1
    want_dcg = 2 * d[0] + 0 * d[1] + 3 * d[2]
    want_idcg = 3 * d[0] + 2 * d[1] + 1 * d[2]
    assert nd[0]["dcg_micro"] == want_dcg
    assert nd[0]["idcg_micro"] == want_idcg
    assert nd[0]["ndcg_micro"] == want_dcg * 1_000_000 // want_idcg
    assert nd[7]["dcg_micro"] == 0 and nd[7]["ndcg_micro"] == 0

    mr = {r["probe_id"]: r for r in mrr_at_k(approx, exact, k=k).collect()}
    assert mr[0]["first_hit_rank"] == 1 and mr[0]["rr_micro"] == 1_000_000
    assert mr[7]["first_hit_rank"] == 0 and mr[7]["rr_micro"] == 0


def test_cohens_d_matches_numpy(spark):
    """Two labeled samples per group vs a numpy pooled-SD replay;
    degenerate groups (single-side, zero variance) read 0e0."""
    import numpy as np

    from document_quality_assessment_ocr_spark.operators.experiment import (
        cohens_d_by_group,
    )

    pos = [100, 140, 120, 160]
    neg = [80, 90, 70, 100, 60]
    rows = [("a", v, 1) for v in pos] + [("a", v, 0) for v in neg]
    rows += [("b", 5, 1), ("b", 5, 1), ("b", 5, 0), ("b", 5, 0)]  # var 0
    rows += [("c", 1, 1), ("c", 2, 1)]  # no negatives
    df = spark.createDataFrame(rows, "g string, v long, label long")
    out = {r["g"]: r for r in cohens_d_by_group(df, "v", "label", "g").collect()}

    p, n = np.array(pos, float), np.array(neg, float)
    ss = ((p - p.mean()) ** 2).sum() + ((n - n.mean()) ** 2).sum()
    want = (p.mean() - n.mean()) / np.sqrt(ss / (len(p) + len(n) - 2))
    assert abs(out["a"]["cohens_d"] - round(want, 6)) < 2e-6
    assert out["a"]["n_pos"] == 4 and out["a"]["n_neg"] == 5
    assert out["b"]["cohens_d"] == 0.0  # pooled SS == 0 guard
    assert out["c"]["cohens_d"] == 0.0  # n_neg < 2 guard


def test_zipf_slope_python_replay(spark):
    """Synthetic near-Zipf corpus vs a python replay of the whole-bit
    band math: per-term floor-log2 ranks/counts, exact OLS moments."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        zipf_slope,
    )

    # counts: term_i repeated max(16 >> i, 1) times -> clean log2 steps
    words = []
    for i in range(8):
        words += [f"w{i}"] * max(16 >> i, 1)
    docs = spark.createDataFrame(
        [(1, " ".join(words), "s")], "doc_id long, text string, source string"
    )
    out = zipf_slope(docs, "source").collect()
    assert len(out) == 1
    r = out[0]

    # python replay: rank terms by count desc (ties: any order inside a
    # cell — the band overlap math is order-free within equal counts)
    from collections import Counter

    c = Counter(words)
    ordered = sorted(c.values(), reverse=True)
    xs = [(rank + 1).bit_length() - 1 for rank in range(len(ordered))]
    ys = [v.bit_length() - 1 for v in ordered]
    n = len(ordered)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    assert r["n_types"] == n
    assert r["num"] == n * sxy - sx * sy
    assert r["den"] == n * sxx - sx * sx
    want = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    assert abs(r["zipf_slope"] - want) < 2e-6
    assert r["zipf_slope"] < 0  # heavier tail -> negative slope


def test_mcnemar_filters(spark):
    """Hand-built 2x2: 3 both-keep, 2 A-only, 1 B-only, 4 both-drop ->
    chi2 = (1-2)^2/3, agreement 7/10."""
    from document_quality_assessment_ocr_spark.operators.experiment import (
        mcnemar_filters,
    )

    rows = (
        [("s", 1, 1)] * 3 + [("s", 1, 0)] * 2 + [("s", 0, 1)] + [("s", 0, 0)] * 4
    )
    df = spark.createDataFrame(rows, "g string, a long, b long")
    r = mcnemar_filters(df, "a", "b", "g").collect()[0]
    assert (r["n11"], r["n10"], r["n01"], r["n00"]) == (3, 2, 1, 4)
    assert r["agreement_micro"] == 700000
    assert abs(r["mcnemar_chi2"] - round(1 / 3, 6)) < 2e-6

    # no discordant pairs -> 0e0 guard
    df2 = spark.createDataFrame([("t", 1, 1), ("t", 0, 0)], "g string, a long, b long")
    assert mcnemar_filters(df2, "a", "b", "g").collect()[0]["mcnemar_chi2"] == 0.0


def test_kaplan_meier_replay(spark):
    """5 users with hand-placed lifetimes vs a python KM replay: deaths
    step the curve, the max-day user is censored (no step), at-risk
    shrinks by deaths AND censorings."""
    from datetime import datetime, timedelta

    from document_quality_assessment_ocr_spark.operators.sessions import (
        kaplan_meier,
        kaplan_meier_fold,
    )

    t0 = datetime(2026, 1, 1)

    def ev(eid, uid, day):
        return (eid, uid, "E", t0 + timedelta(days=day), 1.0)

    # max day M = 10. lifetimes: u1 0->2 (ev), u2 0->2 (ev), u3 0->5 (ev),
    # u4 3->10 (censored: last==M), u5 10->10 (censored, dur 0)
    rows = [
        ev(1, 1, 0), ev(2, 1, 2),
        ev(3, 2, 0), ev(4, 2, 2),
        ev(5, 3, 0), ev(6, 3, 5),
        ev(7, 4, 3), ev(8, 4, 10),
        ev(9, 5, 10),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts timestamp, "
        "value double",
    )
    out = {r["dur_days"]: r for r in kaplan_meier(df).collect()}
    # grid: dur 0: 1 censored; dur 2: 2 deaths; dur 5: 1 death; dur 7: 1 censored
    assert out[0]["n_risk"] == 5 and out[0]["n_events"] == 0
    assert out[2]["n_risk"] == 4 and out[2]["n_events"] == 2
    assert out[5]["n_risk"] == 2 and out[5]["n_events"] == 1
    assert out[7]["n_censored"] == 1
    # fold replay: s(2) = 1e6*(4-2)//4 = 500000; s(5) = 500000*(2-1)//2
    assert out[0]["s_micro"] == 1_000_000
    assert out[2]["s_micro"] == 500_000
    assert out[5]["s_micro"] == 250_000
    assert out[7]["s_micro"] == 250_000  # censoring never steps the curve
    want = kaplan_meier_fold([(0, 0, 1), (2, 2, 0), (5, 1, 0), (7, 0, 1)])
    assert [(t, r, d, c, s) for t, r, d, c, s in want] == [
        (0, 5, 0, 1, 1_000_000),
        (2, 4, 2, 0, 500_000),
        (5, 2, 1, 0, 250_000),
        (7, 1, 0, 1, 250_000),
    ]


def test_mann_kendall_daily(spark):
    """Strictly rising daily counts -> S = C(n,2), no ties, z > 0;
    a constant series -> all ties, var18 = 0 -> z = 0e0 guard."""
    from datetime import datetime, timedelta

    from document_quality_assessment_ocr_spark.operators.sessions import (
        mann_kendall_daily,
    )

    t0 = datetime(2026, 3, 1)
    rows = []
    eid = 0
    for day in range(5):  # counts 1,2,3,4,5 -> strictly increasing
        for _ in range(day + 1):
            eid += 1
            rows.append((eid, 1, "E", t0 + timedelta(days=day), 1.0))
    schema = (
        "event_id long, user_id long, event_type string, ts timestamp, "
        "value double"
    )
    r = mann_kendall_daily(spark.createDataFrame(rows, schema)).collect()[0]
    n = 5
    assert r["n_days"] == n
    assert r["s_stat"] == n * (n - 1) // 2  # all pairs concordant
    assert r["var18"] == n * (n - 1) * (2 * n + 5)
    import math

    want = round((r["s_stat"] - 1) / math.sqrt(r["var18"] / 18), 6)
    assert abs(r["z_mk"] - want) < 2e-6 and r["z_mk"] > 0

    flat = [(i, 1, "E", t0 + timedelta(days=i), 1.0) for i in range(4)]
    r2 = mann_kendall_daily(spark.createDataFrame(flat, schema)).collect()[0]
    assert r2["s_stat"] == 0 and r2["var18"] == 0 and r2["z_mk"] == 0.0


def test_textrank_keywords(spark):
    """Hub word 'x' adjacent to w0..w3 out-centralizes them; ranks are
    the fixed-point nano-ranks (deterministic, repeat-stable)."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        textrank_keywords,
    )

    text = "x w0 x w1 x w2 x w3"
    docs = spark.createDataFrame(
        [(1, text, "s")], "doc_id long, text string, source string"
    )
    out = textrank_keywords(docs, k=5, iters=3).collect()
    assert out[0]["term"] == "x" and out[0]["rank"] == 1
    assert {r["term"] for r in out} == {"x", "w0", "w1", "w2", "w3"}
    # spokes tie -> term ASC breaks: w0 < w1 < w2 < w3
    assert [r["term"] for r in out[1:]] == ["w0", "w1", "w2", "w3"]
    again = textrank_keywords(docs, k=5, iters=3).collect()
    assert [r.asDict() for r in again] == [r.asDict() for r in out]


def test_psi_drift_properties(spark):
    """Identical halves -> every psi_term 0; a shifted half -> positive
    terms; terms are non-negative by bits-monotonicity."""
    from document_quality_assessment_ocr_spark.operators.experiment import (
        psi_drift,
    )

    # ids 0..199, constant value -> single bucket, halves differ only in
    # COUNT (md5 split is ~even but not exactly); p/q micro differ a bit
    docs = spark.createDataFrame(
        [(i, 100) for i in range(200)], "doc_id long, n_chars long"
    )
    out = psi_drift(docs).collect()
    assert len(out) == 1 and out[0]["bucket"] == 100 .bit_length() - 1
    assert all(r["psi_term"] >= 0 for r in out)

    # big drift: half-dependent magnitudes via value = doc_id parity proxy
    rows = [(i, 10 if i % 2 == 0 else 10_000) for i in range(400)]
    out2 = psi_drift(
        spark.createDataFrame(rows, "doc_id long, n_chars long")
    ).collect()
    assert all(r["psi_term"] >= 0 for r in out2)
    assert len({r["psi_total"] for r in out2}) == 1  # constant total col
    # python replay of the whole-bit algebra
    import hashlib

    def half(i):
        return int(hashlib.md5(f"{i}|psi".encode()).hexdigest()[:15], 16) % 2

    na = {}
    nb = {}
    for i, v in rows:
        b = (v + 1).bit_length() - 1
        (na if half(i) == 0 else nb)[b] = (na if half(i) == 0 else nb).get(b, 0) + 1
    ta, tb = sum(na.values()), sum(nb.values())
    want_total = 0
    for b in set(na) | set(nb):
        p = na.get(b, 0) * 1_000_000 // max(ta, 1)
        q = nb.get(b, 0) * 1_000_000 // max(tb, 1)
        bits = lambda x: max(x, 0).bit_length() - 1 if x > 0 else 0
        want_total += (p - q) * (bits(p) - bits(q))
    assert out2[0]["psi_total"] == want_total


def test_partition_conductance(spark):
    """Hand-built 6-edge graph vs a python replay of the md5-mod-4
    assignment: cut counted to both sides, min-side volume guard."""
    import hashlib

    from document_quality_assessment_ocr_spark.operators.graph import (
        partition_conductance,
    )

    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("d", "e"), ("e", "f"), ("a", "d"), ("a", "b"),  # dup collapses
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r["grp"]: r for r in partition_conductance(df, groups=4).collect()}

    def gof(x):
        return int(hashlib.md5(f"{x}|cond".encode()).hexdigest()[:15], 16) % 4

    und = {tuple(sorted(e)) for e in edges}
    ne = len(und)
    vol, cut = {}, {}
    for a, b in und:
        ga, gb = gof(a), gof(b)
        vol[ga] = vol.get(ga, 0) + 1
        vol[gb] = vol.get(gb, 0) + 1
        if ga != gb:
            cut[ga] = cut.get(ga, 0) + 1
            cut[gb] = cut.get(gb, 0) + 1
    for g, v in vol.items():
        r = out[g]
        assert r["vol"] == v and r["n_edges"] == ne
        c = cut.get(g, 0)
        assert r["cut_edges"] == c
        assert r["conductance_micro"] == c * 1_000_000 // max(
            min(v, 2 * ne - v), 1
        )
    assert set(out) == set(vol)


def test_partition_modularity(spark):
    """Same 6-edge graph as the conductance test vs a python replay of
    the 4m^2-scaled Newman identity; Q consistency: sum q_num matches
    q_micro's numerator."""
    import hashlib

    from document_quality_assessment_ocr_spark.operators.graph import (
        partition_modularity,
    )

    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("d", "e"), ("e", "f"), ("a", "d"), ("a", "b"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r["grp"]: r for r in partition_modularity(df, groups=4).collect()}

    def gof(x):
        return int(hashlib.md5(f"{x}|cond".encode()).hexdigest()[:15], 16) % 4

    und = {tuple(sorted(e)) for e in edges}
    m = len(und)
    vol, win = {}, {}
    for a, b in und:
        ga, gb = gof(a), gof(b)
        vol[ga] = vol.get(ga, 0) + 1
        vol[gb] = vol.get(gb, 0) + 1
        if ga == gb:
            win[ga] = win.get(ga, 0) + 1
    qsum = 0
    for g, v in vol.items():
        qn = 4 * m * win.get(g, 0) - v * v
        assert out[g]["q_num"] == qn
        assert out[g]["within_edges"] == win.get(g, 0)
        qsum += qn
    # min-shifted fixed point: operand non-negative by construction
    qm = (qsum + 4 * m * m) * 1_000_000 // max(4 * m * m, 1) - 1_000_000
    assert all(r["q_micro"] == qm for r in out.values())
    assert set(out) == set(vol)


def test_sqrt_mixture_weights(spark):
    """80/20 two-language corpus vs a python isqrt replay: T=2 flattens
    toward uniform (tail gains), weights sum to ~1e6."""
    import math

    from document_quality_assessment_ocr_spark.operators.sampling import (
        sqrt_mixture_weights,
    )

    rows = [(i, "en") for i in range(80)] + [(i + 80, "sw") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = {r["lang"]: r for r in sqrt_mixture_weights(df, "lang").collect()}
    sa = 80 * 1_000_000 // 100
    sb = 20 * 1_000_000 // 100
    wa = math.isqrt(sa * 1_000_000)
    wb = math.isqrt(sb * 1_000_000)
    assert out["en"]["share_micro"] == sa and out["sw"]["share_micro"] == sb
    assert out["en"]["weight_micro"] == wa * 1_000_000 // (wa + wb)
    assert out["sw"]["weight_micro"] == wb * 1_000_000 // (wa + wb)
    # flattening: tail lang's weight > its raw share
    assert out["sw"]["weight_micro"] > sb
    assert out["en"]["weight_micro"] < sa


def test_prf_expansion(spark):
    """Hand-built corpus: feedback pool shares a rare token that the
    query itself doesn't contain -> it tops the expansion; original
    query terms never appear."""
    from document_quality_assessment_ocr_spark.operators.retrieval import (
        prf_expansion,
    )

    # q terms: 'alpha'. docs 1,2 contain alpha+zeta (pool); doc 3 only
    # noise. zeta is rare (df=2 of 4) -> positive idf; 'common' appears
    # everywhere -> idf 0 -> never ranks above zeta.
    rows = [
        (1, "alpha zeta common x1"),
        (2, "alpha zeta zeta zeta common x2"),
        (3, "noise common x3"),
        (4, "filler common x4"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = prf_expansion(d, {1: ["alpha"]}, k_docs=2, m=3).collect()
    toks = [r["token"] for r in out]
    assert "alpha" not in toks  # original term excluded
    assert toks[0] == "zeta"  # tf_pool=4, df=2 -> score 4000 beats x1's 3000
    r0 = out[0]
    n_docs, df = 4, 2
    assert r0["score"] == 4 * ((n_docs - df) * 1000 // df)
    assert all(out[i]["score"] >= out[i + 1]["score"] for i in range(len(out) - 1))


def test_duplicate_clusters_star_equals_pairs(spark):
    """The r6 star-contracted default candidate edges must produce the
    same components as the explicit pair list (clique vs star on the
    bucket minimum are CC-equivalent)."""
    from document_quality_assessment_ocr_spark.operators.dedup import (
        duplicate_clusters,
        minhash_lsh_pairs,
    )

    rows = []
    for i in range(60):
        base = f"the quick brown fox jumps over dog number {i % 7} again and again"
        if i % 3 == 0:
            base += " tail"
        rows.append((i, base))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    star = {
        (r["doc_id"], r["cluster_id"], r["is_cluster_head"])
        for r in duplicate_clusters(docs, n_hashes=8, bands=4).collect()
    }
    pairs = minhash_lsh_pairs(docs, n_hashes=8, bands=4)
    viapairs = {
        (r["doc_id"], r["cluster_id"], r["is_cluster_head"])
        for r in duplicate_clusters(
            docs, n_hashes=8, bands=4, candidates=pairs
        ).collect()
    }
    assert star == viapairs and len(star) == 60


def test_celldrop_matches_pair_join(spark):
    """_celldrop_ids (r6 numpy rewrite) == the pair-join + Arrow
    pair-cosine + F.round >= tau form it replaced, on clustered vectors
    with exact duplicates (rounded ties)."""
    import numpy as np
    from pyspark.sql import functions as F

    from document_quality_assessment_ocr_spark.operators.similarity import (
        _celldrop_ids,
        pair_cosine_udf,
    )

    rng = np.random.default_rng(7)
    rows = []
    rid = 0
    for cell in range(3):
        center = rng.normal(size=8)
        for j in range(25):
            v = center if j % 5 == 0 else center + rng.normal(size=8) * (1e-8 if j % 5 == 1 else 0.3)
            rows.append((rid, cell, [float(x) for x in v]))
            rid += 1
    assigned = spark.createDataFrame(rows, "vec_id long, cell int, embedding array<double>")
    for tau in (0.99, 0.35):
        fast = {r["vec_id"] for r in _celldrop_ids(assigned, tau, "vec_id", "embedding").collect()}
        x, y = assigned.alias("x"), assigned.alias("y")
        ref = {
            r["vec_id"]
            for r in x.join(
                y,
                (F.col("x.cell") == F.col("y.cell"))
                & (F.col("y.vec_id") < F.col("x.vec_id")),
            )
            .where(
                F.round(pair_cosine_udf()(F.col("x.embedding"), F.col("y.embedding")), 6)
                >= F.lit(float(tau))
            )
            .select(F.col("x.vec_id").alias("vec_id"))
            .distinct()
            .collect()
        }
        assert fast == ref, (tau, fast ^ ref)


def test_silhouette_audit_empty_input(spark):
    """Empty embeddings -> empty audit grid with the declared schema, not
    an opaque crash (r5 ADVICE)."""
    from document_quality_assessment_ocr_spark.operators.similarity import (
        silhouette_audit,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = silhouette_audit(empty)
    assert out.columns == ["cell", "n_points", "n_positive", "sum_s_micro"]
    assert out.count() == 0


def test_minhash_signatures_python_path_matches_column_form(spark):
    """The r6 mapInPandas signature pass must equal the explode +
    HashAggregate Column form it replaced, char AND word mode, including
    whitespace/short-doc edges."""
    from pyspark.sql import functions as F

    from document_quality_assessment_ocr_spark.operators.dedup import (
        MERSENNE31,
        _shingle_df,
        minhash_coeffs,
        minhash_signatures,
        shingle_hash_expr,
    )

    rows = [
        (1, "The quick  brown fox\tjumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "  leading and trailing   "),
        (4, ""),
        (5, None),
        (6, "tiny"),
        (7, "a b c d e f g h i j k l m n o p"),
        (8, "word word word word word word"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for mode, ngram in (("char", 5), ("word", 3)):
        fast = {
            r["doc_id"]: tuple(r[f"h{i:02d}"] for i in range(8))
            for r in minhash_signatures(
                docs, "doc_id", "text", 8, ngram, shingle=mode
            ).collect()
        }
        sh = _shingle_df(docs, "doc_id", "text", ngram, mode).select(
            F.col("doc_id"), shingle_hash_expr("g").alias("hm")
        )
        p = F.lit(MERSENNE31)
        aggs = [
            F.min((F.lit(a) * F.col("hm") + F.lit(b)) % p).alias(f"h{i:02d}")
            for i, (a, b) in enumerate(minhash_coeffs(8, 1))
        ]
        ref = {
            r["doc_id"]: tuple(r[f"h{i:02d}"] for i in range(8))
            for r in sh.groupBy("doc_id").agg(*aggs).collect()
        }
        assert fast == ref, (mode, fast, ref)


def test_minhash_fused_gram_sets_match_column_form(spark):
    """with_gram_sets=True must emit EXACTLY the Column-form doc-local
    distinct shingle arrays (_shingle_sets): same strings, same
    first-occurrence order, same docs present (short docs carry no
    signature row; the Column form carries an empty array for them)."""
    from document_quality_assessment_ocr_spark.operators.dedup import (
        _shingle_sets,
        minhash_signatures,
    )

    rows = [
        (1, "The quick  brown fox\tjumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "  leading and trailing   "),
        (4, ""),
        (5, None),
        (6, "tiny"),
        (7, "a b c a b c a b c a b c"),
        (8, "word word word word word word"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for mode, ngram in (("char", 5), ("word", 3)):
        fused = {
            r["doc_id"]: list(r["gs"])
            for r in minhash_signatures(
                docs, "doc_id", "text", 8, ngram, shingle=mode,
                with_gram_sets=True,
            ).collect()
        }
        ref = {
            r["doc_id"]: list(r["gs"])
            for r in _shingle_sets(docs, "doc_id", "text", ngram, mode).collect()
        }
        for did, gs in fused.items():
            assert gs == ref[did], (mode, did, gs, ref[did])
        # docs absent from the fused table have an EMPTY Column-form set
        for did, gs in ref.items():
            if did not in fused:
                assert gs == [], (mode, did, gs)


def test_hyperplane_buckets_udf_matches_column_form(spark):
    """The r6 Arrow bucket UDF must equal the aggregate/zip_with Column
    form it replaced: _seq_fold_dot reproduces the HOF fold exactly, so
    the packed sign bits are bit-identical."""
    import numpy as np
    from pyspark.sql import functions as F

    from document_quality_assessment_ocr_spark.operators.similarity import (
        _dot,
        _lit_vec,
        hyperplane_lsh_buckets,
    )

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.standard_normal(64)]) for i in range(64)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # 48x64 >= 2048 forces the Arrow-UDF branch; 12x64 exercises the
    # Column branch — both must equal the reference fold
    for n_planes in (12, 48):
        fast = {
            r["vec_id"]: r["bucket"]
            for r in hyperplane_lsh_buckets(
                emb, 64, n_planes=n_planes, seed=42
            ).collect()
        }
        planes = np.random.default_rng(42).standard_normal((n_planes, 64))
        acc = F.lit(0).cast("long")
        for p in range(n_planes):
            dot = _dot(_lit_vec(planes[p]), F.col("embedding"))
            acc = acc + F.when(dot > 0, F.lit(2**p).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        ref = {
            r["vec_id"]: r["b"]
            for r in emb.select("vec_id", acc.alias("b")).collect()
        }
        assert fast == ref, n_planes
