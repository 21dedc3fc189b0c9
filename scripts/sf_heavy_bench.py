#!/usr/bin/env python3
"""Measured scale step (VERDICT r3 #1): time the heaviest registry queries
and count physical-plan Exchanges at a given sf dir — run at BOTH
/root/testdata/sf0.1 and .bench_cache/sf1_tables (10× rows, built by
scripts/make_sf1.py) and compare: near-linear wall growth and an unchanged
exchange count per query is the pass condition ("no new exchange at sf1" —
the failure mode would be a broadcast side crossing the threshold and
flipping to a shuffle join).

Heavy set = the r3 bench's top lines that read only documents/embeddings
(the sf1 set replicates those two tables; TPC-H-backed queries keep their
sf0.1 lines). q134 is benched the round-4 way: the q31 iterative CC loop as
its own line, the consumer against the persisted artifact.

Usage: python3 scripts/sf_heavy_bench.py <sf_dir> [cpus]
Prints one RESULT json line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY = [
    "q111_d4_prune",
    "q93_curation_v4",
    "q79_curation_v3",
    "q46_pq_topk",
    "q42_bloom_decontam",
    "q45_curation_v2",
    "q105_simhash_pairs",
    "q102_rrf_hybrid",
    "q73_exact_substring",
    "q107_prototype_prune",
    "q131_host_pagerank",
    "q25_lsh_jaccard",
    # sixth/seventh-session family reps (documents/embeddings-backed)
    "q146_binary_topk",
    "q147_zorder_layout",
    "q148_matryoshka_topk",
    "q149_hits",
    "q150_borda_ensemble",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_cache/sf1_tables"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF", sf_dir)

    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(repo, "__spark_entry__.py")
    )
    se = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(se)

    from pyspark.sql import functions as F

    from document_quality_assessment_ocr_spark.operators.dedup import duplicate_clusters
    from document_quality_assessment_ocr_spark.session import get_spark

    spark = get_spark(
        app_name=f"sf_heavy[{os.path.basename(sf_dir)}]",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )
    qs = se.queries()
    timings: dict[str, float] = {}
    exchanges: dict[str, int] = {}

    def timed(name, fn, reps=2):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        print(f"[heavy] {name}: {timings[name]}s", file=sys.stderr, flush=True)

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    n_docs = docs.count()

    timed(
        "q31_cluster_loop",
        lambda: duplicate_clusters(docs, n_hashes=8, bands=4)
        .write.mode("overwrite")
        .format("noop")
        .save(),
    )
    clustered = duplicate_clusters(docs, n_hashes=8, bands=4).persist()
    clustered.count()
    timed(
        "q134_preference_pairs",
        lambda: se._q_preference_pairs(spark, sf_dir, clustered=clustered)
        .write.mode("overwrite")
        .format("noop")
        .save(),
    )
    clustered.unpersist()

    for name in HEAVY:
        df = qs[name](spark, sf_dir)
        # static physical plan exchange count — scale-dependence here means
        # a join strategy flipped with the input size
        exchanges[name] = df._jdf.queryExecution().executedPlan().toString().count(
            "Exchange"
        )
        timed(
            name,
            lambda df=None, name=name: qs[name](spark, sf_dir)
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )

    out = {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "cpus": cpus,
        "queries": timings,
        "plan_exchanges": exchanges,
    }
    spark.stop()
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
