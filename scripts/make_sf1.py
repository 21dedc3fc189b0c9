#!/usr/bin/env python3
"""Build the sf1 (10× sf0.1) synthetic table set for the measured scale
step (VERDICT r3 next-round #1): the 100 TB design argument needs at least
one ≥10× row-count run, and the driver ships no sf1 testdata.

Derivation is deterministic and self-contained (no external data — the
task-brief rule): 10 replicas of /root/testdata/sf0.1, where replica 0 is
the original and replicas 1–9 are STRUCTURE-PRESERVING mutations:

- documents: per-replica seeded word permutation of ``text``. Length/token
  distributions (what quality/extraction cost scales with) are preserved,
  while cross-replica shingle overlap collapses to ~0 — so near-dup
  CLUSTERS grow linearly with corpus size (10× more clusters of the same
  size), not quadratically (10×-larger clusters), matching how a real 10×
  web crawl behaves. A naive 10× copy would make every pair-emitting dedup
  query O(replication²) and poison the scaling read.
- embeddings: per-replica seeded sign-flip pattern on the vector
  components. Norms, pairwise-distance distribution, and per-replica
  cluster structure are preserved; cross-replica vectors land far apart.

ids offset by replica·10_000_000 (sf0.1 ids are ≪ 10M), staying BIGINT.

Output: <repo>/.bench_cache/sf1_tables/{documents,embeddings}.parquet
(+ _DONE marker). ~50k docs / 20k vectors. Other TPC-H tables are not
replicated — the sf1 scale step benches the documents/embeddings-backed
queries (the heavy set); TPC-H-backed queries stay at their sf0.1 lines.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = os.path.join(REPO, ".bench_cache", "sf1_tables")
REPLICAS = 10
ID_STRIDE = 10_000_000


def permute_words(text: str, rng: np.random.Generator) -> str:
    words = text.split()
    if len(words) < 2:
        return text
    return " ".join(words[i] for i in rng.permutation(len(words)))


def main() -> None:
    done = os.path.join(OUT, "_DONE")
    if os.path.exists(done):
        print(f"[sf1] already built: {OUT}")
        return
    os.makedirs(OUT, exist_ok=True)

    t0 = time.time()
    docs = pq.read_table(os.path.join(SRC, "documents.parquet"))
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    langs = docs.column("lang").to_pylist()
    sources = docs.column("source").to_pylist()
    assert max(ids) < ID_STRIDE
    rows = []
    for rep in range(REPLICAS):
        rng = np.random.default_rng(1000 + rep)
        for did, tx, lg, sc in zip(ids, texts, langs, sources):
            tx = tx or ""
            nt = tx if rep == 0 else permute_words(tx, rng)
            rows.append(
                {
                    "doc_id": did + rep * ID_STRIDE,
                    "text": nt,
                    "lang": lg,
                    "source": sc,
                    "n_chars": len(nt),
                }
            )
    pq.write_table(
        pa.Table.from_pylist(rows, schema=docs.schema.remove_metadata()),
        os.path.join(OUT, "documents.parquet"),
    )
    print(f"[sf1] documents: {len(rows)} rows in {time.time()-t0:.1f}s")

    t0 = time.time()
    emb = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    vids = emb.column("vec_id").to_pylist()
    vecs = emb.column("embedding").to_pylist()
    labels = emb.column("label").to_pylist()
    assert max(vids) < ID_STRIDE
    dim = len(vecs[0])
    erows = []
    for rep in range(REPLICAS):
        rng = np.random.default_rng(2000 + rep)
        signs = (
            np.ones(dim, dtype=np.float32)
            if rep == 0
            else rng.choice(np.array([-1.0, 1.0], dtype=np.float32), size=dim)
        )
        for vid, v, lb in zip(vids, vecs, labels):
            nv = (np.asarray(v, dtype=np.float32) * signs).tolist()
            erows.append(
                {"vec_id": vid + rep * ID_STRIDE, "embedding": nv, "label": lb}
            )
    pq.write_table(
        pa.Table.from_pylist(erows, schema=emb.schema.remove_metadata()),
        os.path.join(OUT, "embeddings.parquet"),
    )
    print(f"[sf1] embeddings: {len(erows)} rows in {time.time()-t0:.1f}s")
    build_extras()
    with open(done, "w") as f:
        f.write("ok")
    print(f"[sf1] done: {OUT}")


def build_extras() -> None:
    """Round-5 additions so the sf1 VALUE-EQUALITY audit (VERDICT r4 #1)
    can run check_queries.py unchanged at this dir:

    - events: 10 replicas with event_id/user_id offset by replica·ID_STRIDE
      and ts/type/value/props unchanged — 10× more USERS with identical
      per-user series, preserving the per-user monotone (ts, event_id)
      arrival contract (sessions/transitions twins) and scaling session
      COUNT linearly, never session length (the documents cluster rule).
    - remaining TPC-H tables: symlinked from the sf0.1 source — the sf1
      step scales the documents/embeddings/events-backed heavy set; TPC-H
      joins are not part of the 10× story and stay at sf0.1 inputs
      (documented in SCALECHECKS-sf1)."""
    t0 = time.time()
    ev_out = os.path.join(OUT, "events.parquet")
    if not os.path.exists(ev_out):
        ev = pq.read_table(os.path.join(SRC, "events.parquet"))
        assert pa.compute.max(ev.column("event_id")).as_py() < ID_STRIDE
        assert pa.compute.max(ev.column("user_id")).as_py() < ID_STRIDE
        parts = []
        for rep in range(REPLICAS):
            off = pa.scalar(rep * ID_STRIDE, type=pa.int64())
            parts.append(
                ev.set_column(
                    ev.schema.get_field_index("event_id"), "event_id",
                    pa.compute.add(ev.column("event_id"), off),
                ).set_column(
                    ev.schema.get_field_index("user_id"), "user_id",
                    pa.compute.add(ev.column("user_id"), off),
                )
            )
        big = pa.concat_tables(parts)
        pq.write_table(big, ev_out)
        print(f"[sf1] events: {big.num_rows} rows in {time.time()-t0:.1f}s")
    for t in ["lineitem", "orders", "customer", "part", "supplier",
              "nation", "region"]:
        dst = os.path.join(OUT, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), dst)
    print("[sf1] extras done")


if __name__ == "__main__":
    main()
