"""Incremental extraction via Structured Streaming: two micro-batched file
drops produce byte-identical output to the one-shot batch run."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from document_quality_assessment_ocr_spark.plans.pipeline import run_extraction
from document_quality_assessment_ocr_spark.sources import fixtures, tables
from document_quality_assessment_ocr_spark.streaming import stream_extraction


def _result_set(df):
    return {
        (
            r["doc_id"],
            r["accepted"],
            tuple(r["reasons"]),
            tuple((s["kind"], s["text"], s["media_ref"], s["order"]) for s in r["spans"]),
        )
        for r in df.collect()
    }


@pytest.mark.slow
def test_stream_matches_batch(spark, small_corpus_dir, tmp_path):
    rows = fixtures.build_corpus(n_docs=12, seed=7, mega_spans=80)
    half = len(rows) // 2
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for i, chunk in enumerate((rows[:half], rows[half:])):
        pq.write_table(
            pa.Table.from_pylist(chunk, schema=fixtures.SPANS_SCHEMA),
            os.path.join(in_dir, f"drop-{i}.parquet"),
        )
    pay = tables.read_payloads(
        spark, os.path.join(small_corpus_dir, "media_payloads.parquet")
    )
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream_extraction(spark, in_dir, pay, out_dir, ckpt, available_now=True)
    got = _result_set(spark.read.parquet(out_dir))

    spans = tables.read_spans(spark, in_dir)
    expect = _result_set(run_extraction(spans, pay))
    assert got == expect


@pytest.mark.slow
def test_stream_dedup_within_watermark(spark, tmp_path):
    """Streaming first-occurrence dedup: duplicate fingerprints across two
    file drops collapse to one surviving row per fingerprint; survivors
    equal the batch distinct-fingerprint set."""
    import time

    import pyspark.sql.functions as F

    from document_quality_assessment_ocr_spark.functions.text import fingerprint
    from document_quality_assessment_ocr_spark.streaming.dedup import (
        stream_fingerprint_dedup,
    )

    from datetime import datetime

    t0 = datetime(2026, 1, 1, 12, 0, 0)
    batch1 = [(1, t0, "alpha beta"), (2, t0, "gamma delta"), (3, t0, "alpha beta")]
    batch2 = [(4, t0, "ALPHA   beta"), (5, t0, "epsilon zeta")]  # 4 ≡ 1 after norm
    in_dir = str(tmp_path / "sin")
    os.makedirs(in_dir)
    for i, rows in enumerate((batch1, batch2)):
        spark.createDataFrame(
            rows, "doc_id long, ts timestamp, text string"
        ).coalesce(1).write.parquet(os.path.join(in_dir, f"drop-{i}"))
        time.sleep(1.1)  # distinct mtimes → deterministic file order

    stream_fingerprint_dedup(
        spark, in_dir + "/*", str(tmp_path / "sckpt"), query_name="sdedup_t"
    )
    got = spark.sql("SELECT fp, doc_id FROM sdedup_t").collect()
    fps = [r["fp"] for r in got]
    assert len(fps) == len(set(fps)) == 3  # alpha-beta, gamma-delta, epsilon-zeta

    batch_fps = {
        r["fp"]
        for r in spark.read.parquet(in_dir + "/*")
        .select(fingerprint(F.col("text")).alias("fp"))
        .distinct()
        .collect()
    }
    assert set(fps) == batch_fps


@pytest.mark.slow
def test_streaming_cdc_matches_batch_merge(spark, tmp_path):
    """Micro-batched changelog application equals one batch MERGE of the
    seq-ordered union; versions are immutable time-travel points."""
    from document_quality_assessment_ocr_spark.operators.cdc import apply_changes
    from document_quality_assessment_ocr_spark.streaming.cdc import (
        current_snapshot,
        read_snapshot_version,
        stream_apply_changes,
    )

    base = spark.createDataFrame(
        [(i, f"t{i}", "en") for i in range(20)],
        "doc_id long, text string, lang string",
    )
    snap = str(tmp_path / "snap")
    base.write.parquet(os.path.join(snap, "v0"))

    ch_schema = "doc_id long, seq long, op string, text string, lang string"
    batch1 = [(1, 1, "U", "one-v2", "en"), (2, 1, "D", None, None),
              (50, 1, "I", "fifty", "de")]
    batch2 = [(1, 2, "U", "one-v3", "en"), (50, 2, "D", None, None),
              (3, 2, "U", "three-v2", "fr")]
    ch_dir = str(tmp_path / "changes")
    os.makedirs(ch_dir)
    for i, rows in enumerate((batch1, batch2)):
        spark.createDataFrame(rows, ch_schema).coalesce(1).write.parquet(
            os.path.join(ch_dir, f"drop-{i}"),
        )

    stream_apply_changes(
        spark, ch_dir + "/*", ch_schema, snap, str(tmp_path / "ckpt")
    )

    final = {r["doc_id"]: r for r in current_snapshot(spark, snap).collect()}
    union = spark.createDataFrame(batch1 + batch2, ch_schema)
    expect = {r["doc_id"]: r for r in apply_changes(base, union).collect()}
    assert {k: (v["text"], v["lang"]) for k, v in final.items()} == {
        k: (v["text"], v["lang"]) for k, v in expect.items()
    }
    assert final[1]["text"] == "one-v3" and 2 not in final and 50 not in final
    # time travel: v0 is untouched
    assert read_snapshot_version(spark, snap, 0).count() == 20


def test_streaming_cdc_refuses_fresh_checkpoint_on_old_snapshot(spark, tmp_path):
    """A NEW checkpoint pointed at a snapshot_dir that already carries
    history beyond v{batch_id+1} must fail fast, not silently rewrite
    v1..vN and fork the version chain (checkpoint_dir + snapshot_dir are
    a paired unit)."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from document_quality_assessment_ocr_spark.streaming.cdc import (
        stream_apply_changes,
    )

    base = spark.createDataFrame(
        [(1, "a", "en")], "doc_id long, text string, lang string"
    )
    snap = str(tmp_path / "snap")
    for v in (0, 1, 2):  # pre-existing history: v0..v2
        base.write.parquet(os.path.join(snap, f"v{v}"))

    ch_schema = "doc_id long, seq long, op string, text string, lang string"
    ch_dir = str(tmp_path / "changes")
    os.makedirs(ch_dir)
    spark.createDataFrame(
        [(1, 1, "U", "a2", "en")], ch_schema
    ).coalesce(1).write.parquet(os.path.join(ch_dir, "drop-0"))

    with pytest.raises((StreamingQueryException, Py4JJavaError)) as ei:
        stream_apply_changes(
            spark, ch_dir + "/*", ch_schema, snap, str(tmp_path / "fresh-ckpt")
        )
    assert "paired unit" in str(ei.value)
    # history is intact — nothing was overwritten
    assert spark.read.parquet(os.path.join(snap, "v2")).count() == 1


@pytest.mark.slow
def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Native watermarked stream-stream join (append parquet sink) equals
    the batch interval join over the same events."""
    from datetime import datetime, timedelta

    from document_quality_assessment_ocr_spark.streaming.joins import (
        batch_interval_join,
        stream_interval_join,
    )

    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(6):
        rows.append((eid, t0 + timedelta(minutes=u * 60), u, "signup", 0.0, "{}")); eid += 1
        # one purchase inside the 30-min window, one outside
        rows.append((eid, t0 + timedelta(minutes=u * 60 + 10), u, "purchase", 1.0, "{}")); eid += 1
        rows.append((eid, t0 + timedelta(minutes=u * 60 + 50), u, "purchase", 2.0, "{}")); eid += 1
    schema = ("event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string")
    ev = spark.createDataFrame(rows, schema)
    in_dir = str(tmp_path / "ev")
    ev.coalesce(1).write.parquet(in_dir)

    out_dir = str(tmp_path / "out")
    stream_interval_join(
        spark, in_dir, out_dir, str(tmp_path / "ckpt"), within_minutes=30
    )
    got = {(r["user_id"], r["l_id"], r["r_id"])
           for r in spark.read.parquet(out_dir).collect()}
    expect = {(r["user_id"], r["l_id"], r["r_id"])
              for r in batch_interval_join(ev, within_minutes=30).collect()}
    assert got == expect
    assert len(got) == 6  # exactly the in-window purchase per user


def test_stream_count_min_matches_batch(spark, tmp_path):
    """Incremental CMS maintenance: after two micro-batches the persisted
    sketch is CELL-FOR-CELL the batch sketch over the union — the
    mergeability contract, exercised through foreachBatch; version chain
    is v1..v{n_batches}."""
    import time
    from datetime import datetime

    import pyspark.sql.functions as F

    from document_quality_assessment_ocr_spark.streaming.sketches import (
        _cms_partial,
        read_sketch,
        stream_count_min,
    )

    t0 = datetime(2026, 1, 1, 12, 0, 0)
    b1 = [(1, t0, "a b a c"), (2, t0, "b b d")]
    b2 = [(3, t0, "a e"), (4, t0, "")]
    in_dir = str(tmp_path / "cin")
    os.makedirs(in_dir)
    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(
            rows, "doc_id long, ts timestamp, text string"
        ).coalesce(1).write.parquet(os.path.join(in_dir, f"drop-{i}"))
        time.sleep(1.1)

    sketch_dir = str(tmp_path / "sketch")
    stream_count_min(
        spark, in_dir + "/*", str(tmp_path / "cckpt"), sketch_dir,
        width=32, depth=4,
    )
    got = {(r["j"], r["pos"]): r["c"]
           for r in read_sketch(spark, sketch_dir).collect()}
    full = spark.read.parquet(in_dir + "/*")
    want = {(r["j"], r["pos"]): r["c"]
            for r in _cms_partial(full, "text", 32, 4).collect()}
    assert got == want
    assert sum(got.values()) == 9 * 4  # 9 tokens x depth cells
    import os as _os
    assert sorted(_os.listdir(sketch_dir)) == ["v1", "v2"]


def test_stream_hll_matches_batch(spark, tmp_path):
    """Incremental HLL maintenance: after two micro-batches the persisted
    registers are REGISTER-FOR-REGISTER the batch registers over the
    union — bitwise-max mergeability through foreachBatch."""
    import time
    from datetime import datetime

    import pyspark.sql.functions as F

    from document_quality_assessment_ocr_spark.operators.sketches import (
        hll_register_rho,
    )
    from document_quality_assessment_ocr_spark.streaming.sketches import (
        _stream_tokens,
        read_sketch,
        stream_hll,
    )

    t0 = datetime(2026, 1, 1, 12, 0, 0)
    b1 = [(1, t0, "a b a c"), (2, t0, "b b d")]
    b2 = [(3, t0, "a e f g"), (4, t0, None)]
    in_dir = str(tmp_path / "hin")
    os.makedirs(in_dir)
    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(
            rows, "doc_id long, ts timestamp, text string"
        ).coalesce(1).write.parquet(os.path.join(in_dir, f"drop-{i}"))
        time.sleep(1.1)

    sketch_dir = str(tmp_path / "hsketch")
    stream_hll(spark, in_dir + "/*", str(tmp_path / "hckpt"), sketch_dir)
    got = {r["reg"]: r["max_rho"]
           for r in read_sketch(spark, sketch_dir).collect()}
    reg, rho = hll_register_rho(F.col("term"))
    want = {r["reg"]: r["max_rho"]
            for r in _stream_tokens(spark.read.parquet(in_dir + "/*"), "text")
            .select(reg.alias("reg"), rho.alias("rho"))
            .groupBy("reg").agg(F.max("rho").alias("max_rho")).collect()}
    assert got == want
    assert 1 <= len(got) <= 7  # 7 distinct tokens, md5 registers may collide
    assert sorted(os.listdir(sketch_dir)) == ["v1", "v2"]


def test_stream_bloom_matches_batch(spark, tmp_path):
    """Incremental Bloom maintenance: after two micro-batches the persisted
    word bitmap is WORD-FOR-WORD the batch bitmap over the union —
    bit_or mergeability through foreachBatch — and probing it yields no
    false negatives."""
    import time
    from datetime import datetime

    from document_quality_assessment_ocr_spark.operators.bloom import (
        bloom_build, bloom_probe,
    )
    from document_quality_assessment_ocr_spark.streaming.sketches import (
        _stream_tokens,
        read_sketch,
        stream_bloom,
    )

    t0 = datetime(2026, 1, 1, 12, 0, 0)
    b1 = [(1, t0, "a b a c"), (2, t0, "b b d")]
    b2 = [(3, t0, "a e f"), (4, t0, "")]
    in_dir = str(tmp_path / "bin")
    os.makedirs(in_dir)
    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(
            rows, "doc_id long, ts timestamp, text string"
        ).coalesce(1).write.parquet(os.path.join(in_dir, f"drop-{i}"))
        time.sleep(1.1)

    sketch_dir = str(tmp_path / "bsketch")
    stream_bloom(spark, in_dir + "/*", str(tmp_path / "bckpt"), sketch_dir,
                 n_words=8, k=3)
    got = {r["word_idx"]: r["bits"]
           for r in read_sketch(spark, sketch_dir).collect()}
    want = {r["word_idx"]: r["bits"]
            for r in bloom_build(
                _stream_tokens(spark.read.parquet(in_dir + "/*"), "text"),
                "term", n_words=8, k=3).collect()}
    assert got == want
    probes = spark.createDataFrame(
        [("a",), ("e",), ("zz_unseen",)], "term string")
    verdicts = {r["term"]: r["bloom_maybe"]
                for r in bloom_probe(probes, "term",
                                     read_sketch(spark, sketch_dir),
                                     n_words=8, k=3).collect()}
    assert verdicts["a"] and verdicts["e"]  # members: never a false negative
    assert sorted(os.listdir(sketch_dir)) == ["v1", "v2"]


def test_stream_histogram_matches_batch(spark, tmp_path):
    """Incremental histogram maintenance: after two micro-batches the
    persisted (k, bin, c) state is CELL-FOR-CELL the batch partial over
    the union (count-sum mergeability), and quantile estimates off the
    persisted sketch equal histogram_quantiles over the full data."""
    import time
    from datetime import datetime

    from document_quality_assessment_ocr_spark.operators.sketches import (
        histogram_quantiles,
    )
    from document_quality_assessment_ocr_spark.streaming.sketches import (
        _hist_partial,
        read_sketch,
        stream_histogram,
    )

    t0 = datetime(2026, 1, 1, 12, 0, 0)
    b1 = [(1, t0, "x" * 10), (2, t0, "y" * 300)]
    b2 = [(3, t0, "z" * 301), (4, t0, ""), (5, t0, "w" * 4999)]
    in_dir = str(tmp_path / "hin")
    os.makedirs(in_dir)
    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(
            rows, "doc_id long, ts timestamp, text string"
        ).coalesce(1).write.parquet(os.path.join(in_dir, f"drop-{i}"))
        time.sleep(1.1)

    sketch_dir = str(tmp_path / "hsketch")
    stream_histogram(
        spark, in_dir + "/*", str(tmp_path / "hckpt"), sketch_dir,
        lo=0, hi=4096, n_bins=16,
    )
    got = {(r["k"], r["bin"]): r["c"]
           for r in read_sketch(spark, sketch_dir).collect()}
    full = spark.read.parquet(in_dir + "/*")
    want = {(r["k"], r["bin"]): r["c"]
            for r in _hist_partial(full, "length(text)", "'doc_len'",
                                   0, 4096, 16).collect()}
    assert got == want and sum(got.values()) == 5
    assert got[("doc_len", 15)] == 1  # 4999 clamps into the top bin
    assert sorted(os.listdir(sketch_dir)) == ["v1", "v2"]

    # quantiles off the persisted sketch == batch quantiles on raw data
    hist = read_sketch(spark, sketch_dir)
    est_stream = {
        (r["k"], r["p"]): (r["est_bin"], r["est_lo"], r["est_hi"])
        for r in _quantiles_from_hist(spark, hist, 0, 4096, 16, [50, 90]).collect()
    }
    est_batch = {
        (r["k"], r["p"]): (r["est_bin"], r["est_lo"], r["est_hi"])
        for r in histogram_quantiles(
            full.selectExpr("'doc_len' AS k", "length(text) AS v"),
            "k", "v", 0, 4096, 16, [50, 90],
        ).collect()
    }
    assert est_stream == est_batch


def _quantiles_from_hist(spark, hist, lo, hi, n_bins, percents):
    """Fold histogram_quantiles' estimate over an already-binned sketch by
    re-expanding cells to per-bin representative values (exact: every row
    in a cell shares the bin, and binning a bin's lower edge returns the
    same bin)."""
    import pyspark.sql.functions as F

    from document_quality_assessment_ocr_spark.operators.sketches import (
        histogram_quantiles,
    )

    width = (hi - lo) // n_bins
    rows = hist.select(
        "k",
        F.explode(F.expr("sequence(1, c)")).alias("_i"),
        (F.lit(lo) + F.col("bin") * width).alias("v"),
    ).select("k", "v")
    return histogram_quantiles(rows, "k", "v", lo, hi, n_bins, percents)


def test_stream_transitions_match_batch(spark, tmp_path):
    """Incremental Markov-transition maintenance: after two micro-batches
    (per-user monotone arrival), the persisted grid + prob_micro is
    ROW-FOR-ROW the batch transition_matrix over the union — including
    the CROSS-BOUNDARY pair that only the per-user last-event state can
    see (u1's last b1 event -> first b2 event)."""
    import time
    from datetime import datetime, timedelta

    from document_quality_assessment_ocr_spark.operators.sessions import (
        transition_matrix,
    )
    from document_quality_assessment_ocr_spark.streaming.transitions import (
        read_transitions,
        stream_transitions,
    )

    t0 = datetime(2026, 1, 1, 12, 0, 0)

    def ev(eid, uid, ty, sec):
        return (eid, uid, ty, t0 + timedelta(seconds=sec))

    # u1: A->B in b1, then (boundary) B->C->A in b2; u2: same-instant
    # tie broken by event_id in b1, C arrives alone in b2 (C pair via
    # state); u3 appears only in b2.
    b1 = [ev(1, 1, "A", 0), ev(2, 1, "B", 10),
          ev(3, 2, "C", 0), ev(4, 2, "A", 0)]
    b2 = [ev(5, 1, "C", 20), ev(6, 1, "A", 30),
          ev(7, 2, "B", 5),
          ev(8, 3, "A", 0)]
    in_dir = str(tmp_path / "tin")
    os.makedirs(in_dir)
    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts timestamp"
        ).coalesce(1).write.parquet(os.path.join(in_dir, f"drop-{i}"))
        time.sleep(1.1)

    state_dir = str(tmp_path / "tstate")
    stream_transitions(
        spark, in_dir + "/*", str(tmp_path / "tckpt"), state_dir
    )
    got = {(r["prev_type"], r["next_type"]): (r["n"], r["prob_micro"])
           for r in read_transitions(spark, state_dir).collect()}
    full = spark.read.parquet(in_dir + "/*")
    want = {(r["prev_type"], r["next_type"]): (r["n"], r["prob_micro"])
            for r in transition_matrix(full).collect()}
    assert got == want
    # the boundary pairs exist: u1 B->C and u2 A->B cross batches
    assert got[("B", "C")][0] == 1 and got[("A", "B")][0] >= 1
    assert sorted(os.listdir(state_dir)) == ["v1", "v2"]


def test_stream_ks_drift_matches_batch(spark, tmp_path):
    """Sixth incremental twin: after two micro-batches the persisted
    (bucket, ca, cb) grid merged additively yields — through the SHARED
    ks_from_grid stage — exactly the batch ks_drift row over the union,
    and replaying a batch (same version target) stays idempotent."""
    import time
    from datetime import datetime

    import pyspark.sql.functions as F

    from document_quality_assessment_ocr_spark.operators.experiment import ks_drift
    from document_quality_assessment_ocr_spark.streaming.drift import (
        read_ks,
        stream_ks_drift,
    )

    t0 = datetime(2026, 1, 1, 12, 0, 0)
    b1 = [(1, t0, "x" * 10), (2, t0, "y" * 300), (4, t0, "q" * 90)]
    b2 = [(3, t0, "z" * 301), (6, t0, ""), (5, t0, "w" * 500), (8, t0, "k" * 64)]
    in_dir = str(tmp_path / "kin")
    os.makedirs(in_dir)
    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(
            rows, "doc_id long, ts timestamp, text string"
        ).coalesce(1).write.parquet(os.path.join(in_dir, f"drop-{i}"))
        time.sleep(1.1)

    state_dir = str(tmp_path / "kstate")
    stream_ks_drift(
        spark, in_dir + "/*", str(tmp_path / "kckpt"), state_dir,
        bucket_width=64,
    )
    assert sorted(os.listdir(state_dir)) == ["v1", "v2"]
    got = read_ks(spark, state_dir).collect()

    full = spark.read.parquet(in_dir + "/*").select(
        "doc_id", F.length(F.coalesce("text", F.lit(""))).alias("n")
    )
    want = ks_drift(full, F.col("doc_id") % 2 == 0, "n", bucket_width=64).collect()
    assert [r.asDict() for r in got] == [r.asDict() for r in want]
    assert got[0]["n_left"] == 4 and got[0]["n_right"] == 3

    # replay idempotence: re-merging batch 1's partial over v1 must
    # reproduce v2 exactly (same base version, same target)
    from document_quality_assessment_ocr_spark.streaming.drift import _grid_partial

    b2df = spark.read.parquet(os.path.join(in_dir, "drop-1"))
    part = _grid_partial(
        b2df, "doc_id % 2 = 0", "length(coalesce(text, ''))", 64
    )
    prev = spark.read.parquet(os.path.join(state_dir, "v1"))
    remerged = {
        r["bucket"]: (r["ca"], r["cb"])
        for r in prev.unionByName(part)
        .groupBy("bucket")
        .agg(F.sum("ca").alias("ca"), F.sum("cb").alias("cb"))
        .collect()
    }
    v2 = {
        r["bucket"]: (r["ca"], r["cb"])
        for r in spark.read.parquet(os.path.join(state_dir, "v2")).collect()
    }
    assert remerged == v2


def test_stream_isotropy_matches_batch(spark, tmp_path):
    """Seventh incremental twin: two embedding micro-batches merged
    additively through the shared isotropy_grid/isotropy_from_grid
    stages reproduce the batch isotropy_audit row exactly, and replaying
    a batch over v1 regenerates v2 byte-for-byte."""
    import time

    import pyspark.sql.functions as F

    from document_quality_assessment_ocr_spark.operators.similarity import (
        isotropy_audit,
        isotropy_grid,
    )
    from document_quality_assessment_ocr_spark.streaming.drift import (
        read_isotropy,
        stream_isotropy,
    )

    b1 = [(1, [0.5, 0.25, -0.75]), (2, [0.5, 0.3125, -0.75])]
    b2 = [(3, [-1.0, 0.0, 0.5]), (4, [0.25, -0.5, 0.125]), (5, [0.75, 0.75, 0.0])]
    in_dir = str(tmp_path / "iin")
    os.makedirs(in_dir)
    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).coalesce(1).write.parquet(os.path.join(in_dir, f"drop-{i}"))
        time.sleep(1.1)

    state_dir = str(tmp_path / "istate")
    stream_isotropy(
        spark, in_dir + "/*", str(tmp_path / "ickpt"), state_dir, scale=64
    )
    assert sorted(os.listdir(state_dir)) == ["v1", "v2"]
    got = read_isotropy(spark, state_dir).collect()

    full = spark.read.parquet(in_dir + "/*")
    want = isotropy_audit(full, scale=64).collect()
    assert [r.asDict() for r in got] == [r.asDict() for r in want]
    assert got[0]["n"] == 5 and got[0]["dim"] == 3

    # replay idempotence: batch 1's partial merged over v1 == v2
    part = isotropy_grid(
        spark.read.parquet(os.path.join(in_dir, "drop-1")), scale=64
    )
    prev = spark.read.parquet(os.path.join(state_dir, "v1"))
    remerged = {
        r["dim"]: (r["s"], r["ssq"], r["cnt"])
        for r in prev.unionByName(part)
        .groupBy("dim")
        .agg(
            F.sum("s").alias("s"),
            F.sum("ssq").alias("ssq"),
            F.sum("cnt").alias("cnt"),
        )
        .collect()
    }
    v2 = {
        r["dim"]: (r["s"], r["ssq"], r["cnt"])
        for r in spark.read.parquet(os.path.join(state_dir, "v2")).collect()
    }
    assert remerged == v2


def test_stream_funnel_matches_batch(spark, tmp_path):
    """Eighth incremental twin: after two micro-batches (per-user
    monotone arrival) the persisted (user, level, t) funnel state rolls
    up ROW-FOR-ROW to the batch funnel_steps over the union — including
    the CROSS-BOUNDARY completion (u1 reaches A->B in b1 and converts on
    C only in b2) and the strictly-after rule (u2's same-instant B never
    counts)."""
    import os
    import time
    from datetime import datetime, timedelta

    from document_quality_assessment_ocr_spark.operators.sessions import (
        funnel_steps,
    )
    from document_quality_assessment_ocr_spark.streaming.funnel import (
        read_funnel,
        stream_funnel,
    )

    t0 = datetime(2026, 1, 1, 12, 0, 0)

    def ev(eid, uid, ty, sec):
        return (eid, uid, ty, t0 + timedelta(seconds=sec))

    steps = ["A", "B", "C"]
    # u1: A,B in b1 -> C in b2 (cross-boundary completion)
    # u2: A@0 and B@0 same instant (strictly-after rejects B), C@5 in b2
    #     can't count either (level 2 never filled)
    # u3: B-only user -> never enters the funnel
    # u4: appears only in b2, completes A->B inside one batch
    b1 = [ev(1, 1, "A", 0), ev(2, 1, "B", 10),
          ev(3, 2, "A", 0), ev(4, 2, "B", 0),
          ev(5, 3, "B", 0)]
    b2 = [ev(6, 1, "C", 20),
          ev(7, 2, "C", 5),
          ev(8, 4, "A", 0), ev(9, 4, "B", 1)]
    in_dir = str(tmp_path / "fin")
    os.makedirs(in_dir)
    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts timestamp"
        ).coalesce(1).write.parquet(os.path.join(in_dir, f"drop-{i}"))
        time.sleep(1.1)

    state_dir = str(tmp_path / "fstate")
    stream_funnel(
        spark, in_dir + "/*", str(tmp_path / "fckpt"), state_dir, steps
    )
    got = [(r["step"], r["event_type"], r["n_users"],
            r["conv_from_first_micro"], r["conv_from_prev_micro"])
           for r in read_funnel(spark, state_dir, steps)
           .orderBy("step").collect()]
    full = spark.read.parquet(in_dir + "/*")
    want = [(r["step"], r["event_type"], r["n_users"],
             r["conv_from_first_micro"], r["conv_from_prev_micro"])
            for r in funnel_steps(full, steps).orderBy("step").collect()]
    assert got == want
    # u1 + u2 + u4 reach step 1; u1 + u4 reach step 2; only u1 converts
    assert [g[2] for g in got] == [3, 2, 1]
    assert sorted(os.listdir(state_dir)) == ["v1", "v2"]


def test_stream_retention_matches_batch(spark, tmp_path):
    """Ninth incremental twin: after two micro-batches the persisted
    (first, active) state rolls up ROW-FOR-ROW to the batch
    retention_cohorts over the union — INCLUDING out-of-order arrival
    (u1's cohort-defining first event lands in batch 2, after its later
    activity arrived in batch 1): min-merge + distinct-union are
    order-independent, so no monotone-arrival contract is needed."""
    import os
    import time
    from datetime import datetime, timedelta

    from document_quality_assessment_ocr_spark.operators.sessions import (
        retention_cohorts,
    )
    from document_quality_assessment_ocr_spark.streaming.retention import (
        read_retention,
        stream_retention,
    )

    t0 = datetime(2026, 1, 1, 12, 0, 0)
    pu = 10_000_000  # 10-second periods

    def ev(eid, uid, sec):
        return (eid, uid, "E", t0 + timedelta(seconds=sec))

    # u1: activity at p2 arrives FIRST (b1); its p0 first-touch arrives
    #     late in b2 -> cohort must still resolve to p0
    # u2: p0 in b1, p1 in b2; duplicate p1 re-arrival must not recount
    # u3: single event at p2
    b1 = [ev(1, 1, 25), ev(2, 2, 0), ev(3, 3, 21)]
    b2 = [ev(4, 1, 5), ev(5, 2, 12), ev(6, 2, 13)]
    in_dir = str(tmp_path / "rin")
    os.makedirs(in_dir)
    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts timestamp"
        ).coalesce(1).write.parquet(os.path.join(in_dir, f"drop-{i}"))
        time.sleep(1.1)

    state_dir = str(tmp_path / "rstate")
    stream_retention(
        spark, in_dir + "/*", str(tmp_path / "rckpt"), state_dir, period_us=pu
    )
    key = ["cohort_period", "offset"]
    cols = key + ["cohort_size", "n_active", "retained_micro"]
    got = [
        tuple(r[c] for c in cols)
        for r in read_retention(spark, state_dir).orderBy(*key).collect()
    ]
    full = spark.read.parquet(in_dir + "/*")
    want = [
        tuple(r[c] for c in cols)
        for r in retention_cohorts(full, period_us=pu).orderBy(*key).collect()
    ]
    assert got == want
    # cohort p0 = {u1, u2}: both at offset 0; u2 at offset 1 (p1);
    # u1 at offset 2 (p2). cohort p2 = {u3}. Periods are ABSOLUTE
    # epoch_us DIV period_us.
    p0 = int(t0.timestamp() * 1_000_000) // pu
    assert got == [
        (p0, 0, 2, 2, 1000000),
        (p0, 1, 2, 1, 500000),
        (p0, 2, 2, 1, 500000),
        (p0 + 2, 0, 1, 1, 1000000),
    ]
    assert sorted(os.listdir(state_dir)) == ["v1", "v2"]


def test_stream_sessions_matches_batch(spark, tmp_path):
    """Tenth incremental twin: after two micro-batches the closed ∪ open
    session state equals batch sessionize(milli_values=True) over the
    union ROW-FOR-ROW — boundary-spanning session (u1), boundary-closed
    session (u2), and a batch-2-only user (u3) all covered. Per-user
    monotone (ts, event_id) arrival is the documented contract."""
    import os
    import time
    from datetime import datetime, timedelta

    from document_quality_assessment_ocr_spark.operators.sessions import (
        sessionize,
    )
    from document_quality_assessment_ocr_spark.streaming.sessions import (
        read_sessions,
        stream_sessions,
    )

    t0 = datetime(2026, 1, 1, 12, 0, 0)

    def ev(eid, uid, sec, val):
        return (eid, uid, "E", t0 + timedelta(seconds=sec), val)

    # gap 10 s. u1: (0,5 | 12, 30) -> sessions {0..12}, {30}
    #           u2: (0 | 50)       -> {0}, {50}
    #           u3: (- | 60, 62)   -> {60, 62}
    b1 = [ev(1, 1, 0, 1.251), ev(2, 1, 5, 2.5), ev(3, 2, 0, 0.75)]
    b2 = [
        ev(4, 1, 12, 4.0),
        ev(5, 1, 30, 1.0),
        ev(6, 2, 50, 3.125),
        ev(7, 3, 60, 0.5),
        ev(8, 3, 62, 0.25),
    ]
    in_dir = str(tmp_path / "sin")
    os.makedirs(in_dir)
    schema = (
        "event_id long, user_id long, event_type string, ts timestamp, "
        "value double"
    )
    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(in_dir, f"drop-{i}")
        )
        time.sleep(1.1)

    state_dir = str(tmp_path / "sstate")
    stream_sessions(
        spark, in_dir + "/*", str(tmp_path / "sckpt"), state_dir,
        gap_seconds=10,
    )
    cols = [
        "user_id", "session_idx", "session_start_us", "session_end_us",
        "n_events", "value_milli",
    ]
    got = [tuple(r[c] for c in cols) for r in read_sessions(spark, state_dir).collect()]
    allev = spark.createDataFrame(b1 + b2, schema)
    want = sorted(
        tuple(r[c] for c in cols)
        for r in sessionize(allev, gap_seconds=10, milli_values=True).collect()
    )
    assert got == want
    # boundary-spanning session: u1 session 1 spans 0..12 s, 3 events
    u1s1 = [g for g in got if g[0] == 1 and g[1] == 1][0]
    assert u1s1[4] == 3 and u1s1[5] == 1251 + 2500 + 4000


def test_stream_centroid_drift_matches_batch(spark, tmp_path):
    """Eleventh incremental twin: two embedding micro-batches merged
    additively through the shared centroid_drift_grid/from_grid stages
    reproduce the batch centroid_drift panel exactly, and replaying a
    batch over v1 regenerates v2 byte-for-byte."""
    import time

    import pyspark.sql.functions as F

    from document_quality_assessment_ocr_spark.operators.similarity import (
        centroid_drift,
        centroid_drift_grid,
    )
    from document_quality_assessment_ocr_spark.streaming.drift import (
        read_centroid_drift,
        stream_centroid_drift,
    )

    b1 = [(1, [0.5, 0.25, -0.75]), (2, [0.5, 0.3125, -0.75])]
    b2 = [(3, [-1.0, 0.0, 0.5]), (4, [0.25, -0.5, 0.125]), (5, [0.75, 0.75, 0.0])]
    in_dir = str(tmp_path / "cdin")
    os.makedirs(in_dir)
    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).coalesce(1).write.parquet(os.path.join(in_dir, f"drop-{i}"))
        time.sleep(1.1)

    state_dir = str(tmp_path / "cdstate")
    stream_centroid_drift(
        spark, in_dir + "/*", str(tmp_path / "cdckpt"), state_dir, scale=64
    )
    assert sorted(os.listdir(state_dir)) == ["v1", "v2"]
    got = read_centroid_drift(spark, state_dir, scale=64).collect()

    full = spark.read.parquet(in_dir + "/*")
    want = centroid_drift(full, scale=64).collect()
    assert [r.asDict() for r in got] == [r.asDict() for r in want]
    assert len(got) == 3
    assert all(r["c0"] + r["c1"] == 5 for r in got)

    # replay idempotence: batch 1's partial merged over v1 == v2
    part = centroid_drift_grid(
        spark.read.parquet(os.path.join(in_dir, "drop-1")), scale=64
    )
    prev = spark.read.parquet(os.path.join(state_dir, "v1"))
    remerged = {
        (r["half"], r["dim"]): (r["s"], r["cnt"])
        for r in prev.unionByName(part)
        .groupBy("half", "dim")
        .agg(
            F.sum("s").cast("long").alias("s"),
            F.sum("cnt").cast("long").alias("cnt"),
        )
        .collect()
    }
    v2 = {
        (r["half"], r["dim"]): (r["s"], r["cnt"])
        for r in spark.read.parquet(
            os.path.join(state_dir, "v2")
        ).collect()
    }
    assert remerged == v2


def test_stream_auc_matches_batch(spark, tmp_path):
    """Twelfth incremental twin: two document micro-batches merged
    additively through the shared gopher_labeled/auc_grid/auc_from_grid
    stages reproduce the batch per-source AUC exactly, and replaying a
    batch over v1 regenerates v2 byte-for-byte."""
    import time

    import pyspark.sql.functions as F

    from document_quality_assessment_ocr_spark.operators.experiment import (
        auc_by_group,
    )
    from document_quality_assessment_ocr_spark.operators.quality import (
        gopher_labeled,
    )
    from document_quality_assessment_ocr_spark.streaming.drift import (
        _auc_partial,
        read_auc,
        stream_auc,
    )

    long_keep = (
        "the quick brown fox jumps over the lazy dog and that "
        "run of words have been written with care to pass each gate "
    ) * 5
    b1 = [
        (1, long_keep, "web", 120),
        (2, "#### ### ##", "web", 11),
        (3, long_keep, "pdf", 300),
    ]
    b2 = [
        (4, "x", "web", 1),
        (5, long_keep, "web", 500),
        (6, "- a\n- b\n- c", "pdf", 12),
    ]
    in_dir = str(tmp_path / "aucin")
    os.makedirs(in_dir)
    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(
            rows, "doc_id long, text string, source string, n_chars long"
        ).coalesce(1).write.parquet(os.path.join(in_dir, f"drop-{i}"))
        time.sleep(1.1)

    state_dir = str(tmp_path / "aucstate")
    stream_auc(spark, in_dir + "/*", str(tmp_path / "aucckpt"), state_dir)
    assert sorted(os.listdir(state_dir)) == ["v1", "v2"]
    got = read_auc(spark, state_dir).collect()

    full = spark.read.parquet(in_dir + "/*")
    lab = gopher_labeled(full, ["source", "n_chars"]).select(
        "source", "n_chars", F.col("keep").cast("long").alias("label")
    )
    want = auc_by_group(lab, "n_chars", "label", "source").collect()
    assert [r.asDict() for r in got] == [r.asDict() for r in want]
    assert {r["source"] for r in got} == {"web", "pdf"}

    # replay idempotence: batch 1's partial merged over v1 == v2
    part = _auc_partial(spark.read.parquet(os.path.join(in_dir, "drop-1")))
    prev = spark.read.parquet(os.path.join(state_dir, "v1"))
    remerged = {
        (r["g"], r["v"]): (r["pos"], r["neg"])
        for r in prev.unionByName(part)
        .groupBy("g", "v")
        .agg(
            F.sum("pos").cast("long").alias("pos"),
            F.sum("neg").cast("long").alias("neg"),
        )
        .collect()
    }
    v2 = {
        (r["g"], r["v"]): (r["pos"], r["neg"])
        for r in spark.read.parquet(os.path.join(state_dir, "v2")).collect()
    }
    assert remerged == v2


def test_stream_rfm_matches_batch(spark, tmp_path):
    """Thirteenth incremental twin: two event micro-batches merged
    through the shared rfm_user_state/rfm_from_state stages reproduce
    the batch RFM segment grid exactly (including a user spanning both
    batches, whose recency/frequency/monetary must fold max/sum/sum),
    and replaying batch 1 over v1 regenerates v2 byte-for-byte."""
    import os
    import time
    from datetime import datetime, timedelta

    import pyspark.sql.functions as F

    from document_quality_assessment_ocr_spark.operators.sessions import (
        rfm_segments,
        rfm_user_state,
    )
    from document_quality_assessment_ocr_spark.streaming.sessions import (
        read_rfm,
        stream_rfm,
    )

    t0 = datetime(2026, 1, 1, 12, 0, 0)

    def ev(eid, uid, days, val):
        return (eid, uid, "E", t0 + timedelta(days=days), val)

    # u1 spans both batches (last event lands in b2); u2 is b1-only and
    # stale (recency bucket 3); u3 is b2-only with a negative value
    # (monetary clamps at 0 in the shared stage).
    b1 = [ev(1, 1, 0, 1.251), ev(2, 1, 1, 2.5), ev(3, 2, 3, 0.75)]
    b2 = [ev(4, 1, 10, 4.0), ev(5, 3, 10, -0.5), ev(6, 3, 9, 0.125)]
    in_dir = str(tmp_path / "rfmin")
    os.makedirs(in_dir)
    schema = (
        "event_id long, user_id long, event_type string, ts timestamp, "
        "value double"
    )
    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(in_dir, f"drop-{i}")
        )
        time.sleep(1.1)

    state_dir = str(tmp_path / "rfmstate")
    stream_rfm(spark, in_dir + "/*", str(tmp_path / "rfmckpt"), state_dir)
    assert sorted(os.listdir(state_dir)) == ["v1", "v2"]
    got = read_rfm(spark, state_dir).collect()

    full = spark.read.parquet(in_dir + "/*")
    want = rfm_segments(full).collect()
    assert [r.asDict() for r in got] == [r.asDict() for r in want]
    # the spanning user folded: frequency 3 events, monetary milli sum
    total_users = sum(r["n_users"] for r in got)
    assert total_users == 3
    assert sum(r["sum_events"] for r in got) == 6

    # replay idempotence: batch 1's partial merged over v1 == v2
    part = rfm_user_state(
        spark.read.parquet(os.path.join(in_dir, "drop-1"))
    )
    prev = spark.read.parquet(os.path.join(state_dir, "v1"))
    remerged = {
        r["u"]: (r["last_us"], r["n_events"], r["value_milli"])
        for r in prev.unionByName(part)
        .groupBy("u")
        .agg(
            F.max("last_us").cast("long").alias("last_us"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("value_milli").cast("long").alias("value_milli"),
        )
        .collect()
    }
    v2 = {
        r["u"]: (r["last_us"], r["n_events"], r["value_milli"])
        for r in spark.read.parquet(os.path.join(state_dir, "v2")).collect()
    }
    assert remerged == v2


def test_stream_zone_map_matches_batch(spark, tmp_path):
    """Fourteenth incremental twin: two document micro-batches folded
    through the shared zone_map_grid/zone_map_from_grid stages reproduce
    the batch zone-map audit exactly (bucket 0 spans both batches, so
    its min/max/count must merge), and replaying batch 1 over v1
    regenerates v2 byte-for-byte."""
    import time

    import pyspark.sql.functions as F

    from document_quality_assessment_ocr_spark.operators.profile import (
        zone_map_audit,
        zone_map_grid,
    )
    from document_quality_assessment_ocr_spark.streaming.drift import (
        ZONE_THRESHOLDS,
        read_zone_map,
        stream_zone_map,
    )

    b1 = [(0, "a", "web", 50), (1, "b", "web", 2000), (20, "c", "pdf", 400)]
    b2 = [(2, "d", "web", 120), (21, "e", "pdf", 4000), (40, "f", "web", 10)]
    in_dir = str(tmp_path / "zin")
    os.makedirs(in_dir)
    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(
            rows, "doc_id long, text string, source string, n_chars long"
        ).coalesce(1).write.parquet(os.path.join(in_dir, f"drop-{i}"))
        time.sleep(1.1)

    state_dir = str(tmp_path / "zstate")
    stream_zone_map(
        spark, in_dir + "/*", str(tmp_path / "zckpt"), state_dir
    )
    assert sorted(os.listdir(state_dir)) == ["v1", "v2"]
    got = read_zone_map(spark, state_dir).collect()

    full = spark.read.parquet(in_dir + "/*")
    want = zone_map_audit(full, "n_chars", ZONE_THRESHOLDS).collect()
    assert [r.asDict() for r in got] == [r.asDict() for r in want]
    # bucket 0 merged across batches: 3 docs, min 50, max 2000
    grid = {
        r["bucket"]: r
        for r in spark.read.parquet(os.path.join(state_dir, "v2")).collect()
    }
    assert grid[0]["n"] == 3 and grid[0]["vmin"] == 50
    assert grid[0]["vmax"] == 2000

    # replay idempotence: batch 1's partial merged over v1 == v2
    part = zone_map_grid(
        spark.read.parquet(os.path.join(in_dir, "drop-1")), "n_chars"
    )
    prev = spark.read.parquet(os.path.join(state_dir, "v1"))
    remerged = {
        r["bucket"]: (r["vmin"], r["vmax"], r["n"])
        for r in prev.unionByName(part)
        .groupBy("bucket")
        .agg(
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
            F.sum("n").cast("long").alias("n"),
        )
        .collect()
    }
    v2 = {
        r["bucket"]: (r["vmin"], r["vmax"], r["n"]) for r in grid.values()
    }
    assert remerged == v2


def test_stream_daily_matches_batch(spark, tmp_path):
    """Fifteenth incremental twin: one additive day-count grid serves
    BOTH batch statistics — autocorrelation and Mann-Kendall match the
    batch operators exactly after two micro-batches (day 1 spans both
    batches, so its count must fold), and replaying batch 1 over v1
    regenerates v2 byte-for-byte."""
    import time
    from datetime import datetime, timedelta

    import pyspark.sql.functions as F

    from document_quality_assessment_ocr_spark.operators.sessions import (
        daily_autocorr,
        daily_counts,
        mann_kendall_daily,
    )
    from document_quality_assessment_ocr_spark.streaming.sessions import (
        read_daily_autocorr,
        read_daily_mann_kendall,
        stream_daily,
    )

    t0 = datetime(2026, 2, 1)

    def ev(eid, day):
        return (eid, 1, "E", t0 + timedelta(days=day), 1.0)

    # rising series split across batches: day counts 1,3,4,6,8
    b1 = [ev(1, 0), ev(2, 1), ev(3, 1), ev(4, 2), ev(5, 2)]
    b2 = (
        [ev(6, 1)]  # day 1 spans both batches
        + [ev(7, 2), ev(8, 2)]
        + [ev(i, 3) for i in range(9, 15)]
        + [ev(i, 4) for i in range(15, 23)]
    )
    in_dir = str(tmp_path / "din")
    os.makedirs(in_dir)
    schema = (
        "event_id long, user_id long, event_type string, ts timestamp, "
        "value double"
    )
    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(in_dir, f"drop-{i}")
        )
        time.sleep(1.1)

    state_dir = str(tmp_path / "dstate")
    stream_daily(spark, in_dir + "/*", str(tmp_path / "dckpt"), state_dir)
    assert sorted(os.listdir(state_dir)) == ["v1", "v2"]

    full = spark.read.parquet(in_dir + "/*")
    got_ac = read_daily_autocorr(spark, state_dir, max_lag=3).collect()
    want_ac = daily_autocorr(full, max_lag=3).collect()
    assert [r.asDict() for r in got_ac] == [r.asDict() for r in want_ac]

    got_mk = read_daily_mann_kendall(spark, state_dir).collect()
    want_mk = mann_kendall_daily(full).collect()
    assert [r.asDict() for r in got_mk] == [r.asDict() for r in want_mk]
    assert got_mk[0]["s_stat"] > 0  # rising series

    # replay idempotence
    part = daily_counts(spark.read.parquet(os.path.join(in_dir, "drop-1")))
    prev = spark.read.parquet(os.path.join(state_dir, "v1"))
    remerged = {
        r["day"]: r["c"]
        for r in prev.unionByName(part)
        .groupBy("day")
        .agg(F.sum("c").cast("long").alias("c"))
        .collect()
    }
    v2 = {
        r["day"]: r["c"]
        for r in spark.read.parquet(os.path.join(state_dir, "v2")).collect()
    }
    assert remerged == v2


def test_stream_rfm_crash_recovery(spark, tmp_path):
    """Kill-mid-batch + checkpoint restart (round-5, VERDICT r4 #7): the
    first stream_rfm run CRASHES inside foreachBatch on its second batch
    (injected via the shared rfm_user_state stage, before the state
    write), leaving the checkpoint committed through batch 0 and state at
    v1. Re-invoking stream_rfm with the SAME checkpoint/state dirs must
    resume from the checkpoint — replay batch 1, continue to batch 2 —
    and converge to exactly the uninterrupted batch answer."""
    import os
    import time
    from datetime import datetime, timedelta

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from document_quality_assessment_ocr_spark.operators import sessions as opsess
    from document_quality_assessment_ocr_spark.operators.sessions import rfm_segments
    from document_quality_assessment_ocr_spark.streaming.sessions import (
        read_rfm,
        stream_rfm,
    )

    t0 = datetime(2026, 1, 1, 12, 0, 0)

    def ev(eid, uid, days, val):
        return (eid, uid, "E", t0 + timedelta(days=days), val)

    b1 = [ev(1, 1, 0, 1.251), ev(2, 1, 1, 2.5), ev(3, 2, 3, 0.75)]
    b2 = [ev(4, 1, 10, 4.0), ev(5, 3, 10, -0.5)]
    b3 = [ev(6, 3, 9, 0.125), ev(7, 2, 11, 2.0)]
    in_dir = str(tmp_path / "crashin")
    os.makedirs(in_dir)
    schema = (
        "event_id long, user_id long, event_type string, ts timestamp, "
        "value double"
    )
    for i, rows in enumerate((b1, b2, b3)):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(in_dir, f"drop-{i}")
        )
        time.sleep(1.1)

    ckpt = str(tmp_path / "crashckpt")
    state_dir = str(tmp_path / "crashstate")

    real = opsess.rfm_user_state
    calls = {"n": 0}

    def dying(batch):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash: executor lost mid-batch")
        return real(batch)

    opsess.rfm_user_state = dying
    try:
        try:
            stream_rfm(spark, in_dir + "/*", ckpt, state_dir)
            raise AssertionError("first run should have crashed")
        except StreamingQueryException:
            pass  # the injected kill, surfaced through awaitTermination
    finally:
        opsess.rfm_user_state = real

    # crash left batch 0 committed only: state at v1, nothing beyond
    assert sorted(os.listdir(state_dir)) == ["v1"]

    # REAL checkpoint restart: same dirs, no reset — Spark replays batch 1
    # from the checkpoint's planned offsets, then continues to batch 2
    stream_rfm(spark, in_dir + "/*", ckpt, state_dir)
    assert sorted(os.listdir(state_dir)) == ["v1", "v2", "v3"]

    got = [r.asDict() for r in read_rfm(spark, state_dir).collect()]
    want = [
        r.asDict() for r in rfm_segments(spark.read.parquet(in_dir + "/*")).collect()
    ]
    assert got == want


def test_stream_inequality_matches_batch(spark, tmp_path):
    """Sixteenth incremental twin (round 5): one additive (g, v, c)
    value-count grid serves BOTH inequality indices — read_gini and
    read_hoover match gini_by_group / hoover_by_group exactly after two
    micro-batches (a (source, n_chars) cell spanning both batches must
    fold its count), and replaying batch 1 over v1 regenerates v2
    byte-for-byte."""
    import os
    import time
    from datetime import datetime, timedelta

    import pyspark.sql.functions as F

    from document_quality_assessment_ocr_spark.operators.profile import (
        gini_by_group,
        hoover_by_group,
        value_grid,
    )
    from document_quality_assessment_ocr_spark.streaming.inequality import (
        read_gini,
        read_hoover,
        stream_value_grid,
    )

    t0 = datetime(2026, 2, 1, 9, 0, 0)

    def doc(did, mins, source, n_chars):
        return (did, t0 + timedelta(minutes=mins), source, n_chars)

    # (web, 100) appears in BOTH batches — its grid cell must fold to c=3
    b1 = [doc(1, 0, "web", 100), doc(2, 1, "web", 100), doc(3, 2, "web", 400),
          doc(4, 3, "books", 250), doc(5, 4, "books", 250)]
    b2 = [doc(6, 9, "web", 100), doc(7, 10, "web", 7000),
          doc(8, 11, "books", 10), doc(9, 12, None, 50)]
    in_dir = str(tmp_path / "ineqin")
    os.makedirs(in_dir)
    schema = "doc_id long, ts timestamp, source string, n_chars long"
    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(in_dir, f"drop-{i}")
        )
        time.sleep(1.1)

    state_dir = str(tmp_path / "ineqstate")
    stream_value_grid(spark, in_dir + "/*", str(tmp_path / "ineqckpt"), state_dir)
    assert sorted(os.listdir(state_dir)) == ["v1", "v2"]

    full = spark.read.parquet(in_dir + "/*")
    for read_fn, batch_fn in ((read_gini, gini_by_group),
                              (read_hoover, hoover_by_group)):
        got = [r.asDict() for r in read_fn(spark, state_dir).collect()]
        want = [r.asDict() for r in batch_fn(full, "n_chars", "source").collect()]
        assert got == want, (read_fn.__name__, got, want)

    # the spanning cell folded
    grid = {
        (r["g"], r["v"]): r["c"]
        for r in spark.read.parquet(os.path.join(state_dir, "v2")).collect()
    }
    assert grid[("web", 100)] == 3

    # replay idempotence: batch 1's partial merged over v1 == v2
    part = value_grid(
        spark.read.parquet(os.path.join(in_dir, "drop-1")), "n_chars", "source"
    )
    prev = spark.read.parquet(os.path.join(state_dir, "v1"))
    remerged = {
        (r["g"], r["v"]): r["c"]
        for r in prev.unionByName(part)
        .groupBy("g", "v")
        .agg(F.sum("c").cast("long").alias("c"))
        .collect()
    }
    assert remerged == grid
