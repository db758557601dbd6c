"""Stream-mode semantics (T1-T7): head-follow, gap synthesis, dedup,
finalized lag, --continue backfill, fork tolerance."""

import os

from dshackle_archive_spark.core import DataKind, Range
from dshackle_archive_spark.plans.archive_plan import archive
from dshackle_archive_spark.sources.archive import list_archive_files
from dshackle_archive_spark.sources.fetcher import FetchPolicy
from dshackle_archive_spark.sources.mock_chain import MockChain
from dshackle_archive_spark.streaming.stream_plan import (
    CONTINUE_WINDOW,
    FINALITY_MARGIN,
    StreamState,
    run_stream,
    stream_batch,
)

import pytest

# micro-batch streaming semantics: dozens of real StreamingQuery runs with
# poll sleeps and awaitTermination(120) bounds — minutes of wall clock, so
# slow-tier (the fast tier keeps all value/plan gates; see pytest.ini)
pytestmark = pytest.mark.slow

B = (DataKind.BLOCKS,)
POLICY = FetchPolicy(parallel=4)


def AdvancingChain(start_head, step=2, **kw):
    """Head advances by `step` on every poll. Defined as a factory so the
    class is cloudpickled by value (module-level test classes aren't
    importable on executor workers)."""

    class _AdvancingChain(MockChain):
        def __init__(self, start_head, step, **kw):
            super().__init__(head_height=start_head, **kw)
            object.__setattr__(self, "_head", start_head)
            object.__setattr__(self, "_step", step)

        def head(self):
            h = self._head
            object.__setattr__(self, "_head", h + self._step)
            return h

    return _AdvancingChain(start_head, step, **kw)


def files(root):
    return list_archive_files(os.path.join(str(root), "eth"))


def test_stream_follows_head_with_gap_synthesis(spark, tmp_path):
    chain = AdvancingChain(1000, step=3)
    st = run_stream(spark, chain, str(tmp_path), tables=B, policy=POLICY, num_batches=3)
    # batch1: height 1000; batch2: 1001..1003; batch3: 1004..1006 (T4 fills gaps)
    assert st.archived_heights == list(range(1000, 1007))
    assert len(files(tmp_path)) == 7


def test_stream_dedups_stale_head(spark, tmp_path):
    chain = AdvancingChain(1000, step=0)  # head never advances
    st = run_stream(spark, chain, str(tmp_path), tables=B, policy=POLICY, num_batches=3)
    assert st.archived_heights == [1000]  # T6: repeated head archived once
    assert st.batches == 3


def test_stream_finalized_lags_head(spark, tmp_path):
    chain = AdvancingChain(1000, step=0)
    st = run_stream(
        spark, chain, str(tmp_path), tables=B, policy=POLICY,
        follow="finalized", num_batches=1,
    )
    assert st.archived_heights == [1000 - FINALITY_MARGIN]


def test_stream_continue_backfills_missing(spark, tmp_path):
    chain = AdvancingChain(500, step=0)
    # pre-archive part of the continue window, leaving a hole
    archive(spark, MockChain(head_height=10_000), str(tmp_path), Range(400, 449),
            tables=B, chunk=50, policy=POLICY)
    st = run_stream(
        spark, chain, str(tmp_path), tables=B, policy=POLICY,
        continue_from_archive=True, num_batches=1,
    )
    # T3: the missing 450..499 window was repaired before tailing
    assert ("blocks", 450, 499) in st.backfilled
    names = files(tmp_path)
    assert any("range-000000450" in f or "000000450.block" in f for f in names)
    assert st.archived_heights == [500]


def test_stream_fork_tolerant_single_files(spark, tmp_path):
    chain = AdvancingChain(2000, step=0, fork_at=frozenset({2000}))
    run_stream(spark, chain, str(tmp_path), tables=B, policy=POLICY, num_batches=1)
    got = files(tmp_path)
    # T5: both fork variants at the head co-exist, hash-qualified
    assert len(got) == 2
    assert all(".block.parquet" in f for f in got)


def test_structured_streaming_foreachbatch(spark, tmp_path):
    """The documented readStream integration: rate-source ticks drive
    stream_batch via foreachBatch — a genuine StreamingQuery (T1/T7)."""
    chain = AdvancingChain(3000, step=1)
    state = StreamState()

    def on_batch(_df, _batch_id):
        stream_batch(
            spark, chain, str(tmp_path), state,
            tables=B, policy=POLICY, follow="latest",
        )

    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 4)
        .load()
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", str(tmp_path / "_ckpt"))
        .start()
    )
    try:
        import time
        deadline = time.time() + 60
        while time.time() < deadline and state.batches < 3:
            time.sleep(0.5)
    finally:
        q.stop()  # T7 graceful shutdown
    assert state.batches >= 3
    assert state.archived_heights[0] == 3000
    # heights are contiguous despite the head advancing between polls (T4)
    hs = state.archived_heights
    assert hs == list(range(3000, 3000 + len(hs)))
    assert len(files(tmp_path)) == len(hs)


def test_stateful_dedup_applyinpandaswithstate(spark, tmp_path):
    """W2/T6 as a genuine stateful streaming operator: repeated heights are
    flagged first_batch only once; state is per-height with timeout."""
    import time

    from dshackle_archive_spark.streaming.stateful import dedup_heights_stateful
    from pyspark.sql import functions as F

    # rate source: value v -> height floor(v/3) → each height arrives 3 times
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 30)
        .load()
        .select(F.floor(F.col("value") / 3).alias("height"))
    )
    out = dedup_heights_stateful(src, timeout_ms=60_000)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "_ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM dedup_out").collect()
            heights_done = [r for r in rows if r["n_occurrences"] >= 3]
            if len(heights_done) >= 3:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM dedup_out").collect()
    assert rows, "no streaming output"
    by_h = {}
    for r in rows:
        by_h.setdefault(r["height"], []).append(r)
    # for every height: exactly one first_batch=True emission
    complete = {h: rs for h, rs in by_h.items() if any(x["n_occurrences"] >= 3 for x in rs)}
    assert complete
    for h, rs in complete.items():
        assert sum(1 for x in rs if x["first_batch"]) == 1, (h, rs)


def test_windowed_throughput_batch_semantics(spark):
    """The watermarked A9 aggregation also evaluates in batch mode."""
    from dshackle_archive_spark.streaming.stateful import windowed_throughput
    from dshackle_archive_spark.sources.tables import load_table
    from pyspark.sql import functions as F
    import os

    ev = load_table(spark, os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"), "events")
    out = windowed_throughput(ev.select(F.col("ts").cast("timestamp").alias("ts")), window="1 hour", watermark="1 hour")
    rows = out.collect()
    assert sum(r["n_events"] for r in rows) == ev.count()


def test_reorg_correction_cycle(spark, tmp_path):
    """T5 end-to-end: stream appends both fork variants; the periodic verify
    pass prunes the loser against the live chain; the canonical chain
    survives and re-verifies clean."""
    from dshackle_archive_spark.core import Range
    from dshackle_archive_spark.plans.verify_plan import verify

    fork_h = 5005
    chain = AdvancingChain(5000, step=2, fork_at=frozenset({fork_h}))
    run_stream(spark, chain, str(tmp_path), tables=B, policy=POLICY, num_batches=5)
    names = files(tmp_path)
    at_fork = [f for f in names if f"{fork_h:09d}." in f]
    assert len(at_fork) == 2  # both variants co-exist, hash-qualified

    live = MockChain(head_height=100_000)  # canonical chain (B-hashes)
    rep = verify(spark, live, str(tmp_path), Range(5000, 5009), tables=B)
    assert any(f["reason"] == "fork_loser" for f in rep.failures)
    names2 = files(tmp_path)
    at_fork2 = [f for f in names2 if f"{fork_h:09d}." in f]
    assert len(at_fork2) == 1
    # the survivor carries the canonical hash
    assert live.block_hash(fork_h) in at_fork2[0]
    # and a re-verify of the corrected archive is clean
    rep2 = verify(spark, live, str(tmp_path), Range(5000, 5009), tables=B)
    assert rep2.failures == []


def test_bounded_sequencer_reorders_out_of_order_stream(spark, tmp_path):
    """W2 as a genuine stateful streaming operator: adjacent-swapped input
    (1,0,3,2,…) must come out strictly ordered, with emission index == height
    for a contiguous stream."""
    import time

    from pyspark.sql import functions as F

    from dshackle_archive_spark.streaming.stateful import bounded_sequencer

    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 40)
        .load()
        .select(
            F.lit("eth").alias("chain"),
            F.col("value").bitwiseXOR(F.lit(1)).cast("long").alias("height"),
        )
    )
    out = bounded_sequencer(src, max_buffer=8)
    q = (
        out.writeStream.format("memory")
        .queryName("seq_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "_ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and spark.sql("SELECT * FROM seq_out").count() < 20:
            time.sleep(0.5)
    finally:
        q.stop()
    rows = sorted(spark.sql("SELECT * FROM seq_out").collect(), key=lambda r: r["seq"])
    assert len(rows) >= 20
    # strictly ordered emission; contiguous input ⇒ height == seq throughout
    assert [r["height"] for r in rows] == [r["seq"] for r in rows] == list(range(len(rows)))


def test_bounded_sequencer_abandons_permanent_gap(spark, tmp_path):
    """The bound is what keeps state finite: a height that never arrives must
    not wedge the sequencer — past max_buffer it resyncs from the lowest
    buffered height (block_seq.rs's bounded in-flight window)."""
    import time

    from pyspark.sql import functions as F

    from dshackle_archive_spark.streaming.stateful import bounded_sequencer

    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 40)
        .load()
        .select(F.lit("eth").alias("chain"), F.col("value").cast("long").alias("height"))
        .filter(F.col("value") != 5)  # height 5 never arrives
    )
    out = bounded_sequencer(src, max_buffer=3)
    q = (
        out.writeStream.format("memory")
        .queryName("seq_gap")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "_ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and spark.sql(
            "SELECT * FROM seq_gap WHERE height > 8"
        ).count() == 0:
            time.sleep(0.5)
    finally:
        q.stop()
    rows = sorted(spark.sql("SELECT * FROM seq_gap").collect(), key=lambda r: r["seq"])
    hs = [r["height"] for r in rows]
    assert 5 not in hs
    assert hs == sorted(hs) and len(set(hs)) == len(hs)  # strictly ordered
    assert set(range(0, 5)) <= set(hs) and max(hs) > 8  # progressed past the gap


def test_streaming_exact_dedup(spark, tmp_path):
    """Streaming doc ingest dedup: each distinct content appears once in the
    output despite arriving 3x, and contents whose hash is in the static
    known-hash set never appear at all."""
    import time

    from pyspark.sql import functions as F

    from dshackle_archive_spark.operators.dedup import content_hash
    from dshackle_archive_spark.streaming.doc_stream import streaming_exact_dedup

    # rate source: value v -> doc id floor(v/3), text "doc <id>" → 3 copies each
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 30)
        .load()
        .select(
            F.floor(F.col("value") / 3).alias("doc_id"),
            F.concat(F.lit("doc number "), F.floor(F.col("value") / 3)).alias("text"),
        )
    )
    # docs 0 and 1 are "already archived"
    known = spark.createDataFrame(
        [(i, f"doc number {i}") for i in (0, 1)], "doc_id long, text string"
    ).select(content_hash("text").alias("content_hash"))

    out = streaming_exact_dedup(src, known_hashes=known)
    q = (
        out.writeStream.format("memory")
        .queryName("docdedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "_ckpt_docdedup"))
        .start()
    )
    try:
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM docdedup_out").collect()
            if len({r["doc_id"] for r in rows}) >= 4:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids)), f"duplicate docs in output: {sorted(ids)}"
    assert 0 not in ids and 1 not in ids, "known-hash docs must be anti-joined away"
    assert len(set(ids)) >= 4


def test_streaming_dedup_with_watermark_bounds_state(spark, tmp_path):
    """The watermark variant runs with dropDuplicatesWithinWatermark —
    state bounded to the horizon — and still dedups inside it."""
    import time

    from pyspark.sql import functions as F

    from dshackle_archive_spark.streaming.doc_stream import streaming_exact_dedup

    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 20)
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            F.concat(F.lit("item "), F.floor(F.col("value") / 2)).alias("text"),
        )
    )
    out = streaming_exact_dedup(src, watermark=("ts", "10 seconds"))
    q = (
        out.writeStream.format("memory")
        .queryName("docdedup_wm")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "_ckpt_wm"))
        .start()
    )
    try:
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM docdedup_wm").collect()
            if len(rows) >= 4:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    hashes = [r["content_hash"] for r in rows]
    assert len(hashes) == len(set(hashes)), "watermark dedup must drop in-horizon repeats"
    assert len(hashes) >= 4


def test_streaming_curate_gates_then_dedups(spark, tmp_path):
    """Quality gate + stateful dedup on a stream: short docs never surface
    (and never enter dedup state), repeats appear once."""
    import time

    from pyspark.sql import functions as F

    from dshackle_archive_spark.streaming.doc_stream import streaming_curate

    # value v -> doc floor(v/2); even docs are long enough, odd docs too short
    long_text = " ".join(f"w{i}" for i in range(12))
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 30)
        .load()
        .select(
            F.floor(F.col("value") / 2).alias("doc_id"),
            F.when(
                F.floor(F.col("value") / 2) % 2 == 0,
                F.concat(F.lit(long_text + " doc "), F.floor(F.col("value") / 2)),
            )
            .otherwise(F.lit("too short"))
            .alias("text"),
        )
    )
    out = streaming_curate(src, min_tokens=10)
    q = (
        out.writeStream.format("memory")
        .queryName("scurate")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "_ckpt_scurate"))
        .start()
    )
    try:
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM scurate").collect()
            if len({r["doc_id"] for r in rows if r["doc_id"] % 2 == 0}) >= 3:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    ids = [r["doc_id"] for r in rows]
    evens = [i for i in ids if i % 2 == 0]
    assert len(evens) == len(set(evens)), "dedup must hold"
    # odd (short) docs are filtered; "too short" itself dedups to ≤1 row and
    # must never appear since it fails the token gate
    assert all(i % 2 == 0 for i in ids), f"short docs leaked: {ids}"


def test_streaming_session_windows(spark, tmp_path):
    """Native session_window over a stream: a key's rapid events coalesce
    into ONE session per burst; sessions only emit once closed by the
    watermark."""
    import time

    from pyspark.sql import functions as F

    from dshackle_archive_spark.streaming.stateful import session_windows_stream

    # rate source 20 rows/s: key = value % 2; every event within 1s of the
    # next → one long open session per key until the stream's tail passes
    # the watermark. To get CLOSED sessions, burst pattern: active for
    # values 0-39, silent for 40-79 (filtered), active again ≥80.
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 20)
        .load()
        .filter((F.col("value") % 80) < 40)
        .select(
            (F.col("value") % 2).alias("user_id"),
            F.col("timestamp").alias("ts"),
        )
    )
    out = session_windows_stream(src, gap="1 seconds", watermark="2 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "_ckpt_sess"))
        .start()
    )
    try:
        deadline = time.time() + 90
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM sess_out").collect()
            if len(rows) >= 2:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert len(rows) >= 2, "no sessions closed"
    for r in rows:
        assert r["n_events"] >= 2
        assert r["session_end"] > r["session_start"]
    assert {r["user_id"] for r in rows} <= {0, 1}


def test_neardup_batch_step_semantics(spark, tmp_path):
    """Pure-batch contract of the streaming near-dup step: mutated copies of
    an earlier batch's doc (or of an earlier doc in the same batch) are
    dropped; fresh docs survive; a near-dup chain drops every later link."""
    from dshackle_archive_spark.streaming.doc_stream import neardup_batch_step

    state = str(tmp_path / "band_state")
    base = " ".join(f"token{i} filler{i} common{i}" for i in range(30))
    other = " ".join(f"zebra{i} quartz{i} vortex{i}" for i in range(30))

    # batch 0: two distinct docs + an in-batch mutated copy of doc 1
    b0 = spark.createDataFrame(
        [(1, base), (2, other), (3, base + " mutated")],
        "doc_id long, text string",
    )
    s0 = sorted(r["doc_id"] for r in neardup_batch_step(b0, state, 0).collect())
    assert s0 == [1, 2], f"batch 0 survivors: {s0}"

    # batch 1: mutated copy of batch-0 doc 1 (cross-batch), plus a fresh doc
    fresh = " ".join(f"apple{i} banana{i} cherry{i}" for i in range(30))
    b1 = spark.createDataFrame(
        [(10, base + " tweaked tail"), (11, fresh)],
        "doc_id long, text string",
    )
    s1 = sorted(r["doc_id"] for r in neardup_batch_step(b1, state, 1).collect())
    assert s1 == [11], f"batch 1 survivors: {s1}"

    # batch 2: near-copy of the DROPPED doc 3 — its bands were still minted,
    # so the chain member is dropped too (batch keep-one-per-component)
    b2 = spark.createDataFrame(
        [(20, base + " mutated")], "doc_id long, text string"
    )
    s2 = [r["doc_id"] for r in neardup_batch_step(b2, state, 2).collect()]
    assert s2 == [], f"batch 2 survivors: {s2}"


def test_neardup_state_bounded_by_watermark(spark, tmp_path):
    """With a watermark delay, band-store generations prune entries older
    than (max event time − delay): an old doc's bands expire, so a late
    near-copy of it is (by design) admitted, and the store stays bounded."""
    import datetime as dt

    from dshackle_archive_spark.streaming.doc_stream import neardup_batch_step

    state = str(tmp_path / "band_state_wm")
    base = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(30))
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    b0 = spark.createDataFrame(
        [(1, base, t0)], "doc_id long, text string, event_time timestamp"
    )
    assert [r["doc_id"] for r in neardup_batch_step(
        b0, state, 0, watermark_delay_sec=60
    ).collect()] == [1]

    # 10 min later: the batch's own max event time advances the horizon far
    # past doc 1's bands → store prunes them → the near-copy survives
    b1 = spark.createDataFrame(
        [(2, base + " shifted", t0 + dt.timedelta(minutes=10))],
        "doc_id long, text string, event_time timestamp",
    )
    surv = [r["doc_id"] for r in neardup_batch_step(
        b1, state, 1, watermark_delay_sec=60
    ).collect()]
    assert surv == [2], surv

    # bounded state: batch 1's snapshot-committed store holds only doc 2's
    # bands (doc 1's expired) — read through the pinned manifest
    from dshackle_archive_spark.sources import snapshots as SNAP

    snap = SNAP.load_snapshot(state)
    assert snap is not None and snap.extra["batch_id"] == 1
    store = spark.read.parquet(*snap.paths())
    assert store.count() == 4  # bands=4 rows for exactly one doc


def test_neardup_store_snapshot_commits(spark, tmp_path):
    """The band store publishes through the SAME manifest-pinned snapshot
    path as batch curation (round-7 task 8): one commit per micro-batch
    with the batch id in the manifest, time travel over retained monitor
    state, deterministic retries through the manifest chain, and retention
    via the snapshot vacuum."""
    from dshackle_archive_spark.sources import snapshots as SNAP
    from dshackle_archive_spark.streaming.doc_stream import neardup_batch_step

    state = str(tmp_path / "snap_state")
    base = " ".join(f"m{i} n{i} o{i}" for i in range(30))
    other = "totally different " + " ".join(f"x{i} y{i}" for i in range(30))
    b0 = spark.createDataFrame([(1, base)], "doc_id long, text string")
    b1 = spark.createDataFrame(
        [(2, base + " mutated"), (3, other)], "doc_id long, text string"
    )

    assert [r["doc_id"] for r in neardup_batch_step(b0, state, 0).collect()] == [1]
    v_b0 = SNAP.current_version(state)
    snap0 = SNAP.load_snapshot(state)
    assert snap0.extra["batch_id"] == 0 and snap0.files

    surv1 = sorted(r["doc_id"] for r in neardup_batch_step(b1, state, 1).collect())
    assert surv1 == [3]  # 2 is a near-copy of stored doc 1
    snap1 = SNAP.load_snapshot(state)
    assert snap1.extra["batch_id"] == 1 and snap1.parent == v_b0

    # time travel: batch 0's state is still pinned and readable (4 band
    # rows for exactly doc 1), even though batch 1's store is current
    s0 = spark.read.parquet(*SNAP.load_snapshot(state, v_b0).paths())
    assert s0.count() == 4

    # restart/retry of batch 1: must resolve PRE-1 state through the
    # manifest chain (newest manifest with batch_id < 1), not the current
    # batch-1 snapshot — and reproduce the same survivors
    retry = sorted(r["doc_id"] for r in neardup_batch_step(b1, state, 1).collect())
    assert retry == [3]
    snap_retry = SNAP.load_snapshot(state)
    assert snap_retry.extra["batch_id"] == 1 and snap_retry.version > snap1.version

    # retention is per distinct BATCH ID, not per manifest (round-8 ADVICE
    # fix): the batch-1 retry published a SECOND batch-1 manifest, and
    # count-based keep-2 would have evicted batch 0's state — the exact
    # snapshot a further retry of batch 1 must re-read. The batch-id-aware
    # vacuum keeps it.
    assert SNAP.load_snapshot(state, v_b0) is not None
    retry2 = sorted(r["doc_id"] for r in neardup_batch_step(b1, state, 1).collect())
    assert retry2 == [3]  # double retry still resolves pre-batch-1 state

    # advancing to batch 2 retires batch 0: its manifests and exclusively-
    # owned files are vacuumed once the keep window moves to batches {1, 2}
    b2 = spark.createDataFrame(
        [(4, "fresh unrelated " + " ".join(f"k{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    assert [r["doc_id"] for r in neardup_batch_step(b2, state, 2).collect()] == [4]
    assert SNAP.load_snapshot(state, v_b0) is None


def test_neardup_state_walk_fails_loudly_when_vacuumed(spark, tmp_path):
    """_load_state_snapshot must RAISE — never silently return an empty
    store — when the manifest walk dead-ends on a vacuumed version before
    finding any batch < N (round-8 ADVICE: a silent None here resets the
    band store and leaks duplicates with no error)."""
    import os

    import pytest

    from dshackle_archive_spark.sources import snapshots as SNAP
    from dshackle_archive_spark.streaming.doc_stream import (
        _load_state_snapshot,
        neardup_batch_step,
    )

    state = str(tmp_path / "walk_state")
    text = " ".join(f"a{i} b{i}" for i in range(30))
    b0 = spark.createDataFrame([(1, text)], "doc_id long, text string")
    b1 = spark.createDataFrame([(2, text + " more")], "doc_id long, text string")
    neardup_batch_step(b0, state, 0)
    neardup_batch_step(b1, state, 1)
    # simulate over-eager retention: delete the batch-0 manifest out from
    # under the chain, then ask for pre-batch-1 state
    v1 = SNAP.load_snapshot(state).parent
    os.remove(os.path.join(state, "_manifests", f"v{v1}.json"))
    with pytest.raises(RuntimeError, match="vacuumed"):
        _load_state_snapshot(spark, state, 1)
    # a genuinely fresh dir still reads as "no prior state", not an error
    assert _load_state_snapshot(spark, str(tmp_path / "fresh"), 5) is None


def test_streaming_neardup_across_microbatches(spark, tmp_path):
    """End-to-end StreamingQuery: planted mutated duplicates arriving in
    later micro-batches never reach the sink; distinct docs all do."""
    import time

    from pyspark.sql import functions as F

    from dshackle_archive_spark.streaming.doc_stream import (
        start_streaming_neardup_dedup,
    )

    # value v -> doc floor(v/4): variant v%4 appends a 1-token mutation, so
    # each doc arrives as 4 near-copies spread across micro-batches
    body = " ".join(f"w{i} q{i} z{i}" for i in range(25))
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 20)
        .load()
        .select(
            F.col("value").alias("doc_id"),
            F.concat(
                F.lit(body + " doc "),
                F.floor(F.col("value") / 4),
                F.lit(" variant "),
                F.col("value") % 4,
            ).alias("text"),
            F.col("timestamp").alias("event_time"),
        )
    )
    out_dir = str(tmp_path / "neardup_out")
    q = start_streaming_neardup_dedup(
        src,
        state_dir=str(tmp_path / "neardup_state"),
        output_path=out_dir,
        checkpoint=str(tmp_path / "_ckpt_neardup"),
        watermark_delay_sec=3600,
        trigger_processing_time="5 seconds",
    )
    try:
        deadline = time.time() + 240
        rows = []
        while time.time() < deadline:
            try:
                rows = spark.read.parquet(out_dir).collect()
            except Exception:
                rows = []
            if len({r["doc_id"] // 4 for r in rows}) >= 2:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert len(rows) >= 2, "stream produced too little output to judge"
    groups = [r["doc_id"] // 4 for r in rows]
    assert len(groups) == len(set(groups)), (
        f"near-dup variants leaked into the sink: {sorted(r['doc_id'] for r in rows)}"
    )


def test_drift_batch_step_flags_register_change(spark, sf_dir):
    """Same-distribution batch scores near zero; a batch with injected
    out-of-vocabulary skew scores high and reports novel tokens."""
    from pyspark.sql import functions as F

    from dshackle_archive_spark.streaming.doc_stream import (
        drift_batch_step,
        reference_token_distribution,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    ref = reference_token_distribution(docs.filter("doc_id < 300"))
    same = drift_batch_step(docs.filter("doc_id >= 300 and doc_id < 360"), ref, 0)
    skew = drift_batch_step(
        docs.filter("doc_id >= 300 and doc_id < 360").withColumn(
            "text", F.concat(F.col("text"), F.lit(" zzzq" * 40))
        ),
        ref,
        1,
    )
    s = {r["source"]: r for r in same.collect()}
    k = {r["source"]: r for r in skew.collect()}
    assert set(same.columns) == {"batch_id", "source", "n_tokens",
                                 "novel_tokens", "kl"}
    for src in k:
        assert k[src]["novel_tokens"] >= 1
        assert k[src]["kl"] > s.get(src, {"kl": 0.0})["kl"] + 0.5
    for src in s:
        assert s[src]["novel_tokens"] == 0
        assert s[src]["kl"] < 0.5


def test_streaming_drift_monitor_end_to_end(spark, tmp_path, sf_dir):
    """StreamingQuery wiring: per-batch drift rows land in the sink with
    alert flags; the skewed stream trips the alert."""
    import time

    from pyspark.sql import functions as F

    from dshackle_archive_spark.streaming.doc_stream import (
        reference_token_distribution,
        start_streaming_drift_monitor,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ref = reference_token_distribution(docs)
    body = "totally novel register " + " ".join(f"nv{i}" for i in range(30))
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 40)
        .load()
        .select(
            F.col("value").alias("doc_id"),
            F.lit("streamsrc").alias("source"),
            F.lit(body).alias("text"),
        )
    )
    out = str(tmp_path / "drift_out")
    q = start_streaming_drift_monitor(
        src, ref, out, str(tmp_path / "ckpt"), alert_kl=1.0
    )
    try:
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            try:
                rows = spark.read.parquet(out).collect()
            except Exception:
                rows = []
            if len(rows) >= 2:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert len(rows) >= 2
    assert all(r["source"] == "streamsrc" for r in rows)
    assert all(r["alert"] for r in rows)  # novel register → high KL
    assert all(r["novel_tokens"] >= 30 for r in rows)


def test_countmin_merge_step_cumulative_invariant(spark, sf_dir):
    """The batch-step logic alone: merging two batch grids equals sketching
    the concatenated stream, and every probe estimate is >= the true
    cumulative count (count-min's one-sided error)."""
    from pyspark.sql import functions as F

    from dshackle_archive_spark.streaming.doc_stream import (
        countmin_batch_grid,
        countmin_merge_step,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    b1 = docs.filter("doc_id < 60")
    b2 = docs.filter("doc_id >= 60 and doc_id < 120")

    g1, r1 = countmin_merge_step(b1, None, 0)
    g2, r2 = countmin_merge_step(b2, g1, 1)

    # mergeability: cumulative grid == grid of the concatenated stream
    whole = countmin_batch_grid(b1.unionByName(b2))
    merged = {(r["r"], r["bucket"]): r["cell"] for r in g2.collect()}
    direct = {(r["r"], r["bucket"]): r["cell"] for r in whole.collect()}
    assert merged == direct

    # grid state stays bounded at depth*width
    assert len(merged) <= 4 * 256

    # one-sided error vs TRUE cumulative counts
    from dshackle_archive_spark.operators.dedup import normalized_text

    truth = {
        r["token"]: r["n"]
        for r in b1.unionByName(b2)
        .select(F.explode(F.split(normalized_text("text"), " ")).alias("token"))
        .filter("token != ''")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    rep2 = r2.collect()
    assert len(rep2) == 10
    assert all(r["est_total"] >= truth[r["token"]] for r in rep2)
    # batch 2's report reflects CUMULATIVE mass, not just the batch
    assert all(r["est_total"] >= r["batch_count"] for r in rep2)
    assert any(r["est_total"] > r["batch_count"] for r in rep2)


def test_streaming_heavy_hitters_end_to_end(spark, tmp_path):
    """StreamingQuery wiring: reports append per batch, estimates grow
    monotonically for the constant stream token, state dir keeps exactly
    one grid generation."""
    import os
    import time

    from pyspark.sql import functions as F

    from dshackle_archive_spark.streaming.doc_stream import (
        start_streaming_heavy_hitters,
    )

    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 40)
        .load()
        .select(
            F.col("value").alias("doc_id"),
            F.lit("alpha alpha beta gamma").alias("text"),
        )
    )
    out = str(tmp_path / "hh_out")
    state = str(tmp_path / "hh_state")
    q = start_streaming_heavy_hitters(src, state, out, str(tmp_path / "ckpt"))
    try:
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            try:
                rows = spark.read.parquet(out).collect()
            except Exception:
                rows = []
            if len({r["batch_id"] for r in rows}) >= 2:
                break
            time.sleep(1)
    finally:
        q.stop()
    batches = sorted({r["batch_id"] for r in rows})
    assert len(batches) >= 2
    alpha = {r["batch_id"]: r["est_total"] for r in rows if r["token"] == "alpha"}
    ests = [alpha[b] for b in batches if b in alpha]
    assert len(ests) >= 2
    # cumulative estimate strictly grows while the stream keeps emitting
    assert all(a < b for a, b in zip(ests, ests[1:]))
    # alpha appears twice per doc -> estimate ~2x beta's within a batch
    by_batch = {}
    for r in rows:
        by_batch.setdefault(r["batch_id"], {})[r["token"]] = r["est_total"]
    last = by_batch[batches[-1]]
    if "beta" in last and "alpha" in last:
        assert last["alpha"] >= 2 * last["beta"] - 2
    # snapshot retention: the per-commit vacuum keeps the two newest grid
    # manifests; the current one covers the last reported batch, so recovery
    # (newest manifest with batch < N) always finds usable state
    from dshackle_archive_spark.sources import snapshots as SNAP

    snap = SNAP.load_snapshot(state)
    assert snap is not None and snap.extra["batch_id"] >= batches[-1]
    manifests = [
        d for d in os.listdir(os.path.join(state, "_manifests"))
        if d.startswith("v") and d.endswith(".json")
    ]
    assert 1 <= len(manifests) <= 2


def test_streaming_decayed_mean_matches_batch(spark, tmp_path):
    """Streaming EMA: two availableNow runs over a file source (state must
    survive the restart), out-of-order days within a batch fold in day
    order, a stale replayed day is dropped, and every emitted mean equals
    the direct Σv·e^{−λΔ}/Σe^{−λΔ} formula (and the batch operator)."""
    import json as _json
    import math
    import time

    from dshackle_archive_spark.streaming.stateful import decayed_mean_stream

    data_dir = tmp_path / "ema_in"
    data_dir.mkdir()
    ckpt = str(tmp_path / "_ckpt_ema")

    batch1 = [
        {"series": "a", "day": d, "v": float(10 + 3 * d)} for d in range(5)
    ] + [{"series": "b", "day": d, "v": float(100 - d)} for d in (0, 2, 4)]
    (data_dir / "b1.json").write_text(
        "\n".join(_json.dumps(r) for r in batch1)
    )

    out_dir = str(tmp_path / "ema_out")

    def run_once():
        src = (
            spark.readStream.schema("series string, day long, v double")
            .json(str(data_dir))
        )
        q = (
            decayed_mean_stream(src, half_life_days=7.0)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # second batch: out-of-order arrival within the file + one stale day
    batch2 = [
        {"series": "a", "day": 7, "v": 40.0},
        {"series": "a", "day": 5, "v": 31.0},
        {"series": "a", "day": 3, "v": 999.0},  # stale: already folded
        {"series": "a", "day": 6, "v": 35.0},
        {"series": "b", "day": 5, "v": 90.0},
    ]
    (data_dir / "b2.json").write_text(
        "\n".join(_json.dumps(r) for r in batch2)
    )
    run_once()

    rows = {
        (r["series"], r["day"]): r["decayed_mean"]
        for r in spark.read.parquet(out_dir).collect()
    }
    clean = [r for r in batch1 + batch2 if not (r["series"] == "a" and r["day"] == 3 and r["v"] == 999.0)]
    assert set(rows) == {(r["series"], r["day"]) for r in clean}

    lam = math.log(2.0) / 7.0
    for s, d in rows:
        pts = [(r["day"], r["v"]) for r in clean if r["series"] == s and r["day"] <= d]
        num = sum(v * math.exp(-lam * (d - dd)) for dd, v in pts)
        den = sum(math.exp(-lam * (d - dd)) for dd, v in pts)
        assert abs(rows[(s, d)] - num / den) < 1e-9, (s, d)

    # cross-check the batch operator on the same (deduplicated) series
    from pyspark.sql import functions as F

    from dshackle_archive_spark.operators.timeseries import decayed_mean

    bdf = spark.createDataFrame(
        [(r["series"], r["day"], r["v"]) for r in clean],
        "series string, day long, v double",
    ).select(
        "series",
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("day").cast("int")).alias("d"),
        "v",
    )
    for r in decayed_mean(bdf, "series", "d", "v", half_life_days=7.0).collect():
        import datetime

        day = (r["d"] - datetime.date(2024, 1, 1)).days
        assert abs(rows[(r["series"], day)] - r["decayed_mean"]) < 1e-6


def test_streaming_rolling_quantile_matches_batch_rule(spark, tmp_path):
    """Streaming trailing-7 quantiles across a checkpoint restart: every
    emitted p50/p90 equals the percentile_cont rule over the last-7 frame
    (the same rule the batch w9 query and both SQL engines use)."""
    import json as _json

    from dshackle_archive_spark.streaming.stateful import rolling_quantile_stream

    data_dir = tmp_path / "rq_in"
    data_dir.mkdir()
    ckpt = str(tmp_path / "_ckpt_rq")
    out_dir = str(tmp_path / "rq_out")

    batch1 = [{"series": "a", "day": d, "v": float((d * 7) % 13)} for d in range(9)]
    (data_dir / "b1.json").write_text("\n".join(_json.dumps(r) for r in batch1))

    def run_once():
        src = (
            spark.readStream.schema("series string, day long, v double")
            .json(str(data_dir))
        )
        q = (
            rolling_quantile_stream(src, window_days=7)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    batch2 = [
        {"series": "a", "day": 11, "v": 99.0},
        {"series": "a", "day": 10, "v": 1.0},   # out of order in the batch
        {"series": "a", "day": 8, "v": 777.0},  # stale replay: drop
    ]
    (data_dir / "b2.json").write_text("\n".join(_json.dumps(r) for r in batch2))
    run_once()

    rows = {
        r["day"]: (r["p50_7d"], r["p90_7d"])
        for r in spark.read.parquet(out_dir).collect()
    }
    clean = batch1 + [r for r in batch2 if r["day"] > 8]
    assert set(rows) == {r["day"] for r in clean}

    def pctl(vals, p):
        vals = sorted(vals)
        if len(vals) == 1:
            return float(vals[0])
        pos = p * (len(vals) - 1)
        lo = int(pos)
        hi = min(lo + 1, len(vals) - 1)
        return vals[lo] + (pos - lo) * (vals[hi] - vals[lo])

    series = sorted((r["day"], r["v"]) for r in clean)
    for i, (d, _v) in enumerate(series):
        frame = [v for _, v in series[max(0, i - 6): i + 1]]
        assert abs(rows[d][0] - pctl(frame, 0.5)) < 1e-12, d
        assert abs(rows[d][1] - pctl(frame, 0.9)) < 1e-12, d


def test_streaming_novelty_monitor(spark, tmp_path):
    """KMV novelty monitor over three availableNow batches: fresh corpus
    (~1.0), verbatim re-serve (~0.0, alert fires), half-new slice (~0.5).
    State is the fixed-k synopsis — the batch that RE-SERVES content
    leaves the synopsis unchanged."""
    import json as _json
    import os

    from dshackle_archive_spark.streaming.doc_stream import (
        start_streaming_novelty_monitor,
    )

    data_dir = tmp_path / "nov_in"
    data_dir.mkdir()
    ckpt = str(tmp_path / "_ckpt_nov")
    out_dir = str(tmp_path / "nov_out")
    state = str(tmp_path / "nov_state")

    def doc(i):  # ~40 distinct shingles per doc, disjoint across docs
        return {"text": " ".join(f"w{i}_{j}" for j in range(44))}

    def run_once():
        src = spark.readStream.schema("text string").json(str(data_dir))
        q = start_streaming_novelty_monitor(
            src, state, out_dir, ckpt, k=256, alert_below=0.2,
            available_now=True,
        )
        assert q.awaitTermination(120)

    (data_dir / "b1.json").write_text(
        "\n".join(_json.dumps(doc(i)) for i in range(40))
    )
    run_once()
    (data_dir / "b2.json").write_text(  # exact re-serve of 20 batch-1 docs
        "\n".join(_json.dumps(doc(i)) for i in range(20))
    )
    run_once()
    (data_dir / "b3.json").write_text(  # half repeats, half new
        "\n".join(_json.dumps(doc(i)) for i in range(30, 50))
    )
    run_once()

    rows = {r["batch_id"]: r for r in spark.read.parquet(out_dir).collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0]["novelty_rate"] > 0.85 and not rows[0]["alert"]
    assert rows[1]["novelty_rate"] < 0.15 and rows[1]["alert"]
    assert 0.3 < rows[2]["novelty_rate"] < 0.7 and not rows[2]["alert"]
    # snapshot retention: newest synopsis manifest covers the last batch
    from dshackle_archive_spark.sources import snapshots as SNAP

    snap = SNAP.load_snapshot(state)
    assert snap is not None and snap.extra["batch_id"] == 2
    # time travel: the retained previous synopsis is still readable
    prev = SNAP.load_snapshot(state, snap.version - 1)
    if prev is not None and prev.files:
        assert spark.read.parquet(*prev.paths()).count() <= 1024


def test_idempotent_batch_write_replay_overwrites_own_partition(spark, tmp_path):
    """Fast guard for the round-11 restart-chaos finding: a replayed
    foreachBatch (process killed between output write and streaming
    commit) must overwrite ITS OWN batch partition, not append a second
    copy — and must not touch other batches' partitions."""
    from pyspark.sql import functions as F

    from dshackle_archive_spark.streaming.doc_stream import (
        _idempotent_batch_write,
    )

    out = str(tmp_path / "out")
    df3 = spark.range(5).select(F.col("id").alias("doc_id"))
    df4 = spark.range(7).select(F.col("id").alias("doc_id"))
    _idempotent_batch_write(df3, out, 3)
    _idempotent_batch_write(df4, out, 4)
    _idempotent_batch_write(df3, out, 3)  # the replay
    got = spark.read.parquet(out)
    assert got.count() == 12  # 5 + 7, not 17
    per = {r["batch_id"]: r["n"] for r in
           got.groupBy("batch_id").agg(F.count("*").alias("n")).collect()}
    assert {int(k): v for k, v in per.items()} == {3: 5, 4: 7}


def test_idempotent_batch_write_refuses_legacy_flat_layout(spark, tmp_path):
    """Round-11 review finding: an output dir written by the legacy
    APPEND sink (flat part-*.parquet) must be refused loudly — mixing
    the batch_id-partitioned layout into it would break every subsequent
    read with 'conflicting directory structures'."""
    import pytest
    from pyspark.sql import functions as F

    from dshackle_archive_spark.streaming.doc_stream import (
        _idempotent_batch_write,
    )

    out = str(tmp_path / "legacy")
    df = spark.range(3).select(F.col("id").alias("doc_id"))
    df.write.mode("append").parquet(out)  # the pre-round-11 layout
    with pytest.raises(RuntimeError, match="legacy append sink"):
        _idempotent_batch_write(df, out, 7)
