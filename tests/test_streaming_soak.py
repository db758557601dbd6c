"""Streaming resource-hygiene soak (round-10 task 6).

The per-batch snapshot commits, watermark pruning, and (round-10) per-batch
checkpoint releases had only ever run for a handful of micro-batches; leaks
that grow by O(1) per batch — pinned RDDs, snapshot manifests, streaming
checkpoint files — are invisible at that length and fatal on the
always-on 100 TB ingest monitor they exist for. This drives the near-dup +
heavy-hitter + novelty monitors CONCURRENTLY (three StreamingQueries on one
session — also proving the per-RDD-exact release handles never free another
monitor's state) across ~210 micro-batches and asserts every resource pool
is bounded at the end:

- pinned RDDs: ~0 left (pre-round-10: 2/batch from the near-dup step +
  1/batch from the count-min merge = ~210 leaked pins at this length);
- snapshot store: manifests and store-* data dirs bounded by the vacuum's
  two-distinct-batch retention, store ROWS bounded by watermark pruning;
- streaming checkpoint dirs: file count bounded by minBatchesToRetain.

Slow (~2-4 min); skip with SPARK_GRAFT_SKIP_SLOW=1 (same gate as the
local-cluster smoke).
"""

from __future__ import annotations

import os

import pytest

pytestmark = [
    pytest.mark.slow,  # soak + restart-chaos probes, 600-1800 s timeouts
    pytest.mark.skipif(
        os.environ.get("SPARK_GRAFT_SKIP_SLOW") == "1",
        reason="slow streaming soak disabled via SPARK_GRAFT_SKIP_SLOW",
    ),
]

N_BATCHES = 70  # x3 concurrent monitors = 210 micro-batches driven
DOCS_PER_BATCH = 5


def _write_source_files(src_dir: str, n_batches: int = N_BATCHES) -> None:
    """Tiny parquet files (one per micro-batch via maxFilesPerTrigger=1),
    written with pyarrow directly — that many Spark write jobs would
    dominate the soak's wall time with setup cost."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime, timedelta, timezone

    os.makedirs(src_dir, exist_ok=True)
    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    boiler = " ".join(f"boiler{i}" for i in range(8))
    for b in range(n_batches):
        ids, texts, evs = [], [], []
        for j in range(DOCS_PER_BATCH):
            d = b * DOCS_PER_BATCH + j
            ids.append(d)
            # j==0: the recurring boilerplate (near-dup after batch 0);
            # j>0: unique arithmetic-token text
            texts.append(
                boiler if j == 0
                else " ".join(f"u{d}_{i} v{d * 7 + i}" for i in range(8))
            )
            evs.append(t0 + timedelta(seconds=10 * b))
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "event_time": pa.array(evs, pa.timestamp("us", tz="UTC")),
                }
            ),
            os.path.join(src_dir, f"batch_{b:04d}.parquet"),
        )


def _tree_files(root: str) -> list[str]:
    out = []
    for dirpath, _dirnames, filenames in os.walk(root):
        out += [os.path.join(dirpath, f) for f in filenames]
    return out


def test_monitor_soak_bounded_resources(spark, tmp_path):
    from dshackle_archive_spark.core.checkpoint import release_all_pinned
    from dshackle_archive_spark.streaming.doc_stream import (
        _load_state_snapshot,
        start_streaming_heavy_hitters,
        start_streaming_neardup_dedup,
        start_streaming_novelty_monitor,
    )

    src = str(tmp_path / "src")
    _write_source_files(src)
    release_all_pinned(spark)  # clean slate

    def pinned() -> int:
        return int(spark.sparkContext._jsc.getPersistentRDDs().size())

    base_pinned = pinned()
    # the retention knobs an always-on monitor deployment needs: keep 10
    # batches of offsets/commits, and let the file-source metadata log
    # delete compacted-away entries immediately (the default cleanupDelay
    # of 10 min means a soak this short would never observe cleanup)
    knobs = {
        "spark.sql.streaming.minBatchesToRetain": "10",
        "spark.sql.streaming.fileSource.log.deletion": "true",
        "spark.sql.streaming.fileSource.log.cleanupDelay": "0",
    }
    old_conf = {}
    for k, v in knobs.items():
        old_conf[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    dirs = {
        name: {
            "state": str(tmp_path / name / "state"),
            "out": str(tmp_path / name / "out"),
            "ckpt": str(tmp_path / name / "ckpt"),
        }
        for name in ("neardup", "hh", "novelty")
    }
    try:
        stream = (
            spark.readStream.schema(
                "doc_id long, text string, event_time timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        queries = [
            start_streaming_neardup_dedup(
                stream, dirs["neardup"]["state"], dirs["neardup"]["out"],
                dirs["neardup"]["ckpt"], watermark_delay_sec=600,
                available_now=True,
            ),
            start_streaming_heavy_hitters(
                stream, dirs["hh"]["state"], dirs["hh"]["out"],
                dirs["hh"]["ckpt"], available_now=True,
            ),
            start_streaming_novelty_monitor(
                stream, dirs["novelty"]["state"], dirs["novelty"]["out"],
                dirs["novelty"]["ckpt"], available_now=True,
            ),
        ]
        for q in queries:
            assert q.awaitTermination(600), "soak query did not drain in 10 min"
    finally:
        for k, v in old_conf.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    # ---- correctness spot checks: the monitors did real work ------------
    surv = spark.read.parquet(dirs["neardup"]["out"])
    # batch 0 keeps all 5 (boilerplate's first carrier); every later batch
    # drops its boilerplate doc and keeps its 4 unique docs
    assert surv.count() == 5 + 4 * (N_BATCHES - 1)
    hh = spark.read.parquet(dirs["hh"]["out"])
    assert hh.count() > 0
    bad = hh.filter("est_total < batch_count").count()
    assert bad == 0, "count-min overestimate invariant violated"
    nov = spark.read.parquet(dirs["novelty"]["out"])
    assert nov.count() == N_BATCHES
    assert nov.filter("novelty_rate <= 0 OR novelty_rate > 1").count() == 0

    # ---- hygiene: pinned RDDs ~0 after 210 released micro-batches -------
    leaked = pinned() - base_pinned
    assert leaked <= 2, f"soak leaked {leaked} pinned RDDs"

    # ---- hygiene: snapshot stores bounded by the vacuum -----------------
    for name in ("neardup", "hh", "novelty"):
        sdir = dirs[name]["state"]
        manifests = [
            f for f in os.listdir(os.path.join(sdir, "_manifests"))
            if f.endswith(".json")
        ]
        stores = [d for d in os.listdir(sdir) if d.startswith("store-")]
        assert len(manifests) <= 8, (name, sorted(manifests))
        assert len(stores) <= 8, (name, len(stores))

    # watermark pruning bounds the band-store ROWS: 600 s window / 10 s per
    # batch ≈ last 61 batches' bands (+ the evergreen boilerplate band)
    store = _load_state_snapshot(spark, dirs["neardup"]["state"], 10**9)
    max_rows = (61 + 2) * DOCS_PER_BATCH * 4
    assert store is not None and store.count() <= max_rows

    # ---- hygiene: streaming checkpoint file count bounded ---------------
    for name in ("neardup", "hh", "novelty"):
        n_files = len(_tree_files(dirs[name]["ckpt"]))
        assert n_files <= 120, (name, n_files)


# ---------------------------------------------------------------------------
# Restart-chaos soak (round-11 task): the 100 TB operating mode is monitors
# that get KILLED and resumed, not one long-lived process. Hard-kill the
# whole monitor process (SIGKILL — no cleanup, no stop()) after a non-final
# batch of the parameterized monitor commits, restart from the checkpoints,
# and assert the end state is IDENTICAL to an undisturbed clean run:
# exactly-once across the restart boundary (no double-merged count-min grid,
# no re-admitted or doubled near-dup survivor, no repeated novelty row).
# This is what found the at-least-once output sink the monitors had before
# round 11 (mode("append") re-appended a replayed batch's rows) — fixed by
# _idempotent_batch_write's per-batch dynamic partition overwrite.
# ---------------------------------------------------------------------------

N_BATCHES_CHAOS = 12
KILL_AT_COMMIT = 3  # SIGKILL once the target monitor commits batch 3


def _probe_cmd(src: str, work: str) -> list[str]:
    import sys as _sys

    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "monitor_chaos_probe.py")
    return [_sys.executable, script, src, work]


def _out_rows(spark, out_dir: str) -> list[tuple]:
    df = spark.read.parquet(out_dir)
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def _state_rows(spark, state_dir: str) -> list[tuple]:
    from dshackle_archive_spark.streaming.doc_stream import _load_state_snapshot

    store = _load_state_snapshot(spark, state_dir, 10**9)
    assert store is not None
    return sorted(tuple(str(v) for v in r) for r in store.collect())


@pytest.fixture(scope="module")
def chaos_clean_run(tmp_path_factory):
    """ONE undisturbed subprocess run — the ground truth every chaos run
    must match exactly. Subprocess (not in-session) so clean and chaos
    runs share identical session config."""
    import subprocess

    src = str(tmp_path_factory.mktemp("chaos_src"))
    _write_source_files(src, N_BATCHES_CHAOS)
    work = str(tmp_path_factory.mktemp("chaos_clean"))
    # 30 min, not 10: a healthy window drains the probe in ~2-6 min, but
    # this host's wall-clock swings 1.5-2x on multi-minute phases (measured
    # 2026-08-18: one full-suite run timed this exact subprocess out at
    # 600 s; the standalone re-run passed all three params in 378 s total).
    # The timeout exists to catch hangs, not slow phases.
    proc = subprocess.run(
        _probe_cmd(src, work), capture_output=True, text=True, timeout=1800
    )
    assert proc.returncode == 0 and "DRAINED" in proc.stdout, (
        f"clean run failed\nstdout: {proc.stdout[-2000:]}\n"
        f"stderr: {proc.stderr[-4000:]}"
    )
    return src, work


@pytest.mark.parametrize("kill_monitor", ["neardup", "hh", "novelty"])
def test_restart_chaos_exactly_once(spark, tmp_path, chaos_clean_run, kill_monitor):
    import signal
    import subprocess
    import time

    from monitor_chaos_probe import monitor_dirs

    src, clean_work = chaos_clean_run
    work = str(tmp_path / "work")
    dirs = monitor_dirs(work)

    # ---- phase 1: run until the target monitor commits KILL_AT, SIGKILL --
    proc = subprocess.Popen(
        _probe_cmd(src, work), stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True,
    )
    commits_dir = os.path.join(dirs[kill_monitor]["ckpt"], "commits")
    deadline = time.time() + 900  # same host-phase margin as the drain legs
    killed = False
    while time.time() < deadline:
        if proc.poll() is not None:
            out, err = proc.communicate()
            raise AssertionError(
                f"probe drained before the kill point — raise N_BATCHES_CHAOS"
                f"\nstdout: {out[-1000:]}\nstderr: {err[-2000:]}"
            )
        done = [int(f) for f in (os.listdir(commits_dir)
                                 if os.path.isdir(commits_dir) else [])
                if f.isdigit()]
        if done and max(done) >= KILL_AT_COMMIT:
            # non-final: input must remain for the resume leg to replay
            assert max(done) < N_BATCHES_CHAOS - 1, "kill point too late"
            os.kill(proc.pid, signal.SIGKILL)
            killed = True
            break
        time.sleep(0.05)
    assert killed, "kill condition never reached within 15 min"
    proc.wait(timeout=60)
    assert proc.returncode == -signal.SIGKILL

    # ---- phase 2: restart from the checkpoints, drain the remainder ------
    proc2 = subprocess.run(
        _probe_cmd(src, work), capture_output=True, text=True, timeout=1800
    )
    assert proc2.returncode == 0 and "DRAINED" in proc2.stdout, (
        f"resume run failed\nstdout: {proc2.stdout[-2000:]}\n"
        f"stderr: {proc2.stderr[-4000:]}"
    )

    # ---- exactly-once: end state identical to the undisturbed run --------
    clean_dirs = monitor_dirs(clean_work)
    for name in ("neardup", "hh", "novelty"):
        got = _out_rows(spark, dirs[name]["out"])
        want = _out_rows(spark, clean_dirs[name]["out"])
        assert got == want, f"{name} output diverged across the restart"
        got_state = _state_rows(spark, dirs[name]["state"])
        want_state = _state_rows(spark, clean_dirs[name]["state"])
        assert got_state == want_state, f"{name} store diverged across restart"
    # spot invariants on the chaos run itself (not just equality)
    surv = spark.read.parquet(dirs["neardup"]["out"])
    assert surv.count() == 5 + 4 * (N_BATCHES_CHAOS - 1)
    nov = spark.read.parquet(dirs["novelty"]["out"])
    assert nov.count() == N_BATCHES_CHAOS  # one row per batch, no repeats
    hh = spark.read.parquet(dirs["hh"]["out"])
    assert hh.select("batch_id").distinct().count() == N_BATCHES_CHAOS
    assert hh.filter("est_total < batch_count").count() == 0
