"""Subprocess body for the executor-loss durability test (round-8 task 4).

The local-cluster smoke proves PARITY on real executor JVMs; this probe
proves DURABILITY: it runs an iterative registry query under
``local-cluster[2,2,2048]`` and SIGKILLs every live executor JVM mid-iteration —
immediately after the Nth ``reliable_checkpoint`` materialization, so every
later round depends on blocks the dead executor (co-)held.

- With ``$SPARK_GRAFT_CHECKPOINT_DIR`` set (DFS-backed ``df.checkpoint()``),
  the standalone Worker relaunches a replacement executor, the checkpointed
  blocks are re-read from the checkpoint directory, and the job completes
  with results identical to an undisturbed single-JVM run.
- Without it (``localCheckpoint`` fallback), the killed executor's blocks
  are gone AND unrecomputable (localCheckpoint truncates lineage without
  writing anywhere durable) — the job must FAIL, not silently produce
  partial results. This is the spot-instance failure mode the checkpoint
  strategy exists for (``core/checkpoint.py``).

Usage: executor_loss_probe.py <query> <sf_dir> <kill_after_ckpts> <out.json>
Mode is selected by the caller via the SPARK_GRAFT_CHECKPOINT_DIR env var.
Writes {"ok": bool, "killed_pid": int|null, "ckpt_calls": N,
        "cols": [...], "rows": [[str,...],...] | null, "error": str|null}.
Always exits 0 — the caller asserts on the JSON.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time


def _executor_pids() -> list[int]:
    """Real executor JVMs of THIS session's local-cluster (children of this
    process tree): /proc cmdline scan for CoarseGrainedExecutorBackend."""
    pids = []
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        try:
            with open(f"/proc/{entry}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\0", b" ")
        except OSError:
            continue
        if b"CoarseGrainedExecutorBackend" in cmd:
            pids.append(int(entry))
    return sorted(pids)


def main() -> int:
    qname, sf_dir, kill_after, out_path = (
        sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import pyspark

    os.environ.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

    from dshackle_archive_spark.session import get_spark

    spark = get_spark("executor-loss-probe", master="local-cluster[2,2,2048]")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    # wait for both executors to register before arming the kill
    deadline = time.time() + 60
    while len(_executor_pids()) < 2 and time.time() < deadline:
        time.sleep(0.5)

    state = {"calls": 0, "killed": None}

    from dshackle_archive_spark.core import checkpoint as CKPT
    from dshackle_archive_spark import queries as Q
    from dshackle_archive_spark.operators import dedup as DEDUP

    real = CKPT.reliable_checkpoint
    real_cwr = CKPT.checkpoint_with_release

    def _after_materialize():
        state["calls"] += 1
        if state["calls"] == kill_after and state["killed"] is None:
            # kill EVERY live executor, not just one: AQE coalesces the
            # tiny id-only shuffles to a single partition, so one
            # surviving executor can happen to hold every cached block
            # and the localCheckpoint contrast case flakes to success.
            # Total loss makes both verdicts placement-independent: the
            # Workers respawn executors either way; only the DFS path
            # has anywhere durable to re-read the blocks from.
            victims = _executor_pids()
            if victims:
                state["killed"] = victims[0]
                for pid in victims:
                    os.kill(pid, signal.SIGKILL)
                time.sleep(2)  # let the scheduler notice the loss

    def killing_checkpoint(df, eager: bool = True):
        out = real(df, eager=eager)  # eager=True: blocks exist after this
        _after_materialize()
        return out

    def killing_cwr(df, eager: bool = True):
        # the round-9 iterative loops materialize through
        # checkpoint_with_release — same kill point, handle passed through
        out, release = real_cwr(df, eager=eager)
        _after_materialize()
        return out, release

    # Every consumer binds the names at ITS OWN import (`from ..core.checkpoint
    # import reliable_checkpoint`), so patching a fixed module list rots as
    # modules split — after the round-9 queries-package split the package
    # __init__ attribute was a dead patch (round-9 advice). Sweep sys.modules
    # instead: rebind in every already-imported package module whose attribute
    # IS the real function (identity check keeps unrelated attrs untouched).
    _ = (Q, DEDUP)  # imported above to force the family modules into sys.modules
    for mod in list(sys.modules.values()):
        if not getattr(mod, "__name__", "").startswith("dshackle_archive_spark"):
            continue
        if getattr(mod, "reliable_checkpoint", None) is real:
            mod.reliable_checkpoint = killing_checkpoint
        if getattr(mod, "checkpoint_with_release", None) is real_cwr:
            mod.checkpoint_with_release = killing_cwr

    res: dict = {"ok": False, "killed_pid": None, "ckpt_calls": 0,
                 "cols": None, "rows": None, "error": None}
    try:
        df = Q.registry()[qname](spark, sf_dir)
        rows = sorted([str(v) for v in r] for r in df.collect())
        res.update(ok=True, cols=sorted(df.columns), rows=rows)
    except Exception as e:  # the localCheckpoint path is EXPECTED to land here
        res["error"] = f"{type(e).__name__}: {e}"[:2000]
    res["killed_pid"] = state["killed"]
    res["ckpt_calls"] = state["calls"]

    with open(out_path, "w") as f:
        json.dump(res, f)
    try:
        spark.stop()
    except Exception:
        pass  # a dead-executor session may not stop cleanly; result is on disk
    return 0


if __name__ == "__main__":
    sys.exit(main())
