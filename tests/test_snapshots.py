"""Manifest-pinned snapshot commits: atomic multi-file fork correction.

The torn-read scenario these tests pin down: a reorg corrector replaces the
tail files of the chain while a reader is mid-query. With directory scans
(append + verify-later, reference `verify.rs:328-369`) the reader can see a
MIXTURE of fork branches; with manifest pinning it sees exactly one
consistent version, before or after — never between.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from dshackle_archive_spark.sources import snapshots as S


def _chain_rows(heights, branch, parent_of_first):
    """Consistent hash-linked block rows: hash = f'{branch}{h}'."""
    rows = []
    prev = parent_of_first
    for h in heights:
        hsh = f"{branch}{h}"
        rows.append((h, hsh, prev))
        prev = hsh
    return rows


def _write(spark, root, rel, rows):
    df = spark.createDataFrame(rows, "height long, hash string, parent_hash string")
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(root, rel))
    return rel


def _linkage_breaks(df) -> int:
    """Count parent-hash mismatches against the previous height (W1)."""
    from pyspark.sql import Window

    w = Window.orderBy("height")
    return (
        df.withColumn("_prev", F.lag("hash").over(w))
        .filter(F.col("_prev").isNotNull() & (F.col("parent_hash") != F.col("_prev")))
        .count()
    )


@pytest.fixture()
def forked_archive(spark, tmp_path):
    """v1 = base(0-4) + fork-loser tail X(5-9); winner tail Y written beside
    it but not yet committed."""
    root = str(tmp_path / "arch")
    base = _write(spark, root, "base_0_4.parquet", _chain_rows(range(5), "a", "genesis"))
    loser = _write(spark, root, "tail_5_9_x.parquet", _chain_rows(range(5, 10), "x", "a4"))
    winner = _write(spark, root, "tail_5_9_y.parquet", _chain_rows(range(5, 10), "y", "a4"))
    snap1 = S.publish_snapshot(root, [base, loser], note="initial archive")
    return root, base, loser, winner, snap1


def test_reader_pinned_across_fork_merge_sees_one_branch(spark, forked_archive):
    root, base, loser, winner, snap1 = forked_archive

    pinned = S.load_snapshot(root)  # reader pins BEFORE the correction
    assert pinned.version == snap1.version

    # fork correction commits mid-"query": one atomic swap
    snap2 = S.merge_replace(root, remove=[loser], add=[winner], note="reorg @5")

    # the pinned reader resolves through its manifest: full loser branch,
    # zero linkage breaks — no mixture of x/y rows
    old_view = S.read_snapshot(spark, pinned)
    assert _linkage_breaks(old_view) == 0
    assert set(old_view.filter("height >= 5").select("hash").toPandas()["hash"]) == {
        f"x{h}" for h in range(5, 10)
    }

    # a reader pinning AFTER the swap sees the full winner branch
    new_view = S.read_snapshot(spark, S.load_snapshot(root))
    assert _linkage_breaks(new_view) == 0
    assert set(new_view.filter("height >= 5").select("hash").toPandas()["hash"]) == {
        f"y{h}" for h in range(5, 10)
    }
    assert S.load_snapshot(root).version == snap2.version

    # sanity: the torn read the manifest prevents WOULD be detectable —
    # a mixture of branches breaks the hash chain
    torn = spark.read.parquet(
        os.path.join(root, base), os.path.join(root, loser), os.path.join(root, winner)
    )
    assert _linkage_breaks(torn) > 0


def test_crash_between_manifest_and_pointer_swap_is_invisible(spark, forked_archive):
    root, base, loser, winner, snap1 = forked_archive

    # simulate a corrector that wrote manifest v2 but died before swapping
    # _CURRENT: readers keep resolving v1
    orphan = {"files": sorted([base, winner]), "parent": snap1.version,
              "note": "crashed mid-commit", "extra": {}, "version": snap1.version + 1}
    with open(os.path.join(root, S.MANIFEST_DIR, f"v{snap1.version + 1}.json"), "w") as f:
        json.dump(orphan, f)
    assert S.load_snapshot(root).version == snap1.version
    view = S.read_snapshot(spark, S.load_snapshot(root))
    assert set(view.filter("height >= 5").select("hash").toPandas()["hash"]) == {
        f"x{h}" for h in range(5, 10)
    }

    # the orphaned version number is skipped by the next successful commit
    # (O_EXCL claim) — no torn pointer, no version collision
    snap3 = S.merge_replace(root, remove=[loser], add=[winner], note="retry")
    assert snap3.version == snap1.version + 2
    assert S.load_snapshot(root).version == snap3.version


def test_vacuum_drops_only_unreferenced_files(spark, forked_archive):
    root, base, loser, winner, snap1 = forked_archive
    S.merge_replace(root, remove=[loser], add=[winner], note="reorg @5")

    # keep_last=2 retains v1+v2: nothing removable
    assert S.vacuum(root, keep_last=2, dry_run=True) == []
    # keep_last=1 retains only v2: the loser tail is exclusively v1's
    assert S.vacuum(root, keep_last=1) == [loser]
    assert not os.path.exists(os.path.join(root, loser))
    # survivors still scan clean
    view = S.read_snapshot(spark, S.load_snapshot(root))
    assert view.count() == 10 and _linkage_breaks(view) == 0


def test_merge_validates_against_base_snapshot(spark, forked_archive):
    root, base, loser, winner, snap1 = forked_archive
    with pytest.raises(ValueError, match="not in snapshot"):
        S.merge_replace(root, remove=["never_published.parquet"], add=[winner])


def test_concurrent_publishers_get_distinct_versions(spark, forked_archive):
    root, base, loser, winner, snap1 = forked_archive
    a = S.publish_snapshot(root, [base, loser], note="writer A")
    b = S.publish_snapshot(root, [base, winner], note="writer B")
    assert a.version != b.version
    assert S.current_version(root) == b.version
    # both manifests independently loadable (time travel)
    assert set(S.load_snapshot(root, a.version).files) == {base, loser}
    assert set(S.load_snapshot(root, b.version).files) == {base, winner}


def test_slow_claimer_cannot_regress_pointer(forked_archive, monkeypatch):
    """The writer-writer race ADVICE r5 flagged: A claims v2, stalls; B claims
    v3 and publishes. When A finally swaps, _CURRENT must stay at 3 — A's
    manifest exists (time travel works) but never becomes current."""
    import threading

    root, base, loser, winner, snap1 = forked_archive
    a_claimed = threading.Event()
    b_published = threading.Event()

    def pause(r, v):
        if threading.current_thread().name == "slowA":
            a_claimed.set()
            assert b_published.wait(30)

    monkeypatch.setattr(S, "_pause_before_swap", pause)
    a_result: list = []
    a = threading.Thread(
        name="slowA",
        target=lambda: a_result.append(
            S.publish_snapshot(root, [base, loser], note="slow A")
        ),
    )
    a.start()
    assert a_claimed.wait(30)
    b = S.publish_snapshot(root, [base, winner], note="fast B")
    b_published.set()
    a.join(30)
    assert not a.is_alive()
    (a_snap,) = a_result
    assert a_snap.version == snap1.version + 1
    assert b.version == snap1.version + 2  # claim walked past A's version
    assert S.current_version(root) == b.version  # no regression to A's
    # A's commit is still a loadable (non-current) version — time travel
    assert set(S.load_snapshot(root, a_snap.version).files) == {base, loser}


def test_merge_replace_conflicts_on_stale_base(forked_archive):
    """merge_replace computed against a base that is no longer current must
    raise SnapshotConflict and leave no claimed-manifest orphan."""
    root, base, loser, winner, snap1 = forked_archive
    other = S.publish_snapshot(root, [base, loser, winner], note="interloper")
    with pytest.raises(S.SnapshotConflict, match="no longer current"):
        S.merge_replace(root, remove=[loser], add=[winner], base=snap1)
    assert S.current_version(root) == other.version
    # the conflicting writer's claimed manifest was cleaned up
    assert S.load_snapshot(root, other.version + 1) is None
    # retry against the fresh current succeeds
    snap3 = S.merge_replace(root, remove=[loser], add=[winner])
    assert S.current_version(root) == snap3.version
    assert set(snap3.files) == {base, winner}


def test_two_writer_stress_no_torn_pointer(forked_archive):
    """8 threads x 6 publishes each, all racing: every claim gets a distinct
    version, _CURRENT always resolves to a complete manifest, and the final
    pointer equals the max published version (forward-only swap)."""
    from concurrent.futures import ThreadPoolExecutor

    root, base, loser, winner, snap1 = forked_archive
    def publish_n(i):
        out = []
        for k in range(6):
            out.append(
                S.publish_snapshot(root, [base, winner], note=f"w{i}.{k}")
            )
        return out

    with ThreadPoolExecutor(max_workers=8) as ex:
        all_snaps = [s for f in ex.map(publish_n, range(8)) for s in f]
    versions = [s.version for s in all_snaps]
    assert len(set(versions)) == len(versions)  # O_EXCL: one owner per vN
    assert S.current_version(root) == max(versions)
    cur = S.load_snapshot(root)
    assert cur is not None and set(cur.files) == {base, winner}


def test_compact_snapshot_mode_is_transactional(spark, tmp_path):
    """compact(snapshot=True): singles leave the archive by ONE manifest
    swap; a reader pinned pre-compact still scans them (files stay on disk
    until vacuum); the new snapshot reads the compacted ranges only."""
    from dshackle_archive_spark.core import DataKind, Range
    from dshackle_archive_spark.plans.archive_plan import archive_single_blocks
    from dshackle_archive_spark.plans.compact_plan import compact
    from dshackle_archive_spark.sources.fetcher import FetchPolicy
    from dshackle_archive_spark.sources.mock_chain import MockChain

    chain = MockChain(head_height=10_000)
    policy = FetchPolicy(parallel=4)
    root = str(tmp_path)
    base = os.path.join(root, "eth")
    archive_single_blocks(
        spark, chain, root, Range(100, 199),
        tables=(DataKind.BLOCKS,), policy=policy,
    )

    res = compact(
        spark, root, "ETH", Range(100, 199),
        tables=(DataKind.BLOCKS,), chunk=100, snapshot=True,
    )
    assert res.compacted_chunks == [(100, 199)]
    assert res.snapshot_version is not None and res.deleted == []

    cur = S.load_snapshot(base)
    assert cur.version == res.snapshot_version
    # new snapshot: exactly the range file(s), no singles
    assert all("range-" in f for f in cur.files), cur.files
    new_view = S.read_snapshot(spark, cur)
    assert new_view.select("height").distinct().count() == 100

    # the pre-compact snapshot (v1, adopted) still reads the singles —
    # they were NOT physically deleted
    pre = S.load_snapshot(base, cur.parent)
    assert all("range-" not in f for f in pre.files)
    old_view = S.read_snapshot(spark, pre)
    assert old_view.select("height").distinct().count() == 100

    # vacuum with keep_last=1 drops the singles from disk, then sweeps
    # their now-parquet-free directory (round-10 orphan-dir fix)
    removed = S.vacuum(base, keep_last=1)
    assert len([r for r in removed if r.endswith(".parquet")]) == 100
    assert all(r.endswith(".parquet") or "/" in r for r in removed)
    assert S.read_snapshot(spark, S.load_snapshot(base)).count() == new_view.count()


def test_verify_snapshot_mode_fork_merge(spark, tmp_path):
    """verify(snapshot=True) on a forked archive: the loser's file leaves
    the archive by one manifest swap; a reader pinned before verification
    still sees both fork versions (its snapshot's files are untouched on
    disk), the new snapshot reads a clean single chain."""
    from dshackle_archive_spark.core import DataKind, Range
    from dshackle_archive_spark.plans.archive_plan import archive_single_blocks
    from dshackle_archive_spark.plans.verify_plan import verify
    from dshackle_archive_spark.sources.fetcher import FetchPolicy
    from dshackle_archive_spark.sources.mock_chain import MockChain

    fork_chain = MockChain(head_height=10_000, fork_at=frozenset({105}))
    live_chain = MockChain(head_height=10_000)
    policy = FetchPolicy(parallel=4)
    root = str(tmp_path)
    base = os.path.join(root, "eth")
    # fork-tolerant single-block files: height 105 lands twice (both hashes)
    archive_single_blocks(
        spark, fork_chain, root, Range(100, 109),
        tables=(DataKind.BLOCKS,), policy=policy, forks=True,
    )
    import glob

    all_files = sorted(
        os.path.relpath(p, base)
        for p in glob.glob(os.path.join(base, "**", "*.parquet"), recursive=True)
    )
    assert len(all_files) == 11  # 10 heights + 1 fork twin at 105
    pre = S.publish_snapshot(base, all_files, note="pre-verify with fork twin")

    rep = verify(
        spark, live_chain, root, Range(100, 109),
        tables=(DataKind.BLOCKS,), snapshot=True,
    )
    assert rep.snapshot_version == pre.version + 1
    # snapshot mode: nothing physically deleted; the loser is pruned from
    # the manifest and reported as such
    assert rep.deleted == []
    assert len(rep.pruned_from_snapshot) == 1  # exactly the fork loser
    loser_rel = rep.pruned_from_snapshot[0]
    # loser file still on disk (older pin valid), but out of the archive
    assert os.path.exists(os.path.join(base, loser_rel))
    cur = S.load_snapshot(base)
    assert loser_rel not in cur.files
    assert len(cur.files) == len(pre.files) - 1
    # the winning 105 file is still in the new snapshot
    assert sum(1 for f in cur.files if "000000105" in f) == 1


def test_verify_prune_retries_past_concurrent_publish(spark, tmp_path, monkeypatch):
    """Plan-level optimistic-commit lifecycle: verify(snapshot=True) is
    frozen between its version claim and its pointer swap while an
    interloper (a concurrent fix/archive commit) publishes a new file.
    verify must lose the CAS cleanly, retry against the new current, and
    the final snapshot must show BOTH effects: the fork loser pruned AND
    the interloper's file present."""
    import threading

    from dshackle_archive_spark.core import DataKind, Range
    from dshackle_archive_spark.plans.archive_plan import archive_single_blocks
    from dshackle_archive_spark.plans.verify_plan import verify
    from dshackle_archive_spark.sources.fetcher import FetchPolicy
    from dshackle_archive_spark.sources.mock_chain import MockChain

    fork_chain = MockChain(head_height=10_000, fork_at=frozenset({105}))
    live_chain = MockChain(head_height=10_000)
    root = str(tmp_path)
    base = os.path.join(root, "eth")
    archive_single_blocks(
        spark, fork_chain, root, Range(100, 109),
        tables=(DataKind.BLOCKS,), policy=FetchPolicy(parallel=4), forks=True,
    )
    import glob

    all_files = sorted(
        os.path.relpath(p, base)
        for p in glob.glob(os.path.join(base, "**", "*.parquet"), recursive=True)
    )
    S.publish_snapshot(base, all_files, note="pre-verify with fork twin")

    # interloper writes a real new data file beside the archive
    extra_rel = "000000000/extra_000000110.blocks.parquet"
    os.makedirs(os.path.join(base, "000000000"), exist_ok=True)
    spark.createDataFrame(
        [(110, "y110", "y109")], "height long, hash string, parent_hash string"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(base, extra_rel))

    fired = {"done": False}
    orig_pause = S._pause_before_swap

    def pause(r, v):
        # first claim from the verify thread: publish the interloper commit
        # BEFORE verify's swap runs, forcing the CAS to conflict once
        if not fired["done"] and threading.current_thread().name == "verifyT":
            fired["done"] = True
            monkeypatch.setattr(S, "_pause_before_swap", orig_pause)
            S.merge_replace_with_retry(
                base, remove=[], add=[extra_rel], note="interloper fix"
            )

    monkeypatch.setattr(S, "_pause_before_swap", pause)
    box: list = []
    t = threading.Thread(
        name="verifyT",
        target=lambda: box.append(
            verify(spark, live_chain, root, Range(100, 109),
                   tables=(DataKind.BLOCKS,), snapshot=True)
        ),
    )
    t.start()
    t.join(120)
    assert not t.is_alive()
    (rep,) = box
    assert fired["done"], "race injection never fired"
    assert len(rep.pruned_from_snapshot) == 1  # the fork loser
    cur = S.load_snapshot(base)
    assert cur.version == rep.snapshot_version
    assert rep.pruned_from_snapshot[0] not in cur.files  # prune applied
    assert extra_rel in cur.files  # interloper's commit preserved


def test_cli_vacuum_command(spark, tmp_path, capsys):
    """CLI lifecycle: compact --snapshot then vacuum --keep-last 1 removes
    the consumed singles and reports the surviving version."""
    import json as J

    from dshackle_archive_spark import cli
    from dshackle_archive_spark.core import DataKind, Range
    from dshackle_archive_spark.plans.archive_plan import archive_single_blocks
    from dshackle_archive_spark.plans.compact_plan import compact
    from dshackle_archive_spark.sources.fetcher import FetchPolicy
    from dshackle_archive_spark.sources.mock_chain import MockChain

    chain = MockChain(head_height=10_000)
    root = str(tmp_path)
    archive_single_blocks(
        spark, chain, root, Range(100, 199),
        tables=(DataKind.BLOCKS,), policy=FetchPolicy(parallel=4),
    )
    res = compact(spark, root, "ETH", Range(100, 199),
                  tables=(DataKind.BLOCKS,), chunk=100, snapshot=True)
    assert res.snapshot_version is not None

    rc = cli.main(["vacuum", "--dir", root, "--chain", "ETH", "--keep-last", "1"])
    assert rc == 0
    out = J.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["command"] == "vacuum"
    assert len([r for r in out["removed"] if r.endswith(".parquet")]) == 100
    assert out["current"] == res.snapshot_version


def test_fix_snapshot_mode_add_only_merge(spark, tmp_path):
    """fix(snapshot=True): repaired files join the archive in one add-only
    manifest commit; the pre-fix snapshot still describes the gappy view."""
    from dshackle_archive_spark.core import DataKind, Range
    from dshackle_archive_spark.plans.archive_plan import archive
    from dshackle_archive_spark.plans.fix_plan import fix
    from dshackle_archive_spark.sources.archive import delete_files
    from dshackle_archive_spark.sources.fetcher import FetchPolicy
    from dshackle_archive_spark.sources.mock_chain import MockChain

    chain = MockChain(head_height=10_000)
    policy = FetchPolicy(parallel=4)
    root = str(tmp_path)
    base = os.path.join(root, "eth")
    archive(spark, chain, root, Range(100, 299),
            tables=(DataKind.BLOCKS, DataKind.TRANSACTIONS), chunk=100,
            policy=policy)
    # knock out one txes file -> a gap
    victim = "000000000/range-000000200_000000299.txes.parquet"
    delete_files(base, [victim])

    res = fix(spark, chain, root, Range(100, 299),
              tables=(DataKind.BLOCKS, DataKind.TRANSACTIONS), chunk=100,
              policy=policy, snapshot=True)
    assert res.missing == [("transactions", 200, 299)]
    assert res.snapshot_version is not None

    cur = S.load_snapshot(base)
    assert cur.version == res.snapshot_version
    assert victim in cur.files  # repaired file is in the new snapshot
    pre = S.load_snapshot(base, cur.parent)
    assert victim not in pre.files  # adopted pre-fix view has the gap
    assert set(cur.files) - set(pre.files) == {victim}


def test_manifest_stat_pruning_skips_files(spark, tmp_path):
    """Iceberg-style min/max skipping: a height-bounded read through the
    manifest opens ONLY the files whose recorded range intersects — checked
    via inputFiles(), not just row results."""
    root = str(tmp_path / "stats_arch")
    files = []
    for i in range(8):
        rel = f"part_{i}.parquet"
        spark.range(i * 100, (i + 1) * 100).selectExpr(
            "id AS height", "concat('h', id) AS hash", "'' AS parent_hash"
        ).coalesce(1).write.parquet(os.path.join(root, rel))
        files.append(rel)
    stats = S.file_stats(spark, root, files, ["height"])
    assert stats[files[3]]["height"] == [300, 399]
    snap = S.publish_snapshot(root, files, extra={"stats": stats})

    pinned = S.load_snapshot(root)
    pruned = S.read_snapshot(spark, pinned, where=("height", 250, 449))
    opened = {p for p in pruned.inputFiles()}
    # exactly 3 of 8 files intersect [250, 449]
    assert len(opened) == 3, opened
    assert all(any(f"part_{i}.parquet" in p for p in opened) for i in (2, 3, 4))
    # residual row filter still applies inside the boundary files
    assert pruned.count() == 200
    assert pruned.agg({"height": "min"}).first()[0] == 250

    # files without stats are conservatively scanned
    nostats = S.publish_snapshot(root, files, extra={})
    full = S.read_snapshot(spark, S.load_snapshot(root, nostats.version),
                           where=("height", 250, 449))
    assert len(set(full.inputFiles())) == 8
    assert full.count() == 200


def test_compact_snapshot_carries_pruning_stats(spark, tmp_path):
    """compact --snapshot keeps the manifest's min/max index current: a
    bounded read through the post-compact snapshot opens only the range
    file that covers the window."""
    from dshackle_archive_spark.core import DataKind, Range
    from dshackle_archive_spark.plans.archive_plan import archive_single_blocks
    from dshackle_archive_spark.plans.compact_plan import compact
    from dshackle_archive_spark.sources.fetcher import FetchPolicy
    from dshackle_archive_spark.sources.mock_chain import MockChain

    chain = MockChain(head_height=10_000)
    root = str(tmp_path)
    base = os.path.join(root, "eth")
    archive_single_blocks(
        spark, chain, root, Range(100, 299),
        tables=(DataKind.BLOCKS,), policy=FetchPolicy(parallel=4),
    )
    res = compact(spark, root, "ETH", Range(100, 299),
                  tables=(DataKind.BLOCKS,), chunk=100, snapshot=True)
    assert len(res.compacted_chunks) == 2
    cur = S.load_snapshot(base)
    stats = cur.extra.get("stats", {})
    assert len(stats) == 2 and all("height" in v for v in stats.values())
    view = S.read_snapshot(spark, cur, where=("height", 120, 140))
    assert len(set(view.inputFiles())) == 1  # only the 100-199 range file
    assert view.count() == 21


def test_sharded_manifest_million_files(tmp_path):
    """Manifest-of-manifests at 10⁶ entries: publish splits into shards,
    load reassembles exactly, merge works on the sharded base, vacuum
    removes dropped versions' shards. Publish+load wall times printed to
    keep the 10⁸-file extrapolation honest."""
    import time

    root = str(tmp_path / "big")
    os.makedirs(root)
    files = [f"eth/{i // 1000:09d}/range-{i:09d}_{i + 999:09d}.blocks.parquet"
             for i in range(0, 1_000_000_000, 1000)][:1_000_000]

    t0 = time.perf_counter()
    snap = S.publish_snapshot(root, files, note="million")
    t_pub = time.perf_counter() - t0
    mdir = os.path.join(root, S.MANIFEST_DIR)
    shards = [n for n in os.listdir(mdir) if "-shard-" in n]
    assert len(shards) == 4  # 1M / 250k

    t0 = time.perf_counter()
    loaded = S.load_snapshot(root)
    t_load = time.perf_counter() - t0
    assert len(loaded.files) == 1_000_000
    assert list(loaded.files) == sorted(files)
    print(f"[sharded] publish {t_pub:.2f}s load {t_load:.2f}s "
          f"shards={len(shards)}")
    assert t_pub < 30 and t_load < 30

    # merge on the sharded base: drop 1000, add 1
    snap2 = S.merge_replace(root, remove=files[:1000], add=["eth/merged.parquet"],
                            base=loaded)
    re2 = S.load_snapshot(root)
    assert len(re2.files) == 1_000_000 - 999
    assert "eth/merged.parquet" in re2.files

    # vacuum drops v1 and its shards (no data files exist on disk — only
    # manifest hygiene is under test here)
    S.vacuum(root, keep_last=1)
    remaining = os.listdir(mdir)
    assert not any(n.startswith(f"v{snap.version}-shard") for n in remaining)
    assert len(S.load_snapshot(root).files) == 1_000_000 - 999


def test_vacuum_dir_sweep_spares_nested_live_and_sidecars(tmp_path):
    """Round-10 advice hardening of the orphan-dir sweep: vacuum() is a
    public API over arbitrary roots, so the sweep must (a) skip a dir when
    a LIVE manifest path lives anywhere UNDER it — not just as an immediate
    child — and (b) only delete a dir whose leftovers are known writer
    residue (_SUCCESS, *.crc); an unknown sidecar/payload file keeps the
    dir (and itself) alive. Only the pure-residue dir is swept."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "arch")

    def mk(rel):
        p = os.path.join(root, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        pq.write_table(pa.table({"x": [1]}), p)
        return rel

    doomed_nested = mk("a/old.parquet")      # live data NESTED below a/
    live_nested = mk("a/sub/live.parquet")
    doomed_sidecar = mk("b/old.parquet")     # unknown payload beside it
    with open(os.path.join(root, "b", "notes.txt"), "w") as f:
        f.write("sidecar payload vacuum must never delete")
    doomed_clean = mk("c/old.parquet")       # only writer residue remains
    open(os.path.join(root, "c", "_SUCCESS"), "w").close()
    with open(os.path.join(root, "c", ".old.parquet.crc"), "w") as f:
        f.write("crc")

    S.publish_snapshot(root, [doomed_nested, doomed_sidecar, doomed_clean], note="v1")
    S.publish_snapshot(root, [live_nested], note="v2")

    removed = S.vacuum(root, keep_last=1)
    assert set(removed) == {doomed_nested, doomed_sidecar, doomed_clean, "c"}
    assert os.path.isfile(os.path.join(root, live_nested))  # nested live kept
    assert os.path.isdir(os.path.join(root, "a"))           # its ancestor kept
    assert os.path.isfile(os.path.join(root, "b", "notes.txt"))  # sidecar kept
    assert not os.path.exists(os.path.join(root, "c"))      # pure residue swept
