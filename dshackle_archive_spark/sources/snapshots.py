"""Manifest-pinned snapshot commits over the native archive layout.

The base layout (``ref_layout.py``) commits each FILE atomically (tmp+rename)
— the reference's model (``objects.rs`` tmp-object rename), where multi-file
consistency is recovered after the fact by ``verify`` (append both fork
branches, prune losers later, ``verify.rs:328-369``). That leaves a window
where a reader scanning the directory mid-correction sees a half-corrected
chain: some heights already re-pointed to the winning fork, others still on
the loser.

This module closes that window with the standard table-format trick
(Iceberg/Delta-style, reduced to its stdlib core): a SNAPSHOT is an immutable
JSON manifest listing exactly the data files that make up one consistent
version of the archive. Writers never mutate published files — they write new
files beside the old ones and publish a new manifest; the only mutable object
is a one-line ``_CURRENT`` pointer swapped by atomic rename. Readers pin a
manifest once and resolve every scan through its file list, so a concurrent
fork correction is invisible until they re-pin.

Scale notes (100 TB archive ≈ 10⁸ files): the manifest is metadata — file
paths only, no data motion; a fork correction rewrites only the files whose
range intersects the reorg (tail blocks, a handful of files) and republishes;
``read_snapshot`` hands Spark the explicit file list, so planning cost is the
listing the manifest already paid for (no directory walk). Manifest size at
10⁸ files motivates the same sharding Iceberg uses (manifest-of-manifests);
the JSON layout keeps that upgrade seam open via the ``files`` key.

Commit protocol (posix; object stores swap rename for copy+if-match):
1. write ``_manifests/v{N}.json.inprogress`` and ``os.replace`` to its final
   name — O_EXCL claim on the version number doubles as the optimistic lock
   (two racing writers cannot both own ``v{N}``);
2. swap ``_manifests/_CURRENT`` (one line: the version number) via
   tmp + ``os.replace``. A crash between 1 and 2 leaves an orphan manifest,
   never a torn pointer — readers keep resolving the previous version.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

MANIFEST_DIR = "_manifests"
CURRENT = "_CURRENT"


class SnapshotConflict(RuntimeError):
    """A concurrent writer published between reading the base snapshot and
    committing: the commit was computed against a stale base and must be
    retried on the new current (standard optimistic-concurrency loss)."""


@dataclass(frozen=True)
class Snapshot:
    """An immutable, pinned archive version: resolve all reads through it."""

    root: str
    version: int
    files: tuple[str, ...]  # relative to root, sorted
    parent: int | None = None
    note: str = ""
    extra: dict = field(default_factory=dict)

    def paths(self) -> list[str]:
        return [os.path.join(self.root, f) for f in self.files]


def _mdir(root: str) -> str:
    return os.path.join(root, MANIFEST_DIR)


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(_mdir(root), f"v{version}.json")


def current_version(root: str) -> int | None:
    try:
        with open(os.path.join(_mdir(root), CURRENT)) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return None


def load_snapshot(root: str, version: int | None = None) -> Snapshot | None:
    """Pin a snapshot: ``version=None`` resolves ``_CURRENT`` once, then the
    returned object never changes — later publishes are invisible to it.
    Sharded manifests (see ``publish_snapshot``) are reassembled here."""
    v = current_version(root) if version is None else version
    if v is None:
        return None
    try:
        with open(_manifest_path(root, v)) as f:
            m = json.load(f)
    except OSError:
        return None
    if m.get("shards"):
        files: list[str] = []
        for shard in m["shards"]:
            with open(os.path.join(_mdir(root), shard)) as f:
                files.extend(json.load(f))
    else:
        files = m["files"]
    return Snapshot(
        root=root,
        version=v,
        files=tuple(files),
        parent=m.get("parent"),
        note=m.get("note", ""),
        extra=m.get("extra", {}),
    )


SHARD_SIZE = 250_000  # file entries per manifest shard


def _pause_before_swap(root: str, version: int) -> None:
    """No-op seam between the version claim and the pointer swap. Tests
    monkeypatch this to freeze one writer mid-commit and prove the slow
    claimant of v{N} cannot regress ``_CURRENT`` after v{N+1} published."""


def publish_snapshot(
    root: str,
    files: list[str],
    parent: int | None = None,
    note: str = "",
    extra: dict | None = None,
    max_retries: int = 50,
    shard_size: int = SHARD_SIZE,
    require_parent_current: bool = False,
) -> Snapshot:
    """Publish a new snapshot listing ``files`` (paths relative to root).

    Claims the next free version number via O_EXCL (optimistic concurrency:
    a racing writer that loses the claim retries against the next number),
    then advances ``_CURRENT`` atomically — and only FORWARD: the pointer
    swap happens under a short flock'd critical section that re-reads
    ``_CURRENT``, so a slow writer that claimed v{N} while a faster one
    already published v{N+1} cannot regress the pointer (its manifest is
    still written, just never becomes current). With
    ``require_parent_current=True`` the same critical section additionally
    validates that ``_CURRENT`` still equals ``parent`` and raises
    ``SnapshotConflict`` (removing the claimed manifest) otherwise — the
    compare-and-swap used by ``merge_replace``. Returns the published
    Snapshot.

    Above ``shard_size`` entries the file list splits across sidecar shard
    JSONs (manifest-of-manifests, Iceberg's manifest-list move): the root
    manifest stays O(shards) small, each shard is independently parseable,
    and a 10⁸-file archive (100 TB at 1000-block files) is ~400 shards of
    a few MB instead of one multi-GB JSON. Shards are written BEFORE the
    version claim completes the commit, so a crash leaves orphan shards,
    never a torn snapshot.
    """
    os.makedirs(_mdir(root), exist_ok=True)
    base = current_version(root)
    if parent is None:
        parent = base
    files = sorted(files)
    v = (base or 0) + 1
    shard_names: list[str] = []
    for _ in range(max_retries):
        target = _manifest_path(root, v)
        try:
            fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            v += 1
            continue
        payload = {"parent": parent, "note": note, "extra": extra or {}}
        if len(files) > shard_size:
            shard_names = []
            for i in range(0, len(files), shard_size):
                name = f"v{v}-shard-{i // shard_size:05d}.json"
                tmp = os.path.join(_mdir(root), name + ".inprogress")
                with open(tmp, "w") as sf:
                    json.dump(files[i : i + shard_size], sf)
                os.replace(tmp, os.path.join(_mdir(root), name))
                shard_names.append(name)
            payload.update(
                {"files": [], "shards": shard_names, "n_files": len(files)}
            )
        else:
            payload["files"] = files
        with os.fdopen(fd, "w") as f:
            json.dump({**payload, "version": v}, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        break
    else:
        raise RuntimeError(f"could not claim a manifest version under {root}")

    _pause_before_swap(root, v)  # test seam: deterministic race interleaving

    # Pointer swap — the commit's linearization point. flock (released by the
    # OS even on crash) serializes just this re-read + rename; the heavy work
    # (shards, manifest body) stayed outside the lock.
    def _swap() -> None:
        cur = current_version(root) or 0
        if require_parent_current and cur != (parent or 0):
            # lost the race: drop the claimed manifest + shards and report
            for name in shard_names:
                try:
                    os.remove(os.path.join(_mdir(root), name))
                except OSError:
                    pass
            try:
                os.remove(target)
            except OSError:
                pass
            raise SnapshotConflict(
                f"base v{parent or 0} is no longer current (now v{cur}) "
                f"under {root}; re-read the snapshot and retry"
            )
        if v <= cur:  # a newer version already published — never regress
            return
        tmp = os.path.join(_mdir(root), CURRENT + ".inprogress")
        with open(tmp, "w") as f:
            f.write(str(v))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(_mdir(root), CURRENT))

    try:
        import fcntl

        with open(os.path.join(_mdir(root), "_CURRENT.lock"), "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            _swap()
    except ImportError:  # non-posix: keep the atomic rename, skip the lock
        _swap()
    return Snapshot(root=root, version=v, files=tuple(sorted(files)), parent=parent,
                    note=note, extra=extra or {})


def read_snapshot(
    spark: SparkSession,
    snap: Snapshot,
    fmt: str = "parquet",
    where: tuple[str, int, int] | None = None,
) -> DataFrame:
    """Scan exactly the pinned snapshot's files — an explicit file list, so
    a concurrent manifest swap (fork correction, compaction) cannot change
    what this reader sees mid-query.

    ``where=(col, lo, hi)`` enables MANIFEST-LEVEL file skipping: files
    whose recorded [min, max] for ``col`` (see ``file_stats`` /
    ``publish_snapshot(extra={"stats": …})``) don't intersect [lo, hi] are
    dropped from the scan before Spark ever opens them. This is the
    Iceberg min/max-pruning play: at 10⁸ files the manifest filter is a
    driver-side list comprehension, and the cluster touches only matching
    files — directory layout no longer has to encode the partitioning.
    Files with no recorded stats are conservatively kept. A residual
    row-level filter is still applied (stats prune files, not rows).
    """
    paths = snap.paths()
    if where is not None:
        col, lo, hi = where
        stats: dict = snap.extra.get("stats", {})
        kept = []
        for f in snap.files:
            s = stats.get(f, {}).get(col)
            if s is None or (s[1] >= lo and s[0] <= hi):
                kept.append(os.path.join(snap.root, f))
        paths = kept
    if not paths:
        raise ValueError(
            f"snapshot v{snap.version} of {snap.root}: no files"
            + (f" match {where}" if where else " listed")
        )
    df = spark.read.format(fmt).load(paths)
    if where is not None:
        col, lo, hi = where
        df = df.filter((df[col] >= lo) & (df[col] <= hi))
    return df


def file_stats(
    spark: SparkSession, root: str, files: list[str], cols: list[str],
    fmt: str = "parquet",
) -> dict:
    """Per-file [min, max] for ``cols`` → the ``stats`` mapping
    ``publish_snapshot(extra={"stats": …})`` expects. ONE distributed job
    over all files (input_file_name groupBy), not a job per file."""
    from pyspark.sql import functions as F

    df = spark.read.format(fmt).load([os.path.join(root, f) for f in files])
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
    rows = (
        df.withColumn("_f", F.input_file_name())
        .groupBy("_f")
        .agg(*aggs)
        .collect()
    )
    prefix = "file:" + os.path.abspath(root).rstrip("/") + "/"
    out: dict = {}
    for r in rows:
        p = r["_f"]
        for pre in (prefix, "file://" + os.path.abspath(root).rstrip("/") + "/"):
            if p.startswith(pre):
                p = p[len(pre):]
                break
        # Spark lists the leaf parquet part-file; map back to the manifest's
        # file entry (which may be the directory containing it)
        rel = p
        for f in files:
            if rel == f or rel.startswith(f.rstrip("/") + "/"):
                rel = f
                break
        ent = out.setdefault(rel, {})
        for c in cols:
            mn, mx = r[f"_mn_{c}"], r[f"_mx_{c}"]
            if c in ent:
                ent[c] = [min(ent[c][0], mn), max(ent[c][1], mx)]
            else:
                ent[c] = [mn, mx]
    return out


def merge_replace(
    root: str,
    remove: list[str],
    add: list[str],
    note: str = "",
    base: Snapshot | None = None,
    add_stats: dict | None = None,
) -> Snapshot:
    """MERGE-style commit: next snapshot = base − ``remove`` + ``add``.

    The fork-correction primitive (reference semantics ``verify.rs:328-369``
    re-expressed transactionally): the corrector writes replacement files for
    the reorged heights FIRST (new names beside the old files), then calls
    this — one atomic pointer swap moves every affected height to the
    winning fork together. Compaction (N singles → one range file) is the
    same call. ``base`` defaults to the current snapshot; either way the
    commit is a compare-and-swap: if another writer published after ``base``
    was read, the pointer swap raises ``SnapshotConflict`` instead of
    silently clobbering (or being clobbered by) the concurrent commit —
    re-read and retry, Iceberg's optimistic-commit loop.

    The base's manifest stats (min/max pruning metadata) carry forward:
    removed files drop out, ``add_stats`` (from ``file_stats``) merges in —
    so every workflow commit keeps the file-skipping index current.
    """
    cur = base if base is not None else load_snapshot(root)
    if cur is None:
        raise ValueError(f"no current snapshot under {root}")
    missing = set(remove) - set(cur.files)
    if missing:
        raise ValueError(f"merge removes files not in snapshot v{cur.version}: "
                         f"{sorted(missing)[:5]}")
    files = sorted((set(cur.files) - set(remove)) | set(add))
    extra = dict(cur.extra)
    stats = {f: s for f, s in extra.get("stats", {}).items() if f not in set(remove)}
    if add_stats:
        stats.update(add_stats)
    if stats:
        extra["stats"] = stats
    return publish_snapshot(root, files, parent=cur.version, note=note,
                            extra=extra, require_parent_current=True)


def merge_replace_with_retry(
    root: str,
    remove: list[str],
    add: list[str],
    note: str = "",
    add_stats: dict | None = None,
    max_attempts: int = 5,
) -> Snapshot:
    """The optimistic-commit loop around ``merge_replace``: on
    ``SnapshotConflict`` (a concurrent writer published first), re-read the
    new current and retry the same logical merge against it. ``remove``
    entries already pruned by the interloper drop out silently (the intent —
    "these files must not be in the next snapshot" — is already satisfied);
    ``add`` files are this writer's own immutable outputs, always valid.
    This is what makes plan-level commits (verify prune, compaction swap,
    curation admit) safe to run concurrently against one archive root."""
    last: SnapshotConflict | None = None
    for _ in range(max_attempts):
        cur = load_snapshot(root)
        if cur is None:
            raise ValueError(f"no current snapshot under {root}")
        try:
            return merge_replace(
                root,
                remove=sorted(set(remove) & set(cur.files)),
                add=add,
                note=note,
                base=cur,
                add_stats=add_stats,
            )
        except SnapshotConflict as exc:
            last = exc
            continue
    raise SnapshotConflict(
        f"commit lost {max_attempts} consecutive races under {root}"
    ) from last


def vacuum(
    root: str,
    keep_last: int = 2,
    dry_run: bool = False,
    keep_if=None,
) -> list[str]:
    """Delete data files referenced by NO retained manifest (the newest
    ``keep_last`` manifests are retained; older manifests are dropped with
    their exclusively-owned files). Readers pinned within the keep window
    stay valid — deeper pins trade off against storage, exactly the
    Iceberg/Delta retention knob.

    ``keep_if(snapshot) -> bool`` additionally retains any older manifest
    the predicate accepts. Callers whose retention unit is NOT "a manifest"
    need this: the streaming monitor state publishes one manifest per
    micro-batch ATTEMPT, so a retried batch N leaves two batch-N manifests
    and count-based keep_last=2 would evict the batch-N−1 state a further
    retry must re-read (silently resetting dedup state). Those callers keep
    every manifest of the last two distinct batch ids instead."""
    import re

    mdir = _mdir(root)
    if not os.path.isdir(mdir):
        return []
    versions = sorted(
        int(m.group(1))
        for n in os.listdir(mdir)
        if (m := re.fullmatch(r"v(\d+)\.json", n))
    )
    keep, drop = versions[-keep_last:], versions[:-keep_last]
    if keep_if is not None:
        rescued = [
            v for v in drop
            if (s := load_snapshot(root, v)) is not None and keep_if(s)
        ]
        if rescued:
            kept = set(keep) | set(rescued)
            keep = sorted(kept)
            drop = [v for v in versions if v not in kept]
    live: set[str] = set()
    for v in keep:
        s = load_snapshot(root, v)
        if s:
            live |= set(s.files)
    doomed: set[str] = set()
    for v in drop:
        s = load_snapshot(root, v)
        if s:
            doomed |= set(s.files) - live
    removed = []
    for rel in sorted(doomed):
        p = os.path.join(root, rel)
        if os.path.isfile(p) or os.path.isdir(p):
            removed.append(rel)
            if not dry_run:
                if os.path.isdir(p):
                    import shutil

                    shutil.rmtree(p, ignore_errors=True)
                else:
                    os.remove(p)
    # Directory sweep (round-10 streaming-soak finding): manifests list
    # parquet FILES, so deleting a dropped manifest's files left its
    # per-attempt data directory behind holding only writer residue
    # (_SUCCESS, .crc) — one orphaned dir per micro-batch, forever, on a
    # streaming state store. Remove a directory that held a doomed file
    # only when (a) no live manifest path lives anywhere UNDER it (not
    # just as an immediate child — vacuum() is a public API over
    # arbitrary roots, so nested layouts must be safe), and (b) every
    # remaining entry is known writer residue (_SUCCESS, *.crc) or a
    # file we just doomed. Any unknown payload — a sidecar, a non-parquet
    # data file, an externally created parquet — leaves the dir alone.
    def _residue(name: str) -> bool:
        return name == "_SUCCESS" or name.endswith(".crc")

    for d in sorted({os.path.dirname(rel) for rel in doomed} - {""}):
        prefix = d + os.sep
        if any(f == d or f.startswith(prefix) for f in live):
            continue
        p = os.path.join(root, d)
        if not os.path.isdir(p):
            continue
        leftovers = [
            n for n in os.listdir(p)
            if not _residue(n) and os.path.join(d, n) not in doomed
        ]
        if leftovers:
            continue
        removed.append(d)
        if not dry_run:
            import shutil

            shutil.rmtree(p, ignore_errors=True)
    if not dry_run:
        for v in drop:
            try:
                with open(_manifest_path(root, v)) as f:
                    shards = json.load(f).get("shards") or []
            except OSError:
                shards = []
            for sh in shards:
                try:
                    os.remove(os.path.join(mdir, sh))
                except OSError:
                    pass
            try:
                os.remove(_manifest_path(root, v))
            except OSError:
                pass
    return removed
