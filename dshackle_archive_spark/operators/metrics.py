"""Metrics/progress taps + Prometheus serving surface (S17/A9).

The reference keeps counters of items/bytes by (kind, direction) plus timing
histograms (``src/metrics/mod.rs:92-121``) and a sliding-window throughput
log (``src/progress.rs:86-181``), served as Prometheus text at ``/metrics``
when ``--metrics HOST:PORT`` is given (``metrics/mod.rs:73-76``).
Spark-native mapping:

- per-action counters ride on the plan itself via ``DataFrame.observe`` —
  zero extra passes, collected by the JVM during the action;
- streaming throughput comes from ``StreamingQueryListener`` progress events
  (rows/sec per micro-batch), the engine-level equivalent of the 5-minute
  sliding window;
- ``MetricsRegistry`` + ``start_metrics_server`` reproduce the reference's
  metric families byte-compatibly (``metrics/archive.rs``,
  ``metrics/blockchain.rs``): counters ``dshackleArchive_archive_
  items_total``/``bytes_total`` labeled (type, direction), histograms
  ``archive_blockTime_seconds`` and ``blockchain_requestTime_seconds``.
  Counts are fed driver-side from observed plans and write results — on a
  cluster the registry aggregates what the driver sees of each action,
  which is exactly the totals the reference's single process counts.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_table(df: DataFrame, name: str, payload_cols: list[str] | None = None):
    """Attach item/byte counters to a plan (reference ``add_items``/``add_bytes``).

    Returns ``(df, observation)``; read ``observation.get`` after an action.
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_items")]
    for c in payload_cols or []:
        metrics.append(F.sum(F.coalesce(F.length(F.col(c)), F.lit(0))).alias(f"bytes_{c}"))
    return df.observe(obs, *metrics), obs


@dataclass
class ThroughputLog:
    """Micro-batch throughput samples (streaming A9 equivalent)."""

    samples: list[dict] = field(default_factory=list)

    def record(self, batch_id: int, n_rows: int, seconds: float) -> None:
        self.samples.append(
            {
                "batch_id": batch_id,
                "n_rows": n_rows,
                "seconds": seconds,
                "rows_per_sec": (n_rows / seconds) if seconds > 0 else 0.0,
            }
        )

    def sliding(self, window: int = 5) -> dict:
        """Aggregate over the last ``window`` samples (reference keeps 5)."""
        recent = self.samples[-window:]
        rows = sum(s["n_rows"] for s in recent)
        secs = sum(s["seconds"] for s in recent)
        return {
            "n_samples": len(recent),
            "rows": rows,
            "seconds": secs,
            "rows_per_sec": (rows / secs) if secs > 0 else 0.0,
        }


def format_throughput(bytes_per_sec: float) -> str:
    """Human bytes/sec exactly as the reference renders it
    (``progress.rs:183-191``): <1 KiB plain, then one-decimal kb/mb."""
    if bytes_per_sec < 1024.0:
        return f"{bytes_per_sec:.0f} bytes/sec"
    if bytes_per_sec < 1024.0 * 1024.0:
        return f"{bytes_per_sec / 1024.0:.1f} kb/sec"
    return f"{bytes_per_sec / (1024.0 * 1024.0):.1f} mb/sec"


class ProgressClock:
    """Pause-aware sliding-window progress reporter (``progress.rs:27-181``).

    Counts records/bytes and measures ACTIVE time only: streaming mode
    pauses the clock while idle-waiting for new blocks (``pause()`` /
    ``resume()``), so idle wait never dilutes the reported speed — the
    reference's exact semantics, including the snapshot ring: ``report()``
    speeds are deltas against the OLDEST of the last ``WINDOW_SIZE``
    snapshots, a sliding average over that many reporting ticks."""

    WINDOW_SIZE = 5  # progress.rs:13

    def __init__(self, now=None):
        import time as _time

        self._now = now or _time.monotonic
        self.records = 0
        self.bytes = 0
        self._total_active = 0.0
        self._active_since: float | None = self._now()
        # seeded with a zero snapshot so the first report has a baseline
        self._snapshots: list[tuple[int, int, float]] = [(0, 0, 0.0)]

    def on_record(self, n: int = 1) -> None:
        self.records += n

    def on_bytes(self, n: int) -> None:
        self.bytes += n

    def active_seconds(self) -> float:
        """Cumulative active time including the current unpaused period."""
        active = self._total_active
        if self._active_since is not None:
            active += self._now() - self._active_since
        return active

    def pause(self) -> None:
        if self._active_since is not None:
            self._total_active += self._now() - self._active_since
            self._active_since = None

    def resume(self) -> None:
        if self._active_since is None:
            self._active_since = self._now()

    def report(self) -> dict | None:
        """One reporting tick: snapshot + sliding-window speeds.

        Returns None before any record arrives (the reference skips the
        log line); ``recs_per_min``/``bytes_per_sec`` are None when the
        window's active time is under 1 ms (progress.rs:168-170)."""
        if self.records == 0:
            return None
        current = (self.records, self.bytes, self.active_seconds())
        oldest = self._snapshots[0]
        self._snapshots.append(current)
        if len(self._snapshots) > self.WINDOW_SIZE:
            self._snapshots.pop(0)
        d_blocks = current[0] - oldest[0]
        d_bytes = current[1] - oldest[1]
        d_active = max(0.0, current[2] - oldest[2])
        if d_active < 0.001:
            return {"records": self.records, "recs_per_min": None,
                    "bytes_per_sec": None, "throughput": None}
        bps = d_bytes / d_active
        return {
            "records": self.records,
            "recs_per_min": d_blocks / d_active * 60.0,
            "bytes_per_sec": bps,
            "throughput": format_throughput(bps),
        }


# -- Prometheus registry + server (metrics/mod.rs, archive.rs, blockchain.rs) --

# the reference's histogram buckets, "tuned for the expected 500ms-2s range"
BLOCK_TIME_BUCKETS = (
    0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0,
    1.25, 1.5, 1.75, 2.0, 2.5,
    3.0, 4.0, 5.0, 7.5, 10.0, 12.5, 15.0,
    20.0, 25.0, 30.0,
)
# prometheus crate default buckets (blockchain.rs uses HistogramOpts defaults)
REQUEST_TIME_BUCKETS = (
    0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0,
)


class _Hist:
    def __init__(self, buckets: tuple[float, ...]):
        self.buckets = buckets
        self.counts = [0] * len(buckets)
        self.total = 0
        self.sum = 0.0

    def observe(self, v: float) -> None:
        for i, b in enumerate(self.buckets):
            if v <= b:
                self.counts[i] += 1
        self.total += 1
        self.sum += v


class MetricsRegistry:
    """Reference-compatible metric families, rendered as Prometheus text.

    Thread-safe; label sets appear on first use (prometheus CounterVec
    semantics)."""

    def __init__(self, app_name: str = "dshackleArchive"):
        self.app = app_name
        self._lock = threading.Lock()
        self._items: dict[tuple[str, str], float] = {}
        self._bytes: dict[tuple[str, str], float] = {}
        self._block_time = _Hist(BLOCK_TIME_BUCKETS)
        self._request_time: dict[tuple[str, str], _Hist] = {}

    # the reference's four recording entry points (metrics/mod.rs:92-121)
    def add_items(self, kind: str, direction: str, n: int) -> None:
        with self._lock:
            k = (kind, direction)
            self._items[k] = self._items.get(k, 0.0) + n

    def add_bytes(self, kind: str, direction: str, n: int) -> None:
        with self._lock:
            k = (kind, direction)
            self._bytes[k] = self._bytes.get(k, 0.0) + n

    def observe_block_archive(self, seconds: float) -> None:
        with self._lock:
            self._block_time.observe(seconds)

    def observe_request(self, method: str, blockchain: str, seconds: float) -> None:
        with self._lock:
            k = (method, blockchain)
            if k not in self._request_time:
                self._request_time[k] = _Hist(REQUEST_TIME_BUCKETS)
            self._request_time[k].observe(seconds)

    def merge_request_counts(
        self, method: str, blockchain: str, bucket_counts, n: int, total: float
    ) -> None:
        """Fold pre-bucketed observations (from the executor-side
        accumulator bridge) into the request histogram."""
        with self._lock:
            k = (method, blockchain)
            if k not in self._request_time:
                self._request_time[k] = _Hist(REQUEST_TIME_BUCKETS)
            h = self._request_time[k]
            for i, c in enumerate(bucket_counts):
                h.counts[i] += c
            h.total += n
            h.sum += total

    # -- renderer (Prometheus text exposition format 0.0.4) ------------------
    @staticmethod
    def _fmt(v: float) -> str:
        return str(int(v)) if v == int(v) else repr(v)

    def _render_hist(self, out: list, name: str, help_: str, series) -> None:
        out.append(f"# HELP {name} {help_}")
        out.append(f"# TYPE {name} histogram")
        for labels, h in series:
            base = ("{" + labels + ",") if labels else "{"
            for b, c in zip(h.buckets, h.counts):
                out.append(f'{name}_bucket{base}le="{self._fmt(b)}"}} {c}')
            out.append(f'{name}_bucket{base}le="+Inf"}} {h.total}')
            tail = ("{" + labels + "}") if labels else ""
            out.append(f"{name}_sum{tail} {repr(h.sum)}")
            out.append(f"{name}_count{tail} {h.total}")

    def render(self) -> str:
        with self._lock:
            out: list[str] = []
            for metric, data, help_ in (
                ("archive_items_total", self._items, "Total number of items processed"),
                ("archive_bytes_total", self._bytes, "Total number of bytes transferred"),
            ):
                name = f"{self.app}_{metric}"
                out.append(f"# HELP {name} {help_}")
                out.append(f"# TYPE {name} counter")
                for (kind, direction), v in sorted(data.items()):
                    out.append(
                        f'{name}{{type="{kind}",direction="{direction}"}} {self._fmt(v)}'
                    )
            self._render_hist(
                out,
                f"{self.app}_archive_blockTime_seconds",
                "Time to archive a single block with all its tables (block, txes, traces)",
                [("", self._block_time)] if self._block_time.total else [],
            )
            self._render_hist(
                out,
                f"{self.app}_blockchain_requestTime_seconds",
                "Duration of blockchain RPC requests in seconds",
                [
                    (f'method="{m}",blockchain="{b}"', h)
                    for (m, b), h in sorted(self._request_time.items())
                ],
            )
            return "\n".join(out) + "\n"

    def record_write_results(self, rows, elapsed_s: float | None = None) -> None:
        """Feed archive write-result rows (one per written file): items from
        row counts, bytes from file sizes, blockTime from per-height mean."""
        import os

        heights = 0
        for r in rows:
            if r["skipped"]:
                continue
            self.add_items(r["type"], "write", r["n_rows"])
            try:
                self.add_bytes(r["type"], "write", os.path.getsize(r["location"]))
            except OSError:
                pass
            if r["type"] == "blocks":
                heights += r["heightEnd"] - r["heightStart"] + 1
        if elapsed_s is not None and heights:
            per_block = elapsed_s / heights
            for _ in range(heights):
                self.observe_block_archive(per_block)


def start_metrics_server(
    registry: MetricsRegistry, host: str, port: int
) -> ThreadingHTTPServer:
    """Serve ``registry.render()`` at ``/metrics`` (metrics/server.rs shape).

    Daemon-threaded; lives until the process (or returned server) stops —
    for batch commands that means until the CLI exits, for ``stream`` it
    serves for the lifetime of the run, which is the reference's model."""

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path != "/metrics":
                self.send_response(404)
                self.end_headers()
                return
            body = registry.render().encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; version=0.0.4")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            # --metrics.await support: signal anyone waiting for a scrape
            self.server.scrape_count += 1
            self.server.scrape_event.set()

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer((host, port), Handler)
    srv.scrape_count = 0
    srv.scrape_event = threading.Event()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


def await_final_scrape(srv: ThreadingHTTPServer, timeout_s: float = 60.0) -> bool:
    """``--metrics.await``: block until ONE MORE ``/metrics`` scrape lands
    after the command finished, so a pull-based Prometheus never misses the
    final counters of a short batch run (``metrics/server.rs:34-50`` —
    notified-on-scrape with a timeout fallback). Returns True if a scrape
    arrived, False on timeout."""
    srv.scrape_event.clear()
    return srv.scrape_event.wait(timeout_s)


# -- executor→driver metrics bridge ------------------------------------------

class _RequestTimeParam:
    """AccumulatorParam merging {(method, chain): (bucket_counts, n, sum)}."""

    def zero(self, value):
        return {}

    def addInPlace(self, a, b):
        for k, (counts, n, s) in b.items():
            if k in a:
                c0, n0, s0 = a[k]
                a[k] = ([x + y for x, y in zip(c0, counts)], n0 + n, s0 + s)
            else:
                a[k] = (list(counts), n, s)
        return a


class SparkRequestRecorder:
    """Distributed ``observe_request``: the reference observes every RPC in
    its single process (``connection.rs:66``); under Spark those calls run
    inside executor tasks. This recorder ships a Spark accumulator into the
    workers — each call adds a pre-bucketed observation, task completion
    merges them driver-side, and ``drain_into`` folds the totals into the
    Prometheus registry. Works identically on a 1000-executor cluster."""

    worker_safe = True  # clients keep (not shed) this on pickle into tasks

    def __init__(self, sc):
        from pyspark.accumulators import AccumulatorParam

        class Param(_RequestTimeParam, AccumulatorParam):
            pass

        self.acc = sc.accumulator({}, Param())

    def observe_request(self, method: str, blockchain: str, seconds: float) -> None:
        counts = [1 if seconds <= b else 0 for b in REQUEST_TIME_BUCKETS]
        self.acc.add({(method, blockchain): (counts, 1, seconds)})

    def drain_into(self, registry: MetricsRegistry) -> None:
        """Fold accumulated per-task observations into the registry
        (driver-side, after actions have run)."""
        for (method, chain), (counts, n, s) in self.acc.value.items():
            registry.merge_request_counts(method, chain, counts, n, s)
