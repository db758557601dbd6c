"""Partition-parallel chain fetch stage (S6-S8 in SURVEY §2.1).

The reference fans out per-height RPC calls under semaphore caps
(``global.rs:59-97``: api=16, blocks=api/2, tx=api/2, trace=api/4) with
10 s timeouts and exponential-backoff retries (``ethereum.rs:27-30,
104-202``). In Spark the fan-out is task parallelism: the height domain is
repartitioned to the rate cap, and each task runs a bounded fetch loop.
Rows are built in Arrow batches via ``mapInPandas`` — the fetch is the only
Python-side stage in the engine; everything downstream is Catalyst-native.

With the mock provider the "RPC" is a pure function; the real-chain path
plugs an HTTP/gRPC client into the same ``FetchPolicy`` loop, which is where
the retry/backoff/timeout logic lives (Spark task retries are too coarse —
SURVEY §4).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..core.ranges import Range
from ..schemas import BLOCKS_SCHEMA, TRACES_SCHEMA, TRANSACTIONS_SCHEMA

MAX_THREADS = 512  # global.rs:59
DEFAULT_API_THREADS = 16  # global.rs:60

THREADS_ENV = {
    "api": "EMERALD_DSHACKLE_THREADS_API",
    "tx": "EMERALD_DSHACKLE_THREADS_TX",
    "trace": "EMERALD_DSHACKLE_THREADS_TRACE",
    "blocks": "EMERALD_DSHACKLE_THREADS_BLOCK",
}


@dataclass(frozen=True)
class ThreadsConfig:
    """Per-kind fetch rate caps (reference ``ThreadsConfig``,
    ``global.rs:59-97``)."""

    api: int
    tx: int
    trace: int
    blocks: int


def _env_threads(name: str) -> int | None:
    """``read_env`` parity (global.rs:104-106): unset OR unparseable → None
    (the reference's ``parse().ok()`` swallows bad values silently)."""
    raw = os.environ.get(name)
    if raw is None:
        return None
    try:
        v = int(raw)
    except ValueError:
        return None
    return v if v >= 0 else None  # usize can't be negative


def resolve_threads(parallel: int | None = None) -> ThreadsConfig:
    """Resolve the per-kind fetch caps with the reference's exact
    precedence and clamps (``set_threads``, ``global.rs:62-97``):

    - api: ``--parallel`` flag > ``EMERALD_DSHACKLE_THREADS_API`` env >
      default 16, then clamped to 1..512.
    - tx / trace / blocks: the matching env var (clamped only to the
      global 1..512 when set explicitly) > derived from api with the
      tighter derived clamps — tx = (api/2).clamp(1, 64),
      trace = (api/4).clamp(1, 16), blocks = (api/2).clamp(1, 64).

    A real operator migrating from the reference sets these spellings in
    a container env; honoring them is config-surface parity, not tuning.
    """
    api = parallel if parallel is not None else _env_threads(THREADS_ENV["api"])
    if api is None:
        api = DEFAULT_API_THREADS
    api = max(1, min(api, MAX_THREADS))

    def pick(kind: str, derived: int, derived_cap: int) -> int:
        explicit = _env_threads(THREADS_ENV[kind])
        if explicit is not None:
            return max(1, min(explicit, MAX_THREADS))
        return max(1, min(derived, derived_cap))

    return ThreadsConfig(
        api=api,
        tx=pick("tx", api // 2, 64),
        trace=pick("trace", api // 4, 16),
        blocks=pick("blocks", api // 2, 64),
    )


@dataclass(frozen=True)
class FetchPolicy:
    """Retry/backoff envelope mirroring the reference's RPC policy.

    ``include_call_trace`` / ``include_state_diff`` are the reference's
    ``--fields.trace`` selection (``TraceOptions``, ``datakind.rs:224-256``):
    which geth tracers the trace archive runs per transaction. Both default
    on, matching ``TraceOptions::default()``.

    ``parallel`` mirrors ``--parallel``: ``None`` means "flag absent", so
    the api cap falls through to ``$EMERALD_DSHACKLE_THREADS_API`` then the
    default 16 (``global.rs:66-76``). ``threads`` carries a pre-resolved
    ``ThreadsConfig`` (the CLI path resolves once at startup, like the
    reference's ``set_threads``); when ``None``, per-kind caps resolve
    lazily via ``thread_caps()`` — env overrides included either way."""

    parallel: int | None = None
    threads: ThreadsConfig | None = None
    attempts: int = 10
    backoff_base_s: float = 0.1
    backoff_factor: float = 1.75
    backoff_cap_s: float = 2.0
    timeout_s: float = 10.0
    include_call_trace: bool = True
    include_state_diff: bool = True

    def thread_caps(self) -> ThreadsConfig:
        """The resolved per-kind caps this policy fetches under: an
        explicit ``threads`` wins, else ``resolve_threads(self.parallel)``
        (flag > env > default, reference clamps)."""
        if self.threads is not None:
            return self.threads
        return resolve_threads(self.parallel)

    def call(self, fn: Callable, *args):
        delay = self.backoff_base_s
        last: Exception | None = None
        for _ in range(self.attempts):
            try:
                return fn(*args)
            except Exception as e:  # retryable transport error
                last = e
                time.sleep(min(delay, self.backoff_cap_s))
                delay *= self.backoff_factor
        raise last  # exhausted


def parse_trace_options(spec: str) -> tuple[bool, bool]:
    """``--fields.trace`` value → (include_call_trace, include_state_diff).

    Mirrors ``TraceOptions::from_str`` (``datakind.rs:241-256``): a
    case-insensitive comma list of ``calls`` / ``stateDiff``; at least one
    must be present."""
    tokens = {t.strip() for t in spec.lower().split(",")}
    calls, state_diff = "calls" in tokens, "statediff" in tokens
    if not calls and not state_diff:
        raise ValueError(
            "at least one of 'calls' or 'stateDiff' must be specified "
            "for trace options"
        )
    return calls, state_diff


def _now_utc() -> datetime:
    return datetime.now(timezone.utc).replace(tzinfo=None)


def heights_df(
    spark: SparkSession, rng: "Range | list[Range]", parallel: int
) -> DataFrame:
    """The height domain as a DataFrame, pre-partitioned to the rate cap.

    Accepts one range (dense ``spark.range``, no shuffle) or several disjoint
    ranges (the fix plan's gap list — unioned then round-robined so every
    fetch task carries ~equal load even when gap sizes are skewed)."""
    ranges = [rng] if isinstance(rng, Range) else list(rng)
    total = sum(len(r) for r in ranges)
    n_parts = max(1, min(parallel, total))
    if len(ranges) == 1:
        r = ranges[0]
        return spark.range(r.start, r.end + 1, 1, n_parts).withColumnRenamed("id", "height")
    df = None
    for r in ranges:
        piece = spark.range(r.start, r.end + 1)
        df = piece if df is None else df.union(piece)
    return df.repartition(n_parts).withColumnRenamed("id", "height")


def fetch_blocks(
    spark: SparkSession,
    provider,
    rng: Range,
    policy: FetchPolicy = FetchPolicy(),
    forks: bool = False,
) -> DataFrame:
    """Fetch the blocks table for a height range (reference block.rs:20-94).

    ``forks=True`` additionally emits the provider's fork variant at fork
    heights (stream-mode behavior T5: both versions co-exist keyed by
    (height, blockId) until verify prunes losers).
    """
    cap = policy.thread_caps().blocks  # blocks cap (global.rs:78-97)

    uncle_fn = getattr(provider, "uncles", None)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for h in pdf["height"].tolist():
                variants = [False] + ([True] if forks and h in provider.fork_at else [])
                for fork in variants:
                    blk = policy.call(provider.block, h, fork)
                    # uncle payloads (ethereum.rs:243-248; schema stores the
                    # ETH-consensus maximum of two)
                    uncles = policy.call(uncle_fn, h, fork) if uncle_fn else []
                    rows.append(
                        {
                            "blockchainType": provider.blockchain_type,
                            "blockchainId": provider.blockchain_id,
                            "archiveTimestamp": _now_utc(),
                            "height": h,
                            "blockId": blk["hash"],
                            "parentId": blk["parent"],
                            "timestamp": pd.Timestamp(
                                provider.block_timestamp_ms(h), unit="ms"
                            ),
                            "json": policy.call(provider.block_json, h, fork),
                            "unclesCount": len(uncles),
                            "uncle0Json": uncles[0] if len(uncles) > 0 else None,
                            "uncle1Json": uncles[1] if len(uncles) > 1 else None,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in BLOCKS_SCHEMA.fields])

    hs = heights_df(spark, rng, cap)
    return hs.mapInPandas(gen, schema=BLOCKS_SCHEMA)


def _tx_rows_for_block(
    provider, h: int, blk_hash: str, with_traces: bool, policy: FetchPolicy
) -> list[dict]:
    ts = pd.Timestamp(provider.block_timestamp_ms(h), unit="ms")
    details_fn = getattr(provider, "tx_details", None)
    out = []
    for i, txid in enumerate(provider.tx_ids(h)):
        base = {
            "blockchainType": provider.blockchain_type,
            "blockchainId": provider.blockchain_id,
            "archiveTimestamp": _now_utc(),
            "height": h,
            "blockId": blk_hash,
            "timestamp": ts,
            "index": i,
            "txid": txid,
        }
        if with_traces:
            base.update(
                {
                    "traceJson": (
                        policy.call(provider.trace_json, txid)
                        if policy.include_call_trace
                        else None
                    ),
                    "stateDiffJson": (
                        policy.call(provider.state_diff_json, txid)
                        if policy.include_state_diff
                        else None
                    ),
                }
            )
        elif details_fn is not None:
            # full tx surface incl. from/to parsed out of the tx JSON
            # (ethereum.rs:274-280)
            d = policy.call(details_fn, h, txid)
            base.update(
                {
                    "json": d["json"],
                    "raw": d["raw"],
                    "from": d.get("from"),
                    "to": d.get("to"),
                    "receiptJson": d.get("receiptJson"),
                }
            )
        else:
            base.update(
                {
                    "json": policy.call(provider.tx_json, h, txid),
                    "raw": policy.call(provider.tx_raw, txid),
                    "from": None,
                    "to": None,
                    "receiptJson": policy.call(provider.receipt_json, txid),
                }
            )
        out.append(base)
    return out


def fetch_table_for_heights(
    spark: SparkSession,
    provider,
    rng: Range,
    kind: str,  # "transactions" | "traces"
    policy: FetchPolicy = FetchPolicy(),
) -> DataFrame:
    """Fetch txes/traces for a range (reference table.rs:17-150): per-height
    fan-out at the kind's rate cap, one row per (block, tx-index)."""
    with_traces = kind == "traces"
    caps = policy.thread_caps()
    cap = caps.trace if with_traces else caps.tx
    schema = TRACES_SCHEMA if with_traces else TRANSACTIONS_SCHEMA
    cols = [f.name for f in schema.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for h in pdf["height"].tolist():
                blk = policy.call(provider.block, h)
                rows.extend(
                    _tx_rows_for_block(provider, h, blk["hash"], with_traces, policy)
                )
            yield pd.DataFrame(rows, columns=cols)

    hs = heights_df(spark, rng, cap)
    return hs.mapInPandas(gen, schema=schema)
