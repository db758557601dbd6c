"""Continuous head subscription with reconnect (S9 in SURVEY §2.1).

The reference holds a server-streaming gRPC head subscription and feeds
heights into a channel (``/root/reference/src/blockchain/connection.rs:
113-154`` — its error arm is literally ``//TODO reconnect``). This source
completes that semantics: a dropped stream is re-established with
exponential backoff, already-seen heights are deduped, and heights skipped
during an outage are synthesized (``block_id=None``) so consumers observe a
strictly contiguous height sequence — the fetch stage resolves any height
by number, so a missing hash only means "not pre-announced".

Two transports plug in:
- ``DshackleClient.subscribe_head`` — the gRPC server-streaming shape;
- ``polling_head_source(provider)`` — the JSON-RPC filter/long-poll shape.

``HeadCursor`` runs the stream on a daemon thread and exposes the latest
height as a pull surface for micro-batch engines (``run_stream`` archives
up to the cursor per batch — push subscription, batch archiving).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass
from typing import Callable, Iterator


def polling_head_source(provider, interval_s: float = 0.2):
    """Adapt a poll-style provider into a subscribe-style source: an
    infinite ``(height, block_id)`` generator re-reading the head each
    tick. A transport error ends the generator — ``HeadStream`` treats
    that exactly like a dropped gRPC stream and reconnects."""

    def subscribe() -> Iterator[tuple[int, str]]:
        while True:
            h = provider.head()
            yield h, provider.block_hash(h)
            time.sleep(interval_s)

    return subscribe


@dataclass
class HeadStream:
    """Gap-free, deduped head sequence over a reconnecting subscription.

    ``subscribe`` returns a fresh ``(height, block_id)`` iterator; when it
    ends or raises (connection drop, filter expiry, node restart), the
    stream backs off exponentially and resubscribes. ``max_reconnects``
    bounds total reconnect attempts (None = follow forever)."""

    subscribe: Callable[[], Iterator[tuple[int, str]]]
    backoff_base_s: float = 0.05
    backoff_factor: float = 2.0
    backoff_cap_s: float = 2.0
    max_reconnects: int | None = None

    def follow(self) -> Iterator[tuple[int, str | None]]:
        last: int | None = None
        delay = self.backoff_base_s
        reconnects = 0
        while True:
            try:
                for height, block_id in self.subscribe():
                    delay = self.backoff_base_s  # healthy stream resets backoff
                    if last is not None and height <= last:
                        continue  # dedup re-announced heads
                    if last is not None:
                        # synthesize heights skipped during an outage: the
                        # consumer sees a contiguous sequence (T4 gap repair
                        # at the source)
                        for h in range(last + 1, height):
                            yield h, None
                    yield height, block_id
                    last = height
            except (OSError, EOFError, RuntimeError):
                pass  # dropped mid-read — same path as a clean end
            if self.max_reconnects is not None:
                reconnects += 1
                if reconnects > self.max_reconnects:
                    return
            time.sleep(delay)
            delay = min(delay * self.backoff_factor, self.backoff_cap_s)


class HeadCursor:
    """Latest-height cursor fed by a ``HeadStream`` on a daemon thread.

    The micro-batch engine pulls ``head()`` per batch (archives everything
    up to it); the subscription pushes between batches. ``wait(h)`` blocks
    until the cursor reaches ``h`` — used by tests and catch-up logic."""

    def __init__(self, stream: HeadStream):
        self._cond = threading.Condition()
        self._height: int | None = None
        self._stopped = False
        self._thread = threading.Thread(target=self._run, args=(stream,), daemon=True)
        self._thread.start()

    def _run(self, stream: HeadStream) -> None:
        for height, _ in stream.follow():
            with self._cond:
                if self._stopped:
                    return
                if self._height is None or height > self._height:
                    self._height = height
                    self._cond.notify_all()

    def head(self) -> int | None:
        with self._cond:
            return self._height

    def wait(self, height: int, timeout_s: float = 30.0) -> int | None:
        deadline = time.monotonic() + timeout_s
        with self._cond:
            while self._height is None or self._height < height:
                remaining = deadline - time.monotonic()
                if remaining <= 0 or not self._cond.wait(timeout=remaining):
                    break
            return self._height

    def stop(self) -> None:
        with self._cond:
            self._stopped = True
