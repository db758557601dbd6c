"""Metrics/progress taps (S17/A9 in SURVEY §2.1/§2.4).

The reference keeps counters of items/bytes by (kind, direction) plus timing
histograms (``src/metrics/mod.rs:92-121``) and a sliding-window throughput
log (``src/progress.rs:86-181``). Spark-native mapping:

- per-action counters ride on the plan itself via ``DataFrame.observe`` —
  zero extra passes, collected by the JVM during the action;
- streaming throughput comes from ``StreamingQueryListener`` progress events
  (rows/sec per micro-batch), the engine-level equivalent of the 5-minute
  sliding window.
"""

from __future__ import annotations

from dataclasses import dataclass, field

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
