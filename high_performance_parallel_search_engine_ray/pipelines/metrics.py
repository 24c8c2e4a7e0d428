"""Run metrics recording (reference: `SearchEngineMetrics` struct + CSV/JSON
stores, `Serial Version/src/metrics.c:96-141`, `WebSite/api.py:23-70`).

The engine records metrics as rows in a parquet/lance table (one append-only
directory per run) instead of a CSV, plus an incremental query-latency
running average (`record_query_latency`, `Serial Version/src/metrics.c:52-58`).
"""

from __future__ import annotations

import os
import time
import uuid
from dataclasses import dataclass, field

import pyarrow as pa

from ..sources.io import write_table


@dataclass
class MetricsRecorder:
    out_dir: str
    rows: list[dict] = field(default_factory=list)
    query_count: int = 0
    query_latency_avg_ms: float = 0.0

    def record(self, name: str, value: float, unit: str = "ms", **tags) -> None:
        self.rows.append(
            {
                "ts": time.time(),
                "metric": name,
                "value": float(value),
                "unit": unit,
                "tags": str(tags) if tags else "",
            }
        )

    def record_query_latency(self, ms: float) -> None:
        """Incremental running mean (`Serial Version/src/metrics.c:52-58`)."""
        self.query_count += 1
        self.query_latency_avg_ms += (ms - self.query_latency_avg_ms) / self.query_count
        self.record("query_latency", ms)

    def timed(self, name: str):
        rec = self

        class _Timer:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *exc):
                rec.record(name, (time.perf_counter() - self.t0) * 1000.0)

        return _Timer()

    def flush(self) -> str | None:
        if not self.rows:
            return None
        t = pa.Table.from_pylist(self.rows)
        path = os.path.join(self.out_dir, f"metrics-{uuid.uuid4().hex[:8]}")
        uri = write_table(t, path)
        self.rows.clear()
        return uri
