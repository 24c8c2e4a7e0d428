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

    # -- baseline compare / speedup (reference: save_as_baseline +
    #    init_baseline_metrics + calculate_speedup,
    #    `Serial Version/src/benchmark.c:10-118`) ---------------------------

    def snapshot(self) -> dict[str, float]:
        """Latest value per metric name plus the running query-latency avg
        (the reference's SearchEngineMetrics struct flattened)."""
        snap: dict[str, float] = {}
        for r in self.rows:
            snap[r["metric"]] = r["value"]
        if self.query_count:
            snap["avg_query_latency_ms"] = self.query_latency_avg_ms
        return snap

    def save_as_baseline(self, path: str) -> None:
        """Persist the current snapshot as the comparison baseline
        (`save_as_baseline`, benchmark.c:93-118 — CSV there, JSON here)."""
        import json

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump({"saved_at": time.time(), "metrics": self.snapshot()}, f)

    def compare_with_baseline(self, path: str) -> dict:
        """Per-metric {current, baseline, speedup} where speedup =
        baseline/current (>1 means this run is faster), 0.0 when the current
        value is 0 — the exact division rule of `calculate_speedup`
        (benchmark.c:51-91). A missing baseline file warns and yields an
        empty comparison (init_baseline_metrics' missing-file branch,
        benchmark.c:10-21, minus its hardcoded stage defaults, which are
        reference-stage-specific)."""
        import json
        import logging

        if not os.path.exists(path):
            logging.getLogger(__name__).warning(
                "no baseline metrics file at %s", path
            )
            return {"baseline_path": path, "comparison": {}}
        with open(path) as f:
            base = json.load(f).get("metrics", {})
        cur = self.snapshot()
        comparison = {}
        for name, b in base.items():
            if name not in cur:
                continue
            c = cur[name]
            comparison[name] = {
                "current": c,
                "baseline": b,
                "speedup": (b / c) if c > 0 else 0.0,
            }
        return {"baseline_path": path, "comparison": comparison}
