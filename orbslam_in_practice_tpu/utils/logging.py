"""Structured per-frame logging + stage timing (SURVEY.md §5: the reference
had only std::cout error prints; the build promises per-frame state, inlier
counts, keyframe/landmark counts, and per-stage wall-clock metrics)."""

from __future__ import annotations

import json
import time
from collections import defaultdict
from contextlib import contextmanager


class StageTimer:
    """Accumulates wall-clock per named stage (extract / match / optimize)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_ms": 1e3 * self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }


class FrameLog:
    """JSONL per-frame records."""

    def __init__(self, path: str | None = None):
        self.path = path
        self.records = []

    def log(self, **kv):
        kv.setdefault("t", time.time())
        self.records.append(kv)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(kv) + "\n")
