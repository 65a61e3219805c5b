"""Prometheus-format metrics primitives (text exposition only).

The reference has no metrics endpoint at all (SURVEY.md §5: stats structs
exist but are write-only); /metrics with counters shipped in r1, this adds
cumulative histograms for latency/RTF so p50/p99 are derivable with
standard histogram_quantile queries. Dependency-free; aiohttp handlers run
on one event loop so plain float math needs no locking."""

from __future__ import annotations

import math
from typing import List, Sequence

# request latencies: 50 ms … 60 s
LATENCY_BUCKETS = (0.05, 0.1, 0.2, 0.35, 0.5, 0.75, 1.0, 1.5, 2.5, 5.0,
                   10.0, 20.0, 40.0, 60.0)
# RTF: 0.002 (500× realtime) … 1.0
RTF_BUCKETS = (0.002, 0.005, 0.01, 0.02, 0.05, 0.1, 0.2, 0.3, 0.5, 1.0)
# per-request serving stages (queue wait / prefill / first emit / first
# chunk): finer low end than LATENCY_BUCKETS — the interesting regime is
# tens of ms, and attribution needs resolution there
STAGE_BUCKETS = (0.01, 0.025, 0.05, 0.1, 0.15, 0.25, 0.4, 0.6, 1.0, 1.5,
                 2.5, 4.0, 6.0, 10.0, 20.0)


class Histogram:
    """Cumulative-bucket histogram in the Prometheus exposition format."""

    def __init__(self, name: str, buckets: Sequence[float],
                 help_text: str = ""):
        self.name = name
        self.help = help_text
        self.bounds = tuple(sorted(buckets))
        self.counts = [0] * (len(self.bounds) + 1)   # + the +Inf bucket
        self.total = 0.0
        self.n = 0

    def observe(self, value: float) -> None:
        if value != value or value in (math.inf, -math.inf):
            return
        i = 0
        for i, b in enumerate(self.bounds):
            if value <= b:
                self.counts[i] += 1
                break
        else:
            i = len(self.bounds)
            self.counts[i] += 1
        self.total += value
        self.n += 1

    def render(self) -> List[str]:
        lines = []
        if self.help:
            lines.append(f"# HELP {self.name} {self.help}")
        lines.append(f"# TYPE {self.name} histogram")
        cum = 0
        for b, c in zip(self.bounds, self.counts):
            cum += c
            lines.append(f'{self.name}_bucket{{le="{_fmt(b)}"}} {cum}')
        cum += self.counts[-1]
        lines.append(f'{self.name}_bucket{{le="+Inf"}} {cum}')
        lines.append(f"{self.name}_sum {self.total}")
        lines.append(f"{self.name}_count {self.n}")
        return lines


def _fmt(b: float) -> str:
    s = f"{b:g}"
    return s
