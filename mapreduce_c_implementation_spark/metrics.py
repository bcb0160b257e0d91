"""Metrics façade — the analog of the reference's always-on metrics
subsystem (/root/reference/src/metrics.c, 550 LoC of atomic counters and
a plaintext report).

Spark already owns the deep metrics (per-stage shuffle bytes, spill,
skew) via the UI/listener bus; this façade captures the job-level
numbers the reference's report leads with — wall time, counters, config
echo — in the same "consistent section order for easy diffing" spirit
(reference README.md:417).  Stage timings come from Spark's
StatusTracker rather than hand-rolled clocks.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field


@dataclass
class JobMetrics:
    config: dict = field(default_factory=dict)
    wall_s: float = 0.0
    counters: dict = field(default_factory=dict)
    started_unix: float = field(default_factory=time.time)

    def render_report(self) -> str:
        """Plaintext report with stable section order (diffable, like
        the reference's metrics_write_report, src/metrics.c:426-526)."""
        lines = ["=== JOB CONFIG ==="]
        for k in sorted(self.config):
            lines.append(f"{k}: {self.config[k]}")
        lines.append("=== TIMING ===")
        lines.append(f"wall_s: {self.wall_s}")
        lines.append("=== COUNTERS ===")
        for k in sorted(self.counters):
            lines.append(f"{k}: {self.counters[k]}")
        return "\n".join(lines) + "\n"

    def write_report(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.render_report())

    def to_json(self) -> str:
        return json.dumps(
            {"config": self.config, "wall_s": self.wall_s, "counters": self.counters}
        )
