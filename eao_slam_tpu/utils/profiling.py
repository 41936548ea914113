"""Structured stage timing + device profiling.

The reference's observability is ad-hoc wall-clock prints: std::chrono
around TrackMonocular (Examples/Monocular/mono_tum.cc:81-123),
clock_gettime per semi-dense stage (src/ProbabilityMapping.cc:388-508)
and timing vectors summarized to a results log
(LineDetector::Summary, src/LineDetector.cc:67-165). SURVEY.md §5 calls
for the TPU-native equivalent: a structured stage-timer registry plus
jax.profiler traces.

Usage:
    prof = StageProfiler()
    with prof.stage("track"):            # wall-clock, device-synchronized
        out = step(...)
        prof.sync(out)                   # block_until_ready inside the span
    prof.summary()                       # {stage: {count, total_s, ...}}
    prof.write_log(path)                 # LineDetector::Summary-style log

    with device_trace("/tmp/jax-trace"): # XLA-level profiler trace
        step(...)
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, List

import numpy as np


class StageProfiler:
    """Named wall-clock stage timers with summary statistics.

    Mirrors the reference's per-stage timing vectors (total / average /
    count per stage), replacing scattered prints with one registry.
    """

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.samples: Dict[str, List[float]] = defaultdict(list)
        self._stack: List[tuple] = []

    @contextlib.contextmanager
    def stage(self, name: str):
        if not self.enabled:
            yield self
            return
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            self.samples[name].append(time.perf_counter() - t0)

    @staticmethod
    def sync(tree):
        """Block on device results so the enclosing stage measures device
        time, not dispatch time (the per-stage block_until_ready timer of
        SURVEY.md §5)."""
        import jax

        return jax.block_until_ready(tree)

    def add(self, name: str, seconds: float):
        self.samples[name].append(float(seconds))

    def summary(self) -> dict:
        out = {}
        for name, xs in self.samples.items():
            a = np.asarray(xs)
            out[name] = {
                "count": int(a.size),
                "total_s": float(a.sum()),
                "mean_s": float(a.mean()),
                "median_s": float(np.median(a)),
                "max_s": float(a.max()),
            }
        return out

    def write_log(self, path: str) -> None:
        """Per-stage results log (the analogue of the reference's
        results_line_length.txt written by LineDetector::Summary)."""
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2, sort_keys=True)

    def report(self) -> str:
        rows = ["stage                          count   total(s)    mean(ms)"]
        for name, s in sorted(self.summary().items()):
            rows.append(f"{name:<30} {s['count']:>6} {s['total_s']:>10.3f} "
                        f"{s['mean_s'] * 1e3:>11.3f}")
        return "\n".join(rows)

    def reset(self) -> None:
        self.samples.clear()


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context — captures an XLA-level timeline viewable
    in TensorBoard/Perfetto; no-ops gracefully if the profiler backend is
    unavailable (e.g. under some CPU test environments)."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def annotate(name: str):
    """Named profiler span (shows up in device traces); falls back to a
    null context off-device."""
    import jax

    try:
        return jax.profiler.TraceAnnotation(name)
    except Exception:
        return contextlib.nullcontext()
