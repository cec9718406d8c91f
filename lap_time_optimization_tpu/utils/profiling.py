"""Timing + observability (SURVEY.md §5 tracing/metrics plan).

The reference's only instrumentation is `time.time()` deltas printed as
"Run time" (src/trajectory.py:67-75, src/__main__.py:168).  Here:

* `Timer` — wall timers separating compile (first call) from steady state,
  the distinction that matters under jit;
* `solve_rate` — solves/s counters (the BASELINE headline metric);
* `trace` — optional `jax.profiler` trace context for perfetto dumps;
* `log_metrics` — one-line structured (JSON) metric records on stdout, so
  runs are machine-diffable while staying human-readable.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time


class Timer:
    """Accumulates named wall-time spans; first span per name = compile."""

    def __init__(self):
        self.spans: dict[str, list[float]] = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.spans.setdefault(name, []).append(time.perf_counter() - t0)

    def compile_time(self, name: str) -> float:
        return self.spans[name][0]

    def steady_time(self, name: str) -> float:
        xs = self.spans[name][1:] or self.spans[name]
        return sum(xs) / len(xs)

    def report(self) -> dict:
        return {
            name: {"first_s": xs[0], "steady_s": (sum(xs[1:]) / len(xs[1:]) if len(xs) > 1 else xs[0]), "count": len(xs)}
            for name, xs in self.spans.items()
        }


def solve_rate(n_solves: int, seconds: float) -> float:
    return n_solves / max(seconds, 1e-12)


@contextlib.contextmanager
def trace(logdir: str | None):
    """jax.profiler trace context; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def log_metrics(stream=None, **metrics) -> None:
    print(json.dumps({"metrics": metrics}), file=stream or sys.stdout, flush=True)


class Heartbeat:
    """Liveness surface for long-running searches (SURVEY.md §5 failure
    detection): writes a one-line JSON heartbeat — monotonically increasing
    round counter, wall time, best objective — to a file (atomic replace)
    and optionally stdout.  An external watchdog declares the run stalled
    when the file's mtime stops advancing; combined with the per-round
    checkpoints (utils/checkpoint.py) this gives detect + resume."""

    def __init__(self, path: str | None = None, echo: bool = False):
        self.path = path
        self.echo = echo
        self.t0 = time.time()

    def beat(self, round_idx: int, **fields) -> None:
        record = {"heartbeat": {"round": round_idx, "wall_s": round(time.time() - self.t0, 3), **fields}}
        line = json.dumps(record)
        if self.echo:
            print(line, flush=True)
        if self.path:
            import os

            tmp = self.path + ".tmp"
            with open(tmp, "w") as f:
                f.write(line + "\n")
            os.replace(tmp, self.path)
