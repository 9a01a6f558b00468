"""Structured per-stage timing/observability.

The reference's observability is bare stderr progress lines (SURVEY
§5.1: per-frame tracking core_testcode.cpp:117, per-iteration Sync
trace core_private.cpp:330). The rebuild keeps those prints (behind
`progress=`) and adds what the reference lacks: a structured timing
registry per pipeline stage, queryable programmatically and printable
as a report, plus an optional JAX profiler trace hook.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class StageStats:
    calls: int = 0
    total_s: float = 0.0
    min_s: float = float("inf")
    max_s: float = 0.0

    def add(self, dt: float) -> None:
        self.calls += 1
        self.total_s += dt
        self.min_s = min(self.min_s, dt)
        self.max_s = max(self.max_s, dt)


@dataclass
class Timings:
    """Collects wall-clock per named stage; nestable."""

    stages: dict = field(default_factory=lambda: defaultdict(StageStats))

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name].add(time.perf_counter() - t0)

    def report(self) -> str:
        lines = ["stage                         calls    total      mean"]
        for name, s in sorted(
            self.stages.items(), key=lambda kv: -kv[1].total_s
        ):
            mean = s.total_s / max(s.calls, 1)
            lines.append(
                f"{name:<28} {s.calls:>6} {s.total_s:>8.3f}s {mean:>8.4f}s"
            )
        return "\n".join(lines)

    def as_dict(self) -> dict:
        return {
            k: {"calls": v.calls, "total_s": v.total_s}
            for k, v in self.stages.items()
        }


@contextlib.contextmanager
def jax_profiler_trace(log_dir: str | None):
    """Optional XLA profiler capture around a region (view with
    tensorboard-plugin-profile). No-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache. The engine's
    batched PreSync/Sync programs cost ~85 s of XLA compile on first
    use; with the cache that is once per machine, not once per
    process.

    NOT enabled under the axon remote backend: small programs
    round-trip the cache fine there, but reloading the large tracking
    executable from cache hangs the process (measured — second
    process stalls >400 s where a fresh compile takes ~16 s).

    Called by the CLI entry and bench; library users opt in themselves
    (we never override an explicitly configured cache)."""
    import os

    import jax

    if "axon" in os.environ.get("JAX_PLATFORMS", ""):
        return
    if jax.config.jax_compilation_cache_dir:
        return
    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "rssync_tpu", "xla"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
