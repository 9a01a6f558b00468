"""Where does Sync's 0.23 s go? The vmapped while_loop runs until the
LAST window converges, so wall = max(iterations) x per-iteration cost.
Print the per-pass iteration distribution and derived cost/iteration
to see whether the stage is straggler-bound (one slow lane) or
per-iteration-cost-bound (each iteration too expensive).

Usage: PYTHONPATH=/root/repo python experiments/r4_sync_iters.py
"""

import sys
import time

import numpy as np
import jax

from rssync_tpu.parallel.batch import batched_sync, stack_windows
from rssync_tpu.testing.engine_problem import make_engine_problem

prob = make_engine_problem(
    seed=0, duration=60.0, fps=60.0, n_features=130, sync_window=60,
    syncpoint_distance=120, true_delay=0.0423,
)
table, wins = prob.table, stack_windows(prob.windows)
W = len(prob.syncpoints)
print(f"# device: {jax.devices()[0]}  windows: {W}", file=sys.stderr)

key = jax.random.PRNGKey(0)
delays = np.full(W, prob.initial_delay, np.float32)
centers = delays.copy()


def run():
    d = delays
    out = []
    for p in range(4):
        r = batched_sync(table, wins, d, centers, prob.search_radius,
                         jax.random.split(key, W), wide=True)
        d = np.asarray(r.delay)
        out.append((d, np.asarray(r.iterations)))
    return out


t0 = time.time()
out = run()
print(f"# compile+run: {time.time() - t0:.1f}s", file=sys.stderr)

best = np.inf
for _ in range(3):
    t0 = time.time()
    out = run()
    best = min(best, time.time() - t0)

total_max = 0
for p, (d, it) in enumerate(out):
    total_max += int(it.max())
    print(
        f"pass {p}: iters min/med/max = {it.min()}/{int(np.median(it))}/"
        f"{it.max()}  (sum over lanes {it.sum()})",
        file=sys.stderr,
    )
print(
    f"sync(4x): {best:.3f}s  sum-of-max-iters {total_max}  "
    f"-> {best / total_max * 1e3:.2f} ms/outer-iteration",
    file=sys.stderr,
)
