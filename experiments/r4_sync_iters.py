"""Where does Sync's ~0.23 s go? The vmapped while_loop runs until
the LAST window converges, so wall = sum over passes of
max-lane-iterations x per-iteration cost. Print the per-pass
iteration distribution + derived ms/outer-iteration to see whether
the stage is straggler-bound (one slow lane) or per-iteration-bound.

Usage: PYTHONPATH=/root/repo python experiments/r4_sync_iters.py

MEASURED (v5e, 2026-08-19, slow-device day: sync4x 0.375 s vs 0.237
in the same day's bench):
  pass 0: iters min/med/max = 6/8/31
  pass 1-3: ALL lanes exactly 6 (= CONVERGE_COUNT+1, the verification
  minimum — passes 1-3 start at the optimum and spend all 6
  iterations proving step < 1e-4, full work each)
  sum-of-max 49 -> ~7.7 ms per outer iteration
Reading: (a) wall = sum of per-pass MAX lane iterations; batching all
30 windows is already optimal because per-iteration cost is
op-dispatch-bound, not compute-bound (1 window would cost the same
per iteration); (b) the floor is semantic — the reference's cc>5
convergence rule forces >= 6 full iterations per pass, so 4 passes
cannot go below ~24 outer iterations; (c) the lever, if ever needed,
is ops-per-iteration (~5 compute_problem evals via motion/vg/
backtrack), not iteration count or batching.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.parallel.batch import (
    batched_presync,
    batched_sync,
    stack_windows,
)
from rssync_tpu.testing.engine_problem import make_engine_problem

prob = make_engine_problem(
    seed=0, duration=60.0, fps=60.0, n_features=130, sync_window=60,
    syncpoint_distance=120, true_delay=0.0423,
)
table, wins = prob.table, stack_windows(prob.windows)
W = len(prob.syncpoints)
print(f"# device: {jax.devices()[0]}  windows: {W}", file=sys.stderr,
      flush=True)

delays = jnp.asarray(np.arange(-0.2, 0.2, 0.002), jnp.float32)
radius = 0.2
_, best = batched_presync(table, wins, delays, jax.random.PRNGKey(1),
                          wide=True)
np.asarray(best)


def run():
    cur = best
    out = []
    for p in range(4):
        r = batched_sync(table, wins, cur, best, radius,
                         jax.random.PRNGKey(20 + p), wide=True)
        cur = r.delay
        out.append(np.asarray(r.iterations))
    np.asarray(cur)
    return out


t0 = time.time()
out = run()
print(f"# sync compile+run: {time.time() - t0:.1f}s", file=sys.stderr,
      flush=True)

bt = np.inf
for _ in range(3):
    t0 = time.time()
    out = run()
    bt = min(bt, time.time() - t0)

total_max = 0
for p, it in enumerate(out):
    total_max += int(it.max())
    print(
        f"pass {p}: iters min/med/max = {it.min()}/{int(np.median(it))}/"
        f"{it.max()}  (sum over lanes {it.sum()})",
        file=sys.stderr, flush=True,
    )
print(
    f"sync(4x): {bt:.3f}s  sum-of-max-iters {total_max}  "
    f"-> {bt / max(total_max, 1) * 1e3:.2f} ms/outer-iteration",
    file=sys.stderr, flush=True,
)
