"""Fused presync+4xsync single dispatch vs separate dispatches
(round 3 re-check of the round-2 finding at the 5x faster operating
point). Measured: separate 484 ms, fused 462 ms — the async runtime
pipelines even data-dependent dispatches, so the separate path stays
the default (and the CLI's).
"""

import sys, time
import numpy as np, jax, jax.numpy as jnp
from rssync_tpu.parallel import batch as PB
from rssync_tpu.parallel.batch import stack_windows
from rssync_tpu.testing.engine_problem import make_engine_problem

def fetch(x): return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]
print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
prob = make_engine_problem(seed=0, duration=60.0, fps=60.0, n_features=130,
                           sync_window=60, syncpoint_distance=120, true_delay=0.0423)
wins = stack_windows(prob.windows)
delays = jnp.asarray(np.arange(-0.2, 0.2, 0.002), jnp.float32)
table = prob.table
radius = 0.2

def separate(key):
    _, best = PB.batched_presync(table, wins, delays, key, wide=True)
    cur = best
    for i in range(4):
        res = PB.batched_sync(table, wins, cur, best, radius,
                              jax.random.fold_in(key, i), wide=True)
        cur = res.delay
    return cur

def fused(key):
    _, results = PB.batched_sync_pipeline(
        table, wins, wins, delays, 0.0, radius, key, wide=True)
    return results[-1].delay

# NOTE: fused pipeline takes initial_delay scalar as center; separate uses best as centers.
for name, fn in (("separate", separate), ("fused", fused)):
    t0 = time.time(); out = fn(jax.random.PRNGKey(1)); fetch(out)
    ct = time.time() - t0
    best = np.inf
    for r in range(3):
        t0 = time.time(); fetch(fn(jax.random.PRNGKey(2 + r)))
        best = min(best, time.time() - t0)
    print(f"{name:10s} {best*1e3:8.1f} ms  [compile {ct:.0f}s]",
          file=sys.stderr, flush=True)
