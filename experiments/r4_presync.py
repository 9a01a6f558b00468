"""PreSync timing after the flattened (delay x window x frame) RANSAC
scoring (core/presync.py::chunk_costs): per-program overhead dominated
the stage (r3_presync_split.py), so the Pallas bisection now runs ~90
large programs per delay chunk instead of 240 per-(delay, window) ones.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/r4_presync.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.parallel.batch import batched_presync, stack_windows
from rssync_tpu.testing.engine_problem import make_engine_problem


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    prob = make_engine_problem(
        seed=0, duration=60.0, fps=60.0, n_features=130, sync_window=60,
        syncpoint_distance=120, true_delay=0.0423)
    wins = stack_windows(prob.windows)
    delays = jnp.asarray(np.arange(-0.2, 0.2, 0.002), jnp.float32)
    t0 = time.time()
    fetch(batched_presync(prob.table, wins, delays, jax.random.PRNGKey(1),
                          wide=True))
    ct = time.time() - t0
    best = np.inf
    for r in range(3):
        t0 = time.time()
        c, d = batched_presync(prob.table, wins, delays,
                               jax.random.PRNGKey(2 + r), wide=True)
        fetch(d)
        best = min(best, time.time() - t0)
    print(f"presync {best * 1e3:.1f} ms  [compile {ct:.0f}s]",
          file=sys.stderr, flush=True)
    # sanity: recovered delays near truth
    err = np.abs(np.asarray(d, np.float64) - prob.true_delay).max() * 1e3
    print(f"max |presync - truth|: {err:.3f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
