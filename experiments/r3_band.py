"""BAND=16 vs BAND=8 for the banded spline select: the per-ray
coefficient selection is 16 coefficients x BAND one-hot compare-FMAs,
so halving BAND halves the dominant compute of compute_problem
(PreSync's floor after the scoring rework, and Sync's loss evals).
Identical numerics while rolling-shutter spans fit (span+4 <= BAND;
the table build's span check guards this). Also verifies argmin
agreement.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.core import problem as PR
from rssync_tpu.core import sync as SY
from rssync_tpu.parallel import batch as PB
from rssync_tpu.parallel.batch import stack_windows
from rssync_tpu.testing.engine_problem import make_engine_problem


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def clear():
    PB.batched_presync.clear_cache()
    PB.batched_sync.clear_cache()
    SY.sync_window.clear_cache()


def run(tag, table, wins_open, wins_closed, delays, d0):
    clear()
    t0 = time.time()
    _, best = PB.batched_presync(table, wins_open, delays,
                                 jax.random.PRNGKey(1), wide=True)
    fetch(best)
    ct = time.time() - t0
    pre_best = np.inf
    for r in range(3):
        t0 = time.time()
        _, b = PB.batched_presync(table, wins_open, delays,
                                  jax.random.PRNGKey(2 + r), wide=True)
        fetch(b)
        pre_best = min(pre_best, time.time() - t0)
    t0 = time.time()
    cur = best
    for i in range(4):
        r = PB.batched_sync(table, wins_closed, cur, best, 0.2,
                            jax.random.PRNGKey(20 + i), wide=True)
        cur = r.delay
    fetch(cur)
    cts = time.time() - t0
    sync_best = np.inf
    for rep in range(2):
        cur = best
        t0 = time.time()
        for i in range(4):
            r = PB.batched_sync(table, wins_closed, cur, best, 0.2,
                                jax.random.PRNGKey(30 + 4 * rep + i),
                                wide=True)
            cur = r.delay
        fetch(cur)
        sync_best = min(sync_best, time.time() - t0)
    print(f"{tag:8s} presync {pre_best * 1e3:7.1f} ms  "
          f"sync4x {sync_best * 1e3:7.1f} ms  "
          f"[compiles {ct:.0f}/{cts:.0f}s]", file=sys.stderr, flush=True)
    return np.asarray(cur)


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    prob = make_engine_problem(
        seed=0, duration=60.0, fps=60.0, n_features=130, sync_window=60,
        syncpoint_distance=120, true_delay=0.0423,
    )
    wins = stack_windows(prob.windows)
    table = prob.table
    delays = jnp.asarray(np.arange(-0.2, 0.2, 0.002), jnp.float32)
    d0 = jnp.full((wins.frame_mask.shape[0],), 0.040, jnp.float32)

    d16 = run("band16", table, wins, wins, delays, d0)
    PR.BAND = 8
    d8 = run("band8", table, wins, wins, delays, d0)
    PR.BAND = 16
    print(f"# final-delay agreement: max |d| "
          f"{np.abs(d16 - d8).max() * 1e3:.4f} ms",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
