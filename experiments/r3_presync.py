"""Presync A/B on TPU: XLA bisect (re-reads the residual volume from
HBM 14x) vs the VMEM-resident Pallas scoring kernel, at the reference
operating point (30 windows x 200 delays x 60 frames x 130 features).
Also checks argmin-delay agreement between the two paths.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.core import ransac as RS
from rssync_tpu.parallel import batch as PB
from rssync_tpu.parallel.batch import stack_windows
from rssync_tpu.testing.engine_problem import make_engine_problem

ORIG = RS.guess_motion_window


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def timed(name, table, wins, delays, reps=3):
    PB.batched_presync.clear_cache()
    t0 = time.time()
    out = PB.batched_presync(table, wins, delays, jax.random.PRNGKey(1),
                             wide=True)
    fetch(out)
    ct = time.time() - t0
    best = np.inf
    for r in range(reps):
        t0 = time.time()
        fetch(PB.batched_presync(table, wins, delays,
                                 jax.random.PRNGKey(2 + r), wide=True))
        best = min(best, time.time() - t0)
    print(f"{name:24s} {best * 1e3:9.1f} ms  [compile {ct:.0f}s]",
          file=sys.stderr, flush=True)
    return np.asarray(out[1])


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    prob = make_engine_problem(
        seed=0, duration=60.0, fps=60.0, n_features=130, sync_window=60,
        syncpoint_distance=120, true_delay=0.0423,
    )
    wins = stack_windows(prob.windows)
    delays = jnp.asarray(np.arange(-0.2, 0.2, 0.002), jnp.float32)
    table = prob.table

    d_pallas = timed("pallas scoring", table, wins, delays)

    RS.guess_motion_window = lambda P, c, k, iters: ORIG(
        P, c, k, iters, impl="xla")
    d_xla = timed("xla scoring", table, wins, delays)
    RS.guess_motion_window = ORIG

    agree = np.mean(d_pallas == d_xla)
    print(f"# argmin-delay agreement: {agree:.3f} "
          f"(max |d| {np.abs(d_pallas - d_xla).max() * 1e3:.3f} ms)",
          file=sys.stderr, flush=True)


if __name__ == "__main__" and "sweep" not in sys.argv:
    main()


def sweep():
    """Chunk-size sweep + fixed-M split with the new scoring path."""
    from rssync_tpu.core import presync as PS
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    prob = make_engine_problem(
        seed=0, duration=60.0, fps=60.0, n_features=130, sync_window=60,
        syncpoint_distance=120, true_delay=0.0423,
    )
    wins = stack_windows(prob.windows)
    delays = jnp.asarray(np.arange(-0.2, 0.2, 0.002), jnp.float32)
    table = prob.table
    for chunk in (8, 16, 25):
        PS.DELAY_CHUNK = chunk
        timed(f"pallas chunk={chunk}", table, wins, delays)
    PS.DELAY_CHUNK = 8
    RS.guess_motion_window = lambda P, c, k, iters: jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], P.dtype), (P.shape[1], 3))
    timed("fixed M (no ransac)", table, wins, delays)
    RS.guess_motion_window = ORIG


if __name__ == "__main__" and "sweep" in sys.argv:
    sweep()
