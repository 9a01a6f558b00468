"""Delay-blocked PreSync scoring A/B (round 4).

r4_presync_split2.py attribution of the 267 ms stage: P build 119.5 /
hypothesis gen ~30 / bisection scoring ~119 ms across 6000 one-
(delay, window)-per-program Pallas grid cells (~20 us each, compute
~half). This restructure flattens each DELAY_CHUNK x windows slice
into one leading batch axis for score_quartile_pallas_batched, which
packs _b_tile whole problems per program — no transposes (the r4
negative result that sank the frame-axis flattening), the (3, F, N)
blocks stay intact.

Also re-sweeps DELAY_CHUNK (8 was optimal for the old structure).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    experiments/r4_dblock.py [chunk ...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.core import presync as PS
from rssync_tpu.parallel import batch as PB
from rssync_tpu.parallel.batch import stack_windows
from rssync_tpu.testing.engine_problem import make_engine_problem


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def timed(name, table, wins, delays):
    PB.batched_presync.clear_cache()
    t0 = time.time()
    out = PB.batched_presync(table, wins, delays, jax.random.PRNGKey(1),
                             wide=True)
    fetch(out)
    ct = time.time() - t0
    best = np.inf
    for r in range(3):
        t0 = time.time()
        fetch(PB.batched_presync(table, wins, delays,
                                 jax.random.PRNGKey(2 + r), wide=True))
        best = min(best, time.time() - t0)
    print(f"{name:14s} {best * 1e3:9.1f} ms  [compile {ct:.0f}s]",
          file=sys.stderr, flush=True)


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    prob = make_engine_problem(
        seed=0, duration=60.0, fps=60.0, n_features=130, sync_window=60,
        syncpoint_distance=120, true_delay=0.0423)
    wins = stack_windows(prob.windows)
    delays = jnp.asarray(np.arange(-0.2, 0.2, 0.002), jnp.float32)
    table = prob.table
    sel = [int(a) for a in sys.argv[1:]] or [8, 16, 4]
    orig = PS.DELAY_CHUNK
    for ck in sel:
        PS.DELAY_CHUNK = ck
        try:
            timed(f"dblock ck={ck}", table, wins, delays)
        finally:
            PS.DELAY_CHUNK = orig


def main2():
    """Extra sweep: ck=2, and b_tile=3 at ck=4 (3 x 4.9 MB = 14.7 MB,
    still under Mosaic's 16 MB scoped limit though over the 13.5 MB
    budget)."""
    from functools import partial
    from rssync_tpu.ops import pallas_score as PSC

    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    prob = make_engine_problem(
        seed=0, duration=60.0, fps=60.0, n_features=130, sync_window=60,
        syncpoint_distance=120, true_delay=0.0423)
    wins = stack_windows(prob.windows)
    delays = jnp.asarray(np.arange(-0.2, 0.2, 0.002), jnp.float32)
    table = prob.table
    orig_fn = PSC.score_quartile_pallas_batched
    orig_ck = PS.DELAY_CHUNK
    for ck, bt in ((2, None), (4, 3)):
        PS.DELAY_CHUNK = ck
        if bt is not None:
            PSC.score_quartile_pallas_batched = partial(orig_fn, b_tile=bt)
        try:
            timed(f"ck={ck} bt={bt}", table, wins, delays)
        finally:
            PS.DELAY_CHUNK = orig_ck
            PSC.score_quartile_pallas_batched = orig_fn

if __name__ == "__main__":
    (main2 if "2" in sys.argv[1:2] else main)()
