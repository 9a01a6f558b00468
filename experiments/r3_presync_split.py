"""PreSync stage attribution (round 3, post strip-DMA): ablate
window_cost pieces via monkeypatching PB.window_cost (batch.py binds
the symbol at import — patching core.presync does nothing, which an
earlier run demonstrated by measuring identical times for all
variants).

Measured (TPU v5e, reference operating point, F_TILE=16 era):
    full      314 ms   (dispatch 26 + P build 95 + RANSAC 193)
    noransac  121 ms
    ponly     120 ms
    nop        26 ms
After the adaptive frame tile (whole windows per program): full 280.
Conclusion: scoring was bound on per-program overhead; the P build is
VPU-compute-bound (banded selects), and fusing it into the kernel
would save only ~3 ms of HBM round-trips.
"""

import sys, time
import numpy as np, jax, jax.numpy as jnp
from rssync_tpu.core import presync as PS
from rssync_tpu.core import ransac as RS
from rssync_tpu.core.problem import compute_problem
from rssync_tpu.parallel import batch as PB
from rssync_tpu.parallel.batch import stack_windows
from rssync_tpu.testing.engine_problem import make_engine_problem

ORIG = PB.window_cost
def fetch(x): return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]

def timed(name, table, wins, delays):
    PB.batched_presync.clear_cache()
    t0 = time.time()
    out = PB.batched_presync(table, wins, delays, jax.random.PRNGKey(1), wide=True)
    fetch(out); ct = time.time() - t0
    best = np.inf
    for r in range(3):
        t0 = time.time()
        fetch(PB.batched_presync(table, wins, delays, jax.random.PRNGKey(2 + r), wide=True))
        best = min(best, time.time() - t0)
    print(f"{name:12s} {best*1e3:9.1f} ms  [compile {ct:.0f}s]", file=sys.stderr, flush=True)

def wc_noransac(table, win, delay, key, bands=None):
    P = compute_problem(table, win, delay, bands)
    M = jnp.zeros((P.shape[1], 3), P.dtype).at[:, 2].set(1.0)
    return PS.cost_with_motion(P, M, win.frame_mask)

def wc_ponly(table, win, delay, key, bands=None):
    P = compute_problem(table, win, delay, bands)
    return jnp.sum(P * P) * 1e-20 + delay * 0.0

def wc_nop(table, win, delay, key, bands=None):
    return delay * 1.0

def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    prob = make_engine_problem(seed=0, duration=60.0, fps=60.0, n_features=130,
                               sync_window=60, syncpoint_distance=120, true_delay=0.0423)
    wins = stack_windows(prob.windows)
    delays = jnp.asarray(np.arange(-0.2, 0.2, 0.002), jnp.float32)
    table = prob.table
    for name, fn in (("full", ORIG), ("noransac", wc_noransac),
                     ("ponly", wc_ponly), ("nop", wc_nop)):
        PB.window_cost = fn
        try:
            timed(name, table, wins, delays)
        finally:
            PB.window_cost = ORIG

main()
