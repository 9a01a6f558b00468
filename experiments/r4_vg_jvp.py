"""A/B: delay gradient inside the Sync outer loop — reverse-mode
value_and_grad (the round-3 structure) vs forward-mode jax.jvp.

Motivation (experiments/r4_sync_iters.py): Sync is semantics-bound at
>= 6 outer iterations/pass, ~7.7 ms each, so the only lever left is
work per iteration. Each iteration pays ~3 compute_problem forwards
plus ONE backward (value_and_grad at the Nesterov lookahead). The
backward transposes the banded spline-select chain — a long sequence
of small select/scatter-shaped ops. The input is a SCALAR delay, so
forward mode gets the same derivative from one fused tangent pass.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/r4_vg_jvp.py

MEASURED (v5e, 2026-08-19):
  vjp: sync(4x) best-of-3 0.241s  max |delay - truth| 0.0401 ms
  jvp: sync(4x) best-of-3 0.212s  max |delay - truth| 0.0402 ms
-> jvp is ~12% off the stage at unchanged accuracy; now the default
   (core/sync.py delay_grad="jvp").
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.core.sync import sync_window
from rssync_tpu.parallel.batch import batched_presync, stack_windows
from rssync_tpu.testing.engine_problem import make_engine_problem

prob = make_engine_problem(
    seed=0, duration=60.0, fps=60.0, n_features=130, sync_window=60,
    syncpoint_distance=120, true_delay=0.0423,
)
table, wins = prob.table, stack_windows(prob.windows)
W = wins.frame_mask.shape[0]
print(f"# device: {jax.devices()[0]}  windows: {W}", file=sys.stderr,
      flush=True)

delays = jnp.asarray(np.arange(-0.2, 0.2, 0.002), jnp.float32)
radius = 0.2
_, best = batched_presync(table, wins, delays, jax.random.PRNGKey(1),
                          wide=True)
np.asarray(best)


def run(delay_grad):
    cur = best
    centers = best
    final = None
    for p in range(4):
        keys = jax.random.split(jax.random.PRNGKey(20 + p), W)
        r = jax.vmap(
            lambda w, d0, c, k: sync_window(
                table, w, d0, c, radius, k, wide=True,
                delay_grad=delay_grad,
            )
        )(wins, cur, centers, keys)
        cur = r.delay
        final = r
    np.asarray(cur)
    return final


for mode in ("vjp", "jvp"):
    t0 = time.time()
    r = run(mode)
    compile_s = time.time() - t0
    bt = np.inf
    for _ in range(3):
        t0 = time.time()
        r = run(mode)
        bt = min(bt, time.time() - t0)
    d = np.asarray(r.delay)
    err = np.abs(d - prob.true_delay).max() * 1e3
    print(
        f"{mode}: sync(4x) best-of-3 {bt:.3f}s  (compile+first {compile_s:.1f}s)"
        f"  max |delay - truth| {err:.4f} ms",
        file=sys.stderr, flush=True,
    )
