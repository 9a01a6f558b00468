"""Round-3 Sync(4x) attribution at the reference operating point
(30 windows, 60 frames, 130 features, 4 passes). Variants monkeypatch
core/sync.py pieces; ablated variants are timing-only.

  base      - shipped
  initonly  - OUTER_MAX_ITERS=0: init_motion + final loss only
  iter5     - OUTER_MAX_ITERS=5 (per-iteration marginal cost)
  noirls    - motion refinement skipped (M frozen at init)
  nobt      - delay step with fixed t (no line-search evals)
  irls1     - one IRLS round per outer iteration instead of 3
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.core import sync as SY
from rssync_tpu.parallel import batch as PB
from rssync_tpu.parallel.batch import stack_windows
from rssync_tpu.testing.engine_problem import make_engine_problem

ORIG_ITERS = SY.OUTER_MAX_ITERS
ORIG_IRLS = SY.motion_irls
ORIG_BT = SY._backtrack_step


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def timed(name, table, wins, d0, reps=2):
    PB.batched_sync.clear_cache()
    SY.sync_window.clear_cache()  # inner jit caches the traced jaxpr
    t0 = time.time()
    r = None
    cur = d0
    for i in range(4):
        r = PB.batched_sync(table, wins, cur, d0, 0.2,
                            jax.random.PRNGKey(20 + i), wide=True)
        cur = r.delay
    fetch(cur)
    ct = time.time() - t0
    best = np.inf
    iters = None
    for rep in range(reps):
        cur = d0
        t0 = time.time()
        for i in range(4):
            r = PB.batched_sync(table, wins, cur, d0, 0.2,
                                jax.random.PRNGKey(30 + 4 * rep + i),
                                wide=True)
            cur = r.delay
        fetch(cur)
        best = min(best, time.time() - t0)
        iters = np.asarray(r.iterations)
    print(f"{name:10s} {best * 1e3:9.1f} ms  [compile {ct:.0f}s] "
          f"outer-iters last pass: med {np.median(iters):.0f} "
          f"max {iters.max():.0f}", file=sys.stderr, flush=True)


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    prob = make_engine_problem(
        seed=0, duration=60.0, fps=60.0, n_features=130, sync_window=60,
        syncpoint_distance=120, true_delay=0.0423,
    )
    wins = stack_windows(prob.windows)
    table = prob.table
    d0 = jnp.full((wins.frame_mask.shape[0],), 0.040, jnp.float32)

    variants = sys.argv[1:] or [
        "base", "iter1", "iter5", "noirls", "nobt", "irls1",
    ]
    for v in variants:
        SY.OUTER_MAX_ITERS = ORIG_ITERS
        SY.motion_irls = ORIG_IRLS
        SY._backtrack_step = ORIG_BT
        if v == "base":
            pass
        elif v == "iter1":
            SY.OUTER_MAX_ITERS = 1
        elif v == "iter5":
            SY.OUTER_MAX_ITERS = 5
        elif v == "noirls":
            SY.motion_irls = lambda P, M, k, iters=0: M
        elif v == "nobt":
            SY._backtrack_step = (
                lambda f_only, x0, fval, grad: -1e-3 * grad)
        elif v == "irls1":
            SY.motion_irls = lambda P, M, k: ORIG_IRLS(P, M, k, iters=1)
        else:
            raise ValueError(v)
        timed(v, table, wins, d0)
    SY.OUTER_MAX_ITERS = ORIG_ITERS
    SY.motion_irls = ORIG_IRLS
    SY._backtrack_step = ORIG_BT


if __name__ == "__main__":
    main()
