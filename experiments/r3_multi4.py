"""Multi-clip engine throughput on ONE chip (BASELINE configs[4] is
v5e-8 multi-clip batch; the sharded path is validated on the virtual
mesh in dryrun_multichip — this measures the single-chip batch-scaling
the sharding rides on): stack K copies of the reference operating
point's 30 windows and run presync + 4x sync over all K*30 windows in
the same batched dispatches.

Measured (v5e, round 3): K=1 0.474 s (63.3 windows/s, 0.038 ms max
err); K=4 2.148 s (55.9 windows/s, 0.041 ms). Per-window cost is flat
to slightly sublinear — the engine already saturates the chip at one
clip's 30 windows, so multi-clip batches on one chip cost ~linear
time and the way to scale clips is the sharded mesh axis
(parallel/multi.py), exactly as BASELINE configs[4] prescribes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/r3_multi4.py [K ...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.parallel import batch as PB
from rssync_tpu.parallel.batch import stack_windows
from rssync_tpu.testing.engine_problem import make_engine_problem


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    prob = make_engine_problem(
        seed=0, duration=60.0, fps=60.0, n_features=130, sync_window=60,
        syncpoint_distance=120, true_delay=0.0423,
    )
    wins1 = stack_windows(prob.windows)
    delays = jnp.asarray(np.arange(-0.2, 0.2, 0.002), jnp.float32)
    table = prob.table

    for K in [int(a) for a in sys.argv[1:]] or [1, 4]:
        wins = jax.tree_util.tree_map(
            lambda x: jnp.concatenate([x] * K, axis=0), wins1)
        W = wins.frame_mask.shape[0]

        def run(key):
            _, best = PB.batched_presync(table, wins, delays, key, wide=True)
            cur = best
            for p in range(4):
                r = PB.batched_sync(table, wins, cur, best, 0.2,
                                    jax.random.fold_in(key, p), wide=True)
                cur = r.delay
            return cur

        t0 = time.time()
        out = run(jax.random.PRNGKey(1))
        fetch(out)
        ct = time.time() - t0
        best_t = np.inf
        for r in range(3):
            t0 = time.time()
            fetch(run(jax.random.PRNGKey(2 + r)))
            best_t = min(best_t, time.time() - t0)
        err = np.abs(np.asarray(out, np.float64) - prob.true_delay).max() * 1e3
        print(
            f"K={K:2d} ({W:3d} windows)  {best_t:6.3f} s  "
            f"{W / best_t:6.1f} windows/s  max err {err:.4f} ms  "
            f"[compile {ct:.0f}s]",
            file=sys.stderr, flush=True,
        )


if __name__ == "__main__":
    main()
