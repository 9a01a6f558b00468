"""PreSync scoring A/B: the hypothesis residual einsum
("ci,cn->in", a 20x3 @ 3x130 batched dot with terrible MXU padding)
vs an explicit 3-term broadcast formulation (pure VPU)."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.core import presync as PS
from rssync_tpu.core import ransac as RS
from rssync_tpu.parallel import batch as PB
from rssync_tpu.parallel.batch import stack_windows
from rssync_tpu.testing.engine_problem import make_engine_problem

ORIG = RS.guess_motion_from_pairs


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def timed(name, table, wins, delays, reps=3):
    PB.batched_presync.clear_cache()
    fetch(PB.batched_presync(table, wins, delays, jax.random.PRNGKey(1), wide=True))
    best = np.inf
    for r in range(reps):
        t0 = time.time()
        fetch(PB.batched_presync(table, wins, delays, jax.random.PRNGKey(2 + r), wide=True))
        best = min(best, time.time() - t0)
    print(f"{name:44s} {best * 1e3:9.1f} ms", file=sys.stderr, flush=True)


def guess_broadcast(P, count, r0, r1):
    N = P.shape[-1]
    Pn2 = jnp.sum(P * P, axis=0)
    inv = jnp.where(Pn2 < 1e-24, 1.0, jax.lax.rsqrt(jnp.maximum(Pn2, 1e-30)))
    nP = P * inv[None]
    v = RS.cross_soa(P[:, r0], P[:, r1])
    vn2 = jnp.sum(v * v, axis=0)
    vinv = jnp.where(vn2 < 1e-24, 1.0, jax.lax.rsqrt(jnp.maximum(vn2, 1e-30)))
    v = v * vinv[None]
    # 3-term broadcast instead of a batched dot
    res = (
        v[0][:, None] * nP[0][None]
        + v[1][:, None] * nP[1][None]
        + v[2][:, None] * nP[2][None]
    )
    res2 = res * res
    valid = (jnp.arange(N) < count)[None, :]
    k = jnp.maximum(count, 1) // 4
    res2m = jnp.where(valid, res2, jnp.inf).astype(jnp.bfloat16)
    lo = jnp.zeros((res2.shape[0],), res2.dtype)
    hi = jnp.max(jnp.where(valid, res2, 0.0), axis=-1)

    def bisect(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum(res2m <= mid[:, None].astype(jnp.bfloat16), axis=-1)
        ge = cnt >= k + 1
        return jnp.where(ge, lo, mid), jnp.where(ge, mid, hi)

    lo, hi = jax.lax.fori_loop(0, 14, bisect, (lo, hi))
    best = jnp.argmin(hi)
    vb = v[:, best]
    tiny = jnp.sum(vb * vb) < 1e-12
    return jnp.where(tiny, jnp.asarray([0.0, 0.0, 1.0], vb.dtype), vb)


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    prob = make_engine_problem(
        seed=0, duration=60.0, fps=60.0, n_features=130, sync_window=60,
        syncpoint_distance=120, true_delay=0.0423,
    )
    wins = stack_windows(prob.windows)
    delays = jnp.asarray(np.arange(-0.2, 0.2, 0.002), jnp.float32)

    timed("current (einsum residuals)", prob.table, wins, delays)
    RS.guess_motion_from_pairs = guess_broadcast
    timed("broadcast residuals", prob.table, wins, delays)
    RS.guess_motion_from_pairs = ORIG


if __name__ == "__main__":
    main()
