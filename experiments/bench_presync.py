"""Locate the PreSync bottleneck: time batched_presync variants at the
reference operating point (30 windows x 200 delays x 60 frames x 130
features) by monkeypatching the RANSAC / cost pieces."""

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

ORIG_GUESS = RS.guess_motion


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
    print(f"{name:52s} {best * 1e3:9.1f} ms", file=sys.stderr, flush=True)
    return best


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    prob = make_engine_problem(
        seed=0, duration=60.0, fps=60.0, n_features=130, sync_window=60,
        syncpoint_distance=120, true_delay=0.0423,
    )
    wins = stack_windows(prob.windows)
    delays = jnp.asarray(np.arange(-0.2, 0.2, 0.002), jnp.float32)
    table = prob.table

    timed("current (chunk=32, ransac20, bisect24)", table, wins, delays)

    # no RANSAC: fixed M (isolates RANSAC+quartile cost)
    PS.guess_motion = lambda P, c, k, iters: jnp.asarray([0.0, 0.0, 1.0], P.dtype)
    timed("fixed M (no ransac at all)", table, wins, delays)
    PS.guess_motion = ORIG_GUESS

    # ransac with hypotheses but cheap score (mean instead of quartile)
    def guess_meanscore(P, count, key, iters):
        r0, r1 = RS.sample_pairs(key, iters, count)
        N = P.shape[-1]
        Pn2 = jnp.sum(P * P, axis=0)
        inv = jnp.where(Pn2 < 1e-24, 1.0, jax.lax.rsqrt(jnp.maximum(Pn2, 1e-30)))
        nP = P * inv[None]
        v = RS.cross_soa(P[:, r0], P[:, r1])
        vn2 = jnp.sum(v * v, axis=0)
        vinv = jnp.where(vn2 < 1e-24, 1.0, jax.lax.rsqrt(jnp.maximum(vn2, 1e-30)))
        v = v * vinv[None]
        res = jnp.einsum("ci,cn->in", v, nP)
        valid = (jnp.arange(N) < count)[None, :]
        med = jnp.sum(jnp.where(valid, res * res, 0.0), -1)
        best = jnp.argmin(med)
        return v[:, best]

    PS.guess_motion = guess_meanscore
    timed("ransac w/ mean score (no quartile)", table, wins, delays)

    # quartile via half the bisect rounds
    def guess_rounds(nrounds):
        def g(P, count, key, iters):
            r0, r1 = RS.sample_pairs(key, iters, count)
            N = P.shape[-1]
            Pn2 = jnp.sum(P * P, axis=0)
            inv = jnp.where(Pn2 < 1e-24, 1.0, jax.lax.rsqrt(jnp.maximum(Pn2, 1e-30)))
            nP = P * inv[None]
            v = RS.cross_soa(P[:, r0], P[:, r1])
            vn2 = jnp.sum(v * v, axis=0)
            vinv = jnp.where(vn2 < 1e-24, 1.0, jax.lax.rsqrt(jnp.maximum(vn2, 1e-30)))
            v = v * vinv[None]
            res = jnp.einsum("ci,cn->in", v, nP)
            res2 = res * res
            valid = (jnp.arange(N) < count)[None, :]
            k = jnp.maximum(count, 1) // 4
            res2m = jnp.where(valid, res2, jnp.inf)
            lo = jnp.zeros((res2.shape[0],), res2.dtype)
            hi = jnp.max(jnp.where(valid, res2, 0.0), axis=-1)

            def bisect(_, carry):
                lo, hi = carry
                mid = 0.5 * (lo + hi)
                cnt = jnp.sum(res2m <= mid[:, None], axis=-1)
                ge = cnt >= k + 1
                return jnp.where(ge, lo, mid), jnp.where(ge, mid, hi)

            lo, hi = jax.lax.fori_loop(0, nrounds, bisect, (lo, hi))
            best = jnp.argmin(hi)
            vb = v[:, best]
            tiny = jnp.sum(vb * vb) < 1e-12
            return jnp.where(tiny, jnp.asarray([0.0, 0.0, 1.0], vb.dtype), vb)
        return g

    PS.guess_motion = guess_rounds(12)
    timed("quartile bisect 12 rounds", table, wins, delays)

    PS.guess_motion = guess_rounds(24)
    timed("quartile bisect 24 rounds (=current, sanity)", table, wins, delays)

    # quartile via sort
    def guess_sort(P, count, key, iters):
        r0, r1 = RS.sample_pairs(key, iters, count)
        N = P.shape[-1]
        Pn2 = jnp.sum(P * P, axis=0)
        inv = jnp.where(Pn2 < 1e-24, 1.0, jax.lax.rsqrt(jnp.maximum(Pn2, 1e-30)))
        nP = P * inv[None]
        v = RS.cross_soa(P[:, r0], P[:, r1])
        vn2 = jnp.sum(v * v, axis=0)
        vinv = jnp.where(vn2 < 1e-24, 1.0, jax.lax.rsqrt(jnp.maximum(vn2, 1e-30)))
        v = v * vinv[None]
        res = jnp.einsum("ci,cn->in", v, nP)
        res2 = res * res
        valid = (jnp.arange(N) < count)[None, :]
        k = jnp.maximum(count, 1) // 4
        res2m = jnp.where(valid, res2, jnp.inf)
        srt = jnp.sort(res2m, axis=-1)
        med = jnp.take_along_axis(srt, k[None, None].repeat(res2.shape[0], 0), axis=-1)[:, 0]
        best = jnp.argmin(med)
        vb = v[:, best]
        tiny = jnp.sum(vb * vb) < 1e-12
        return jnp.where(tiny, jnp.asarray([0.0, 0.0, 1.0], vb.dtype), vb)

    PS.guess_motion = guess_sort
    timed("quartile via jnp.sort", table, wins, delays)
    PS.guess_motion = ORIG_GUESS

    # chunk sweep
    for chunk in (8, 16, 64, 100):
        PS.DELAY_CHUNK = chunk
        timed(f"current w/ DELAY_CHUNK={chunk}", table, wins, delays)
    PS.DELAY_CHUNK = 32


if __name__ == "__main__":
    main()
