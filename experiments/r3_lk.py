"""Round-3 LK stage attribution at the real operating point: full-run
A/B of the shipped chunked video tracker (240 pairs, chunk=16, 2.7k
u8, 130-pt grid) with stages ablated or reparameterized via
monkeypatching. Ablated variants are timing-only (tracks are wrong);
precision/iteration variants are candidates and also report the mean
|track - base| deviation on one block.

Usage: python experiments/r3_lk.py [variant ...]
"""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.frontend import tracking as T

H, W = 2028, 2704
SEG = 240
CHUNK = 16


def fetch(x):
    return np.asarray(x.ravel()[:1])


def time_variant(frames, pts, label, ref=None):
    # fresh jit per variant: the shipped _lk_track_video_chunked_jit
    # would cache-hit across monkeypatched internals
    @jax.jit
    def fn(frames, pts):
        Tn, Hn, Wn = frames.shape
        n_chunks = (Tn - 1) // CHUNK
        starts = jnp.arange(n_chunks) * CHUNK

        def one(start):
            blk = jax.lax.dynamic_slice(
                frames, (start, 0, 0), (CHUNK + 1, Hn, Wn))
            return T._lk_video_core(blk, pts, 8, T.LK_RADIUS, T.LK_ITERS)

        out = jax.lax.map(one, starts)
        return out.reshape(Tn - 1, pts.shape[0], 2)

    t0 = time.time()
    out = fn(frames, pts)
    fetch(out)
    compile_t = time.time() - t0
    best = np.inf
    for rep in range(2):
        t0 = time.time()
        fetch(fn(frames + jnp.uint8(rep + 1), pts))
        best = min(best, time.time() - t0)
    dev = ""
    if ref is not None:
        d = np.abs(np.asarray(out) - ref).mean()
        dev = f"  mean|d-base| {d:8.4f} px"
    print(
        f"{label:12s} {best * 1e3:9.1f} ms  ({best * 1e3 / SEG:7.3f}"
        f" ms/pair)  [compile {compile_t:.0f}s]{dev}",
        file=sys.stderr, flush=True,
    )
    return np.asarray(out)


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    key = jax.random.PRNGKey(0)
    frames = jax.random.randint(key, (SEG + 1, H, W), 0, 255, jnp.uint8)
    pts = jnp.asarray(T.grid_points(W, H, 200), jnp.float32)
    fetch(frames)

    orig_plan = T._fine_plan
    orig_coarse = T._coarse_init
    orig_level = T._lk_level

    variants = sys.argv[1:] or [
        "base", "nocoarse", "nofine0", "nofine2", "noboth", "onlypyr",
        "iters2", "prechigh", "precdef",
    ]
    ref = None
    for v in variants:
        T._fine_plan = orig_plan
        T._coarse_init = orig_coarse
        T._lk_level = orig_level
        if v == "base":
            pass
        elif v == "nocoarse":
            T._coarse_init = lambda pyr, lv, lg, p, D: jnp.zeros(
                (pyr[lv][0].shape[0], p.shape[0], 2), jnp.float32)
        elif v == "nofine0":
            T._fine_plan = lambda L, i, r: orig_plan(L, i, r)[:1]
        elif v == "nofine2":
            T._fine_plan = lambda L, i, r: orig_plan(L, i, r)[1:]
        elif v == "noboth":
            T._fine_plan = lambda L, i, r: orig_plan(L, i, r)[:0] or [
                orig_plan(L, i, r)[1]]  # keep one so pts path exists
            T._fine_plan = lambda L, i, r: [orig_plan(L, i, r)[1]]
            T._coarse_init = lambda pyr, lv, lg, p, D: jnp.zeros(
                (pyr[lv][0].shape[0], p.shape[0], 2), jnp.float32)
        elif v == "onlypyr":
            # no coarse, single fine level with 0 iters: pyramid +
            # gathers only
            T._coarse_init = lambda pyr, lv, lg, p, D: jnp.zeros(
                (pyr[lv][0].shape[0], p.shape[0], 2), jnp.float32)
            T._fine_plan = lambda L, i, r: [(0, 0, 4, r)]
        elif v == "iters2":
            def plan2(L, i, r):
                p = orig_plan(L, i, r)
                return [(l, min(it, 2), m, rr) for l, it, m, rr in p]
            T._fine_plan = plan2
        elif v == "prechigh":
            def lvl_high(a, b, p, g, radius, iters, margin,
                         precision=None):
                return orig_level(a, b, p, g, radius, iters, margin,
                                  precision=jax.lax.Precision.HIGH)
            T._lk_level = lvl_high
        elif v == "precdef":
            def lvl_def(a, b, p, g, radius, iters, margin,
                        precision=None):
                return orig_level(a, b, p, g, radius, iters, margin,
                                  precision=jax.lax.Precision.DEFAULT)
            T._lk_level = lvl_def
        else:
            raise ValueError(v)
        out = time_variant(frames, pts, v, ref if v != "base" else None)
        if v == "base":
            ref = out
    T._fine_plan = orig_plan
    T._coarse_init = orig_coarse
    T._lk_level = orig_level


if __name__ == "__main__":
    main()
