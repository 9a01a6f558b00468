"""Microbench v4: gather width/count scaling, pair-batched behavior,
cost-volume stage cost, f32-precision rem matmul.
"""

from __future__ import annotations

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

REPS = 200
N = 130
S = 33


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


_floor = None


def timed(name, fn, *args):
    global _floor
    fn_j = jax.jit(fn)
    fetch(fn_j(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        fetch(fn_j(*args))
        best = min(best, time.time() - t0)
    if _floor is None:
        _floor = best
        print(f"{name:56s} {best * 1e3:8.2f} ms (floor)", file=sys.stderr,
              flush=True)
        return
    per = (best - _floor) / REPS * 1e6
    print(f"{name:56s} {per:9.1f} us/rep", file=sys.stderr, flush=True)
    return per


def scan_reps(body, origins):
    def f(o0):
        def step(carry, i):
            out = body((o0 + i) % 1200)
            return carry + jnp.sum(out.astype(jnp.float32)), None

        tot, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(REPS))
        return tot

    return f


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    key = jax.random.PRNGKey(0)
    H, Wp = 2028, 2816
    img = jax.random.randint(key, (H, Wp), 0, 255, jnp.uint8)
    o130 = jax.random.randint(key, (N, 2), 0, 1200, jnp.int32)

    timed("floor", scan_reps(lambda o: o[:1, :1], o130), o130)

    # gather width scaling: same bytes, fewer/wider rows
    for bw in (128, 256):
        nb = Wp // bw
        nblk = 2 if bw >= 128 else 3
        src = img.reshape(H * nb, bw)

        def body(o, nb=nb, bw=bw, src=src):
            ox, oy = o[:, 0], o[:, 1]
            b = ox // bw
            rows = oy[:, None] + jnp.arange(S)[None, :]
            idx = (rows * nb)[:, :, None] + (
                b[:, None, None] + jnp.arange(2)[None, None, :]
            )
            idx = jnp.minimum(idx, H * nb - 1)
            return jnp.take(src, idx.reshape(-1), axis=0)

        timed(f"gather u8 bw={bw} ({N * S * 2} rows)",
              scan_reps(body, o130), o130)

    # batched over 16 pairs (B*N*S*2 rows in one take)
    B = 16
    W4 = 768
    imgs = jax.random.randint(key, (B, H // 4, W4), 0, 255, jnp.uint8)
    nb4 = W4 // 128
    srcB = imgs.reshape(B, (H // 4) * nb4, 128)
    oB = jax.random.randint(key, (B, N, 2), 0, 300, jnp.int32)

    def bodyB(o):
        ox, oy = o[..., 0], o[..., 1]
        b = ox // 128
        rows = oy[..., None] + jnp.arange(S)[None, None, :]
        idx = (rows * nb4)[..., None] + (
            b[..., None, None] + jnp.arange(2)[None, None, None, :]
        )
        idx = jnp.minimum(idx, (H // 4) * nb4 - 1)
        return jnp.take_along_axis(
            srcB, idx.reshape(B, -1, 1), axis=1
        )

    t = timed(f"gather u8 batched B=16 level-2-size ({B * N * S * 2} rows)",
              scan_reps(bodyB, oB), oB)
    if t:
        print(f"   -> per pair: {t / B:.1f} us", file=sys.stderr)

    # rem-resolve matmul precision variants
    wide = jax.random.uniform(key, (N, S, 256), jnp.float32)

    def rem_mm(prec, dt):
        def body(o):
            rem = (o[:, 0] % 128).astype(jnp.float32)
            p = rem[:, None, None] + jnp.arange(S, dtype=jnp.float32)[:, None]
            src = jnp.arange(256, dtype=jnp.float32)[None, :]
            C = jnp.maximum(0.0, 1.0 - jnp.abs(p - src))
            return jax.lax.dot_general(
                wide.astype(dt), C.astype(dt),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=prec,
            )

        return body

    timed("rem matmul bf16", scan_reps(rem_mm(None, jnp.bfloat16), o130), o130)
    timed("rem matmul f32 default",
          scan_reps(rem_mm(None, jnp.float32), o130), o130)
    timed("rem matmul f32 HIGHEST",
          scan_reps(rem_mm(jax.lax.Precision.HIGHEST, jnp.float32), o130),
          o130)

    # cost volume at level 5 (63x88), D=7 -> 15x15 shifts, SAD + 5x5 box
    H5, W5 = 63, 88
    a5 = jax.random.uniform(key, (H5, W5), jnp.float32)
    b5 = jax.random.uniform(key, (H5, W5), jnp.float32)
    D = 7

    def costvol(o):
        a = a5 + o[0, 0] * 0.0
        pb = jnp.pad(b5, D, mode="edge")
        vols = []
        for dy in range(2 * D + 1):
            for dx in range(2 * D + 1):
                diff = jnp.abs(a - jax.lax.dynamic_slice(
                    pb, (dy, dx), (H5, W5)))
                vols.append(diff)
        v = jnp.stack(vols)  # (225, H5, W5)
        # 5x5 box filter, separable via cumsum-free shifts
        vp = jnp.pad(v, ((0, 0), (2, 2), (2, 2)), mode="edge")
        r = sum(vp[:, i : i + H5, :] for i in range(5))
        r = sum(r[:, :, i : i + W5] for i in range(5))
        best = jnp.argmin(r, axis=0)
        return best.astype(jnp.float32)

    timed("cost volume lvl5 D=7 (225 shifts) + 5x5 box + argmin",
          scan_reps(costvol, o130), o130)

    D = 4

    def costvol4(o):
        a = a5 + o[0, 0] * 0.0
        pb = jnp.pad(b5, D, mode="edge")
        v = jnp.stack([
            jnp.abs(a - jax.lax.dynamic_slice(pb, (dy, dx), (H5, W5)))
            for dy in range(2 * D + 1)
            for dx in range(2 * D + 1)
        ])
        vp = jnp.pad(v, ((0, 0), (2, 2), (2, 2)), mode="edge")
        r = sum(vp[:, i : i + H5, :] for i in range(5))
        r = sum(r[:, :, i : i + W5] for i in range(5))
        return jnp.argmin(r, axis=0).astype(jnp.float32)

    timed("cost volume lvl5 D=4 (81 shifts) + box + argmin",
          scan_reps(costvol4, o130), o130)
    return 0


if __name__ == "__main__":
    sys.exit(main())
