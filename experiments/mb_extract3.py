"""Microbench v3: the gather+soft-matmul LK-level design vs current.

Design under test (per level, per pair, N static grid points):
  - search-buffer extraction: ONE jnp.take gather of (N*S*2) 128-wide
    row-blocks from the (H, Wp/128, 128)-reshaped level image, then a
    soft one-hot matmul resolving the per-point column remainder
    -> (N, S, S) resident f32 buffer
  - LK iterations: shifted+bilinear window = Ry @ buf @ Cx^T with
    per-point 2-tap interpolation matrices (batched MXU matmuls)
    instead of (2M+1) masked select-rounds

Timing: REPS executions inside a jitted scan; report (t - floor)/REPS.
"""

from __future__ import annotations

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

REPS = 200
N = 130
RAD = 10
W_WIN = 2 * RAD + 1  # 21


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
        print(f"{name:56s} {best * 1e3:8.2f} ms total (floor)",
              file=sys.stderr, flush=True)
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


def soft_onehot(pos, size, width):
    """(...,) fractional positions -> (..., size, width) 2-tap rows:
    row i interpolates source[pos + i]."""
    p = pos[..., None, None] + jnp.arange(size, dtype=jnp.float32)[:, None]
    src = jnp.arange(width, dtype=jnp.float32)[None, :]
    d = p - src
    wgt = jnp.maximum(0.0, 1.0 - jnp.abs(d))
    return wgt  # (..., size, width)


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    key = jax.random.PRNGKey(0)
    H, W = 2028, 2704
    Wp = 2816  # padded to 128
    NB = Wp // 128
    img = jax.random.randint(key, (H, Wp), 0, 255, jnp.uint8)
    o130 = jax.random.randint(key, (N, 2), 0, 1200, jnp.int32)

    timed("floor (trivial)", scan_reps(lambda o: o[:1, :1], o130), o130)

    M = 8
    S = W_WIN + 2 * M + 2  # 39

    # ---- extraction: row-block gather + column soft-matmul -----------------
    def make_extract(src_dtype):
        src = img.astype(src_dtype).reshape(H * NB, 128)

        def body(o):
            ox, oy = o[:, 0], o[:, 1]
            b = ox // 128  # (N,)
            rem = (ox - b * 128).astype(jnp.float32)
            rows = oy[:, None] + jnp.arange(S)[None, :]  # (N, S)
            idx = (rows * NB)[:, :, None] + (b[:, None, None]
                                             + jnp.arange(2)[None, None, :])
            flat = jnp.take(src, idx.reshape(-1), axis=0)  # (N*S*2, 128)
            wide = flat.reshape(N, S, 256).astype(jnp.bfloat16)
            # resolve the column remainder (integer here; frac folded in
            # real kernel): (N, S, 256) @ (N, 256, S)
            C = soft_onehot(rem, S, 256).astype(jnp.bfloat16)  # (N, S, 256)
            return jax.lax.dot_general(
                wide, C, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (N, S, S)

        return body

    for dt in (jnp.uint8, jnp.bfloat16):
        timed(f"rowblock-gather + col soft-mm src={jnp.dtype(dt).name}",
              scan_reps(make_extract(dt), o130), o130)

    # gather only (no matmul), to split costs
    def gather_only(src_dtype):
        src = img.astype(src_dtype).reshape(H * NB, 128)

        def body(o):
            ox, oy = o[:, 0], o[:, 1]
            b = ox // 128
            rows = oy[:, None] + jnp.arange(S)[None, :]
            idx = (rows * NB)[:, :, None] + (b[:, None, None]
                                             + jnp.arange(2)[None, None, :])
            return jnp.take(src, idx.reshape(-1), axis=0)

        return body

    for dt in (jnp.uint8, jnp.bfloat16, jnp.float32):
        timed(f"rowblock-gather only src={jnp.dtype(dt).name}",
              scan_reps(gather_only(dt), o130), o130)

    # ---- iteration inner loop: soft-matmul vs select-rounds ---------------
    buf = jax.random.uniform(key, (N, S, S), jnp.float32)
    t_patch = jax.random.uniform(key, (N, W_WIN, W_WIN), jnp.float32)
    zkey = jax.random.uniform(key, (N, 2), jnp.float32, -6.0, 6.0)

    def iter_softmm(n_iters):
        def body(o):
            def step(d, _):
                z = zkey + d[:, :1] * 0.0 + d  # depend on d
                Ry = soft_onehot(z[:, 1] + M, W_WIN + 1, S)
                Cx = soft_onehot(z[:, 0] + M, W_WIN + 1, S)
                rb = jax.lax.dot_general(
                    Ry.astype(jnp.bfloat16), buf.astype(jnp.bfloat16),
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # (N, w+1, S)
                pb = jax.lax.dot_general(
                    rb.astype(jnp.bfloat16), Cx.astype(jnp.bfloat16),
                    (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # (N, w+1, w+1)
                e = pb[:, :W_WIN, :W_WIN] - t_patch
                gx = jnp.sum(e, axis=(1, 2))
                d = d + jnp.stack([gx, -gx], -1) * 1e-6
                return d, None

            d0 = jnp.zeros((N, 2), jnp.float32) + o[:, :2] * 0.0
            d, _ = jax.lax.scan(step, d0, jnp.arange(n_iters))
            return d

        return body

    timed("iter soft-matmul x10", scan_reps(iter_softmm(10), o130), o130)

    def iter_select(n_iters, m):
        def body(o):
            def step(d, _):
                z = zkey + d
                zi = jnp.clip(jnp.floor(z), -m, m)
                sel_y = (zi[:, 1] + m).astype(jnp.int32)
                sel_x = (zi[:, 0] + m).astype(jnp.int32)
                rows = jnp.zeros((N, W_WIN + 1, S), buf.dtype)
                for dy in range(2 * m + 1):
                    hit = (sel_y == dy)[:, None, None]
                    rows = rows + jnp.where(
                        hit, buf[:, dy : dy + W_WIN + 1, :], 0.0)
                big = jnp.zeros((N, W_WIN + 1, W_WIN + 1), buf.dtype)
                for dx in range(2 * m + 1):
                    hit = (sel_x == dx)[:, None, None]
                    big = big + jnp.where(
                        hit, rows[:, :, dx : dx + W_WIN + 1], 0.0)
                e = big[:, :W_WIN, :W_WIN] - t_patch
                gx = jnp.sum(e, axis=(1, 2))
                return d + jnp.stack([gx, -gx], -1) * 1e-6, None

            d0 = jnp.zeros((N, 2), jnp.float32) + o[:, :2] * 0.0
            d, _ = jax.lax.scan(step, d0, jnp.arange(n_iters))
            return d

        return body

    timed("iter select-rounds x10 (M=8)",
          scan_reps(iter_select(10, M), o130), o130)

    # ---- current extraction for comparison --------------------------------
    imgf = img.astype(jnp.float32)

    def vds(o):
        def one(p):
            return jax.lax.dynamic_slice(imgf, (p[1], p[0]), (S, S))

        return jax.vmap(one)(o)

    timed("CURRENT vmap(dynamic_slice) f32", scan_reps(vds, o130), o130)
    return 0


if __name__ == "__main__":
    sys.exit(main())
