"""Pooling strategy shootout: (16, 2028, 2704) u8 -> half-res u8.
Full-sum consumption (no DCE)."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def timed(name, fn, *args, reps=3):
    fn_j = jax.jit(fn)
    try:
        fetch(fn_j(*args))
    except Exception as e:
        print(f"{name:52s} FAILED {type(e).__name__}: {str(e)[:120]}",
              file=sys.stderr, flush=True)
        return
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        fetch(fn_j(*args))
        best = min(best, time.time() - t0)
    print(f"{name:52s} {best * 1e3:9.2f} ms", file=sys.stderr, flush=True)
    return best


def to_u8(x):
    return jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)


def main():
    H, W = 2028, 2704
    B = 16
    key = jax.random.PRNGKey(0)
    frames = jax.random.randint(key, (B, H, W), 0, 255, jnp.uint8)
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    def consume(x):
        return jnp.sum(x.astype(jnp.float32))

    timed("floor: full sum of u8 input", lambda x: consume(x), frames)

    def pool_reshape(x):
        f = x.astype(jnp.float32)
        f = f.reshape(B, H // 2, 2, W // 2, 2).mean(axis=(-3, -1))
        return consume(to_u8(f))

    timed("A reshape-mean", pool_reshape, frames)

    def pool_rw(x):
        f = x.astype(jnp.float32)
        s = jax.lax.reduce_window(
            f, 0.0, jax.lax.add, (1, 2, 2), (1, 2, 2), "VALID")
        return consume(to_u8(s * 0.25))

    timed("G reduce_window", pool_rw, frames)

    def pool_conv(x):
        f = x.astype(jnp.float32)[:, None]  # NCHW
        k = jnp.full((1, 1, 2, 2), 0.25, jnp.float32)
        y = jax.lax.conv_general_dilated(
            f, k, (2, 2), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return consume(to_u8(y[:, 0]))

    timed("D conv 2x2 stride2", pool_conv, frames)

    Rm = np.zeros((H // 2, H), np.float32)
    for i in range(H // 2):
        Rm[i, 2 * i] = 0.5
        Rm[i, 2 * i + 1] = 0.5
    Cm = np.zeros((W, W // 2), np.float32)
    for i in range(W // 2):
        Cm[2 * i, i] = 0.5
        Cm[2 * i + 1, i] = 0.5
    Rj = jnp.asarray(Rm.astype(np.float32))
    Cj = jnp.asarray(Cm.astype(np.float32))

    def pool_mm(x):
        xb = x.astype(jnp.bfloat16)
        y = jnp.einsum("rh,bhw->brw", Rj.astype(jnp.bfloat16), xb,
                       preferred_element_type=jnp.float32)
        z = jnp.einsum("brw,wc->brc", y.astype(jnp.bfloat16),
                       Cj.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return consume(to_u8(z))

    timed("F matmul rows+cols bf16", pool_mm, frames)

    def pool_mm_colsonly(x):
        f = x.astype(jnp.float32)
        rows = (f[:, ::2] + f[:, 1::2]) * 0.5  # sublane-strided
        z = jnp.einsum("brw,wc->brc", rows.astype(jnp.bfloat16),
                       Cj.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return consume(to_u8(z))

    timed("C rows-strided + cols-matmul", pool_mm_colsonly, frames)

    def pool_rw_u16(x):
        s = jax.lax.reduce_window(
            x.astype(jnp.uint16), np.uint16(0), jax.lax.add,
            (1, 2, 2), (1, 2, 2), "VALID")
        return consume((s // 4).astype(jnp.uint8))

    timed("H reduce_window u16", pool_rw_u16, frames)

    # 4x pooling variants (skip level 1 entirely)
    def pool4_rw(x):
        f = x.astype(jnp.float32)
        s = jax.lax.reduce_window(
            f, 0.0, jax.lax.add, (1, 4, 4), (1, 4, 4), "VALID")
        return consume(to_u8(s * 0.0625))

    timed("G4 reduce_window 4x4", pool4_rw, frames)


if __name__ == "__main__":
    main()
