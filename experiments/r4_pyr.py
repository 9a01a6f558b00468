"""Decompose the full-clip pyramid cost (r4_hoist_stages: 0.281
ms/pair, the dominant floor item): pad copy, bf16 cast, the 0->2
einsum (row/col split), 2->5, 5->7, plus variants.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/r4_pyr.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.frontend import tracking as T

H, W = 2028, 2704
SEG = 240
LEVELS = 8


def fetch(x):
    return np.asarray(x).ravel()[:1]


def timed(label, fn, frames):
    f = jax.jit(fn)
    t0 = time.time()
    fetch(f(frames))
    ct = time.time() - t0
    best = np.inf
    for rep in range(3):
        t0 = time.time()
        fetch(f(frames + jnp.uint8(rep + 1)))
        best = min(best, time.time() - t0)
    print(f"{label:24s} {best * 1e3 / SEG:7.3f} ms/pair  [compile {ct:.0f}s]",
          file=sys.stderr, flush=True)


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    frames = jax.random.randint(
        jax.random.PRNGKey(0), (SEG + 1, H, W), 0, 255, jnp.uint8)
    fetch(frames)

    need = T._needed_levels(LEVELS, T.LK_ITERS, T.LK_RADIUS)
    fine = {l for l, *_ in T._fine_plan(LEVELS, T.LK_ITERS, T.LK_RADIUS)}
    pad_plan = {l: "fine" if l in fine else "lane" for l in need}
    print(f"# need={need} fine={sorted(fine)}", file=sys.stderr)

    def pad(fr):
        return T._pad_lanes(fr, True)

    timed("pad", lambda fr: jnp.sum(pad(fr), dtype=jnp.int32), frames)
    timed("pad+cast",
          lambda fr: jnp.sum(pad(fr).astype(jnp.bfloat16),
                             dtype=jnp.float32), frames)

    fp = pad(np.asarray(frames))  # host once; shape only
    Hp, Wp = fp.shape[-2:]
    h2 = T._lvl_size(H, 0, 2)
    w2 = T._lvl_size(W, 0, 2)
    h2s, w2s = T._stored_dims(h2, w2, "fine")
    R2 = jnp.asarray(
        T._down_mat_stored(H, 0, 2, Hp, h2s), jnp.bfloat16)
    C2 = jnp.asarray(
        T._down_mat_stored(W, 0, 2, Wp, w2s), jnp.bfloat16)

    def rows_first(fr):
        x = pad(fr).astype(jnp.bfloat16)
        y = jnp.einsum("rh,bhw->brw", R2, x,
                       preferred_element_type=jnp.float32)
        z = jnp.einsum("brw,wc->brc", y.astype(jnp.bfloat16), C2,
                       preferred_element_type=jnp.float32)
        return jnp.sum(z)

    def cols_first(fr):
        x = pad(fr).astype(jnp.bfloat16)
        y = jnp.einsum("bhw,wc->bhc", x, C2,
                       preferred_element_type=jnp.float32)
        z = jnp.einsum("rh,bhc->brc", R2, y.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return jnp.sum(z)

    def fused3(fr):
        x = pad(fr).astype(jnp.bfloat16)
        z = jnp.einsum("rh,bhw,wc->brc", R2, x, C2.T,
                       preferred_element_type=jnp.float32)
        return jnp.sum(z)

    timed("lvl2 rows-first", rows_first, frames)
    timed("lvl2 cols-first", cols_first, frames)
    timed("lvl2 fused-einsum", fused3, frames)

    def full_pyr(fr):
        fp_ = pad(fr)
        pyr = T.build_pyramid_sparse(fp_, LEVELS, need, (H, W), pad_plan)
        return sum(jnp.sum(pyr[l], dtype=jnp.int32).astype(jnp.float32)
                   for l in need)

    timed("full pyramid", full_pyr, frames)


if __name__ == "__main__":
    main()
