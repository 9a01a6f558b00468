"""Probe the hybrid tracker restructure's full-clip passes (round 4).

r4_chunk_stages.py attribution of the production chunked path:
    slice 0.137 / +pyr 0.054 / +coarse 0.030 / +entry 0.032
    / +fine 0.097  = 0.350 ms/pair
The u8 block dynamic_slice is the single biggest line and produces
nothing — XLA materializes it even when the pyramid einsum is its only
consumer (stage "pyr" = 0.191, not 0.054+eps). Hybrid plan: hoist ONLY
the per-frame passes (small-level pyramid {2,5,7}, level-0 templates)
to one-shot full-clip computations, keep coarse/entry/fine per-chunk
reading small-level slices + fidx strip-DMA into the full u8 clip.

This probe measures the hoisted pieces in isolation:
    smallpyr   one-shot build_pyramid_sparse(frames_p, 8, [2,5,7])
    tmpl0      one-shot _lk_templates of the full clip at level 0
    both       the two together (shared u8 read?)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    experiments/r4_pyr2.py [variant ...]
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
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def consume(tree):
    return sum(
        jnp.sum(l, dtype=jnp.int32).astype(jnp.float32)
        if jnp.issubdtype(l.dtype, jnp.integer) else jnp.sum(l)
        for l in jax.tree_util.tree_leaves(tree)
    )


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    need = T._needed_levels(LEVELS, T.LK_ITERS, T.LK_RADIUS)
    plan = T._fine_plan(LEVELS, T.LK_ITERS, T.LK_RADIUS)
    fine = {l for l, *_ in plan}
    lvl_plan = {l: "fine" if l in fine else "lane" for l in need}
    small = [l for l in need if l > 0]
    pts0 = T.grid_points(W, H, 200)  # static int grid
    radius0 = plan[-1][3]

    @jax.jit
    def smallpyr(frames_p):
        pyr = T.build_pyramid_sparse(frames_p, LEVELS, small, (H, W),
                                     lvl_plan)
        return consume(pyr)

    @jax.jit
    def tmpl0(frames_p):
        tm = T._lk_templates(frames_p, pts0, radius0)
        return consume(tm)

    @jax.jit
    def both(frames_p):
        pyr = T.build_pyramid_sparse(frames_p, LEVELS, small, (H, W),
                                     lvl_plan)
        tm = T._lk_templates(frames_p, pts0, radius0)
        return consume(pyr) + consume(tm)

    frames = np.random.default_rng(0).integers(
        0, 255, (SEG + 1, H, W), np.uint8)
    frames_p = jnp.asarray(T.pad_frames_host(frames, LEVELS))
    fetch(frames_p)
    sel = sys.argv[1:]
    for name, fn in (("smallpyr", smallpyr), ("tmpl0", tmpl0),
                     ("both", both)):
        if sel and name not in sel:
            continue
        t0 = time.time()
        fetch(fn(frames_p))
        ct = time.time() - t0
        best = np.inf
        for rep in range(3):
            t0 = time.time()
            fetch(fn(frames_p + jnp.uint8(rep + 1)))
            best = min(best, time.time() - t0)
        print(f"{name:9s} {best * 1e3 / SEG:7.3f} ms/pair  "
              f"[compile {ct:.0f}s]", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
