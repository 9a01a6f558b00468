"""Stage-resolved timing of the v2 tracker at the 2.7k operating point."""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.frontend import tracking as T


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def timed(name, fn, *args, reps=3):
    fn_j = jax.jit(fn) if not hasattr(fn, "lower") else fn
    fetch(fn_j(*args))
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        fetch(fn_j(*args))
        best = min(best, time.time() - t0)
    print(f"{name:46s} {best * 1e3:9.2f} ms  ({best * 1e3 / 16:7.3f} ms/pair)",
          file=sys.stderr, flush=True)
    return best


def main():
    H, W = 2028, 2704
    B = 16
    key = jax.random.PRNGKey(0)
    frames = jax.random.randint(key, (B + 1, H, W), 0, 255, jnp.uint8)
    pts = jnp.asarray(T.grid_points(W, H, 200), jnp.float32)
    levels = T.auto_levels(H, W)
    print(f"# device: {jax.devices()[0]} levels={levels} N={pts.shape[0]}",
          file=sys.stderr)

    @jax.jit
    def stage_pyr(frames):
        a = [T._pad_lanes(l) for l in T.build_pyramid(frames[:-1], levels)]
        b = [T._pad_lanes(l) for l in T.build_pyramid(frames[1:], levels)]
        return sum(jnp.sum(x[..., ::64, ::64].astype(jnp.float32))
                   for x in a + b)

    timed("pyramid x2 + pad", stage_pyr, frames)

    @jax.jit
    def stage_coarse(frames):
        pyr_a = [T._pad_lanes(l) for l in T.build_pyramid(frames[:-1], levels)]
        pyr_b = [T._pad_lanes(l) for l in T.build_pyramid(frames[1:], levels)]
        lvl_glob = levels - 1
        lvl_vol = max(3, lvl_glob - 2)
        pairs = {
            lvl: (pyr_a[lvl].astype(jnp.float32),
                  pyr_b[lvl].astype(jnp.float32))
            for lvl in {lvl_glob, lvl_vol}
        }
        hg = pyr_a[lvl_glob].shape[-2:]
        D_glob = max(2, min(hg) // 3)
        return T._coarse_init(pairs, lvl_vol, lvl_glob, pts, D_glob)

    timed("pyramid + coarse init", stage_coarse, frames)

    def stage_lk(frames, lvl, iters, margin):
        pyr_a = [T._pad_lanes(l) for l in T.build_pyramid(frames[:-1], levels)]
        pyr_b = [T._pad_lanes(l) for l in T.build_pyramid(frames[1:], levels)]
        scale = float(2**lvl)
        d = jnp.zeros((B,) + pts.shape, jnp.float32)
        return T._lk_level(
            pyr_a[lvl], pyr_b[lvl], pts / scale, d, T.LK_RADIUS, iters,
            margin, precision=jax.lax.Precision.HIGHEST)

    for lvl, iters, margin in ((2, 0, T.MARGIN_ENTRY), (2, 3, T.MARGIN_ENTRY),
                               (1, 0, T.MARGIN_FINE), (1, 2, T.MARGIN_FINE),
                               (0, 0, T.MARGIN_FINE), (0, 5, T.MARGIN_FINE)):
        timed(f"pyr + lk lvl={lvl} iters={iters} M={margin}",
              jax.jit(partial(stage_lk, lvl=lvl, iters=iters, margin=margin)),
              frames)

    @jax.jit
    def full(frames):
        return T._lk_pairs_core(frames[:-1], frames[1:], pts, levels,
                                T.LK_RADIUS, T.LK_ITERS)

    timed("FULL core", full, frames)


if __name__ == "__main__":
    main()
