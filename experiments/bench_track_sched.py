"""A/B the fine-LK schedule with FULL chunked runs only (partial-
consumption microbenches DCE-underestimate; see bench_track_bisect
history). Variants patch a script-local _lk_core with per-level
(iters, margin, radius)."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.frontend import tracking as T

ORIG_CORE = T._lk_core


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def make_core(plan):
    """plan: [(lvl, iters, margin, radius)] finest-last."""
    def core(pyr_pairs, pts, levels, radius, iters):
        B = pyr_pairs[0][0].shape[0]
        entry = plan[0][0]
        if levels > entry + 1:
            lvl_glob = levels - 1
            lvl_vol = max(entry + 1, lvl_glob - 2)
            pairs = {
                lvl: (pyr_pairs[lvl][0].astype(jnp.float32),
                      pyr_pairs[lvl][1].astype(jnp.float32))
                for lvl in {lvl_glob, lvl_vol}
            }
            hg = pyr_pairs[lvl_glob][0].shape[-2:]
            D_glob = max(2, min(hg) // 3)
            d = T._coarse_init(pairs, lvl_vol, lvl_glob, pts, D_glob)
        else:
            d = jnp.zeros((B,) + pts.shape, jnp.float32)
        for lvl, it_l, m_l, r_l in plan:
            scale = float(2 ** lvl)
            d = T._lk_level(
                pyr_pairs[lvl][0], pyr_pairs[lvl][1], pts / scale, d / scale,
                r_l, it_l, m_l, precision=jax.lax.Precision.HIGHEST,
            ) * scale
        return pts[None] + d
    return core


def run(name, seg=240, chunk=16, n_pairs_total=3600, reps=2):
    H, W = 2028, 2704
    frames = jax.random.randint(jax.random.PRNGKey(0), (seg + 1, H, W), 0, 255,
                                jnp.uint8)
    fetch(frames)
    T._lk_track_video_chunked_jit.clear_cache()
    fetch(T.lk_track_video_chunked(frames, chunk=chunk, grid_step=200))
    n_disp = n_pairs_total // seg
    best = np.inf
    for rep in range(reps):
        bias = jnp.uint8(rep + 1)
        t0 = time.time()
        outs = [T.lk_track_video_chunked(frames + (bias + i), chunk=chunk,
                                         grid_step=200) for i in range(n_disp)]
        for o in outs:
            fetch(o)
        best = min(best, time.time() - t0)
    print(f"{name:46s} {best:6.2f}s/clip  {1e3 * best / (n_disp * seg):7.3f} ms/pair",
          file=sys.stderr, flush=True)


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    run("V0 current plan (2,3,8,r10)(1,2,3,r10)(0,5,3,r10)")
    T._lk_core = make_core([(2, 3, 8, 10), (0, 5, 4, 10)])
    run("V1 skip lvl1: (2,3,8,r10)(0,5,4,r10)")
    T._lk_core = make_core([(2, 3, 8, 6), (0, 5, 4, 10)])
    run("V2 = V1 + lvl2 radius 6")
    T._lk_core = make_core([(2, 2, 8, 6), (0, 4, 4, 10)])
    run("V3 = V2 + iters (2,4)")
    T._lk_core = ORIG_CORE


if __name__ == "__main__":
    main()
