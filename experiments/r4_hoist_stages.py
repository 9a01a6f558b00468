"""Stage attribution for the hoisted chunked tracker: time prefixes of
the pipeline (pyramid / +coarse / +templates / full) with every
intermediate consumed via a tiny sum (nothing DCE'd).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    experiments/r4_hoist_stages.py [stage ...]
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
LEVELS = 8


def fetch(x):
    return np.asarray(x).ravel()[:1]


def staged(stage):
    radius, iters = T.LK_RADIUS, T.LK_ITERS
    pts = np.asarray(T.grid_points(W, H, 200), np.float32)
    N = pts.shape[0]
    need = T._needed_levels(LEVELS, iters, radius)
    plan_fine = T._fine_plan(LEVELS, iters, radius)
    fine = {l for l, *_ in plan_fine}
    pad_plan = {l: "fine" if l in fine else "lane" for l in need}

    @jax.jit
    def fn(frames):
        acc = jnp.float32(0)
        frames_p = T._pad_lanes(frames, 0 in fine)
        pyr = T.build_pyramid_sparse(frames_p, LEVELS, need, (H, W), pad_plan)
        if stage == "pyr":
            for l in need:
                acc += jnp.sum(pyr[l], dtype=jnp.int32).astype(jnp.float32)
            return acc
        entry = plan_fine[0][0]
        lvl_glob = LEVELS - 1
        lvl_vol = max(entry + 1, lvl_glob - 2)
        pairs = {
            lvl: (pyr[lvl][:-1], pyr[lvl][1:]) for lvl in {lvl_glob, lvl_vol}
        }
        hg = pyr[lvl_glob].shape[-2:]
        D_glob = max(2, min(hg) // 3)
        d_all = T._coarse_init(pairs, lvl_vol, lvl_glob, pts, D_glob)
        if stage == "coarse":
            return acc + jnp.sum(d_all)
        pts_lvl = {lvl: pts / float(2**lvl) for lvl, *_ in plan_fine}
        tmpl_all = {
            lvl: T._lk_templates(pyr[lvl], pts_lvl[lvl], r_l)
            for lvl, _i, _m, r_l in plan_fine
        }
        if stage == "tmpl":
            for lvl in tmpl_all:
                for v in tmpl_all[lvl].values():
                    acc += 1e-20 * jnp.sum(v)
            return acc + jnp.sum(d_all)
        n_chunks = (SEG + 1 - 1) // CHUNK
        starts = jnp.arange(n_chunks) * CHUNK

        def one(start):
            d = jax.lax.dynamic_slice(d_all, (start, 0, 0), (CHUNK, N, 2))
            fidx = start + 1 + jnp.arange(CHUNK, dtype=jnp.int32)
            for lvl, it_l, m_l, r_l in plan_fine:
                scale = float(2**lvl)
                tmpl = {
                    k: jax.lax.dynamic_slice_in_dim(v, start, CHUNK, axis=0)
                    for k, v in tmpl_all[lvl].items()
                }
                d = T._lk_iterate(
                    pyr[lvl], pts_lvl[lvl], d / scale, tmpl, r_l, it_l, m_l,
                    jax.lax.Precision.HIGHEST, fidx=fidx,
                ) * scale
            return jnp.asarray(pts, jnp.float32)[None] + d

        out = jax.lax.map(one, starts)
        return acc + jnp.sum(out)

    return fn


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    frames = jax.random.randint(
        jax.random.PRNGKey(0), (SEG + 1, H, W), 0, 255, jnp.uint8)
    fetch(frames)
    sel = sys.argv[1:]
    for stage in ["pyr", "coarse", "tmpl", "full"]:
        if sel and stage not in sel:
            continue
        fn = staged(stage)
        t0 = time.time()
        fetch(fn(frames))
        ct = time.time() - t0
        best = np.inf
        for rep in range(3):
            t0 = time.time()
            fetch(fn(frames + jnp.uint8(rep + 1)))
            best = min(best, time.time() - t0)
        print(f"{stage:8s} {best * 1e3 / SEG:7.3f} ms/pair  "
              f"[compile {ct:.0f}s]", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
