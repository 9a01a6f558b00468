"""Stage attribution of the CURRENT production chunked tracker path
(host-padded frames, sparse pyramid with folded level pads, chunk 16)
at the 2.7k operating point. Complements experiments/r4_hoist_stages.py
(which attributed the LOST hoisted layout: pyr 0.276 / full 0.579).

Stages are cumulative truncations of _lk_video_core inside the real
lax.map chunk loop:
  slice   dynamic_slice of the (chunk+1) block only
  pyr     + build_pyramid_sparse (consume every needed level)
  coarse  + _coarse_init (consume the coarse flow)
  entry   + the entry fine level (level 2 of the deep plan)
  full    + the finest level (production output)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    experiments/r4_chunk_stages.py [stage ...]
"""

import sys
import time

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
    need = T._needed_levels(LEVELS, T.LK_ITERS, T.LK_RADIUS)
    plan = T._fine_plan(LEVELS, T.LK_ITERS, T.LK_RADIUS)
    fine = {l for l, *_ in plan}
    lvl_plan = {l: "fine" if l in fine else "lane" for l in need}
    pts = np.asarray(T.grid_points(W, H, 200), np.float32)

    @jax.jit
    def fn(frames_p):
        n_chunks = (frames_p.shape[0] - 1) // CHUNK
        starts = jnp.arange(n_chunks) * CHUNK
        Hp, Wp = frames_p.shape[-2:]

        def one(start):
            blk = jax.lax.dynamic_slice(
                frames_p, (start, 0, 0), (CHUNK + 1, Hp, Wp))
            acc = jnp.float32(0)
            if stage == "slice":
                return acc + jnp.sum(blk, dtype=jnp.int32).astype(jnp.float32)
            pyr = T.build_pyramid_sparse(blk, LEVELS, need, (H, W), lvl_plan)
            if stage == "pyr":
                for l in need:
                    acc += jnp.sum(pyr[l], dtype=jnp.int32).astype(jnp.float32)
                return acc
            pairs = {l: (pyr[l][:-1], pyr[l][1:]) for l in need}
            entry = plan[0][0]
            lvl_glob = LEVELS - 1
            lvl_vol = max(entry + 1, lvl_glob - 2)
            cpairs = {lvl: pairs[lvl] for lvl in {lvl_glob, lvl_vol}}
            hg = pairs[lvl_glob][0].shape[-2:]
            D_glob = max(2, min(hg) // 3)
            d = T._coarse_init(cpairs, lvl_vol, lvl_glob, pts, D_glob)
            if stage == "coarse":
                return acc + jnp.sum(d)
            sub = plan[:1] if stage == "entry" else plan
            for lvl, it_l, m_l, r_l in sub:
                scale = float(2**lvl)
                d = T._lk_level(
                    pairs[lvl][0], pairs[lvl][1], pts / scale, d / scale,
                    r_l, it_l, m_l, precision=jax.lax.Precision.HIGHEST,
                ) * scale
            return acc + jnp.sum(d)

        return jax.lax.map(one, starts)

    return fn


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    frames = np.random.default_rng(0).integers(
        0, 255, (SEG + 1, H, W), np.uint8)
    frames_p = jnp.asarray(T.pad_frames_host(frames, LEVELS))
    fetch(frames_p)
    sel = sys.argv[1:]
    for stage in ["slice", "pyr", "coarse", "entry", "full"]:
        if sel and stage not in sel:
            continue
        fn = staged(stage)
        t0 = time.time()
        fetch(fn(frames_p))
        ct = time.time() - t0
        best = np.inf
        for rep in range(3):
            t0 = time.time()
            fetch(fn(frames_p + jnp.uint8(rep + 1)))
            best = min(best, time.time() - t0)
        print(f"{stage:8s} {best * 1e3 / SEG:7.3f} ms/pair  "
              f"[compile {ct:.0f}s]", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
