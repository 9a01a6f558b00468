"""Round-3 LK micro-targets, full-run A/B (240 pairs, chunk=16, 2.7k):
the ablation (r3_lk.py) showed fine-l0 0.27 / l2 0.15 / coarse 0.15
ms/pair dominated by FIXED per-level costs (gather + narrowing), not
iterations. Variants here attack those:

  base       - shipped
  narrowbf16 - search-region narrowing matmul in bf16 DEFAULT
               (one-hot x u8-valued pixels: exact)
  u8take     - jnp.take stays u8, cast at the narrowing matmul
  l2rad4     - entry-level radius 6 -> 4 (w 13 -> 9, S 31 -> 27)
  l0m3       - level-0 margin 4 -> 3 (S 31 -> 29)
  vold3      - cost-volume radius 4 -> 3 (81 -> 49 shifts)
  glob4      - global-SAD search D = min(hg)//4 instead of //3
  all        - all of the above
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


def fetch(x):
    return np.asarray(x.ravel()[:1])


ORIG_GATHER = T._gather_blocks
ORIG_LEVEL = T._lk_level
ORIG_PLAN = T._fine_plan
ORIG_CORE = T._lk_core


def gather_u8(imgs, oy, obx, S):
    """Like _gather_blocks but keeps the source dtype (u8 stays u8)."""
    B, Hh, Wp = imgs.shape
    NB = Wp // T.LANE
    src = imgs.reshape(B * Hh * NB, T.LANE)
    rows = jnp.clip(oy[..., None] + jnp.arange(S, dtype=jnp.int32), 0, Hh - 1)
    blk = jnp.clip(
        obx[..., None, None] + jnp.arange(2, dtype=jnp.int32), 0, NB - 1)
    base = jnp.arange(B, dtype=jnp.int32)[:, None, None] * Hh + rows
    idx = base[..., None] * NB + blk
    out = jnp.take(src, idx.reshape(-1), axis=0)
    N = oy.shape[1]
    return out.reshape(B, N, S, 2 * T.LANE)


def make_level(narrow_bf16=False, u8=False, margin_l0=None):
    def lk_level(img_a, img_b, pts_level, guess, radius, iters, margin,
                 precision=None):
        w = 2 * radius + 1
        B = img_a.shape[0]
        if margin_l0 is not None and radius >= 10:
            margin = margin_l0
        if pts_level.ndim == 2:
            pts_level = jnp.broadcast_to(pts_level[None], (B, *pts_level.shape))
        patch_a = T._extract_patches(
            img_a, pts_level - (radius + 1), w + 2,
            precision=jax.lax.Precision.HIGHEST)
        ix = 0.5 * (patch_a[..., 1:-1, 2:] - patch_a[..., 1:-1, :-2])
        iy = 0.5 * (patch_a[..., 2:, 1:-1] - patch_a[..., :-2, 1:-1])
        t = patch_a[..., 1:-1, 1:-1]
        gxx = jnp.sum(ix * ix, axis=(-2, -1))
        gxy = jnp.sum(ix * iy, axis=(-2, -1))
        gyy = jnp.sum(iy * iy, axis=(-2, -1))
        det = gxx * gyy - gxy * gxy
        inv_ok = det > 1e-6
        det_safe = jnp.where(inv_ok, det, 1.0)

        M = margin
        S = w + 2 * M + 2
        Sc = w + 2 * M + 1
        anchor = jnp.floor(pts_level + guess)
        origin = anchor - (radius + M)
        oy = origin[..., 1].astype(jnp.int32)
        ox = origin[..., 0].astype(jnp.int32)
        obx = ox // T.LANE
        rem = (ox - obx * T.LANE).astype(jnp.float32)
        if u8:
            wide = gather_u8(img_b, oy, obx, S)
        else:
            wide = T._gather_blocks(img_b, oy, obx, S)
        if narrow_bf16:
            Cr = T._tap2(rem, Sc, 2 * T.LANE, jnp.bfloat16)
            buf = T._bmm(wide.astype(jnp.bfloat16), Cr, (1, 1))
        else:
            Cr = T._tap2(rem, Sc, 2 * T.LANE)
            buf = T._bmm(wide.astype(jnp.float32), Cr, (1, 1),
                         jax.lax.Precision.HIGHEST)
        g_frac = ((pts_level + guess) - anchor).astype(jnp.float32)

        def body(_, d_rel):
            z = jnp.clip(g_frac + d_rel, -(M - 1.0), M - 1.0)
            patch_b = T._sample_windows(
                buf, M + z[..., 1], M + z[..., 0], w, w, precision)
            e = patch_b - t
            bx = jnp.sum(ix * e, axis=(-2, -1))
            by = jnp.sum(iy * e, axis=(-2, -1))
            du = (gyy * bx - gxy * by) / det_safe
            dv = (gxx * by - gxy * bx) / det_safe
            step = jnp.stack([du, dv], axis=-1)
            step = jnp.where(inv_ok[..., None], step, 0.0)
            return jnp.clip(d_rel - step, -(M - 1.0), M - 1.0)

        d_rel = jax.lax.fori_loop(0, iters, body, jnp.zeros_like(guess))
        return guess + d_rel

    return lk_level


def plan_l2rad4(L, i, r):
    p = ORIG_PLAN(L, i, r)
    return [(lv, it, m, (4 if lv == 2 else rr)) for lv, it, m, rr in p]


def time_variant(frames, pts, label, ref=None):
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
        d = np.abs(np.asarray(out) - ref)
        dev = f"  mean|d-base| {d.mean():8.4f} px  p99 {np.quantile(d, 0.99):.3f}"
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

    variants = sys.argv[1:] or [
        "base", "narrowbf16", "u8take", "l2rad4", "l0m3", "vold3",
        "glob4", "all",
    ]
    ref = None
    for v in variants:
        T._lk_level = ORIG_LEVEL
        T._fine_plan = ORIG_PLAN
        vd, gd = T.VOL_D, None
        if v == "base":
            pass
        elif v == "narrowbf16":
            T._lk_level = make_level(narrow_bf16=True)
        elif v == "u8take":
            T._lk_level = make_level(u8=True)
        elif v == "l2rad4":
            T._fine_plan = plan_l2rad4
        elif v == "l0m3":
            T._lk_level = make_level(margin_l0=3)
        elif v == "vold3":
            T.VOL_D = 3
        elif v == "glob4":
            gd = 4
        elif v == "all":
            T._lk_level = make_level(narrow_bf16=True, u8=True, margin_l0=3)
            T._fine_plan = plan_l2rad4
            T.VOL_D = 3
            gd = 4
        else:
            raise ValueError(v)
        if gd is not None:
            orig_core = ORIG_CORE

            def core_glob(pyr_pairs, pts_, levels, radius, iters, _g=gd):
                plan = T._fine_plan(levels, iters, radius)
                entry = plan[0][0]
                B = pyr_pairs[entry][0].shape[0]
                if levels > entry + 1:
                    lvl_glob = levels - 1
                    lvl_vol = max(entry + 1, lvl_glob - 2)
                    pairs = {
                        lvl: (pyr_pairs[lvl][0].astype(jnp.float32),
                              pyr_pairs[lvl][1].astype(jnp.float32))
                        for lvl in {lvl_glob, lvl_vol}
                    }
                    hg = pyr_pairs[lvl_glob][0].shape[-2:]
                    D_glob = max(2, min(hg) // _g)
                    d = T._coarse_init(pairs, lvl_vol, lvl_glob, pts_, D_glob)
                else:
                    d = jnp.zeros((B,) + pts_.shape, jnp.float32)
                for lvl, it_l, m_l, r_l in plan:
                    scale = float(2**lvl)
                    d = T._lk_level(
                        pyr_pairs[lvl][0], pyr_pairs[lvl][1], pts_ / scale,
                        d / scale, r_l, it_l, m_l,
                        precision=jax.lax.Precision.HIGHEST,
                    ) * scale
                return pts_[None] + d

            T._lk_core = core_glob
        out = time_variant(frames, pts, v, ref if v != "base" else None)
        if v == "base":
            ref = out
        T.VOL_D = vd
        T._lk_core = ORIG_CORE
    T._lk_level = ORIG_LEVEL
    T._fine_plan = ORIG_PLAN


if __name__ == "__main__":
    main()
