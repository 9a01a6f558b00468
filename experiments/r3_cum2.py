"""Post-strip-DMA attribution: time the shipped tracker with pieces
of the NEW _lk_level (strip fetch + bf16 narrow) ablated, everything
consumed (no DCE). Splits the remaining ms/pair between pyramid,
coarse, templates, strip fetch, narrowing, and iterations.
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

ORIG_LEVEL = T._lk_level
ORIG_COARSE = T._coarse_init


def fetch(x):
    return np.asarray(x.ravel()[:1])


def make_level(template=True, fetch_strips=True, narrow=True,
               n_iters=None):
    def lk_level(img_a, img_b, pts_level, guess, radius, iters, margin,
                 precision=None):
        if n_iters is not None:
            iters = n_iters
        w = 2 * radius + 1
        B = img_a.shape[0]
        static_grid = (
            isinstance(pts_level, np.ndarray) and pts_level.ndim == 2
            and np.all(pts_level == np.round(pts_level))
        )
        consume = 0.0
        ix = iy = t = None
        if template and static_grid:
            pa = T._extract_patches_static(
                img_a, pts_level - (radius + 1), w + 2)
            pts_level = jnp.asarray(pts_level, jnp.float32)
            if pts_level.ndim == 2:
                pts_level = jnp.broadcast_to(
                    pts_level[None], (B, *pts_level.shape))
            ix = 0.5 * (pa[..., 1:-1, 2:] - pa[..., 1:-1, :-2])
            iy = 0.5 * (pa[..., 2:, 1:-1] - pa[..., :-2, 1:-1])
            t = pa[..., 1:-1, 1:-1]
            gxx = jnp.sum(ix * ix, axis=(-2, -1))
            gxy = jnp.sum(ix * iy, axis=(-2, -1))
            gyy = jnp.sum(iy * iy, axis=(-2, -1))
            det = gxx * gyy - gxy * gxy
            inv_ok = det > 1e-6
            det_safe = jnp.where(inv_ok, det, 1.0)
            consume = consume + 1e-20 * (
                jnp.sum(t) + jnp.sum(det))[None, None, None]
        else:
            pts_level = jnp.asarray(pts_level, jnp.float32)
            if pts_level.ndim == 2:
                pts_level = jnp.broadcast_to(
                    pts_level[None], (B, *pts_level.shape))

        buf = roff = g_frac = None
        if fetch_strips:
            M = margin
            S = w + 2 * M + 2
            Sc = w + 2 * M + 1
            anchor = jnp.floor(pts_level + guess)
            origin = anchor - (radius + M)
            oy = origin[..., 1].astype(jnp.int32)
            ox = origin[..., 0].astype(jnp.int32)
            Hp = img_b.shape[1]
            NB = img_b.shape[2] // T.LANE
            oyq = jnp.clip(oy // 8, 0, (Hp - T.STRIP_ROWS) // 8)
            obx = jnp.clip(ox // T.LANE, 0, NB - 2)
            roff = jnp.clip((oy - oyq * 8).astype(jnp.float32), 0.0,
                            float(T.STRIP_ROWS - S))
            rem = jnp.clip((ox - obx * T.LANE).astype(jnp.float32), 0.0,
                           float(2 * T.LANE - Sc))
            wide = T._gather_strips(img_b, oyq, obx)
            if narrow:
                Cr = T._tap2(rem, Sc, 2 * T.LANE, jnp.bfloat16)
                buf = T._bmm(wide.astype(jnp.bfloat16), Cr, (1, 1))
                consume = consume + 1e-20 * jnp.sum(buf)[None, None, None]
            else:
                consume = consume + 1e-20 * jnp.sum(
                    wide.astype(jnp.float32))[None, None, None]
            g_frac = ((pts_level + guess) - anchor).astype(jnp.float32)

        if template and fetch_strips and narrow and iters > 0:
            M = margin

            def body(_, d_rel):
                z = jnp.clip(g_frac + d_rel, -(M - 1.0), M - 1.0)
                patch_b = T._sample_windows(
                    buf, roff + M + z[..., 1], M + z[..., 0], w, w,
                    precision)
                e = patch_b - t
                bx = jnp.sum(ix * e, axis=(-2, -1))
                by = jnp.sum(iy * e, axis=(-2, -1))
                du = (gyy * bx - gxy * by) / det_safe
                dv = (gxx * by - gxy * bx) / det_safe
                step = jnp.stack([du, dv], axis=-1)
                step = jnp.where(inv_ok[..., None], step, 0.0)
                return jnp.clip(d_rel - step, -(M - 1.0), M - 1.0)

            d_rel = jax.lax.fori_loop(0, iters, body,
                                      jnp.zeros_like(guess))
            return guess + d_rel + consume
        return guess + consume

    return lk_level


def timing(label):
    frames = jax.random.randint(
        jax.random.PRNGKey(0), (SEG + 1, H, W), 0, 255, jnp.uint8)
    fetch(frames)
    T._lk_track_video_chunked_jit.clear_cache()
    t0 = time.time()
    fetch(T.lk_track_video_chunked(frames, chunk=CHUNK, grid_step=200))
    ct = time.time() - t0
    best = np.inf
    for rep in range(3):
        t0 = time.time()
        fetch(T.lk_track_video_chunked(
            frames + jnp.uint8(rep + 1), chunk=CHUNK, grid_step=200))
        best = min(best, time.time() - t0)
    print(f"{label:22s} {best * 1e3 / SEG:7.3f} ms/pair  "
          f"[compile {ct:.0f}s]", file=sys.stderr, flush=True)


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    variants = [
        ("full", dict()),
        ("iters0", dict(n_iters=0)),
        ("nonarrow", dict(narrow=False, n_iters=0)),
        ("nostrips", dict(fetch_strips=False, n_iters=0)),
        ("floor", dict(template=False, fetch_strips=False, n_iters=0)),
        ("notmpl", dict(template=False, n_iters=0)),
    ]
    sel = sys.argv[1:]
    for name, kw in variants:
        if sel and name not in sel:
            continue
        T._lk_level = make_level(**kw)
        try:
            timing(name)
        finally:
            T._lk_level = ORIG_LEVEL

    # coarse ablation with the real level
    T._coarse_init = lambda pyr, lv, lg, p, D: jnp.zeros(
        (pyr[lv][0].shape[0], p.shape[0], 2), jnp.float32)
    try:
        if not sel or "nocoarse" in sel:
            timing("nocoarse")
    finally:
        T._coarse_init = ORIG_COARSE


if __name__ == "__main__":
    main()
