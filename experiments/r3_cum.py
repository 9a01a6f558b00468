"""Round-3 cumulative fine-level build: time the shipped tracker with
_lk_level progressively truncated, consuming every produced tensor
(sum folded into the output) so nothing is DCE'd. Pinpoints which
piece of the ~0.21 ms/pair/level fine cost is real: template extract,
search gather, narrowing matmul, or iterations.
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


def fetch(x):
    return np.asarray(x.ravel()[:1])


def make_level(template=True, gather=True, narrow=True, n_iters=None,
               prec_extract=None, prec_narrow="highest",
               prec_iter=None):
    def lk_level(img_a, img_b, pts_level, guess, radius, iters, margin,
                 precision=None):
        if n_iters is not None:
            iters = n_iters
        if prec_iter is not None:
            precision = prec_iter
        w = 2 * radius + 1
        B = img_a.shape[0]
        if pts_level.ndim == 2:
            pts_level = jnp.broadcast_to(pts_level[None],
                                         (B, *pts_level.shape))
        consume = 0.0
        ix = iy = t = None
        if template:
            pa = T._extract_patches(
                img_a, pts_level - (radius + 1), w + 2,
                precision=prec_extract or jax.lax.Precision.HIGHEST)
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

        buf = None
        if gather:
            M = margin
            S = w + 2 * M + 2
            Sc = w + 2 * M + 1
            anchor = jnp.floor(pts_level + guess)
            origin = anchor - (radius + M)
            oy = origin[..., 1].astype(jnp.int32)
            ox = origin[..., 0].astype(jnp.int32)
            obx = ox // T.LANE
            rem = (ox - obx * T.LANE).astype(jnp.float32)
            wide = T._gather_blocks(img_b, oy, obx, S)
            if narrow:
                if prec_narrow == "bf16":
                    Cr = T._tap2(rem, Sc, 2 * T.LANE, jnp.bfloat16)
                    buf = T._bmm(wide.astype(jnp.bfloat16), Cr, (1, 1))
                else:
                    Cr = T._tap2(rem, Sc, 2 * T.LANE)
                    buf = T._bmm(wide, Cr, (1, 1),
                                 jax.lax.Precision.HIGHEST)
                consume = consume + 1e-20 * jnp.sum(buf)[None, None, None]
            else:
                consume = consume + 1e-20 * jnp.sum(wide)[None, None, None]
            g_frac = ((pts_level + guess) - anchor).astype(jnp.float32)

        if template and gather and narrow and iters > 0:
            M = margin

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
        ("nogather", dict(gather=False, n_iters=0)),
        ("gatheronly", dict(template=False, n_iters=0)),
        ("narrowbf16", dict(prec_narrow="bf16")),
        ("iterdefault", dict(prec_iter=jax.lax.Precision.DEFAULT,
                             prec_narrow="bf16",
                             prec_extract=jax.lax.Precision.HIGH)),
    ]
    sel = sys.argv[1:]
    for name, kw in variants:
        if sel and name not in sel:
            continue
        T._lk_level = make_level(**kw)
        timing(name)
    T._lk_level = ORIG_LEVEL


if __name__ == "__main__":
    main()
