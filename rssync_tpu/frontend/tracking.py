"""Feature tracking front-end: host video decode + TPU pyramidal
Lucas-Kanade tracking of a fixed feature grid, with rolling-shutter
timestamp assignment and fisheye ray lifting.

Rebuild of `track_frames` (ref: src/core_testcode.cpp:97-162). The
reference runs OpenCV DIS dense optical flow per frame pair on the
host and samples it at a fixed grid (step 200 px starting at
(200, 200)); dense flow over 5.5 MPx is wildly more work than the
~130 tracked points need. The TPU-native design tracks exactly the
grid points with iterative pyramidal LK — every (point, level,
iteration) is a fixed-shape vmapped computation in one jitted call per
frame pair — and fuses the downstream undistort + rolling-shutter
timestamping + unit-ray lifting into the same launch.

A `method="dis"` path (host cv2 DIS at the same grid) is kept for
cross-validation against the reference's tracker choice
(SURVEY §7 step 6).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Iterator

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.ops import lens as lens_ops

# LK parameters. Pyramid depth is auto-scaled to the image: LK locks
# when the coarsest-level displacement is within the feature scale
# (~4 px), so depth L gives ~4 * 2^(L-1) px of displacement capacity;
# we deepen until the coarsest level is ~24 px across. For 2.7k GoPro
# frames that is 7 levels ~= 250 px inter-frame motion capacity.
LK_MIN_COARSE = 24
# depth capped at 6: with the LK_MARGIN=8 search buffer the coarsest
# level still covers (8-1) * 2^5 = 224 px of inter-frame motion at
# 2.7k, and each level costs two per-point slicing rounds
LK_MAX_LEVELS = 6
LK_RADIUS = 10  # 21x21 window
LK_ITERS = 10


def auto_levels(height: int, width: int) -> int:
    import math

    m = min(height, width)
    return max(1, min(LK_MAX_LEVELS, int(math.floor(math.log2(m / LK_MIN_COARSE))) + 1))


def auto_grid_step(width: int) -> int:
    """The reference hardcodes step=200 px for 2704-wide GoPro frames
    (ref: core_testcode.cpp:127); scale that density with resolution
    (exactly 200 at 2704) with a floor for small frames."""
    return max(40, round(200 * width / 2704))


def grid_points(width: int, height: int, step: int | None = None) -> np.ndarray:
    """The reference's sampling grid: x-major from (step, step)
    (ref: core_testcode.cpp:125-132)."""
    if step is None:
        step = auto_grid_step(width)
    pts = [
        [float(i), float(j)]
        for i in range(step, width, step)
        for j in range(step, height, step)
    ]
    return np.asarray(pts, np.float64)


# ---------------------------------------------------------------------------
# device-side LK


def _blur5(img: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Separable 5-tap Gaussian [1 4 6 4 1]/16 with edge padding over
    one of the last two (spatial) axes; leading axes are batch."""
    ax = img.ndim - 2 + axis  # axis 0 -> rows, 1 -> cols
    pad = [(0, 0)] * img.ndim
    pad[ax] = (2, 2)
    p = jnp.pad(img, pad, mode="edge")
    n = img.shape[ax]

    def sl(off):
        idx = [slice(None)] * img.ndim
        idx[ax] = slice(off, off + n)
        return p[tuple(idx)]

    return (sl(0) + 4.0 * sl(1) + 6.0 * sl(2) + 4.0 * sl(3) + sl(4)) / 16.0


def _downsample2(img: jnp.ndarray) -> jnp.ndarray:
    """Gaussian blur + 2x decimation (anti-aliased pyramid level, like
    cv2.pyrDown). Plain 2x2 pooling aliases high-frequency texture and
    breaks coarse-level LK for large motions."""
    img = _blur5(_blur5(img, 0), 1)
    return img[..., ::2, ::2]


def _avgpool2(img: jnp.ndarray) -> jnp.ndarray:
    H, W = img.shape[-2], img.shape[-1]
    H2, W2 = H // 2, W // 2
    x = img[..., : H2 * 2, : W2 * 2]
    x = x.reshape(*x.shape[:-2], H2, 2, W2, 2)
    return x.mean(axis=(-3, -1))


def build_pyramid(img: jnp.ndarray, levels: int) -> list[jnp.ndarray]:
    """Image pyramid, HBM-traffic-minimal.

    - level 0 keeps the input dtype (u8 from the decoder: no 4x f32
      blow-up of the full-res frame; patches convert to f32 after
      extraction, where they are tiny)
    - level 1 is a 2x2 average (the 5-tap blur at full res costs ~4x
      the whole rest of the pyramid; a box filter antialiases enough
      for LK on natural images), stored bf16
    - deeper levels use the 5-tap Gaussian, stored bf16 (coarse levels
      only steer the search; the f32 final refinement happens at
      level 0)
    """
    pyr = [img]
    if levels > 1:
        pyr.append(_avgpool2(img.astype(jnp.float32)).astype(jnp.bfloat16))
    for _ in range(2, levels):
        pyr.append(_downsample2(pyr[-1].astype(jnp.float32)).astype(jnp.bfloat16))
    return pyr


def _bilinear_patches(img: jnp.ndarray, centers: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Sample (2r+1)^2 windows at fractional centers.

    img: (H, W); centers: (N, 2) xy. Returns (N, 2r+1, 2r+1).

    TPU-shaped implementation: an LK window is RIGID, so every pixel of
    a patch shares the point's single fractional offset. Each patch is
    one `dynamic_slice` of (w+1, w+1) at the integer origin (a block
    transfer the hardware is good at) blended by 4 scalar weights —
    per-element gathers (jnp.take of scattered indices) run ~100M
    elem/s on TPU and made tracking 100x slower than this.

    Near the border dynamic_slice clamps the slice start, which shifts
    the window instead of clamp-padding it; sync feature grids stay
    interior so the difference is immaterial.
    """
    w = 2 * radius + 1
    start = centers - radius  # (N, 2) xy of patch origin
    base = jnp.floor(start)
    frac = start - base  # (N, 2) in [0, 1)

    def one(origin_xy):
        return jax.lax.dynamic_slice(
            img,
            (origin_xy[1].astype(jnp.int32), origin_xy[0].astype(jnp.int32)),
            (w + 1, w + 1),
        )

    big = jax.vmap(one)(base).astype(jnp.float32)  # (N, w+1, w+1)
    frac = frac.astype(jnp.float32)
    fx = frac[:, 0, None, None]
    fy = frac[:, 1, None, None]
    return (
        big[:, :-1, :-1] * (1 - fx) * (1 - fy)
        + big[:, :-1, 1:] * fx * (1 - fy)
        + big[:, 1:, :-1] * (1 - fx) * fy
        + big[:, 1:, 1:] * fx * fy
    )


#: search-buffer margin: LK iterations may move the displacement up to
#: +-(MARGIN-1) px away from the incoming guess within one level.
#: Coarse-to-fine guesses are within a few px, so interior levels use
#: LK_MARGIN_FINE; the coarsest level starts from guess 0 and gets the
#: full LK_MARGIN (its margin bounds total displacement capacity).
LK_MARGIN = 8
LK_MARGIN_FINE = 4


def _level_schedule(lvl: int, levels: int, iters: int) -> tuple[int, int]:
    """(iterations, margin) per pyramid level: full iterations at the
    finest level (subpixel accuracy) and at the coarsest (it pulls the
    track in from a zero guess across the full margin); intermediate
    levels only need to land within ~1 px for the next level's margin."""
    margin = LK_MARGIN if lvl == levels - 1 else LK_MARGIN_FINE
    if lvl == 0 or lvl == levels - 1:
        return iters, margin
    if lvl == 1:
        return max(1, min(iters, 6)), margin
    return max(1, min(iters, 4)), margin


def _static_template_patches(imgs, pts_level_np, radius: int):
    """Template patches for a STATIC feature grid, gather-free.

    imgs: (B, Hp, Wp) one (padded) pyramid level for the B `img_a`
    frames. pts_level_np: (N, 2) numpy — compile-time constants on a
    full rectangular grid (Gx distinct x, Gy distinct y, x-major
    order). Returns (B, N, 2r+3, 2r+3) f32, numerically identical to
    `_bilinear_patches(imgs[b], pts_level, radius + 1)`.

    Because origins are static, extraction needs NO per-point dynamic
    slices (~3 us each on TPU): rows come from Gy static strip slices,
    columns from one constant one-hot matmul on the MXU, and the
    bilinear blend uses per-column/per-row constant fractions.
    """
    B, Hp, Wp = imgs.shape
    w2 = 2 * (radius + 1) + 1  # blended patch side
    S_t = w2 + 1  # superset side for the 4-tap blend

    start = np.asarray(pts_level_np, np.float64) - (radius + 1)
    base = np.floor(start).astype(np.int64)
    frac = (start - base).astype(np.float32)  # (N, 2)

    xs = np.unique(base[:, 0])
    ys = np.unique(base[:, 1])
    Gx, Gy = len(xs), len(ys)
    if Gx * Gy != len(base):
        raise ValueError("static template grid must be rectangular")
    # x-major point order check: n = ix * Gy + iy
    expect = np.stack(
        [np.repeat(xs, Gy), np.tile(ys, Gx)], axis=1
    )
    if not np.array_equal(base, expect):
        raise ValueError("static template grid must be x-major ordered")

    ys_c = np.clip(ys, 0, Hp - S_t)
    xs_c = np.clip(xs, 0, Wp - S_t)

    strips = jnp.concatenate(
        [imgs[:, oy : oy + S_t, :] for oy in ys_c], axis=1
    ).astype(jnp.float32)  # (B, Gy*S_t, Wp)
    # constant one-hot column selector
    C = np.zeros((Wp, Gx * S_t), np.float32)
    for g, ox in enumerate(xs_c):
        for j in range(S_t):
            C[ox + j, g * S_t + j] = 1.0
    big = strips @ jnp.asarray(C)  # (B, Gy*S_t, Gx*S_t)
    big = big.reshape(B, Gy, S_t, Gx, S_t)
    big = jnp.transpose(big, (0, 3, 1, 2, 4)).reshape(B, Gx * Gy, S_t, S_t)

    fx = jnp.asarray(frac[:, 0])[None, :, None, None]
    fy = jnp.asarray(frac[:, 1])[None, :, None, None]
    return (
        big[:, :, :-1, :-1] * (1 - fx) * (1 - fy)
        + big[:, :, :-1, 1:] * fx * (1 - fy)
        + big[:, :, 1:, :-1] * (1 - fx) * fy
        + big[:, :, 1:, 1:] * fx * fy
    )


def _lk_level(img_a, img_b, pts_level, guess, radius: int, iters: int,
              template=None, margin: int = LK_MARGIN):
    """One pyramid level of iterative LK for all points.

    img_a/img_b must be EDGE-PADDED per _pad_level and pts_level offset
    accordingly. pts_level: (N, 2) positions in this level's (padded)
    coordinates. guess: (N, 2) incoming displacement. Returns (N, 2).

    TPU structure: exactly TWO rounds of per-point slicing from the
    level image — the template (image A) and one (2*MARGIN + w + 1)^2
    search buffer around the guess (image B). The iteration loop never
    touches the image again: the integer part of each point's offset
    selects among (2*MARGIN+1)^2 STATIC slices of its resident buffer
    (fused VPU selects), the fraction is a 4-tap blend. Per-point
    dynamic slices cost ~1.5 us each on TPU, so the previous
    extract-per-iteration design was ~6x more expensive.
    """
    w = 2 * radius + 1
    # template patch + gradients from image A (fixed over iterations);
    # precomputed gather-free for static grids (template=...)
    patch_a = (
        template
        if template is not None
        else _bilinear_patches(img_a, pts_level, radius + 1)
    )  # (N, w+2, w+2)
    ix = 0.5 * (patch_a[:, 1:-1, 2:] - patch_a[:, 1:-1, :-2])
    iy = 0.5 * (patch_a[:, 2:, 1:-1] - patch_a[:, :-2, 1:-1])
    t = patch_a[:, 1:-1, 1:-1]
    gxx = jnp.sum(ix * ix, axis=(1, 2))
    gxy = jnp.sum(ix * iy, axis=(1, 2))
    gyy = jnp.sum(iy * iy, axis=(1, 2))
    det = gxx * gyy - gxy * gxy
    inv_ok = det > 1e-6
    det_safe = jnp.where(inv_ok, det, 1.0)

    # resident search buffer around the incoming guess:
    # buf[n, k, l] = img_b[oy + k, ox + l] with (ox, oy) =
    # floor(pts + guess) - radius - margin
    M = margin
    S = w + 2 * M + 2
    anchor = jnp.floor(pts_level + guess)  # (N, 2) int-valued
    origin = anchor - (radius + M)

    def one(o):
        return jax.lax.dynamic_slice(
            img_b, (o[1].astype(jnp.int32), o[0].astype(jnp.int32)), (S, S)
        )

    buf = jax.vmap(one)(origin).astype(jnp.float32)  # (N, S, S)
    g_frac = ((pts_level + guess) - anchor).astype(jnp.float32)  # in [0, 1)

    def body(_, d_rel):
        # sample positions: pts + guess + d_rel + [-r .. r+1]
        # buffer coords: (M + g_frac + d_rel) + [0 .. w+1]
        z = g_frac + d_rel  # (N, 2)
        zi = jnp.clip(jnp.floor(z), -M, M)
        zf = z - zi  # (N, 2) in [0, 1) when unclamped
        sel_y = (zi[:, 1] + M).astype(jnp.int32)  # 0 .. 2M
        sel_x = (zi[:, 0] + M).astype(jnp.int32)
        # separable shift-select: rows then columns — 2*(2M+1) fused
        # terms instead of (2M+1)^2 (the joint form defeats XLA's
        # fusion staging and re-reads the buffer from HBM per term)
        rows = jnp.zeros((buf.shape[0], w + 1, buf.shape[2]), buf.dtype)
        for dy in range(2 * M + 1):
            hit = (sel_y == dy)[:, None, None]
            rows = rows + jnp.where(hit, buf[:, dy : dy + w + 1, :], 0.0)
        big = jnp.zeros((buf.shape[0], w + 1, w + 1), buf.dtype)
        for dx in range(2 * M + 1):
            hit = (sel_x == dx)[:, None, None]
            big = big + jnp.where(hit, rows[:, :, dx : dx + w + 1], 0.0)
        fx = zf[:, 0, None, None]
        fy = zf[:, 1, None, None]
        patch_b = (
            big[:, :-1, :-1] * (1 - fx) * (1 - fy)
            + big[:, :-1, 1:] * fx * (1 - fy)
            + big[:, 1:, :-1] * (1 - fx) * fy
            + big[:, 1:, 1:] * fx * fy
        )
        e = patch_b - t
        bx = jnp.sum(ix * e, axis=(1, 2))
        by = jnp.sum(iy * e, axis=(1, 2))
        du = (gyy * bx - gxy * by) / det_safe
        dv = (gxx * by - gxy * bx) / det_safe
        step = jnp.stack([du, dv], axis=-1)
        step = jnp.where(inv_ok[:, None], step, 0.0)
        d_new = d_rel - step
        # keep the iterate inside the resident buffer
        return jnp.clip(d_new, -(M - 1.0), M - 1.0)

    d_rel = jax.lax.fori_loop(0, iters, body, jnp.zeros_like(guess))
    return guess + d_rel


def lk_track(
    img_a: jnp.ndarray,
    img_b: jnp.ndarray,
    pts: jnp.ndarray,
    levels: int | None = None,
    radius: int = LK_RADIUS,
    iters: int = LK_ITERS,
) -> jnp.ndarray:
    """Track points from img_a to img_b. pts: (N, 2) xy pixels.
    Returns tracked (N, 2) positions in img_b. levels=None auto-scales
    pyramid depth to the image size."""
    if levels is None:
        levels = auto_levels(img_a.shape[0], img_a.shape[1])
    return _lk_track_jit(img_a, img_b, pts, levels, radius, iters)


def lk_track_pairs(
    imgs_a: jnp.ndarray,
    imgs_b: jnp.ndarray,
    pts: jnp.ndarray,
    levels: int | None = None,
    radius: int = LK_RADIUS,
    iters: int = LK_ITERS,
) -> jnp.ndarray:
    """Batched tracking of independent pairs: (B, H, W) x2 -> (B, N, 2).
    For consecutive video frames prefer lk_track_video (shares each
    frame's pyramid between its two pairs)."""
    if levels is None:
        levels = auto_levels(imgs_a.shape[1], imgs_a.shape[2])
    return _lk_track_pairs_jit(imgs_a, imgs_b, pts, levels, radius, iters)


@partial(jax.jit, static_argnames=("levels", "radius", "iters"))
def _lk_track_pairs_jit(imgs_a, imgs_b, pts, levels, radius, iters):
    return jax.vmap(
        lambda a, b: _lk_track_jit(a, b, pts, levels, radius, iters)
    )(imgs_a, imgs_b)


def lk_track_video(
    frames: jnp.ndarray,
    pts: jnp.ndarray | None = None,
    levels: int | None = None,
    radius: int = LK_RADIUS,
    iters: int = LK_ITERS,
    grid_step: int | None = None,
) -> jnp.ndarray:
    """Track the shared grid across all consecutive pairs of a frame
    block: (B, H, W) -> (B-1, N, 2). Each frame's pyramid is built
    once (the pair-wise API rebuilds interior frames' pyramids twice —
    pyramid construction dominates tracking HBM traffic). u8 input is
    converted on device (4x less host->device transfer).

    pts=None uses the reference feature grid (grid_step; auto from the
    resolution) as a COMPILE-TIME constant, enabling the gather-free
    static template extraction; an explicit pts array takes the
    dynamic path."""
    if levels is None:
        levels = auto_levels(frames.shape[1], frames.shape[2])
    if pts is None:
        step = grid_step or auto_grid_step(frames.shape[2])
        grid = (frames.shape[2], frames.shape[1], step)
        return _lk_track_video_static_jit(frames, grid, levels, radius, iters)
    return _lk_track_video_jit(frames, pts, levels, radius, iters)


@partial(jax.jit, static_argnames=("grid", "levels", "radius", "iters"))
def _lk_track_video_static_jit(frames, grid, levels, radius, iters):
    static_pts = grid_points(*grid)
    pts = jnp.asarray(static_pts, jnp.float32)
    return _lk_track_video_core(
        frames, pts, levels, radius, iters, static_pts=static_pts
    )


def _lk_track_video_core(frames, pts, levels, radius, iters, static_pts=None):
    # one pyramid + (small-level) edge-pad per FRAME (serves 2 pairs)
    pyr = [_pad_level(l, radius) for l in build_pyramid(frames, levels)]
    B = frames.shape[0]
    d = jnp.zeros((B - 1,) + pts.shape, jnp.float32)
    for lvl in range(levels - 1, -1, -1):
        scale = jnp.float32(2.0**lvl)
        imgs, pad = pyr[lvl]
        it_l, m_l = _level_schedule(lvl, levels, iters)
        templates = None
        if static_pts is not None:
            # gather-free template extraction for compile-time grids
            try:
                templates = _static_template_patches(
                    imgs[:-1], static_pts / (2.0**lvl) + pad, radius
                )
            except ValueError:
                templates = None
        if templates is None:
            lk = jax.vmap(
                lambda a, b, g: _lk_level(
                    a, b, pts / scale + pad, g, radius, it_l, margin=m_l
                ),
                in_axes=(0, 0, 0),
            )
            d = lk(imgs[:-1], imgs[1:], d / scale) * scale
        else:
            lk = jax.vmap(
                lambda a, b, g, t: _lk_level(
                    a, b, pts / scale + pad, g, radius, it_l, t, margin=m_l
                ),
                in_axes=(0, 0, 0, 0),
            )
            d = lk(imgs[:-1], imgs[1:], d / scale, templates) * scale
    return pts[None] + d


@partial(jax.jit, static_argnames=("levels", "radius", "iters"))
def _lk_track_video_jit(frames, pts, levels, radius, iters):
    return _lk_track_video_core(frames, pts, levels, radius, iters)


def lk_track_video_chunked(
    frames: jnp.ndarray,
    pts: jnp.ndarray | None = None,
    chunk: int = 16,
    levels: int | None = None,
    radius: int = LK_RADIUS,
    iters: int = LK_ITERS,
    grid_step: int | None = None,
) -> jnp.ndarray:
    """Track (T, H, W) consecutive frames -> (T-1, N, 2) in ONE
    dispatch: `lax.map` over chunk-sized blocks inside the jit. The
    remote-dispatch overhead of this environment is ~30 ms per call —
    per-block dispatching dominates wall-clock for long clips.
    Requires (T-1) % chunk == 0 (callers pad by repeating the last
    frame; repeated frames track to zero flow). pts=None: static-grid
    fast path (see lk_track_video)."""
    if levels is None:
        levels = auto_levels(frames.shape[1], frames.shape[2])
    T = frames.shape[0]
    if (T - 1) % chunk:
        raise ValueError(f"(T-1)={T - 1} must be a multiple of chunk={chunk}")
    if pts is None:
        step = grid_step or auto_grid_step(frames.shape[2])
        grid = (frames.shape[2], frames.shape[1], step)
        return _lk_track_video_chunked_jit(
            frames, None, chunk, levels, radius, iters, grid
        )
    return _lk_track_video_chunked_jit(
        frames, pts, chunk, levels, radius, iters, None
    )


@partial(jax.jit, static_argnames=("chunk", "levels", "radius", "iters", "grid"))
def _lk_track_video_chunked_jit(frames, pts, chunk, levels, radius, iters, grid=None):
    T, H, W = frames.shape
    n_chunks = (T - 1) // chunk
    starts = jnp.arange(n_chunks) * chunk
    static_pts = grid_points(*grid) if grid is not None else None
    if pts is None:
        pts = jnp.asarray(static_pts, jnp.float32)

    def one(start):
        blk = jax.lax.dynamic_slice(frames, (start, 0, 0), (chunk + 1, H, W))
        return _lk_track_video_core(
            blk, pts, levels, radius, iters, static_pts=static_pts
        )

    out = jax.lax.map(one, starts)  # (n_chunks, chunk, N, 2)
    return out.reshape(T - 1, pts.shape[0], 2)


#: levels whose min dimension exceeds this skip the edge-pad copy:
#: copying a padded full-res image would double the pyramid's HBM
#: traffic, and at fine levels the feature grid's own margin keeps
#: windows interior (dynamic_slice clamping can then only affect
#: tracks that wander to the border — absorbed by the robust loss).
PAD_MAX_DIM = 512


def _pad_level(img: jnp.ndarray, radius: int) -> tuple[jnp.ndarray, int]:
    """Edge-pad small pyramid levels; returns (image, applied_pad).
    The pad must cover the search-buffer extent (radius + LK_MARGIN)."""
    if min(img.shape[-2], img.shape[-1]) > PAD_MAX_DIM:
        return img, 0
    pad = radius + LK_MARGIN + 2
    cfg = [(0, 0)] * (img.ndim - 2) + [(pad, pad), (pad, pad)]
    return jnp.pad(img, cfg, mode="edge"), pad


@partial(jax.jit, static_argnames=("levels", "radius", "iters"))
def _lk_track_jit(
    img_a: jnp.ndarray,
    img_b: jnp.ndarray,
    pts: jnp.ndarray,
    levels: int,
    radius: int,
    iters: int,
) -> jnp.ndarray:
    pyr_a = [_pad_level(l, radius) for l in build_pyramid(img_a, levels)]
    pyr_b = [_pad_level(l, radius) for l in build_pyramid(img_b, levels)]
    d = jnp.zeros_like(pts, dtype=jnp.float32)
    for lvl in range(levels - 1, -1, -1):
        scale = 2.0**lvl
        (a, pad), (b, _) = pyr_a[lvl], pyr_b[lvl]
        it_l, m_l = _level_schedule(lvl, levels, iters)
        d = _lk_level(
            a, b, pts / scale + pad, d / scale, radius, it_l, margin=m_l
        ) * scale
    return pts + d


# ---------------------------------------------------------------------------
# fused post-processing: undistort + RS timestamps + ray lifting


@partial(jax.jit, static_argnames=("lens",))
def lift_rays(lens: lens_ops.Lens, pts_a: jnp.ndarray, pts_b: jnp.ndarray):
    """Undistort both endpoints and lift to unit rays
    normalize([x, y, 1]) (ref: core_testcode.cpp:147-152). Device side."""
    ua = lens_ops.undistort_points(lens, pts_a)
    ub = lens_ops.undistort_points(lens, pts_b)
    return lens_ops.rays_from_normalized(ua), lens_ops.rays_from_normalized(ub)


def rolling_shutter_ts(
    lens: lens_ops.Lens,
    pts_a: np.ndarray,
    pts_b: np.ndarray,
    ts_frame_a: float,
    ts_frame_b: float,
    rows: int,
):
    """Per-ray rolling-shutter timestamps from each endpoint's own row —
    including the *tracked* row for frame B
    (ref: core_testcode.cpp:144-145). Host f64: frame timestamps are
    ~minutes-scale and must keep sub-µs resolution."""
    ts_a = ts_frame_a + lens.ro * (np.asarray(pts_a, np.float64)[:, 1] / rows)
    ts_b = ts_frame_b + lens.ro * (np.asarray(pts_b, np.float64)[:, 1] / rows)
    return ts_a, ts_b


# ---------------------------------------------------------------------------
# host video decode


@dataclass
class Frame:
    index: int
    timestamp: float  # seconds
    gray: np.ndarray  # (H, W) uint8


class VideoSource:
    """cv2-backed host decoder (the reference's VideoCapture usage,
    ref: core_testcode.cpp:99-122)."""

    def __init__(self, path: str):
        import cv2

        self._cv2 = cv2
        self.cap = cv2.VideoCapture(path)
        if not self.cap.isOpened():
            raise RuntimeError("video open failed")
        self.fps = self.cap.get(cv2.CAP_PROP_FPS)
        self.width = int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT))

    def seek(self, frame: int) -> None:
        self.cap.set(self._cv2.CAP_PROP_POS_FRAMES, frame)
        if self.cap.get(self._cv2.CAP_PROP_POS_FRAMES) != frame:
            raise RuntimeError("Seek failed")

    def frames(self, start: int, stop: int) -> Iterator[Frame]:
        self.seek(start)
        for idx in range(start, stop):
            ok, img = self.cap.read()
            if not ok:
                raise RuntimeError("frame read failed")
            ts = self.cap.get(self._cv2.CAP_PROP_POS_MSEC) / 1000.0
            gray = self._cv2.cvtColor(img, self._cv2.COLOR_BGR2GRAY)
            yield Frame(index=idx, timestamp=ts, gray=gray)


# ---------------------------------------------------------------------------
# full tracking stage


#: frames per device tracking launch (block + 1 frames resident;
#: 2.7k f32 pyramids are ~29 MB/frame so 16 frames ~ 0.5 GB)
TRACK_BLOCK = 16


def track_frames(
    problem,
    lens: lens_ops.Lens,
    video_path: str,
    frame_begin: int,
    frame_end: int,
    grid_step: int | None = None,
    method: str = "lk",
    progress: bool = False,
    block: int = TRACK_BLOCK,
) -> None:
    """Track every consecutive frame pair in [frame_begin, frame_end)
    and feed `problem.set_track_result` (ref: core_testcode.cpp:97-162).

    method: "lk" (TPU pyramidal LK, default: frames decode on host in
    blocks, ship as u8, and every block's pairs track in one launch
    with per-frame pyramids shared) or "dis" (host cv2 DIS dense flow
    sampled at the grid — the reference's tracker, for cross-validation).
    """
    src = VideoSource(video_path)
    pts = grid_points(src.width, src.height, grid_step)
    pts_j = jnp.asarray(pts, jnp.float32)

    def emit(frame_idx, tracked, ts_cur, ts_nxt):
        rays_a, rays_b = lift_rays(
            lens, pts_j, jnp.asarray(tracked, jnp.float32)
        )
        ts_a, ts_b = rolling_shutter_ts(
            lens, pts, tracked, ts_cur, ts_nxt, src.height
        )
        problem.set_track_result(
            frame_idx,
            np.asarray(ts_a, np.float64),
            np.asarray(ts_b, np.float64),
            np.asarray(rays_a, np.float64),
            np.asarray(rays_b, np.float64),
        )

    if method == "dis":
        import cv2

        dis = cv2.DISOpticalFlow.create()
        it = src.frames(frame_begin, frame_end + 1)
        cur = next(it)
        for nxt in it:
            if progress:
                print(f"processing frame {cur.index}", flush=True)
            flow = dis.calc(cur.gray, nxt.gray, None)
            ij = pts.astype(int)
            tracked = pts + flow[ij[:, 1], ij[:, 0]]
            emit(cur.index, tracked, cur.timestamp, nxt.timestamp)
            cur = nxt
        return
    if method != "lk":
        raise ValueError(f"unknown tracking method {method!r}")

    it = src.frames(frame_begin, frame_end + 1)
    carry: Frame | None = None
    done = False
    while not done:
        frames = [carry] if carry is not None else []
        while len(frames) < block + 1:
            try:
                frames.append(next(it))
            except StopIteration:
                done = True
                break
        if len(frames) < 2:
            break
        if progress:
            print(
                f"processing frames {frames[0].index}..{frames[-1].index - 1}",
                flush=True,
            )
        stack = jnp.asarray(np.stack([f.gray for f in frames]))  # u8 on device
        tracked_all = np.asarray(
            lk_track_video(
                stack, grid_step=grid_step or auto_grid_step(src.width)
            )
        )
        for i in range(len(frames) - 1):
            emit(
                frames[i].index,
                tracked_all[i],
                frames[i].timestamp,
                frames[i + 1].timestamp,
            )
        carry = frames[-1]
