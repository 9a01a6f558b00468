"""Round-3 coarse/fine schedule A/B: timing on full 240-pair noise
runs AND accuracy on affine-warped textured 2.7k frames with analytic
ground-truth flow. The goal: replace the cost-volume coarse stage +
level-2 entry (0.30 ms/pair combined, r3_lk.py) with a cheaper
global-shift + mid-level-LK schedule without losing capacity.

Ground truth: frame i is sampled from one big smooth texture at
coords A_i(x) (rotation about the frame center + translation), so
the true flow of grid point p between frames i and i+1 is
A_{i+1}^{-1}... careful: we warp SOURCE coords, see code.
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

ORIG_CORE = T._lk_core
ORIG_NEED = T._needed_levels


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def make_core(plan, coarse):
    """coarse: 'full' (global+volume), 'glob' (global only, broadcast
    per point), 'none'."""
    need = sorted({lv for lv, *_ in plan} | ({7} if coarse != "none" else set())
                  | ({5} if coarse == "full" else set()))

    def needed(levels, iters, radius):
        return need

    def core(pyr_pairs, pts, levels, radius, iters):
        entry = plan[0][0]
        B = pyr_pairs[entry][0].shape[0]
        if coarse == "full":
            lvl_glob, lvl_vol = 7, 5
            pairs = {
                lvl: (pyr_pairs[lvl][0].astype(jnp.float32),
                      pyr_pairs[lvl][1].astype(jnp.float32))
                for lvl in {lvl_glob, lvl_vol}
            }
            hg = pyr_pairs[lvl_glob][0].shape[-2:]
            D_glob = max(2, min(hg) // 3)
            d = T._coarse_init(pairs, lvl_vol, lvl_glob, pts, D_glob)
        elif coarse == "glob":
            lvl_glob = 7
            a_g = pyr_pairs[lvl_glob][0].astype(jnp.float32)
            b_g = pyr_pairs[lvl_glob][1].astype(jnp.float32)
            hg = a_g.shape[-2:]
            D_glob = max(2, min(hg) // 3)
            g = T._global_shift(a_g, b_g, D_glob)  # (B, 2) @ lvl_glob
            d = jnp.broadcast_to(
                (g * float(2 ** lvl_glob))[:, None, :],
                (a_g.shape[0], pts.shape[0], 2),
            )
        else:
            d = jnp.zeros((B,) + pts.shape, jnp.float32)
        for lvl, it_l, m_l, r_l in plan:
            scale = float(2 ** lvl)
            d = T._lk_level(
                pyr_pairs[lvl][0], pyr_pairs[lvl][1], pts / scale, d / scale,
                r_l, it_l, m_l, precision=jax.lax.Precision.HIGHEST,
            ) * scale
        return pts[None] + d

    return core, needed


def render_scene(rng, n_frames=49, max_shift=120.0, rot=0.004):
    """Affine-warped frames from one big smooth texture (host,
    scipy). Returns frames (T, H, W) u8 and the list of affines
    mapping OUTPUT pixel -> TEXTURE coords: x_tex = R_i x + t_i."""
    from scipy import ndimage

    pad = int(max_shift * n_frames ** 0.5) + 400
    Hb, Wb = H + 2 * pad, W + 2 * pad
    tex = rng.normal(size=(Hb // 4, Wb // 4)).astype(np.float32)
    tex = ndimage.zoom(tex, 4.0, order=3)[:Hb, :Wb]
    tex = ndimage.gaussian_filter(tex, 1.2)
    tex = (tex - tex.min()) / (tex.max() - tex.min() + 1e-9) * 255.0

    frames = np.empty((n_frames, H, W), np.uint8)
    affines = []
    cx, cy = W / 2, H / 2
    t = np.array([pad + 10.0, pad + 10.0])
    ang = 0.0
    for i in range(n_frames):
        # random walk: mixture of small and large steps
        step = rng.normal() * (3.0 if i % 7 else 60.0)
        dxy = rng.normal(size=2)
        dxy = dxy / (np.linalg.norm(dxy) + 1e-9) * abs(step)
        t = t + dxy
        ang = ang + rng.normal() * rot
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, -s], [s, c]])
        # x_tex = R (x - c0) + c0 + t  for output pixel x
        off = np.array([cy, cx]) - R @ np.array([cy, cx]) + t[::-1]
        frames[i] = np.clip(
            ndimage.affine_transform(tex, R, offset=off, order=1,
                                     output_shape=(H, W)),
            0, 255).astype(np.uint8)
        affines.append((R.copy(), off.copy()))
    return frames, affines


def true_flow(affines, pts):
    """Flow of grid points from frame i to i+1: find x' with
    tex(A_{i+1} x') = tex(A_i x)  =>  x' = A_{i+1}^{-1} A_i x."""
    flows = []
    for (R0, o0), (R1, o1) in zip(affines[:-1], affines[1:]):
        yx = pts[:, ::-1]  # (N, 2) as (y, x)
        tex_yx = yx @ R0.T + o0
        yx1 = (tex_yx - o1) @ np.linalg.inv(R1).T
        flows.append((yx1 - yx)[:, ::-1])  # back to (x, y)
    return np.stack(flows)  # (T-1, N, 2)


def timing(label):
    frames = jax.random.randint(
        jax.random.PRNGKey(0), (SEG + 1, H, W), 0, 255, jnp.uint8)
    fetch(frames)
    T._lk_track_video_chunked_jit.clear_cache()
    t0 = time.time()
    fetch(T.lk_track_video_chunked(frames, chunk=CHUNK, grid_step=200))
    ct = time.time() - t0
    best = np.inf
    for rep in range(2):
        t0 = time.time()
        fetch(T.lk_track_video_chunked(
            frames + jnp.uint8(rep + 1), chunk=CHUNK, grid_step=200))
        best = min(best, time.time() - t0)
    return best * 1e3 / SEG, ct


def accuracy(frames_dev, gt, pts_np):
    T._lk_track_video_chunked_jit.clear_cache()
    out = np.asarray(T.lk_track_video_chunked(
        frames_dev, chunk=CHUNK, grid_step=200))
    flow = out - pts_np[None]
    err = np.linalg.norm(flow - gt, axis=-1)
    # exclude points whose true end position leaves the frame
    end = pts_np[None] + gt
    ok = ((end[..., 0] > 30) & (end[..., 0] < W - 30)
          & (end[..., 1] > 30) & (end[..., 1] < H - 30))
    e = err[ok]
    return np.median(e), np.quantile(e, 0.95), e.max(), ok.mean()


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(5)
    print("# rendering textured scene (host)...", file=sys.stderr, flush=True)
    frames_np, affines = render_scene(rng)
    pts_np = np.asarray(T.grid_points(W, H, 200), np.float32)
    gt = true_flow(affines, pts_np.astype(np.float64)).astype(np.float32)
    frames_dev = jnp.asarray(frames_np)
    fetch(frames_dev)
    print(f"# gt flow magnitude: med "
          f"{np.median(np.linalg.norm(gt, axis=-1)):.1f} px, max "
          f"{np.linalg.norm(gt, axis=-1).max():.1f} px",
          file=sys.stderr, flush=True)

    variants = [
        ("base", None),
        ("glob+l3l0", make_core([(3, 3, 10, 6), (0, 4, 4, 10)], "glob")),
        ("glob+l4l2l0", make_core(
            [(4, 3, 10, 6), (2, 2, 4, 6), (0, 3, 3, 10)], "glob")),
        ("glob+l3l1l0", make_core(
            [(3, 3, 10, 6), (1, 2, 3, 10), (0, 3, 3, 10)], "glob")),
        ("full+l2l0m3", make_core([(2, 2, 8, 6), (0, 4, 3, 10)], "full")),
    ]
    sel = sys.argv[1:]
    for name, patch in variants:
        if sel and name not in sel:
            continue
        if patch is None:
            T._lk_core = ORIG_CORE
            T._needed_levels = ORIG_NEED
        else:
            T._lk_core, T._needed_levels = patch
        med, p95, mx, cov = accuracy(frames_dev, gt, pts_np)
        ms, ct = timing(name)
        print(f"{name:14s} {ms:7.3f} ms/pair  acc: med {med:6.3f} "
              f"p95 {p95:6.3f} max {mx:7.2f} px (cov {cov:.2f}) "
              f"[compile {ct:.0f}s]", file=sys.stderr, flush=True)
    T._lk_core = ORIG_CORE
    T._needed_levels = ORIG_NEED


if __name__ == "__main__":
    main()
