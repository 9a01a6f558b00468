"""Pyramid-cost attribution via FULL chunked runs (no partial
consumption): E1 strided no-blur decimation (accuracy-breaking lower
bound), E2 u16 integer gaussian (no f32 full-res traffic)."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.frontend import tracking as T

ORIG_BUILD = T.build_pyramid


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


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
    print(f"{name:40s} {best:6.2f}s/clip  {1e3 * best / (n_disp * seg):7.3f} ms/pair",
          file=sys.stderr, flush=True)


def pyr_strided(img, levels):
    pyr = [img]
    x = img
    for _ in range(1, levels):
        x = x[..., ::2, ::2]
        pyr.append(x)
    return pyr


def _blur5_u16(x, axis):
    ax = x.ndim - 2 + axis
    pad = [(0, 0)] * x.ndim
    pad[ax] = (2, 2)
    p = jnp.pad(x, pad, mode="edge")
    n = x.shape[ax]

    def sl(off):
        idx = [slice(None)] * x.ndim
        idx[ax] = slice(off, off + n)
        return p[tuple(idx)]

    return sl(0) + 4 * sl(1) + 6 * sl(2) + 4 * sl(3) + sl(4)


def pyr_u16(img, levels):
    # integer [1,4,6,4,1]^2 gaussian: u8 -> u16 through both axes
    # (max 255*16*16 = 65280 fits), decimate, >>8 back to u8
    pyr = [img]
    if levels > 1:
        x = img.astype(jnp.uint16)
        win = (1,) * (x.ndim - 2) + (2, 2)
        s = jax.lax.reduce_window(x, np.uint16(0), jax.lax.add, win, win,
                                  "VALID")
        pyr.append(((s + 2) // 4).astype(jnp.uint8))
    for _ in range(2, levels):
        x = pyr[-1].astype(jnp.uint16)
        b = _blur5_u16(_blur5_u16(x, 0), 1)
        b = b[..., ::2, ::2]
        pyr.append(((b + 128) // 256).astype(jnp.uint8))
    return pyr


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    run("current (f32 gaussian)")
    T.build_pyramid = pyr_strided
    run("E1 strided no-blur (lower bound)")
    T.build_pyramid = pyr_u16
    run("E2 u16 integer gaussian")
    T.build_pyramid = ORIG_BUILD


if __name__ == "__main__":
    main()
