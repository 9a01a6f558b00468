"""A/B the round-4 hoisted chunked tracker (full-clip pyramid +
templates + coarse init, strip DMA at per-pair frame indices) at the
2.7k operating point. Round-3 baseline: 0.33-0.34 ms/pair.

Usage: python experiments/r4_hoist.py [chunk ...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.frontend.tracking import lk_track_video_chunked

H, W = 2028, 2704
SEG = 240


def fetch(x):
    return np.asarray(x).ravel()[:1]


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    frames = jax.random.randint(
        jax.random.PRNGKey(0), (SEG + 1, H, W), 0, 255, jnp.uint8)
    fetch(frames)
    chunks = [int(c) for c in sys.argv[1:]] or [16]
    for chunk in chunks:
        t0 = time.time()
        fetch(lk_track_video_chunked(frames, chunk=chunk, grid_step=200))
        ct = time.time() - t0
        best = np.inf
        for rep in range(3):
            t0 = time.time()
            fetch(lk_track_video_chunked(
                frames + jnp.uint8(rep + 1), chunk=chunk, grid_step=200))
            best = min(best, time.time() - t0)
        print(f"chunk={chunk:3d}  {best * 1e3 / SEG:7.3f} ms/pair  "
              f"({best:.3f}s/dispatch)  [compile {ct:.0f}s]",
              file=sys.stderr, flush=True)




def prepadded():
    from rssync_tpu.frontend.tracking import (
        LK_ITERS, LK_RADIUS, _fine_plan, _stored_dims, auto_levels)
    lv = auto_levels(H, W)
    fine0 = 0 in {l for l, *_ in _fine_plan(lv, LK_ITERS, LK_RADIUS)}
    Hp, Wp = _stored_dims(H, W, "fine" if fine0 else "lane")
    frames = jax.random.randint(
        jax.random.PRNGKey(0), (SEG + 1, Hp, Wp), 0, 255, jnp.uint8)
    fetch(frames)
    for chunk in [int(c) for c in sys.argv[2:]] or [16]:
        t0 = time.time()
        fetch(lk_track_video_chunked(
            frames, chunk=chunk, grid_step=200, logical_hw=(H, W)))
        ct = time.time() - t0
        best = np.inf
        for rep in range(3):
            t0 = time.time()
            fetch(lk_track_video_chunked(
                frames + jnp.uint8(rep + 1), chunk=chunk, grid_step=200,
                logical_hw=(H, W)))
            best = min(best, time.time() - t0)
        print(f"prepad chunk={chunk:3d}  {best * 1e3 / SEG:7.3f} ms/pair  "
              f"({best:.3f}s/dispatch)  [compile {ct:.0f}s]",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    if sys.argv[1:2] == ["prepad"]:
        prepadded()
    else:
        main()
