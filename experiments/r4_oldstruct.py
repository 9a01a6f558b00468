"""Head-to-head: round-3 per-chunk tracker structure (dynamic_slice
block + per-chunk pyramid/coarse/templates) vs the round-4 hoisted
structure, SAME harness, both on pre-padded frames.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/r4_oldstruct.py
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
LEVELS = 8


def fetch(x):
    return np.asarray(x).ravel()[:1]


@partial(jax.jit, static_argnames=("chunk",))
def old_chunked(frames_p, chunk):
    pts = np.asarray(T.grid_points(W, H, 200), np.float32)
    Tn = frames_p.shape[0]
    n_chunks = (Tn - 1) // chunk
    starts = jnp.arange(n_chunks) * chunk
    Hp, Wp = frames_p.shape[-2:]

    def one(start):
        blk = jax.lax.dynamic_slice(
            frames_p, (start, 0, 0), (chunk + 1, Hp, Wp))
        return T._lk_video_core(blk, pts, LEVELS, T.LK_RADIUS, T.LK_ITERS,
                                logical_hw=(H, W))

    out = jax.lax.map(one, starts)
    return out.reshape(Tn - 1, pts.shape[0], 2)


def timed(label, fn):
    frames = jax.random.randint(
        jax.random.PRNGKey(0),
        (SEG + 1,) + T._stored_dims(H, W, "fine"), 0, 255, jnp.uint8)
    fetch(frames)
    t0 = time.time()
    fetch(fn(frames))
    ct = time.time() - t0
    best = np.inf
    for rep in range(3):
        t0 = time.time()
        fetch(fn(frames + jnp.uint8(rep + 1)))
        best = min(best, time.time() - t0)
    print(f"{label:22s} {best * 1e3 / SEG:7.3f} ms/pair  [compile {ct:.0f}s]",
          file=sys.stderr, flush=True)


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    for chunk in (16, 48):
        timed(f"old-struct chunk={chunk}",
              lambda fr, c=chunk: old_chunked(fr, c))
        timed(f"hoisted   chunk={chunk}",
              lambda fr, c=chunk: T.lk_track_video_chunked(
                  fr, chunk=c, grid_step=200, logical_hw=(H, W)))


if __name__ == "__main__":
    main()
