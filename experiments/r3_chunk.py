"""Round-3 chunk-size re-sweep: round 2 fixed chunk=16 when the dense
pyramid dominated; after the sparse composed-matmul pyramid (22a0a9c)
the per-op overheads at B=16 may now dominate, so larger blocks could
amortize them. Times the SHIPPED lk_track_video_chunked at the 2.7k
operating point for several chunk sizes (SEG adjusted to a multiple).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.frontend import tracking as T

H, W = 2028, 2704


def fetch(x):
    return np.asarray(x.ravel()[:1])


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    chunks = [int(c) for c in sys.argv[1:]] or [16, 24, 32, 48, 60]
    for chunk in chunks:
        seg = chunk * max(1, 240 // chunk)
        frames = jax.random.randint(
            jax.random.PRNGKey(0), (seg + 1, H, W), 0, 255, jnp.uint8)
        fetch(frames)
        t0 = time.time()
        fetch(T.lk_track_video_chunked(frames, chunk=chunk, grid_step=200))
        ct = time.time() - t0
        best = np.inf
        for rep in range(3):
            t0 = time.time()
            fetch(T.lk_track_video_chunked(
                frames + jnp.uint8(rep + 1), chunk=chunk, grid_step=200))
            best = min(best, time.time() - t0)
        print(
            f"chunk={chunk:3d} seg={seg:3d}  {best * 1e3 / seg:7.3f} "
            f"ms/pair  [compile {ct:.0f}s]",
            file=sys.stderr, flush=True,
        )


if __name__ == "__main__":
    main()
