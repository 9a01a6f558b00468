"""Tracking-stage bench: ms/pair on the 2.7k GoPro operating point."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.frontend.tracking import lk_track_video_chunked


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def main():
    H, W = 2028, 2704
    seg = int(sys.argv[1]) if len(sys.argv) > 1 else 240
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    key = jax.random.PRNGKey(0)
    print(f"# device: {jax.devices()[0]} seg={seg} chunk={chunk}",
          file=sys.stderr)
    frames = jax.random.randint(key, (seg + 1, H, W), 0, 255, jnp.uint8)
    fetch(frames)
    t0 = time.time()
    fetch(lk_track_video_chunked(frames, chunk=chunk, grid_step=200))
    print(f"# compile+warmup: {time.time() - t0:.1f}s", file=sys.stderr)

    n_pairs_total = 3599
    n_disp = (n_pairs_total + seg - 1) // seg
    best = np.inf
    for rep in range(2):
        biases = jax.random.randint(
            jax.random.PRNGKey(rep + 1), (n_disp,), 0, 100, jnp.uint8)
        fetch(biases)
        t0 = time.time()
        outs = [
            lk_track_video_chunked(frames + biases[i], chunk=chunk,
                                   grid_step=200)
            for i in range(n_disp)
        ]
        for o in outs:
            fetch(o)
        best = min(best, time.time() - t0)
    print(f"# tracking: {best:.2f}s per 60s clip "
          f"({1e3 * best / (n_disp * seg):.3f} ms/pair)", file=sys.stderr)


if __name__ == "__main__":
    main()
