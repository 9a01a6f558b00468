"""Pipelined tracking-stage timing (bench.py's methodology) with two
dedup-defeat strategies: full-frame +bias add (a ~0.14 ms/pair u8 pass
per dispatch) vs a donated 8-row in-place perturbation.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/r4_bench_track.py
"""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.frontend.tracking import (
    LK_ITERS,
    LK_RADIUS,
    _fine_plan,
    _stored_dims,
    auto_levels,
    lk_track_video_chunked,
)

H, W = 2028, 2704
SEG = 240
N_DISP = 15


def fetch(x):
    return np.asarray(x).ravel()[:1]


@partial(jax.jit, donate_argnums=0)
def perturb(fr, b):
    return fr.at[:, :8, :].add(b)


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    lv = auto_levels(H, W)
    fine0 = 0 in {l for l, *_ in _fine_plan(lv, LK_ITERS, LK_RADIUS)}
    Hp, Wp = _stored_dims(H, W, "fine" if fine0 else "lane")
    frames = jax.random.randint(
        jax.random.PRNGKey(0), (SEG + 1, Hp, Wp), 0, 255, jnp.uint8)
    fetch(frames)
    track = lambda fr: lk_track_video_chunked(
        fr, chunk=16, grid_step=200, logical_hw=(H, W))
    fetch(track(frames))
    biases = jax.random.randint(
        jax.random.PRNGKey(1), (2 * N_DISP,), 0, 100, jnp.uint8)
    fetch(biases)

    # warm the perturb executable
    frames = perturb(frames, biases[0])
    fetch(track(frames))

    for label, mode in (("full-add", 0), ("row-perturb", 1)):
        best = np.inf
        for rep in range(2):
            nonlocal_frames = frames
            t0 = time.time()
            outs = []
            for i in range(N_DISP):
                b = biases[rep * N_DISP + i]
                if mode == 0:
                    outs.append(track(nonlocal_frames + b))
                else:
                    nonlocal_frames = perturb(nonlocal_frames, b)
                    outs.append(track(nonlocal_frames))
            for o in outs:
                fetch(o)
            best = min(best, time.time() - t0)
            frames = nonlocal_frames
        print(f"{label:12s} {best:.3f}s  "
              f"({best * 1e3 / (N_DISP * SEG):.3f} ms/pair)",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
