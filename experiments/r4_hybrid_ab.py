"""A/B the round-4 HYBRID chunked-tracker structure (per-frame passes
— small-level pyramid + level-0 templates — hoisted out of the chunk
loop; level-0 search reads ride the strip DMA at per-pair frame
indices) against the per-chunk BLOCK structure, both on host-padded
frames at the 2.7k operating point, with bench.py's pipelined
row-perturb methodology.

Context (experiments/r4_chunk_stages.py): the (chunk+1, Hp, Wp) u8
block dynamic_slice alone costs 0.137 ms/pair of the block path's
0.350; the hybrid never copies the full-res block.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    experiments/r4_hybrid_ab.py
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
    biases = jax.random.randint(
        jax.random.PRNGKey(1), (2 * N_DISP,), 0, 100, jnp.uint8)
    fetch(biases)

    sel = sys.argv[1:]
    for label, hyb in (("block", False), ("hybrid", True)):
        if sel and label not in sel:
            continue
        track = lambda fr: lk_track_video_chunked(
            fr, chunk=16, grid_step=200, logical_hw=(H, W), hybrid=hyb)
        t0 = time.time()
        fetch(track(frames))
        ct = time.time() - t0
        frames = perturb(frames, biases[0])
        fetch(track(frames))
        best = np.inf
        for rep in range(2):
            fr = frames
            t0 = time.time()
            outs = []
            for i in range(N_DISP):
                fr = perturb(fr, biases[rep * N_DISP + i])
                outs.append(track(fr))
            for o in outs:
                fetch(o)
            best = min(best, time.time() - t0)
            frames = fr
        print(f"{label:8s} {best:.3f}s  "
              f"({best * 1e3 / (N_DISP * SEG):.3f} ms/pair)  "
              f"[compile {ct:.0f}s]", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
