"""What's inside the tracker 'floor' (~0.22 ms/pair with coarse and
fine stages ablated, r3_cum2)? Staged builds of the per-chunk
machinery at the real operating point, everything consumed.
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
LEVELS = 8


def fetch(x):
    return np.asarray(x).ravel()[:1]


def timed(label, fn, frames):
    t0 = time.time()
    fetch(fn(frames))
    ct = time.time() - t0
    best = np.inf
    for rep in range(3):
        t0 = time.time()
        fetch(fn(frames + jnp.uint8(rep + 1)))
        best = min(best, time.time() - t0)
    print(f"{label:18s} {best * 1e3 / SEG:7.3f} ms/pair  "
          f"[compile {ct:.0f}s]", file=sys.stderr, flush=True)


def staged(stage):
    need = T._needed_levels(LEVELS, T.LK_ITERS, T.LK_RADIUS)
    fine = {l for l, *_ in T._fine_plan(LEVELS, T.LK_ITERS, T.LK_RADIUS)}

    @jax.jit
    def fn(frames):
        n_chunks = (frames.shape[0] - 1) // CHUNK
        starts = jnp.arange(n_chunks) * CHUNK

        def one(start):
            blk = jax.lax.dynamic_slice(
                frames, (start, 0, 0), (CHUNK + 1, H, W))
            acc = jnp.float32(0)
            if stage == "slice":
                return acc + jnp.sum(blk, dtype=jnp.int32).astype(
                    jnp.float32)
            pyr = T.build_pyramid_sparse(blk, LEVELS, need)
            if stage == "pyr":
                for l in need:
                    acc += jnp.sum(pyr[l], dtype=jnp.int32).astype(
                        jnp.float32)
                return acc
            pairs = {}
            for l in need:
                padded = T._pad_lanes(pyr[l], l in fine)
                pairs[l] = (padded[:-1], padded[1:])
            if stage == "pad":
                for l in need:
                    acc += jnp.sum(pairs[l][0], dtype=jnp.int32).astype(
                        jnp.float32)
                    acc += jnp.sum(pairs[l][1], dtype=jnp.int32).astype(
                        jnp.float32)
                return acc
            raise ValueError(stage)

        return jax.lax.map(one, starts)

    return fn


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    frames = jax.random.randint(
        jax.random.PRNGKey(0), (SEG + 1, H, W), 0, 255, jnp.uint8)
    fetch(frames)
    sel = sys.argv[1:]
    for stage in ["slice", "pyr", "pad"]:
        if sel and stage not in sel:
            continue
        timed(stage, staged(stage), frames)


if __name__ == "__main__":
    main()
