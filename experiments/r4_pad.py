"""Why does _pad_lanes cost 0.18 ms/pair (43 ms for a 240-pair clip,
~8% of HBM peak)? Time pad variants on the full u8 clip.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/r4_pad.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

H, W = 2028, 2704
SEG = 240
HP = -(-(H + 24) // 8) * 8  # 2056
WP = -(-W // 128) * 128     # 2816


def fetch(x):
    return np.asarray(x).ravel()[:1]


def timed(label, fn, frames):
    f = jax.jit(fn)
    t0 = time.time()
    fetch(f(frames))
    ct = time.time() - t0
    best = np.inf
    for rep in range(3):
        t0 = time.time()
        fetch(f(frames + jnp.uint8(rep + 1)))
        best = min(best, time.time() - t0)
    print(f"{label:28s} {best * 1e3 / SEG:7.3f} ms/pair  [compile {ct:.0f}s]",
          file=sys.stderr, flush=True)


def main():
    print(f"# device: {jax.devices()[0]}  Hp={HP} Wp={WP}",
          file=sys.stderr, flush=True)
    frames = jax.random.randint(
        jax.random.PRNGKey(0), (SEG + 1, H, W), 0, 255, jnp.uint8)
    fetch(frames)

    def s(x):
        return jnp.sum(x, dtype=jnp.int32).astype(jnp.float32)

    timed("copy (x+1)", lambda fr: s(fr + jnp.uint8(1)), frames)
    timed("pad edge both", lambda fr: s(jnp.pad(
        fr, ((0, 0), (0, HP - H), (0, WP - W)), mode="edge")), frames)
    timed("pad edge rows only", lambda fr: s(jnp.pad(
        fr, ((0, 0), (0, HP - H), (0, 0)), mode="edge")), frames)
    timed("pad edge lanes only", lambda fr: s(jnp.pad(
        fr, ((0, 0), (0, 0), (0, WP - W)), mode="edge")), frames)
    timed("pad const both", lambda fr: s(jnp.pad(
        fr, ((0, 0), (0, HP - H), (0, WP - W)))), frames)

    def concat_pad(fr):
        rows = jnp.repeat(fr[:, -1:, :], HP - H, axis=1)
        x = jnp.concatenate([fr, rows], axis=1)
        cols = jnp.repeat(x[:, :, -1:], WP - W, axis=2)
        return s(jnp.concatenate([x, cols], axis=2))

    timed("concat edge pad", concat_pad, frames)

    def dus_pad(fr):
        out = jnp.zeros((SEG + 1, HP, WP), jnp.uint8)
        out = jax.lax.dynamic_update_slice(out, fr, (0, 0, 0))
        rows = jnp.broadcast_to(fr[:, -1:, :], (SEG + 1, HP - H, W))
        out = jax.lax.dynamic_update_slice(out, rows, (0, H, 0))
        cols = jnp.broadcast_to(out[:, :, W - 1 : W], (SEG + 1, HP, WP - W))
        return s(jax.lax.dynamic_update_slice(out, cols, (0, 0, W)))

    timed("dyn-update-slice pad", dus_pad, frames)


if __name__ == "__main__":
    main()
