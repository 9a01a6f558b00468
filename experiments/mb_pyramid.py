"""Why is the pyramid 4.3 ms/pair? Time each piece at 2.7k x16."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.frontend import tracking as T


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def timed(name, fn, *args, reps=3):
    fn_j = jax.jit(fn)
    fetch(fn_j(*args))
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        fetch(fn_j(*args))
        best = min(best, time.time() - t0)
    print(f"{name:52s} {best * 1e3:9.2f} ms", file=sys.stderr, flush=True)
    return best


def main():
    H, W = 2028, 2704
    B = 16
    key = jax.random.PRNGKey(0)
    frames = jax.random.randint(key, (B, H, W), 0, 255, jnp.uint8)
    frames_f = frames.astype(jnp.float32)
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    def red(x):
        return jnp.sum(x[..., ::32, ::32].astype(jnp.float32))

    timed("baseline: strided sum of input", lambda x: red(x), frames)
    timed("astype f32 full", lambda x: red(x.astype(jnp.float32) * 2), frames)
    timed("avgpool2 (reshape-mean) on f32-cast",
          lambda x: red(T._avgpool2(x.astype(jnp.float32))), frames)
    timed("avgpool via 4 strided slices",
          lambda x: red(
              (x[..., ::2, ::2].astype(jnp.float32)
               + x[..., ::2, 1::2] + x[..., 1::2, ::2] + x[..., 1::2, 1::2])
              * 0.25),
          frames)
    timed("avgpool strided + round-to-u8",
          lambda x: red(jnp.clip(jnp.round(
              (x[..., ::2, ::2].astype(jnp.float32)
               + x[..., ::2, 1::2] + x[..., 1::2, ::2] + x[..., 1::2, 1::2])
              * 0.25), 0, 255).astype(jnp.uint8)),
          frames)
    timed("pad_lanes level0 u8", lambda x: red(T._pad_lanes(x)), frames)
    timed("pad_lanes level0 via concat",
          lambda x: red(jnp.concatenate(
              [x, jnp.broadcast_to(x[..., -1:], x.shape[:-1] + (112,))],
              axis=-1)),
          frames)

    l1 = jax.jit(lambda x: jnp.clip(jnp.round(
        (x[..., ::2, ::2].astype(jnp.float32)
         + x[..., ::2, 1::2] + x[..., 1::2, ::2] + x[..., 1::2, 1::2])
        * 0.25), 0, 255).astype(jnp.uint8))(frames)
    timed("blur5+decimate lvl1->2 (u8 round)",
          lambda x: red(jnp.clip(jnp.round(T._downsample2(
              x.astype(jnp.float32))), 0, 255).astype(jnp.uint8)), l1)

    timed("build_pyramid(8) u8 full",
          lambda x: sum(red(l) for l in T.build_pyramid(x, 8)), frames)
    timed("build_pyramid(8) + pad_lanes all",
          lambda x: sum(red(T._pad_lanes(l))
                        for l in T.build_pyramid(x, 8)), frames)


if __name__ == "__main__":
    main()
