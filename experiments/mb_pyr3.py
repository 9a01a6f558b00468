"""Microbench pyramid construction variants at the 2.7k x17 video-mode
operating point (shared pyramid: 17 frames serve 16 pairs)."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.frontend import tracking as T


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def timed(name, fn, *args, reps=3, pairs=16):
    fn_j = jax.jit(fn)
    fetch(fn_j(*args))
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        fetch(fn_j(*args))
        best = min(best, time.time() - t0)
    print(f"{name:52s} {best * 1e3:9.2f} ms  ({best * 1e3 / pairs:7.3f} ms/pair)",
          file=sys.stderr, flush=True)
    return best


def main():
    H, W = 2028, 2704
    B = 17
    key = jax.random.PRNGKey(0)
    frames = jax.random.randint(key, (B, H, W), 0, 255, jnp.uint8)
    levels = T.auto_levels(H, W)
    print(f"# device: {jax.devices()[0]} levels={levels} B={B}",
          file=sys.stderr)

    def consume(pyr):
        return sum(jnp.sum(x[..., ::64, ::64].astype(jnp.float32)) for x in pyr)

    # the no-op baseline: dispatch + fetch overhead
    timed("noop (dispatch+fetch overhead)", lambda f: jnp.sum(f[0, 0, :4].astype(jnp.float32)), frames)

    # current full pyramid
    timed("build_pyramid (current)", lambda f: consume(T.build_pyramid(f, levels)), frames)
    timed("build_pyramid + pad_lanes (current)",
          lambda f: consume([T._pad_lanes(l) for l in T.build_pyramid(f, levels)]), frames)

    # pieces
    timed("lvl1 avgpool2 only", lambda f: jnp.sum(T._avgpool2(f.astype(jnp.float32))[..., ::64, ::64]), frames)
    timed("lvl1 avgpool2 + u8 cast", lambda f: jnp.sum(jnp.clip(jnp.round(T._avgpool2(f.astype(jnp.float32))), 0, 255).astype(jnp.uint8)[..., ::64, ::64].astype(jnp.float32)), frames)

    def deep_only(f):
        l1 = jnp.clip(jnp.round(T._avgpool2(f.astype(jnp.float32))), 0, 255).astype(jnp.uint8)
        pyr = [l1]
        for _ in range(2, levels):
            pyr.append(jnp.clip(jnp.round(T._downsample2(pyr[-1].astype(jnp.float32))), 0, 255).astype(jnp.uint8))
        return consume(pyr[1:])

    timed("lvl2.. downsample2 chain (on top of lvl1)", deep_only, frames)

    # variant: all-levels avgpool cascade (no gaussian)
    def cascade(f):
        pyr = [f]
        x = f.astype(jnp.float32)
        for _ in range(1, levels):
            x = T._avgpool2(x)
            pyr.append(jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8))
        return consume(pyr)

    timed("avgpool cascade all levels (u8 store)", cascade, frames)

    # variant: avgpool cascade staying f32 (no u8 round-trips)
    def cascade_f32(f):
        pyr = [f]
        x = f.astype(jnp.float32)
        for _ in range(1, levels):
            x = T._avgpool2(x)
            pyr.append(x)
        return consume(pyr)

    timed("avgpool cascade all levels (f32 store)", cascade_f32, frames)

    # variant: blur only on fine levels (1,2), cascade for deep
    def hybrid(f):
        l1 = jnp.clip(jnp.round(T._avgpool2(f.astype(jnp.float32))), 0, 255).astype(jnp.uint8)
        l2 = jnp.clip(jnp.round(T._downsample2(l1.astype(jnp.float32))), 0, 255).astype(jnp.uint8)
        pyr = [f, l1, l2]
        x = l2.astype(jnp.float32)
        for _ in range(3, levels):
            x = T._avgpool2(x)
            pyr.append(jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8))
        return consume(pyr)

    timed("hybrid: blur@2, avgpool deep", hybrid, frames)

    # pad_lanes cost alone at level 0+1
    timed("pad_lanes lvl0 u8", lambda f: jnp.sum(T._pad_lanes(f)[..., ::64, ::64].astype(jnp.float32)), frames)

    # variant: pooled-with-pad: pad first (u8), then pool => all levels lane-sized?
    def pad_first(f):
        fp = T._pad_lanes(f)
        pyr = [fp]
        x = fp.astype(jnp.float32)
        for _ in range(1, levels):
            x = T._avgpool2(x)
            pyr.append(jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8))
        return consume(pyr)

    timed("pad lvl0 first, avgpool cascade", pad_first, frames)


if __name__ == "__main__":
    main()
