"""Bisect the v2 tracker cost at seg=240 by disabling stages
(monkeypatching _fine_plan / _coarse_init), with async pipelining so
tunnel dispatch overhead washes out."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.frontend import tracking as T

ORIG_PLAN = T._fine_plan
ORIG_COARSE = T._coarse_init


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def run(name, seg=240, chunk=16, n_pairs_total=3600):
    H, W = 2028, 2704
    frames = jax.random.randint(jax.random.PRNGKey(0), (seg + 1, H, W), 0, 255,
                                jnp.uint8)
    fetch(frames)
    T._lk_track_video_chunked_jit.clear_cache()
    fetch(T.lk_track_video_chunked(frames, chunk=chunk, grid_step=200))
    n_disp = n_pairs_total // seg
    best = np.inf
    for rep in range(2):
        biases = jax.random.randint(jax.random.PRNGKey(rep + 1), (n_disp,),
                                    0, 100, jnp.uint8)
        fetch(biases)
        t0 = time.time()
        outs = [T.lk_track_video_chunked(frames + biases[i], chunk=chunk,
                                         grid_step=200) for i in range(n_disp)]
        for o in outs:
            fetch(o)
        best = min(best, time.time() - t0)
    print(f"{name:44s} {best:6.2f}s/clip  {1e3 * best / (n_disp * seg):7.3f} ms/pair",
          file=sys.stderr, flush=True)


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    # pyramid only: no coarse, no fine
    T._fine_plan = lambda levels, iters: []
    T._coarse_init = lambda *a, **k: jnp.zeros(
        (a[0][sorted(a[0])[0]][0].shape[0], a[3].shape[0], 2), jnp.float32)
    run("pyramid only")

    # + coarse
    T._coarse_init = ORIG_COARSE
    run("pyramid + coarse")

    # + entry level only
    T._fine_plan = lambda levels, iters: ORIG_PLAN(levels, iters)[:1]
    run("pyr + coarse + entry lvl2")

    # + level 1
    T._fine_plan = lambda levels, iters: ORIG_PLAN(levels, iters)[:2]
    run("pyr + coarse + lvl2 + lvl1")

    # full
    T._fine_plan = ORIG_PLAN
    run("FULL")

    # full, gathers in bf16 buf instead of f32? (just full again w/ seg=720)
    run("FULL seg=720", seg=720)


if __name__ == "__main__":
    main()
