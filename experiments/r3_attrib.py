"""Round-3 tracker attribution: FULL-RUN deletion A/B at the real
operating point (240 pairs per dispatch, chunk=16 lax.map, 2.7k u8
frames). Round 2's partial-consumption stage benches were DCE-polluted
(see memory/axon-bench-method.md); here every variant is a complete
chunked dispatch whose output is fully consumed, and stage costs are
obtained by DELETING work from the full run:

  full       = pyramid + coarse + fine(l2) + fine(l0)
  nocoarse   = pyramid + fine (coarse replaced by zero init)
  coarseonly = pyramid + coarse (fine plan skipped)
  pyronly    = pyramid alone (each level consumed by a full sum)
  finel0     = pyramid + coarse + fine(l0) only
  finel2     = pyramid + coarse + fine(l2) only

Differences between rows attribute time to the deleted stage under the
same fusion regime as the shipped path (not exactly — deletion changes
fusion opportunities — but it is the only trustworthy signal on this
backend: jax.profiler hangs, and microbenches get DCE'd).
"""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.frontend import tracking as T


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


H, W = 2028, 2704
SEG = 240
CHUNK = 16
LEVELS = T.auto_levels(H, W)
PTS = jnp.asarray(T.grid_points(W, H, 200), jnp.float32)


def _variant_core(pyr_pairs, pts, mode):
    B = pyr_pairs[0][0].shape[0]
    plan = T._fine_plan(LEVELS, T.LK_ITERS, T.LK_RADIUS)
    entry = plan[0][0]

    if mode == "pyronly":
        return sum(
            jnp.sum(a.astype(jnp.float32)) + jnp.sum(b.astype(jnp.float32))
            for a, b in pyr_pairs
        ) * jnp.ones((B, pts.shape[0], 2), jnp.float32) * 1e-30

    if mode == "nocoarse":
        d = jnp.zeros((B,) + pts.shape, jnp.float32)
    else:
        lvl_glob = LEVELS - 1
        lvl_vol = max(entry + 1, lvl_glob - 2)
        pairs = {
            lvl: (pyr_pairs[lvl][0].astype(jnp.float32),
                  pyr_pairs[lvl][1].astype(jnp.float32))
            for lvl in {lvl_glob, lvl_vol}
        }
        hg = pyr_pairs[lvl_glob][0].shape[-2:]
        D_glob = max(2, min(hg) // 3)
        d = T._coarse_init(pairs, lvl_vol, lvl_glob, pts, D_glob)

    if mode == "coarseonly":
        return pts[None] + d

    if mode == "finel0":
        plan = [p for p in plan if p[0] == 0]
    elif mode == "finel2":
        plan = [p for p in plan if p[0] == 2]

    for lvl, it_l, m_l, r_l in plan:
        scale = float(2**lvl)
        d = T._lk_level(
            pyr_pairs[lvl][0], pyr_pairs[lvl][1], pts / scale, d / scale,
            r_l, it_l, m_l, precision=jax.lax.Precision.HIGHEST,
        ) * scale
    return pts[None] + d


@partial(jax.jit, static_argnames=("mode",))
def run_chunked(frames, pts, mode):
    Tn = frames.shape[0]
    n_chunks = (Tn - 1) // CHUNK
    starts = jnp.arange(n_chunks) * CHUNK

    def one(start):
        blk = jax.lax.dynamic_slice(
            frames, (start, 0, 0), (CHUNK + 1, H, W)
        )
        pyr = [T._pad_lanes(l) for l in T.build_pyramid(blk, LEVELS)]
        return _variant_core(
            [(l[:-1], l[1:]) for l in pyr], pts, mode
        )

    out = jax.lax.map(one, starts)
    return out.reshape(Tn - 1, pts.shape[0], 2)


def main():
    print(f"# device: {jax.devices()[0]} levels={LEVELS} N={PTS.shape[0]} "
          f"seg={SEG} chunk={CHUNK}", file=sys.stderr, flush=True)
    key = jax.random.PRNGKey(0)
    frames = jax.random.randint(key, (SEG + 1, H, W), 0, 255, jnp.uint8)
    fetch(frames)

    modes = sys.argv[1:] or [
        "full", "nocoarse", "coarseonly", "pyronly", "finel0", "finel2",
    ]
    results = {}
    for mode in modes:
        t0 = time.time()
        fetch(run_chunked(frames, PTS, mode))
        compile_t = time.time() - t0
        best = np.inf
        for rep in range(2):
            bias = jnp.uint8(rep + 1)
            t0 = time.time()
            fetch(run_chunked(frames + bias, PTS, mode))
            best = min(best, time.time() - t0)
        results[mode] = best
        print(f"{mode:12s} {best * 1e3:9.1f} ms  "
              f"({best * 1e3 / SEG:7.3f} ms/pair)  [compile {compile_t:.1f}s]",
              file=sys.stderr, flush=True)
    if "full" in results:
        f = results["full"]
        for k, v in results.items():
            if k != "full":
                print(f"# full - {k:12s} = {(f - v) * 1e3:8.1f} ms",
                      file=sys.stderr)


if __name__ == "__main__":
    main()
