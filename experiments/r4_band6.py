"""Banded-eval width probe (round 4): the P build (124 ms of the
231 ms PreSync stage) is VPU-bound on the band x 16 compare+select
chain of _select_and_horner, and `band` is quantized to BAND_FAST=8
while the operating point's true per-frame knot span is 2.

Derivation of the minimum safe width (see _banded_quats/_wide_quats):
idx - band_start = (i0 - base) + (floor(f0 + shift) - sfloor) + 1
with i0 - base in [0, span] and the floor term in {0, 1}, so
rel in [1, span + 2] and band >= span + 3 suffices; the production
gate keeps one extra knot of margin (span + 4). This probe rebuilds
the operating-point windows with band = 6 (= span 2 + 4) and checks
(a) bitwise cost/delay parity with band = 8 on CPU-identical math,
(b) the timing delta at the operating point.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    experiments/r4_band6.py [band ...]
"""

import dataclasses
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.parallel import batch as PB
from rssync_tpu.parallel.batch import stack_windows
from rssync_tpu.testing.engine_problem import make_engine_problem


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def with_band(wins, band):
    return dataclasses.replace(wins, band=band)


def timed(name, table, wins, delays):
    PB.batched_presync.clear_cache()
    t0 = time.time()
    out = PB.batched_presync(table, wins, delays, jax.random.PRNGKey(1),
                             wide=True)
    fetch(out)
    ct = time.time() - t0
    best = np.inf
    for r in range(3):
        t0 = time.time()
        fetch(PB.batched_presync(table, wins, delays,
                                 jax.random.PRNGKey(2 + r), wide=True))
        best = min(best, time.time() - t0)
    print(f"{name:10s} {best * 1e3:9.1f} ms  [compile {ct:.0f}s]",
          file=sys.stderr, flush=True)
    return out


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    prob = make_engine_problem(
        seed=0, duration=60.0, fps=60.0, n_features=130, sync_window=60,
        syncpoint_distance=120, true_delay=0.0423)
    wins = stack_windows(prob.windows)
    delays = jnp.asarray(np.arange(-0.2, 0.2, 0.002), jnp.float32)
    table = prob.table
    sel = [int(a) for a in sys.argv[1:]] or [8, 6, 5]
    ref = None
    for band in sel:
        c, d = timed(f"band={band}", table, with_band(wins, band), delays)
        c, d = np.asarray(c), np.asarray(d)
        if ref is None:
            ref = (c, d)
        else:
            dc = np.abs(ref[0] - c).max()
            dd = np.abs(ref[1] - d).max()
            print(f"  vs band={sel[0]}: max|dcost|={dc:.3e} "
                  f"max|ddelay|={dd:.3e}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
