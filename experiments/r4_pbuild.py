"""P-build select restructure probe (round 4): _select_and_horner's
coefficient select is band x 16 fused compare+FMAs per (F, N) element
on the VPU — the dominant PreSync cost after the scoring-kernel work
(ponly = 119.5 ms of the 267 ms stage, r4_presync_split2.py).

Variant `mxu`: build the (F, N, band) one-hot ONCE (band compares per
element) and contract the 16 coefficient rows against it in a single
batched dot_general on the MXU — VPU work drops ~17x to just the
one-hot compares; the contraction is exact (one nonzero term per row,
HIGHEST precision).

Times the P-build-only presync (wc_ponly of r4_presync_split2) with
the production select vs the MXU select.

MEASURED (TPU v5e, 2026-08-18): orig 123.7 ms, mxu 157.1 ms — the MXU
variant LOSES despite bit-identical values (max |P_orig - P_mxu| = 0):
the (F, N, band) one-hot materializes through HBM between the compare
pass and the dot, while the fused VPU compare+select chain never
leaves registers. P build stays on the VPU select form; its remaining
headroom is the band width itself (band=8 vs true per-frame spans of
~2 knots at the operating point).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    experiments/r4_pbuild.py [orig|mxu ...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.core import problem as PR
from rssync_tpu.parallel import batch as PB
from rssync_tpu.parallel.batch import stack_windows
from rssync_tpu.testing.engine_problem import make_engine_problem

ORIG_SELECT = PR._select_and_horner
ORIG_WC = PB.window_cost


def _select_and_horner_mxu(sub, sub_start, xi, h_in, n):
    band = sub.shape[-1]
    idx = jnp.clip(xi, 0, n - 1)
    rel = jnp.clip(idx - sub_start[..., None], 0, band - 1)  # (F, N)
    onehot = (rel[..., None] == jnp.arange(band)).astype(jnp.float32)
    coefs = jax.lax.dot_general(
        onehot, sub, (((2,), (2,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
    )  # (F, N, 16)
    coefs = jnp.moveaxis(coefs, -1, 0)  # (16, F, N)
    yk, bk, ck, dk = coefs[0:4], coefs[4:8], coefs[8:12], coefs[12:16]

    below = xi < 0
    above = xi > n - 2
    h_lo = xi.astype(h_in.dtype) + h_in
    h_hi = (xi - (n - 1) - (xi >= n).astype(xi.dtype)).astype(
        h_in.dtype) + h_in
    h = jnp.where(below, h_lo, jnp.where(above, h_hi, h_in))[None]
    cubic = ((dk * h + ck) * h + bk) * h + yk
    quad = (ck * h + bk) * h + yk
    return jnp.where((below | above)[None], quad, cubic)


def wc_ponly(table, win, delay, key, bands=None):
    P = PR.compute_problem(table, win, delay, bands)
    return jnp.sum(P * P) * 1e-20 + delay * 0.0


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


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
    print(f"{name:12s} {best * 1e3:9.1f} ms  [compile {ct:.0f}s]",
          file=sys.stderr, flush=True)


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    prob = make_engine_problem(
        seed=0, duration=60.0, fps=60.0, n_features=130, sync_window=60,
        syncpoint_distance=120, true_delay=0.0423)
    wins = stack_windows(prob.windows)
    delays = jnp.asarray(np.arange(-0.2, 0.2, 0.002), jnp.float32)
    table = prob.table

    # numeric check first (CPU-cheap shapes are fine on device too):
    win0 = jax.tree_util.tree_map(lambda a: a[0], wins)
    bands0 = PR.make_wide_bands(table, win0, jnp.float32(0.0))
    p_ref = PR.compute_problem(table, win0, jnp.float32(0.013), bands0)
    PR._select_and_horner = _select_and_horner_mxu
    try:
        p_mxu = PR.compute_problem(table, win0, jnp.float32(0.013), bands0)
    finally:
        PR._select_and_horner = ORIG_SELECT
    d = np.abs(np.asarray(p_ref) - np.asarray(p_mxu)).max()
    print(f"# max |P_orig - P_mxu| = {d:.3e}", file=sys.stderr, flush=True)

    sel = sys.argv[1:]
    PB.window_cost = wc_ponly
    try:
        if not sel or "orig" in sel:
            timed("orig", table, wins, delays)
        if not sel or "mxu" in sel:
            PR._select_and_horner = _select_and_horner_mxu
            try:
                timed("mxu", table, wins, delays)
            finally:
                PR._select_and_horner = ORIG_SELECT
    finally:
        PB.window_cost = ORIG_WC


if __name__ == "__main__":
    main()
