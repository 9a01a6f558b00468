"""Bit-compare bisection probe (round 4): the scoring kernel's
resident compare buffer is bf16-QUANTIZED squared residuals stored as
f32 (Mosaic has no bf16 compare on this target). For non-negative
floats the bf16 BIT PATTERN viewed as int16 is order-isomorphic to
the float value (sign bit 0, monotone exponent/mantissa; +inf =
0x7f80 sorts above all finite) — so the bisection predicate
`bf16(x) <= bf16(mid)` can run as an int16 integer compare on a
HALF-size resident buffer with zero per-round converts.

Variant kernel here (package kernel untouched until this wins):
  res2m_bits : int16 bitcast of the bf16 quantized residuals
  mid bits   : f32 mid -> bf16 -> int16 bitcast per round
Numerics are bit-identical to score_quartile_pallas_batched by
construction (same bf16 grid, same <=).

Per-problem VMEM drops from ~4 to ~2.5 f32-equivalent buffers, so the
default tile fits 3-4 problems per program instead of 2.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    experiments/r4_i16score.py [bt]

MEASURED (TPU v5e, 2026-08-18): NEGATIVE — Mosaic rejects the int16
vector compare outright ("Target does not support this comparison",
arith.cmpi on vector<8x128x2xi16>), the same target limitation that
forced the f32-quantized compare in the first place. v5e's VPU has no
16-bit vector compare of ANY kind; widening the bits to i32 erases
the memory saving. The f32-quantized compare buffer stays.
"""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rssync_tpu.core import presync as PS
from rssync_tpu.ops import pallas_score as PSC
from rssync_tpu.ops.pallas_score import BISECT_ROUNDS, MARKOV_C
from rssync_tpu.parallel import batch as PB
from rssync_tpu.parallel.batch import stack_windows
from rssync_tpu.testing.engine_problem import make_engine_problem


def _kernel_i16(nP_ref, v_ref, cnt_ref, med_ref):
    nP = nP_ref[...]          # (bt, 3, F, N)
    v = v_ref[...]            # (bt, 3, F, I)
    cnt = cnt_ref[...]        # (bt, F, 1)
    bt, _, F, N = nP.shape

    res = (
        v[:, 0][..., None] * nP[:, 0][:, :, None, :]
        + v[:, 1][..., None] * nP[:, 1][:, :, None, :]
        + v[:, 2][..., None] * nP[:, 2][:, :, None, :]
    )
    res2 = res * res

    iota_n = jax.lax.broadcasted_iota(jnp.int32, (bt, F, 1, N), 3)
    valid = iota_n < cnt[..., None]
    k = jnp.maximum(cnt, 1) // 4

    res2m_bits = jax.lax.bitcast_convert_type(
        jnp.where(valid, res2, jnp.inf).astype(jnp.bfloat16), jnp.int16)
    lo = jnp.zeros(res2.shape[:3], jnp.float32)
    masked = jnp.where(valid, res2, 0.0)
    mu = jnp.sum(masked, axis=-1) / jnp.maximum(cnt, 1).astype(jnp.float32)
    hi = jnp.minimum(jnp.max(masked, axis=-1), MARKOV_C * mu)

    def bisect(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        midb = jax.lax.bitcast_convert_type(
            mid[..., None].astype(jnp.bfloat16), jnp.int16)
        c = jnp.sum((res2m_bits <= midb).astype(jnp.float32), axis=-1)
        ge = c >= (k + 1).astype(jnp.float32)
        return jnp.where(ge, lo, mid), jnp.where(ge, mid, hi)

    lo, hi = jax.lax.fori_loop(0, BISECT_ROUNDS, bisect, (lo, hi))
    med_ref[...] = hi


@partial(jax.jit, static_argnames=("interpret", "b_tile"))
def score_i16(nP, v, counts, interpret=False, b_tile=None):
    B, _, F, N = nP.shape
    Iq = v.shape[-1]
    n_eff = -(-N // 128) * 128
    bt = b_tile or max(1, min(
        B, PSC.VMEM_BUDGET // (F * Iq * n_eff * 4 * 10 // 4)))
    pad = (-B) % bt
    if pad:
        nP = jnp.pad(nP, ((0, pad), (0, 0), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, pad), (0, 0), (0, 0), (0, 0)))
        counts = jnp.pad(counts, ((0, pad), (0, 0)))
    Bp = B + pad
    cnt = counts.astype(jnp.int32).reshape(Bp, F, 1)
    out = pl.pallas_call(
        _kernel_i16,
        out_shape=jax.ShapeDtypeStruct((Bp, F, Iq), jnp.float32),
        grid=(Bp // bt,),
        in_specs=[
            pl.BlockSpec((bt, 3, F, N), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 3, F, Iq), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, F, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, F, Iq), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(nP, v, cnt)
    return out[:B]


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    bt = int(sys.argv[1]) if sys.argv[1:] else None

    # parity first (on-device, tiny shapes)
    rng = np.random.default_rng(0)
    B, F, N, I = 5, 7, 40, 20
    P = rng.normal(size=(B, 3, F, N)).astype(np.float32) * 0.1
    counts = rng.integers(5, N + 1, size=(B, F)).astype(np.int32)
    for b in range(B):
        for f in range(F):
            P[b, :, f, counts[b, f]:] = 0.0
    Pn2 = np.sum(P * P, axis=1)
    inv = np.where(Pn2 < 1e-24, 1.0, 1.0 / np.sqrt(np.maximum(Pn2, 1e-30)))
    nP = (P * inv[:, None]).astype(np.float32)
    v = rng.normal(size=(B, 3, F, I)).astype(np.float32)
    v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
    a = np.asarray(score_i16(jnp.asarray(nP), jnp.asarray(v),
                             jnp.asarray(counts), b_tile=2))
    b_ = np.asarray(PSC.score_quartile_pallas_batched(
        jnp.asarray(nP), jnp.asarray(v), jnp.asarray(counts), b_tile=2))
    print(f"# parity max |d| = {np.abs(a - b_).max():.3e}",
          file=sys.stderr, flush=True)
    assert np.array_equal(a, b_), "i16 kernel diverges"

    # timing at the operating point
    prob = make_engine_problem(
        seed=0, duration=60.0, fps=60.0, n_features=130, sync_window=60,
        syncpoint_distance=120, true_delay=0.0423)
    wins = stack_windows(prob.windows)
    delays = jnp.asarray(np.arange(-0.2, 0.2, 0.002), jnp.float32)
    orig = PSC.score_quartile_pallas_batched
    PSC.score_quartile_pallas_batched = (
        partial(score_i16, b_tile=bt) if bt else score_i16)
    try:
        PB.batched_presync.clear_cache()
        t0 = time.time()
        out = PB.batched_presync(prob.table, wins, delays,
                                 jax.random.PRNGKey(1), wide=True)
        fetch(out)
        ct = time.time() - t0
        best = np.inf
        for r in range(3):
            t0 = time.time()
            fetch(PB.batched_presync(prob.table, wins, delays,
                                     jax.random.PRNGKey(2 + r), wide=True))
            best = min(best, time.time() - t0)
        print(f"i16 bt={bt}    {best * 1e3:9.1f} ms  [compile {ct:.0f}s]",
              file=sys.stderr, flush=True)
    finally:
        PSC.score_quartile_pallas_batched = orig


if __name__ == "__main__":
    main()
