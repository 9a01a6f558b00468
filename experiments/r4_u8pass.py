"""How fast can this TPU actually touch u8 pixels? Every earlier
probe consumed blocks with jnp.sum(u8, dtype=i32), which conflates
three candidate bottlenecks: 8-bit vector loads, integer reduces, and
the u8->bf16 widening convert. Measure them separately, full-clip
(241 x 2048+ x 2816 ~ 1.4 GB u8), each variant its own jit:

  sum_u8_i32    jnp.sum(u8, dtype=i32)            [the old consumer]
  sum_u8_bf16   jnp.sum(u8.astype(bf16), f32 acc) [u8 load + f32 red]
  sum_bf16      jnp.sum(bf16_frames)              [bf16 load + reduce]
  sum_f32       jnp.sum(f32_frames)               [f32 ceiling]
  conv_mat      u8 -> bf16 materialized via optimization_barrier,
                tiny strided sum after              [convert+write]
  pallas_conv   same convert as a Mosaic kernel     [is XLA the limit?]

bf16/f32 copies are derived on device (nothing extra rides the
tunnel). GB/s uses bytes actually read+written per variant.

Usage: PYTHONPATH=/root/repo python experiments/r4_u8pass.py [names]

MEASURED (v5e, 2026-08-19) — and then DISTRUSTED: every whole-array
variant lands at 2-11 GB/s (sum_u8_i32 602 ms, sum_f32 517 ms for the
same pixels the chunked lax.map reduce sums in ~36 ms). Single-jit
whole-array reductions are a backend pathology (17x slower than the
identical math inside a 16-frame lax.map), so NONE of these numbers
measure dtype pass rates. pallas_conv also fails: Mosaic has no
direct u8->bf16 cast. Superseded by r4_u8pass2.py, which re-runs the
matrix inside the chunked harness the tracker actually uses.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rssync_tpu.frontend import tracking as T

H, W = 2028, 2704
SEG = 240
LEVELS = 8


def fetch(x):
    return np.asarray(x).ravel()[:1]


def _conv_kernel(src_ref, dst_ref):
    dst_ref[...] = src_ref[...].astype(jnp.bfloat16)


def pallas_convert(frames):
    Tn, Hp, Wp = frames.shape
    RB = 256
    grid = (Tn, Hp // RB)
    return pl.pallas_call(
        _conv_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, RB, Wp), lambda t, r: (t, r, 0))],
        out_specs=pl.BlockSpec((1, RB, Wp), lambda t, r: (t, r, 0)),
        out_shape=jax.ShapeDtypeStruct((Tn, Hp, Wp), jnp.bfloat16),
    )(frames)


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    frames = np.random.default_rng(0).integers(
        0, 255, (SEG + 1, H, W), np.uint8)
    u8 = jnp.asarray(T.pad_frames_host(frames, LEVELS))
    Tn, Hp, Wp = u8.shape
    nbytes = Tn * Hp * Wp
    print(f"# frames {u8.shape} = {nbytes / 1e9:.2f} GB u8",
          file=sys.stderr, flush=True)
    fetch(u8)
    bf = jax.jit(lambda x: x.astype(jnp.bfloat16))(u8)
    fetch(bf)
    f32 = jax.jit(lambda x: x.astype(jnp.float32))(u8)
    fetch(f32)

    def tiny(y):
        return jnp.sum(y[:, ::128, ::512].astype(jnp.float32))

    cases = {
        "sum_u8_i32": (
            lambda: jax.jit(
                lambda x: jnp.sum(x, dtype=jnp.int32))(u8),
            nbytes,
        ),
        "sum_u8_bf16": (
            lambda: jax.jit(lambda x: jnp.sum(
                x.astype(jnp.bfloat16), dtype=jnp.float32))(u8),
            nbytes,
        ),
        "sum_bf16": (
            lambda: jax.jit(lambda x: jnp.sum(
                x, dtype=jnp.float32))(bf),
            2 * nbytes,
        ),
        "sum_f32": (
            lambda: jax.jit(lambda x: jnp.sum(x))(f32),
            4 * nbytes,
        ),
        "conv_mat": (
            lambda: jax.jit(lambda x: tiny(
                jax.lax.optimization_barrier(
                    x.astype(jnp.bfloat16))))(u8),
            3 * nbytes,
        ),
        "pallas_conv": (
            lambda: jax.jit(lambda x: tiny(
                jax.lax.optimization_barrier(pallas_convert(x))))(u8),
            3 * nbytes,
        ),
    }
    sel = sys.argv[1:]
    for name, (run, bts) in cases.items():
        if sel and name not in sel:
            continue
        try:
            t0 = time.time()
            fetch(run())
            ct = time.time() - t0
        except Exception as e:
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
            continue
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            fetch(run())
            best = min(best, time.time() - t0)
        print(
            f"{name:12s} {best * 1e3:7.2f} ms  "
            f"{bts / best / 1e9:6.0f} GB/s  "
            f"({best * 1e3 / SEG:6.3f} ms/pair)  [compile {ct:.0f}s]",
            file=sys.stderr, flush=True,
        )


if __name__ == "__main__":
    main()
