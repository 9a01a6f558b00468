"""Per-dtype pixel-pass rates in the harness the tracker actually
uses (lax.map over 16-frame chunks) — r4_u8pass.py's single-jit
full-array reduces ran 17x slower than the identical chunked reduce
(601 vs ~36 ms for 1.4 GB u8; even a full f32 sum managed only
11 GB/s), so whole-array reductions are a backend pathology and those
numbers say nothing about pass rates. Chunked variants:

  sum_u8      per-chunk jnp.sum(u8, i32)           [prod consumer]
  sum_i16     i16-stored frames, per-chunk i32 sum  [16-bit rate]
  sum_bf16    bf16-stored frames, per-chunk f32 sum [bf16 rate, 2x B]
  sum_f32     f32-stored frames, per-chunk sum      [f32 rate, 4x B]
  conv        u8 -> bf16 materialized (optimization_barrier), tiny sum
  pallas_conv same convert as a Mosaic kernel (u8->i32->bf16; Mosaic
              has no direct u8->bf16 cast)

If 16/32-bit loads run at >= 4x the u8 BYTE rate, storing frames
wider than u8 wins despite the extra traffic, and the pyramid's
convert pass (the tracker's single biggest cost) shrinks accordingly.

Usage: PYTHONPATH=/root/repo python experiments/r4_u8pass2.py [names]

MEASURED (v5e, 2026-08-19), all for the same 1.4e9 pixels:
  sum_u8  30.3 ms   sum_i16 32.4   sum_bf16 30.9   sum_f32 36.2
  conv    41.1 ms (0.171 ms/pair)   pallas_conv 47.9
Verdict: wall time is ~CONSTANT across dtypes — these passes are
bound by the platform's elementwise issue rate (~46 Gelem/s observed,
~20x below the VPU's nameplate rate; f32 tops out ~154 GB/s, far
under HBM spec), not by bytes. Consequences: (a) storing frames wider
than u8 buys nothing; (b) the pyramid's u8->bf16 convert — the
tracker's biggest single cost — is AT this platform floor, and Mosaic
can't beat XLA at it; (c) tracking at 0.23-0.28 ms/pair sits ~1.5x
above an irreducible ~0.17 ms/pair one-elementwise-pass floor, so
further tracker work is low-yield on this device tier.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from rssync_tpu.frontend import tracking as T

H, W = 2028, 2704
SEG = 240
CHUNK = 16
LEVELS = 8


def fetch(x):
    return np.asarray(x).ravel()[:1]


def _conv_kernel(src_ref, dst_ref):
    x = src_ref[...].astype(jnp.int32)
    dst_ref[...] = x.astype(jnp.bfloat16)


def pallas_convert(blk):
    B, Hp, Wp = blk.shape
    RB = 256
    return pl.pallas_call(
        _conv_kernel,
        grid=(B, Hp // RB),
        in_specs=[pl.BlockSpec((1, RB, Wp), lambda t, r: (t, r, 0))],
        out_specs=pl.BlockSpec((1, RB, Wp), lambda t, r: (t, r, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp), jnp.bfloat16),
    )(blk)


def chunked(frames, one):
    @jax.jit
    def fn(frames):
        n_chunks = (frames.shape[0] - 1) // CHUNK
        Hp, Wp = frames.shape[-2:]
        starts = jnp.arange(n_chunks) * CHUNK

        def body(start):
            blk = jax.lax.dynamic_slice(
                frames, (start, 0, 0), (CHUNK + 1, Hp, Wp))
            return one(blk)

        return jax.lax.map(body, starts)

    return fn


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    frames = np.random.default_rng(0).integers(
        0, 255, (SEG + 1, H, W), np.uint8)
    u8 = jnp.asarray(T.pad_frames_host(frames, LEVELS))
    Tn, Hp, Wp = u8.shape
    nb = Tn * Hp * Wp
    print(f"# frames {u8.shape} = {nb / 1e9:.2f} GB u8",
          file=sys.stderr, flush=True)
    fetch(u8)

    def tiny(y):
        return jnp.sum(y[:, ::128, ::512].astype(jnp.float32))

    def derived(dt):
        x = jax.jit(lambda x: x.astype(dt))(u8)
        fetch(x)
        return x

    cases = {}
    cases["sum_u8"] = (
        u8, lambda b: jnp.sum(b, dtype=jnp.int32).astype(jnp.float32), nb)
    cases["sum_i16"] = (
        lambda: derived(jnp.int16),
        lambda b: jnp.sum(b, dtype=jnp.int32).astype(jnp.float32), 2 * nb)
    cases["sum_bf16"] = (
        lambda: derived(jnp.bfloat16),
        lambda b: jnp.sum(b, dtype=jnp.float32), 2 * nb)
    cases["sum_f32"] = (
        lambda: derived(jnp.float32), lambda b: jnp.sum(b), 4 * nb)
    cases["conv"] = (
        u8,
        lambda b: tiny(jax.lax.optimization_barrier(
            b.astype(jnp.bfloat16))), 3 * nb)
    cases["pallas_conv"] = (
        u8,
        lambda b: tiny(jax.lax.optimization_barrier(pallas_convert(b))),
        3 * nb)

    sel = sys.argv[1:]
    for name, (src, one, bts) in cases.items():
        if sel and name not in sel:
            continue
        try:
            arr = src() if callable(src) else src
            fn = chunked(arr, one)
            t0 = time.time()
            fetch(fn(arr))
            ct = time.time() - t0
        except Exception as e:
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
            continue
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            fetch(fn(arr))
            best = min(best, time.time() - t0)
        del arr
        print(
            f"{name:12s} {best * 1e3:7.2f} ms  "
            f"{bts / best / 1e9:6.0f} GB/s  "
            f"({best * 1e3 / SEG:6.3f} ms/pair)  [compile {ct:.0f}s]",
            file=sys.stderr, flush=True,
        )


if __name__ == "__main__":
    main()
