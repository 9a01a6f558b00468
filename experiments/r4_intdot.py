"""Can the MXU read the full-res pixels as int8 faster than the VPU
can widen u8? The pyramid's first hop is one u8->bf16 convert pass
(~0.15 ms/pair, VPU-bound at ~110 GB/s) + two bf16 dots; an s8 x s8 ->
i32 MXU dot would stream the pixels via DMA at full HBM bandwidth and
never touch the VPU at full resolution.

Variants (chunked lax.map at the 2.7k operating point, rows-dot only,
output consumed by a sum):
  bf16    convert blk to bf16, dot with the bf16 row matrix (current)
  s8      blk pre-stored as s8 (pixel-128), dot with an s8 row matrix,
          preferred_element_type=i32
  s8x2    the real thing: integer row matrix split into two s8 halves
          (values up to ~200 exceed s8), two dots, summed
  vpu     u8 sum only (the VPU-pass floor for reference)

Usage: PYTHONPATH=/root/repo python experiments/r4_intdot.py

MEASURED (v5e, 2026-08-19): Rint max |coeff| = 352 (so the exact
integer path needs >= 2 s8 planes), bf16 0.183 ms/pair, s8 (single
clipped plane, timing only) 0.156. The s8 dot is NOT MXU-native on
this backend — it runs at the same ~40 GB/s as a u8 VPU widening
pass, so the exact 2-plane version would be SLOWER than the current
convert+bf16 path. Negative result: int8 matmuls are no shortcut
around the 8-bit VPU penalty on v5e via XLA.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.frontend import tracking as T

H, W = 2028, 2704
SEG = 240
CHUNK = 16
LEVELS = 8


def fetch(x):
    return np.asarray(x).ravel()[:1]


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    frames = np.random.default_rng(0).integers(
        0, 255, (SEG + 1, H, W), np.uint8)
    frames_p = np.asarray(T.pad_frames_host(frames, LEVELS))
    Hp, Wp = frames_p.shape[-2:]
    frames_u8 = jnp.asarray(frames_p)
    frames_s8 = jnp.asarray(
        (frames_p.astype(np.int16) - 128).astype(np.int8))
    fetch(frames_u8), fetch(frames_s8)

    # composed 0->2 row-downsample matrix, exact integer/2^k
    R = T._down_mat_stored(H, 0, 2, Hp, 512)  # (512, Hp) float
    Rint = np.round(R * 1024.0).astype(np.int32)
    assert np.allclose(Rint / 1024.0, R, atol=0), "not integer/1024"
    print(f"# Rint max |coeff| = {np.abs(Rint).max()}", file=sys.stderr)
    R_bf16 = jnp.asarray(R, jnp.bfloat16)
    Ra = jnp.asarray(np.minimum(Rint, 127), jnp.int8)
    Rb = jnp.asarray(Rint - np.minimum(Rint, 127), jnp.int8)
    R_s8 = jnp.asarray(np.clip(Rint, -128, 127), jnp.int8)  # s8 (clipped,
    # wrong values — timing only)

    def harness(one, frames):
        @jax.jit
        def fn(frames):
            n_chunks = (frames.shape[0] - 1) // CHUNK
            starts = jnp.arange(n_chunks) * CHUNK

            def body(start):
                blk = jax.lax.dynamic_slice(
                    frames, (start, 0, 0), (CHUNK + 1, Hp, Wp))
                return one(blk)

            return jax.lax.map(body, starts)

        return fn, frames

    def v_bf16(blk):
        x = jnp.einsum("rh,bhw->brw", R_bf16, blk.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return jnp.sum(x, dtype=jnp.float32)

    def v_s8(blk):
        x = jnp.einsum("rh,bhw->brw", R_s8, blk,
                       preferred_element_type=jnp.int32)
        return jnp.sum(x, dtype=jnp.int32).astype(jnp.float32)

    def v_s8x2(blk):
        xa = jnp.einsum("rh,bhw->brw", Ra, blk,
                        preferred_element_type=jnp.int32)
        xb = jnp.einsum("rh,bhw->brw", Rb, blk,
                        preferred_element_type=jnp.int32)
        return jnp.sum(xa + xb, dtype=jnp.int32).astype(jnp.float32)

    def v_vpu(blk):
        return jnp.sum(blk, dtype=jnp.int32).astype(jnp.float32)

    cases = [
        ("bf16", v_bf16, frames_u8),
        ("s8", v_s8, frames_s8),
        ("s8x2", v_s8x2, frames_s8),
        ("vpu", v_vpu, frames_u8),
    ]
    sel = sys.argv[1:]
    for name, one, fr in cases:
        if sel and name not in sel:
            continue
        fn, fr = harness(one, fr)
        try:
            t0 = time.time()
            fetch(fn(fr))
            ct = time.time() - t0
        except Exception as e:
            print(f"{name:6s} FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
            continue
        best = np.inf
        for rep in range(3):
            t0 = time.time()
            fetch(fn(fr + fr.dtype.type(rep % 2)))
            best = min(best, time.time() - t0)
        print(f"{name:6s} {best * 1e3 / SEG:7.3f} ms/pair  "
              f"[compile {ct:.0f}s]", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
