"""Is the per-chunk block dynamic_slice actually a separate cost, or
is the measured 'slice' stage (r4_chunk_stages.py: 0.137 ms/pair)
really just the u8 consumption pass?

Variants at the 2.7k operating point (SEG=240 pairs, CHUNK=16):
  slice_sum   dynamic_slice of the (chunk+1) block + int32 sum
              (identical to r4_chunk_stages 'slice')
  static_sum  the SAME total bytes summed from a reshape view (no
              overlap frame, no dynamic start) — if this matches
              slice_sum, the slice fuses into its consumer and costs
              nothing on its own
  dma_sum     a Pallas HBM->HBM async-copy of the block + the same
              int32 sum — does a DMA-engine copy beat XLA's
              dynamic_slice copy (if that copy exists at all)?
  slice_pyr   dynamic_slice + first sparse-pyramid einsum (level 2),
              consumed — the production shape of the question
  static_pyr  the same einsum over a reshape-fed chunk (16 frames,
              static start)

Usage: PYTHONPATH=/root/repo python experiments/r4_slice2.py [names]

MEASURED (v5e, 2026-08-19):
  slice_sum  0.150 ms/pair   static_sum 0.165   dma_sum 0.157
  slice_pyr  0.196 ms/pair   static_pyr 0.212
Verdict: the dynamic_slice itself is ~free (slice_sum ~= static_sum,
and routing the copy through a DMA kernel changes nothing) — every
variant is dominated by the CONSUMER's pass over the u8 bytes, not by
the slice. ROADMAP #1's "block dynamic_slice costs ~0.14 ms/pair" was
a misattribution: that number is the cost of ANY u8-touching pass
(see r4_u8pass.py, which separates load/convert/reduce rates).
"""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rssync_tpu.frontend import tracking as T

H, W = 2028, 2704
SEG = 240
CHUNK = 16
LEVELS = 8


def fetch(x):
    return np.asarray(x).ravel()[:1]


def _copy_block_kernel(start_ref, src_ref, dst_ref, sem):
    cp = pltpu.make_async_copy(
        src_ref.at[pl.ds(start_ref[0], dst_ref.shape[0])],
        dst_ref,
        sem,
    )
    cp.start()
    cp.wait()


def dma_block(frames_p, start, n):
    Tn, Hp, Wp = frames_p.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        _copy_block_kernel,
        out_shape=jax.ShapeDtypeStruct((n, Hp, Wp), frames_p.dtype),
        grid_spec=grid_spec,
    )(jnp.atleast_1d(start).astype(jnp.int32), frames_p)


def build(variant):
    need = T._needed_levels(LEVELS, T.LK_ITERS, T.LK_RADIUS)
    plan = T._fine_plan(LEVELS, T.LK_ITERS, T.LK_RADIUS)
    fine = {l for l, *_ in plan}
    lvl_plan = {l: "fine" if l in fine else "lane" for l in need}
    first = sorted(set(need) - {0})[0]

    def pyr1(blk):
        p = T.build_pyramid_sparse(blk, LEVELS, [first], (H, W), lvl_plan)
        return jnp.sum(p[first], dtype=jnp.int32).astype(jnp.float32)

    @jax.jit
    def fn(frames_p):
        n_chunks = (frames_p.shape[0] - 1) // CHUNK
        Hp, Wp = frames_p.shape[-2:]
        starts = jnp.arange(n_chunks) * CHUNK

        if variant in ("static_sum", "static_pyr"):
            view = frames_p[: n_chunks * CHUNK].reshape(
                n_chunks, CHUNK, Hp, Wp)
            if variant == "static_sum":
                def one(blk):
                    return jnp.sum(blk, dtype=jnp.int32).astype(jnp.float32)
            else:
                one = pyr1
            return jax.lax.map(one, view)

        def one(start):
            if variant == "dma_sum":
                blk = dma_block(frames_p, start, CHUNK + 1)
            else:
                blk = jax.lax.dynamic_slice(
                    frames_p, (start, 0, 0), (CHUNK + 1, Hp, Wp))
            if variant in ("slice_sum", "dma_sum"):
                return jnp.sum(blk, dtype=jnp.int32).astype(jnp.float32)
            return pyr1(blk)

        return jax.lax.map(one, starts)

    return fn


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    frames = np.random.default_rng(0).integers(
        0, 255, (SEG + 1, H, W), np.uint8)
    frames_p = jnp.asarray(T.pad_frames_host(frames, LEVELS))
    fetch(frames_p)
    sel = sys.argv[1:]
    names = ["slice_sum", "static_sum", "dma_sum", "slice_pyr", "static_pyr"]
    for v in names:
        if sel and v not in sel:
            continue
        fn = build(v)
        t0 = time.time()
        fetch(fn(frames_p))
        ct = time.time() - t0
        best = np.inf
        for rep in range(3):
            t0 = time.time()
            fetch(fn(frames_p + jnp.uint8(rep + 1)))
            best = min(best, time.time() - t0)
        print(f"{v:11s} {best * 1e3 / SEG:7.3f} ms/pair  [compile {ct:.0f}s]",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
