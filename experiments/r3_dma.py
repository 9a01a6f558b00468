"""Probe: per-point search-region extraction via Pallas double-
buffered row-strip DMA vs the XLA row-block gather (`_gather_blocks`).

The r3_cum attribution shows extraction (search gathers + templates)
runs ~10x above its HBM traffic floor under XLA. Round 2's per-patch
kernel lost to aligned-superset converts (ops/pallas_patch.py
postmortem); this probe tests the postmortem's suggested design: DMA
each point's EXACT (S, 256) u8 strip (no convert, no roll) into a
per-pair VMEM buffer, double-buffered, amortized over all N points of
a program. Indices are scalar-prefetched and pre-clamped in XLA.

Success = extraction wall-clock well under the XLA gather's at the
operating shape (16 pairs x 130 points x 31 rows x 256 lanes u8).
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

B, H, Wp = 16, 2028, 2816
N, S = 130, 31
SD = 40  # DMA rows: 31 needed + up to 7 residual, shape multiple of 8
REPS = 200  # chained extractions per dispatch (amortizes the tunnel)


def fetch(x):
    return np.asarray(x.ravel()[:1])


def _kernel(oy_ref, obx_ref, img_ref, out_ref, sems):
    b = pl.program_id(0)

    def get(i, slot):
        return pltpu.make_async_copy(
            img_ref.at[
                b,
                pl.ds(oy_ref[b, i] * 8, SD),  # *8: provably aligned
                pl.ds(obx_ref[b, i] * T.LANE, 2 * T.LANE),
            ],
            out_ref.at[i],
            sems.at[slot],
        )

    get(0, 0).start()

    def body(i, _):
        @pl.when(i + 1 < N)
        def _():
            get(i + 1, (i + 1) % 2).start()

        get(i, i % 2).wait()
        return 0

    jax.lax.fori_loop(0, N, body, 0)


@jax.jit
def extract_pallas(img, oy, obx):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (None, N, SD, 2 * T.LANE), lambda b, oy, obx: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((2,))],
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, SD, 2 * T.LANE), jnp.uint8),
        grid_spec=grid_spec,
    )(oy, obx, img)


@jax.jit
def chain_pallas(img, oy, obx):
    def one(carry, i):
        out = extract_pallas(img, (oy + i) % ((H - SD) // 8), obx)
        return carry + jnp.sum(out.astype(jnp.float32)), None

    tot, _ = jax.lax.scan(one, 0.0, jnp.arange(REPS, dtype=jnp.int32))
    return tot


@jax.jit
def chain_xla(img, oy, obx):
    def one(carry, i):
        out = T._gather_blocks(img, (oy * 8 + i) % (H - S), obx, S)
        return carry + jnp.sum(out), None

    tot, _ = jax.lax.scan(one, 0.0, jnp.arange(REPS, dtype=jnp.int32))
    return tot


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (B, H, Wp)), jnp.uint8)
    # row-block index: kernel DMAs rows [8*oy, 8*oy + SD)
    oy = jnp.asarray(rng.integers(0, (H - SD) // 8, (B, N)), jnp.int32)
    obx = jnp.asarray(rng.integers(0, Wp // T.LANE - 1, (B, N)), jnp.int32)
    fetch(img)

    # correctness (interior indices -> exact match)
    a = np.asarray(extract_pallas(img, oy, obx))
    b = np.asarray(T._gather_blocks(img, oy * 8, obx, SD)).astype(np.uint8)
    match = np.array_equal(a, b)
    print(f"# correctness vs XLA gather: {match}", file=sys.stderr,
          flush=True)

    for name, fn in (("pallas-dma", chain_pallas), ("xla-gather", chain_xla)):
        t0 = time.time()
        fetch(fn(img, oy, obx))
        ct = time.time() - t0
        best = np.inf
        for r in range(3):
            t0 = time.time()
            fetch(fn(img, oy + (r + 1), obx))
            best = min(best, time.time() - t0)
        per = best / REPS * 1e6
        print(f"{name:12s} {per:8.1f} us/extraction "
              f"({per / (B * N):.3f} us/point)  [compile {ct:.0f}s]",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
