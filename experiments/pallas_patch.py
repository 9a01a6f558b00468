"""Pallas TPU kernel: gather N square patches from an image at
per-patch integer origins. EXPERIMENTAL — measured SLOWER than the
XLA path; kept as documentation of the design space (see below).

Motivation: the LK tracker's hot extraction (template + search buffer
per point per level) lowers to XLA block-gathers at ~3 us per patch;
this kernel streams patches with double-buffered async DMA instead
(pallas_guide.md double-buffering pattern).

Mosaic constraints shaping (and ultimately sinking) the design:
- TPU memrefs are tile-laid-out even in HBM, so DMA slice origins
  must be tile-aligned (rows to the dtype's sublane tile, lanes to
  128). The kernel copies an ALIGNED superset region per patch
  ((size+32) x 256 for u8) and resolves the residual offset in VMEM.
- `pltpu.roll` accepts traced shifts but only 32-bit data, forcing a
  widening convert of the whole superset region per patch.
- consequence: per-patch work (18 KB DMA + 73 KB convert + 2 full
  rotates) measures ~33 us vs ~3 us for XLA's native block gather —
  the aligned-superset overhead swamps the DMA win. A faster kernel
  would need the unconstrained-offset DMA path (copy engine directly,
  not memref slices), which pallas does not currently expose.
- the aligned region also cannot reach origins within ~(256 - size)
  px of the right image edge (x is clamped earlier than the XLA
  path's dynamic_slice clamp).

The default path therefore stays XLA (`force=None` off-TPU or
`force="xla"`); tests exercise the kernel in interpreter mode for
correctness on interior origins.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _row_align(dtype) -> int:
    # sublane tile: f32 8, bf16 16, int8/u8 32
    return {4: 8, 2: 16, 1: 32}[jnp.dtype(dtype).itemsize]


def _on_tpu() -> bool:
    try:
        return "TPU" in jax.devices()[0].device_kind.upper()
    except Exception:
        return False


def _make_kernel(size: int, rows: int, cols: int, ralign: int):
    def kernel(origins_ref, img_ref, out_ref, scratch, sems):
        N = out_ref.shape[0]

        def aligned(i):
            x = origins_ref[i, 0]
            y = origins_ref[i, 1]
            ax = (x // LANE) * LANE
            ay = (y // ralign) * ralign
            return ax, ay

        def dma(slot, i):
            ax, ay = aligned(i)
            return pltpu.make_async_copy(
                img_ref.at[pl.ds(ay, rows), pl.ds(ax, cols)],
                scratch.at[slot],
                sems.at[slot],
            )

        dma(0, 0).start()

        def body(i, _):
            slot = i % 2

            @pl.when(i + 1 < N)
            def _():
                dma((i + 1) % 2, i + 1).start()

            dma(slot, i).wait()
            ax, ay = aligned(i)
            ry = origins_ref[i, 1] - ay
            rx = origins_ref[i, 0] - ax
            # roll requires 32-bit data: widen u8 -> i32 / bf16 -> f32
            v = scratch[slot].astype(out_ref.dtype)
            r = pltpu.roll(v, -ry, 0)
            r = pltpu.roll(r, -rx, 1)
            out_ref[i] = r[:size, :size]
            return 0

        jax.lax.fori_loop(0, N, body, 0)

    return kernel


@partial(jax.jit, static_argnames=("size", "interpret"))
def _extract_pallas(img, origins, size, interpret=False):
    N = origins.shape[0]
    H, W = img.shape
    ralign = _row_align(img.dtype)
    rows = size + ralign  # residual row offset in [0, ralign)
    cols = size + LANE  # residual lane offset in [0, LANE)
    cols = ((cols + LANE - 1) // LANE) * LANE
    if rows % 8:
        rows += 8 - rows % 8
    if H < rows or W < cols:
        raise ValueError(
            f"image {H}x{W} smaller than aligned DMA region {rows}x{cols}"
        )
    # clamp so the ALIGNED region stays in bounds: origin o with
    # aligned(o) = floor(o/a)*a needs aligned(o) <= dim - region, i.e.
    # o <= floor((dim - region)/a)*a + a - 1; the residual then still
    # satisfies residual + size <= region
    x_max = (W - cols) // LANE * LANE + LANE - 1
    y_max = (H - rows) // ralign * ralign + ralign - 1
    origins = jnp.stack(
        [
            jnp.clip(origins[:, 0], 0, x_max),
            jnp.clip(origins[:, 1], 0, y_max),
        ],
        axis=1,
    )
    work = jnp.int32 if jnp.issubdtype(img.dtype, jnp.integer) else jnp.float32
    out = pl.pallas_call(
        _make_kernel(size, rows, cols, ralign),
        out_shape=jax.ShapeDtypeStruct((N, size, size), work),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, rows, cols), img.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(origins, img)
    return out.astype(jnp.float32)


def _extract_xla(img, origins, size):
    def one(o):
        return jax.lax.dynamic_slice(
            img, (o[1], o[0]), (size, size)
        ).astype(jnp.float32)

    return jax.vmap(one)(origins)


def extract_patches(
    img: jnp.ndarray, origins: jnp.ndarray, size: int,
    force: str | None = None,
) -> jnp.ndarray:
    """(H, W) image + (N, 2) int32 xy origins -> (N, size, size) f32.

    Origins are clamped into bounds (both paths; near the aligned
    boundary the pallas path may clamp slightly earlier than
    dynamic_slice — callers keep windows interior). force: "pallas" |
    "pallas_interpret" | "xla" | None (auto: pallas on TPU).
    """
    origins = origins.astype(jnp.int32)
    if force in ("pallas", "pallas_interpret"):
        return _extract_pallas(
            img, origins, size, interpret=(force == "pallas_interpret")
        )
    return _extract_xla(img, origins, size)
