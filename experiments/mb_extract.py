"""Microbenchmark: strategies for extracting N small square windows at
dynamic per-point origins from one pyramid level — the LK tracker's
hot operation (130 points x 6 levels x 3599 pairs per clip).

Each strategy is timed as REPS executions inside one jitted scan
(the axon remote dispatch costs ~30 ms; scan amortizes it), best of 3.

Run on the TPU:  python experiments/mb_extract.py
"""

from __future__ import annotations

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

N = 130  # points
S = 40  # window side (radius 10 -> w+2M+2 = 31..39; round to 40)
REPS = 50


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def timed(name, fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    fetch(out)  # compile
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        fetch(fn_j(*args))
        best = min(best, time.time() - t0)
    per = best / REPS * 1e6
    print(f"{name:44s} {per:9.1f} us/call  ({per / N * 1e3:7.1f} ns/pt)",
          file=sys.stderr, flush=True)
    return per


def scan_reps(body, init_origins):
    """Run body(origins) REPS times with varying origins, summing
    outputs so nothing is dead-code-eliminated."""
    def f(origins):
        def step(carry, i):
            o = (init_origins + i) % 1500
            out = body(o)
            return carry + jnp.sum(out.astype(jnp.float32)), None

        tot, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(REPS))
        return tot

    return f


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    key = jax.random.PRNGKey(0)
    H, W = 2028, 2704
    img_u8 = jax.random.randint(key, (H, W), 0, 255, jnp.uint8)
    img_bf = img_u8.astype(jnp.bfloat16)
    img_f32 = img_u8.astype(jnp.float32)
    origins = jax.random.randint(key, (N, 2), 0, 1500, jnp.int32)  # xy

    # ---- 1. current: vmapped dynamic_slice -------------------------------
    def vds(img):
        def body(o):
            def one(p):
                return jax.lax.dynamic_slice(
                    img, (p[1], p[0]), (S, S)
                ).astype(jnp.float32)

            return jax.vmap(one)(o)

        return scan_reps(body, origins)

    timed("vmap(dynamic_slice) u8", vds(img_u8), origins)
    timed("vmap(dynamic_slice) bf16", vds(img_bf), origins)
    timed("vmap(dynamic_slice) f32", vds(img_f32), origins)

    # ---- 2. one-hot matmul rows + cols (MXU) ------------------------------
    def onehot_mm(img):
        Himg, Wimg = img.shape

        def body(o):
            # rows: (N*S, H) one-hot @ (H, W)
            rows_idx = (o[:, 1:2] + jnp.arange(S)[None, :]).reshape(-1)  # N*S
            oh_r = (
                rows_idx[:, None] == jnp.arange(Himg)[None, :]
            ).astype(jnp.bfloat16)
            strips = jax.lax.dot_general(
                oh_r, img.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(N, S, Wimg)
            # cols: (N, S, W) @ (N, W, S) one-hot
            cols_idx = o[:, 0:1] + jnp.arange(S)[None, :]  # (N, S)
            oh_c = (
                cols_idx[:, None, :] == jnp.arange(Wimg)[None, :, None]
            ).astype(jnp.bfloat16)
            return jax.lax.dot_general(
                strips.astype(jnp.bfloat16), oh_c,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )

        return scan_reps(body, origins)

    timed("one-hot matmul rows+cols u8", onehot_mm(img_u8), origins)
    timed("one-hot matmul rows+cols bf16", onehot_mm(img_bf), origins)

    # ---- 3. row dynamic-slice strips + col one-hot matmul ------------------
    def rowslice_colmm(img):
        Himg, Wimg = img.shape

        def body(o):
            def one(p):
                return jax.lax.dynamic_slice(img, (p[1], 0), (S, Wimg))

            strips = jax.vmap(one)(o).astype(jnp.bfloat16)  # (N, S, W)
            cols_idx = o[:, 0:1] + jnp.arange(S)[None, :]
            oh_c = (
                cols_idx[:, None, :] == jnp.arange(Wimg)[None, :, None]
            ).astype(jnp.bfloat16)
            return jax.lax.dot_general(
                strips, oh_c, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )

        return scan_reps(body, origins)

    timed("row-dynslice + col one-hot mm u8", rowslice_colmm(img_u8), origins)
    timed("row-dynslice + col one-hot mm bf16", rowslice_colmm(img_bf), origins)

    # ---- 4. row gather (take) + col one-hot matmul -------------------------
    def rowtake_colmm(img):
        Himg, Wimg = img.shape

        def body(o):
            ridx = (o[:, 1:2] + jnp.arange(S)[None, :]).reshape(-1)
            strips = jnp.take(img, ridx, axis=0).astype(jnp.bfloat16)
            strips = strips.reshape(N, S, Wimg)
            cols_idx = o[:, 0:1] + jnp.arange(S)[None, :]
            oh_c = (
                cols_idx[:, None, :] == jnp.arange(Wimg)[None, :, None]
            ).astype(jnp.bfloat16)
            return jax.lax.dot_general(
                strips, oh_c, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )

        return scan_reps(body, origins)

    timed("row-take + col one-hot mm u8", rowtake_colmm(img_u8), origins)
    timed("row-take + col one-hot mm bf16", rowtake_colmm(img_bf), origins)

    # ---- 5. pallas: burst DMA aligned supersets + in-kernel VMEM slice -----
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def make_pallas(img, chunk=N, sub=8, lane=128):
        Himg, Wimg = img.shape
        rows = S + sub
        rows += (-rows) % 8
        cols = S + lane

        def kernel(orig_ref, img_ref, out_ref):
            def inner(scratch, sems):
                def dma(i):
                    ax = (orig_ref[i, 0] // lane) * lane
                    ay = (orig_ref[i, 1] // sub) * sub
                    return pltpu.make_async_copy(
                        img_ref.at[pl.ds(ay, rows), pl.ds(ax, cols)],
                        scratch.at[i],
                        sems.at[i],
                    )

                for i in range(chunk):  # burst-issue all DMAs
                    dma(i).start()

                def body(i, _):
                    dma(i).wait()
                    ry = orig_ref[i, 1] - (orig_ref[i, 1] // sub) * sub
                    rx = orig_ref[i, 0] - (orig_ref[i, 0] // lane) * lane
                    v = scratch[i, pl.ds(ry, S), pl.ds(rx, S)]
                    out_ref[i] = v.astype(jnp.float32)
                    return 0

                jax.lax.fori_loop(0, chunk, body, 0)

            pl.run_scoped(
                inner,
                scratch=pltpu.VMEM((chunk, rows, cols), img.dtype),
                sems=pltpu.SemaphoreType.DMA((chunk,)),
            )

        def call(o):
            # clamp so aligned region stays in bounds
            x_max = (Wimg - cols) // lane * lane + lane - 1
            y_max = (Himg - rows) // sub * sub + sub - 1
            o = jnp.stack(
                [jnp.clip(o[:, 0], 0, x_max), jnp.clip(o[:, 1], 0, y_max)],
                axis=1,
            )
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((chunk, S, S), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(o, img)

        return call

    for dtype, img, sub in (("u8", img_u8, 32), ("bf16", img_bf, 16),
                            ("f32", img_f32, 8)):
        try:
            call = make_pallas(img, sub=sub)
            timed(
                f"pallas burst-DMA + vmem slice {dtype}",
                lambda o, c=call: scan_reps(c, o)(o),
                origins,
            )
        except Exception as e:
            print(f"pallas {dtype} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", file=sys.stderr)

    return 0


if __name__ == "__main__":
    sys.exit(main())
