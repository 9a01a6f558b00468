"""Follow-up microbench: isolate what the ~780 us/call is made of.

- scan-step floor (trivial body)
- vmap(dynamic_slice) scaling in N and S
- pallas burst-DMA with small chunks + real error surfaces
"""

from __future__ import annotations

import time
import sys
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 50


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def timed(name, fn, *args):
    fn_j = jax.jit(fn)
    fetch(fn_j(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        fetch(fn_j(*args))
        best = min(best, time.time() - t0)
    per = best / REPS * 1e6
    print(f"{name:52s} {per:9.1f} us/call", file=sys.stderr, flush=True)
    return per


def scan_reps(body, origins):
    def f(o0):
        def step(carry, i):
            out = body((o0 + i) % 1500)
            return carry + jnp.sum(out.astype(jnp.float32)), None

        tot, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(REPS))
        return tot

    return f


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    key = jax.random.PRNGKey(0)
    H, W = 2028, 2704
    img = jax.random.randint(key, (H, W), 0, 255, jnp.uint8).astype(jnp.float32)

    # floor: trivial body
    o130 = jax.random.randint(key, (130, 2), 0, 1500, jnp.int32)
    timed("floor: static slice + sum",
          scan_reps(lambda o: img[: 40, : 40] + o[0, 0], o130), o130)

    def vds(S):
        def body(o):
            def one(p):
                return jax.lax.dynamic_slice(img, (p[1], p[0]), (S, S))

            return jax.vmap(one)(o)

        return body

    for N in (8, 32, 130, 256):
        oN = jax.random.randint(key, (N, 2), 0, 1500, jnp.int32)
        timed(f"vmap(dynslice) f32 N={N:4d} S=40", scan_reps(vds(40), oN), oN)
    for S in (8, 16, 64, 128):
        timed(f"vmap(dynslice) f32 N=130 S={S}", scan_reps(vds(S), o130), o130)

    # fori_loop of sequential dynamic slices (no vmap/gather)
    def seq_slices(o):
        def body(i, acc):
            p = o[i]
            sl = jax.lax.dynamic_slice(img, (p[1], p[0]), (40, 40))
            return acc + jnp.sum(sl)

        return jax.lax.fori_loop(0, 130, body, jnp.float32(0.0))[None]

    timed("fori_loop 130 sequential dynslice S=40",
          scan_reps(seq_slices, o130), o130)

    # pallas burst DMA, chunk sizes, f32 image
    S = 40

    def make_pallas(chunk, nbuf):
        sub, lane = 8, 128
        rows = S + sub
        rows += (-rows) % 8
        cols = S + lane
        n_iters = 130 // chunk + (1 if 130 % chunk else 0)
        Npad = n_iters * chunk

        def kernel(orig_ref, img_ref, out_ref):
            def inner(scratch, sems):
                def dma(slot, i):
                    ax = (orig_ref[i, 0] // lane) * lane
                    ay = (orig_ref[i, 1] // sub) * sub
                    return pltpu.make_async_copy(
                        img_ref.at[pl.ds(ay, rows), pl.ds(ax, cols)],
                        scratch.at[slot],
                        sems.at[slot],
                    )

                for i in range(nbuf):
                    dma(i, i).start()

                def body(i, _):
                    slot = i % nbuf

                    @pl.when(i + nbuf < Npad)
                    def _():
                        dma(slot, i + nbuf).start()

                    dma(slot, i).wait()
                    ry = orig_ref[i, 1] % sub
                    rx = orig_ref[i, 0] % lane
                    out_ref[i] = scratch[slot, pl.ds(ry, S), pl.ds(rx, S)]
                    return 0

                jax.lax.fori_loop(0, Npad, body, 0, unroll=False)

            pl.run_scoped(
                inner,
                scratch=pltpu.VMEM((nbuf, rows, cols), img.dtype),
                sems=pltpu.SemaphoreType.DMA((nbuf,)),
            )

        def call(o):
            x_max = (W - cols) // lane * lane + lane - 1
            y_max = (H - rows) // sub * sub + sub - 1
            o = jnp.stack(
                [jnp.clip(o[:, 0], 0, x_max), jnp.clip(o[:, 1], 0, y_max)],
                axis=1,
            )
            o = jnp.pad(o, ((0, Npad - o.shape[0]), (0, 0)))
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((Npad, S, S), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(o, img)

        return call

    for nbuf in (2, 8, 16):
        try:
            call = make_pallas(chunk=130 if nbuf == 16 else 130, nbuf=nbuf)
            # smoke-check correctness once
            out = np.asarray(jax.jit(call)(o130))
            oc = np.asarray(o130)
            ok = True
            for i in (0, 64, 129):
                x, y = int(oc[i, 0]), int(oc[i, 1])
                ref = np.asarray(img)[y : y + S, x : x + S]
                if not np.array_equal(out[i], ref):
                    ok = False
            print(f"# pallas nbuf={nbuf} correct={ok}", file=sys.stderr)
            timed(f"pallas burst nbuf={nbuf} f32",
                  lambda o, c=call: scan_reps(c, o)(o), o130)
        except Exception as e:
            msg = str(e).replace("\n", " | ")[:500]
            print(f"pallas nbuf={nbuf} FAILED: {type(e).__name__}: {msg}",
                  file=sys.stderr)

    return 0


if __name__ == "__main__":
    sys.exit(main())
