"""Probe: does a remote-compile RPC block concurrent device uploads?

Context (r4 warm A/B, 2026-08-18): the background engine-warm thread
adds +232 s to the tracking stage (351 vs 119 s) while saving only
~77 s of exposed sync-stage compile. Two candidate mechanisms:
  (a) the axon tunnel serializes RPCs, so a long compile RPC blocks
      every frame-upload RPC behind it;
  (b) host-side contention (GIL during tracing / dummy-problem build
      on this 1-core box).

This probe isolates (a): thread A uploads 98 MB u8 blocks in a loop
and prints per-iteration rates; thread B fires a fresh unique compile
(not in the jit cache) mid-stream. If upload iterations stall for the
compile's duration, the tunnel serializes and NO threading design can
overlap compile with uploads.

Run: python experiments/r4_tunnel_overlap.py
"""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev}")
    blk = np.zeros((24, 2704, 1520), np.uint8)  # ~98 MB
    mb = blk.nbytes / 1e6

    # warm the upload path once
    jax.device_put(blk, dev).block_until_ready()

    rates = []
    compile_span = [None, None]

    def uploader():
        for i in range(14):
            t0 = time.time()
            jax.device_put(blk, dev).block_until_ready()
            dt = time.time() - t0
            rates.append((time.time(), dt))
            print(f"# upload[{i}] {dt:6.2f}s  {mb/dt:6.1f} MB/s", flush=True)

    def compiler():
        time.sleep(0.5)
        # unique shapes -> guaranteed fresh compile
        t0 = time.time()
        f = jax.jit(lambda a, b: jnp.tanh(a @ b) @ b.T)
        a = jnp.zeros((1021, 763), jnp.float32)
        b = jnp.zeros((763, 517), jnp.float32)
        f(a, b).block_until_ready()
        t1 = time.time()
        compile_span[0] = (t0, t1)
        print(f"# compile#1 (matmul) {t1-t0:.1f}s", flush=True)
        # a second, bigger program while uploads continue
        t0 = time.time()
        g = jax.jit(lambda x: jax.lax.scan(
            lambda c, y: (jnp.tanh(c @ y), c.sum()), x[0], x)[1])
        x = jnp.zeros((9, 389, 389), jnp.float32)
        g(x).block_until_ready()
        t1 = time.time()
        compile_span[1] = (t0, t1)
        print(f"# compile#2 (scan) {t1-t0:.1f}s", flush=True)

    ta = threading.Thread(target=uploader)
    tb = threading.Thread(target=compiler)
    t_start = time.time()
    ta.start(); tb.start()
    ta.join(); tb.join()

    # classify each upload iteration as overlapping a compile or not
    for tag, span in zip(("c1", "c2"), compile_span):
        if span is None:
            continue
        inside = [dt for (te, dt) in rates
                  if span[0] < te and te - dt < span[1]]
        outside = [dt for (te, dt) in rates
                   if te <= span[0] or te - dt >= span[1]]
        med = lambda v: sorted(v)[len(v) // 2] if v else float("nan")
        print(f"# {tag}: median upload dt inside={med(inside):.2f}s "
              f"(n={len(inside)}) outside={med(outside):.2f}s "
              f"(n={len(outside)})")
    print(f"# total {time.time()-t_start:.1f}s")


if __name__ == "__main__":
    main()
