"""Round-3 pyramid attribution: full-run A/B of pyramid construction
variants at the real operating point (240 pairs, chunk=16, 2.7k u8).
Every variant builds all 8 levels for the 17-frame block and consumes
each level by a full sum (same consumption across variants), inside
one chunked lax.map dispatch like the shipped tracker.

Variants:
  base      - shipped build_pyramid (avgpool L1, blur5+decimate L2+)
  f32       - same but no u8 round-trips (store f32)
  avgpool   - all levels plain 2x2 avgpool (no blur5)
  conv      - blur+decimate via conv_general_dilated stride 2
  matmul    - blur+decimate as two dense banded-matrix matmuls (MXU)
  onlyl1    - levels 0-1 only (cost of the full-res avgpool)
  onlyl2    - levels 0-2 only
"""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.frontend import tracking as T

H, W = 2028, 2704
SEG = 240
CHUNK = 16
LEVELS = 8


def fetch(x):
    # slice on device FIRST: np.asarray(big_array) would ship the whole
    # buffer over the axon tunnel
    return np.asarray(x.ravel()[:1])


def _blurmat(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """(n//2, n) banded matrix: rows are the 5-tap kernel centered at
    even positions with edge clamping; D @ v = blur5+decimate of v."""
    k = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    m = np.zeros((n // 2, n), np.float32)
    for r in range(n // 2):
        for i, kv in enumerate(k):
            c = min(max(2 * r + i - 2, 0), n - 1)
            m[r, c] += kv
    return m


def _poolmat(n: int, dtype=jnp.float32) -> jnp.ndarray:
    m = np.zeros((n // 2, n), np.float32)
    for r in range(n // 2):
        m[r, 2 * r] = 0.5
        m[r, 2 * r + 1] = 0.5
    return m


def build_variant(img, mode, levels=LEVELS):
    store = img.dtype

    def cast(x):
        if mode == "f32":
            return x.astype(jnp.float32)
        if jnp.issubdtype(store, jnp.integer):
            return jnp.clip(jnp.round(x), 0, 255).astype(store)
        return x.astype(store)

    pyr = [img]
    if mode in ("base", "f32", "onlyl1", "onlyl2"):
        n = {"onlyl1": 2, "onlyl2": 3}.get(mode, levels)
        if n > 1:
            pyr.append(cast(T._avgpool2(img.astype(jnp.float32))))
        for _ in range(2, n):
            pyr.append(cast(T._downsample2(pyr[-1].astype(jnp.float32))))
    elif mode == "avgpool":
        for _ in range(1, levels):
            pyr.append(cast(T._avgpool2(pyr[-1].astype(jnp.float32))))
    elif mode == "conv":
        k = jnp.asarray([1, 4, 6, 4, 1], jnp.float32) / 16.0
        kv = k.reshape(1, 1, 5, 1)
        kh = k.reshape(1, 1, 1, 5)
        pyr.append(cast(T._avgpool2(img.astype(jnp.float32))))
        for _ in range(2, levels):
            x = pyr[-1].astype(jnp.float32)[:, None]  # (B,1,h,w)
            x = jax.lax.conv_general_dilated(
                x, kv, (2, 1), [(2, 2), (0, 0)])
            x = jax.lax.conv_general_dilated(
                x, kh, (1, 2), [(0, 0), (2, 2)])
            pyr.append(cast(x[:, 0]))
    elif mode == "matmul":
        pyr.append(cast(T._avgpool2(img.astype(jnp.float32))))
        for _ in range(2, levels):
            x = pyr[-1].astype(jnp.float32)
            h, w = x.shape[-2:]
            dr = jnp.asarray(_blurmat(h))
            dc = jnp.asarray(_blurmat(w))
            x = jnp.einsum("rh,bhw,wc->brc", dr, x, dc.T,
                           preferred_element_type=jnp.float32)
            pyr.append(cast(x))
    elif mode == "mm1":
        # every level as bf16 banded matmuls (u8 exact in bf16; MXU
        # products exact, f32 accumulation -> bit-identical to f32)
        x = img.astype(jnp.bfloat16)
        h, w = x.shape[-2:]
        l1 = jnp.einsum("rh,bhw,wc->brc", jnp.asarray(_poolmat(h), jnp.bfloat16), x,
                        jnp.asarray(_poolmat(w), jnp.bfloat16).T,
                        preferred_element_type=jnp.float32)
        pyr.append(cast(l1))
        for _ in range(2, levels):
            x = pyr[-1].astype(jnp.bfloat16)
            h, w = x.shape[-2:]
            x = jnp.einsum("rh,bhw,wc->brc", jnp.asarray(_blurmat(h), jnp.bfloat16), x,
                           jnp.asarray(_blurmat(w), jnp.bfloat16).T,
                           preferred_element_type=jnp.float32)
            pyr.append(cast(x))
    elif mode == "skip1":
        # L2 straight from L0 (L1 is never consumed on deep pyramids):
        # composed (blur o pool) banded matrix, bf16 on the MXU
        def compose(n):
            return jnp.asarray(
                _blurmat(n // 2) @ _poolmat(n), jnp.bfloat16)
        x = img.astype(jnp.bfloat16)
        h, w = x.shape[-2:]
        l2 = jnp.einsum("rh,bhw,wc->brc", compose(h), x, compose(w).T,
                        preferred_element_type=jnp.float32)
        pyr.append(cast(l2))
        for _ in range(3, levels):
            x = pyr[-1].astype(jnp.bfloat16)
            h, w = x.shape[-2:]
            x = jnp.einsum("rh,bhw,wc->brc", jnp.asarray(_blurmat(h), jnp.bfloat16), x,
                           jnp.asarray(_blurmat(w), jnp.bfloat16).T,
                           preferred_element_type=jnp.float32)
            pyr.append(cast(x))
    elif mode == "onlyl0":
        pass  # no pyramid: measures slice+consumption overhead alone
    elif mode == "skip1b":
        # like skip1 but explicit chained dots with bf16 intermediate
        def compose(n):
            return jnp.asarray(
                _blurmat(n // 2) @ _poolmat(n), jnp.bfloat16)
        x = img.astype(jnp.bfloat16)
        h, w = x.shape[-2:]
        y = jnp.einsum("rh,bhw->brw", compose(h), x,
                       preferred_element_type=jnp.float32)
        l2 = jnp.einsum("brw,cw->brc", y.astype(jnp.bfloat16), compose(w),
                        preferred_element_type=jnp.float32)
        pyr.append(cast(l2))
        for _ in range(3, levels):
            x = pyr[-1].astype(jnp.bfloat16)
            h, w = x.shape[-2:]
            x = jnp.einsum("rh,bhw,wc->brc", jnp.asarray(_blurmat(h), jnp.bfloat16), x,
                           jnp.asarray(_blurmat(w), jnp.bfloat16).T,
                           preferred_element_type=jnp.float32)
            pyr.append(cast(x))
    elif mode == "bf16pool":
        for _ in range(1, levels):
            x = pyr[-1].astype(jnp.bfloat16)
            win = (1,) * (x.ndim - 2) + (2, 2)
            s = jax.lax.reduce_window(
                x, jnp.bfloat16(0), jax.lax.add, win, win, "VALID")
            pyr.append(cast(s.astype(jnp.float32) * 0.25))
    else:
        raise ValueError(mode)
    return pyr


@partial(jax.jit, static_argnames=("mode",))
def run_chunked(frames, mode):
    Tn = frames.shape[0]
    n_chunks = (Tn - 1) // CHUNK
    starts = jnp.arange(n_chunks) * CHUNK

    def one(start):
        blk = jax.lax.dynamic_slice(
            frames, (start, 0, 0), (CHUNK + 1, H, W)
        )
        pyr = build_variant(blk, mode)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in pyr)

    return jax.lax.map(one, starts)


def main():
    print(f"# device: {jax.devices()[0]} levels={LEVELS} seg={SEG} "
          f"chunk={CHUNK}", file=sys.stderr, flush=True)
    key = jax.random.PRNGKey(0)
    frames = jax.random.randint(key, (SEG + 1, H, W), 0, 255, jnp.uint8)
    fetch(frames)

    modes = sys.argv[1:] or [
        "base", "f32", "avgpool", "conv", "matmul", "onlyl1", "onlyl2",
    ]
    for mode in modes:
        t0 = time.time()
        fetch(run_chunked(frames, mode))
        compile_t = time.time() - t0
        best = np.inf
        for rep in range(2):
            bias = jnp.uint8(rep + 1)
            t0 = time.time()
            fetch(run_chunked(frames + bias, mode))
            best = min(best, time.time() - t0)
        print(f"{mode:10s} {best * 1e3:9.1f} ms  "
              f"({best * 1e3 / SEG:7.3f} ms/pair)  [compile {compile_t:.1f}s]",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
