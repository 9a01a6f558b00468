"""lax.map vs fully-unrolled chunk loop for the tracker (round 3).
Measured at seg=80: map 0.676, unroll 0.668 ms/pair, outputs
bit-identical — the map has no per-iteration cost worth removing.
Comparing seg=80 vs seg=240 instead isolates a ~28 ms fixed
per-dispatch cost (the remote tunnel RTT), which the pipelined bench
already hides; single-dispatch harness numbers include it.
"""

import sys, time
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from rssync_tpu.frontend import tracking as T
H, W = 2028, 2704
CHUNK = 16
def fetch(x): return np.asarray(x).ravel()[:1]
print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)

@partial(jax.jit, static_argnames=("pts_static",))
def unrolled(frames, pts_static):
    Tn = frames.shape[0]
    pts = np.asarray(pts_static, np.float32)
    levels, radius, iters = 8, T.LK_RADIUS, T.LK_ITERS
    fine0 = 0 in {l for l, *_ in T._fine_plan(levels, iters, radius)}
    frames_p = T._pad_lanes(frames, fine0)
    outs = []
    for start in range(0, Tn - 1, CHUNK):
        blk = frames_p[start:start + CHUNK + 1]
        outs.append(T._lk_video_core(blk, pts, levels, radius, iters,
                                     logical_hw=(H, W)))
    return jnp.concatenate(outs, axis=0)

for seg in [int(a) for a in sys.argv[1:]] or [80]:
    frames = jax.random.randint(jax.random.PRNGKey(0), (seg + 1, H, W), 0, 255, jnp.uint8)
    pts = T.grid_points(W, H, 200)
    fetch(frames)
    # baseline: shipped lax.map path at same seg
    t0 = time.time()
    fetch(T.lk_track_video_chunked(frames, chunk=CHUNK, grid_step=200))
    ct0 = time.time() - t0
    best0 = np.inf
    for r in range(3):
        t0 = time.time()
        fetch(T.lk_track_video_chunked(frames + jnp.uint8(r + 1), chunk=CHUNK, grid_step=200))
        best0 = min(best0, time.time() - t0)
    print(f"map    seg={seg:4d}  {best0*1e3/seg:7.3f} ms/pair [compile {ct0:.0f}s]",
          file=sys.stderr, flush=True)
    ps = T._static_pts(pts)
    t0 = time.time()
    out_u = unrolled(frames, ps)
    fetch(out_u)
    ct = time.time() - t0
    best = np.inf
    for r in range(3):
        t0 = time.time()
        fetch(unrolled(frames + jnp.uint8(r + 1), ps))
        best = min(best, time.time() - t0)
    print(f"unroll seg={seg:4d}  {best*1e3/seg:7.3f} ms/pair [compile {ct:.0f}s]",
          file=sys.stderr, flush=True)
    ref = np.asarray(T.lk_track_video_chunked(frames, chunk=CHUNK, grid_step=200))
    dev = np.abs(np.asarray(out_u) - ref).max()
    print(f"max|unroll-map| = {dev}", file=sys.stderr, flush=True)
