"""Unchunked full-batch tracker vs the chunk-16 lax.map path
(round 3). Measured: seg=60 0.949, seg=120 0.780, seg=240 0.748
ms/pair vs 0.61 chunked — bigger graphs lose; chunk 16 stays.
"""

import sys, time
import numpy as np, jax, jax.numpy as jnp
from rssync_tpu.frontend import tracking as T
H, W = 2028, 2704
def fetch(x): return np.asarray(x.ravel()[:1])
print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
for seg in [int(a) for a in sys.argv[1:]] or [60, 120, 240]:
    frames = jax.random.randint(jax.random.PRNGKey(0), (seg + 1, H, W), 0, 255, jnp.uint8)
    fetch(frames)
    try:
        t0 = time.time()
        fetch(T.lk_track_video(frames, grid_step=200))
        ct = time.time() - t0
        best = np.inf
        for rep in range(3):
            t0 = time.time()
            fetch(T.lk_track_video(frames + jnp.uint8(rep + 1), grid_step=200))
            best = min(best, time.time() - t0)
        print(f"full seg={seg:4d}  {best*1e3/seg:7.3f} ms/pair  [compile {ct:.0f}s]",
              file=sys.stderr, flush=True)
    except Exception as e:
        print(f"full seg={seg:4d}  FAILED: {type(e).__name__}: {str(e)[:200]}",
              file=sys.stderr, flush=True)
