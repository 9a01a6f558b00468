"""Headline benchmark: track + PreSync + Sync of a 60 s GoPro-shaped
clip on one chip (BASELINE.md north star: < 2 s on a TPU v5e).

Workload (reference operating point, README.md:15-44 / BASELINE.md):
  - 60 s @ 60 fps -> 3599 tracked frame pairs at 2704x2028
  - 130-feature grid (step 200), pyramidal LK on device (per-frame
    pyramids shared across pairs, 16-pair blocks)
  - 30 syncpoints: 60-frame windows every 120 frames
  - PreSync +-200 ms at 2 ms step (200-delay grid), then 4 Sync passes
  - engine rays from the vectorized synthetic generator (no video
    decode in the measurement: the metric is device compute, and no
    real GoPro clip exists in this environment; frames are
    device-generated noise — LK cost is data-independent)

Methodology notes for this environment: the axon remote backend's
block_until_ready is a no-op, so synchronization is via scalar host
fetches; the tunnel's throughput varies, so each stage reports the
best of 2 measured repetitions with distinct inputs (the runtime
dedupes identical executions).

Prints ONE json line: {"metric", "value" (seconds), "unit",
"vs_baseline" (= 2.0 / value; > 1 beats the target)}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from rssync_tpu.utils.timing import enable_compile_cache

    enable_compile_cache()

    from rssync_tpu.frontend.tracking import grid_points, lk_track_video
    from rssync_tpu.parallel.batch import (
        batched_presync,
        batched_sync,
        stack_windows,
    )
    from rssync_tpu.testing.engine_problem import make_engine_problem

    def fetch(x):
        """True device sync: host-fetch one scalar leaf."""
        leaf = jax.tree_util.tree_leaves(x)[0]
        return np.asarray(leaf).ravel()[:1]

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    # ---- tracking stage -------------------------------------------------
    from rssync_tpu.frontend.tracking import lk_track_video_chunked

    H, W = 2028, 2704
    n_pairs_total = 3599
    seg = 240  # pairs per dispatch (seg+1 frames resident, ~1.3 GB u8;
    #            the remote tunnel costs ~30 ms per dispatch)
    key = jax.random.PRNGKey(0)
    pts = jnp.asarray(grid_points(W, H, 200), jnp.float32)
    print(f"# features/frame: {pts.shape[0]}", file=sys.stderr)

    k0, k1, k2 = jax.random.split(key, 3)
    frames = jax.random.randint(k0, (seg + 1, H, W), 0, 255, jnp.uint8)
    fetch(frames)
    t0 = time.time()
    fetch(lk_track_video_chunked(frames, chunk=16, grid_step=200))
    print(f"# lk compile+warmup: {time.time() - t0:.1f}s", file=sys.stderr)

    n_disp = (n_pairs_total + seg - 1) // seg  # 15 dispatches / clip
    track_best = np.inf
    for krep in (k1, k2):
        biases = jax.random.randint(krep, (n_disp,), 0, 100, jnp.uint8)
        fetch(biases)
        t0 = time.time()
        outs = [
            lk_track_video_chunked(
                frames + biases[i], chunk=16, grid_step=200
            )
            for i in range(n_disp)
        ]
        for o in outs:
            fetch(o)
        track_best = min(track_best, time.time() - t0)
    track_time = track_best
    print(
        f"# tracking: {track_best:.2f}s per 60s clip "
        f"({1e3 * track_best / (n_disp * seg):.2f} ms/pair)",
        file=sys.stderr,
    )

    # ---- engine stage ---------------------------------------------------
    t0 = time.time()
    prob = make_engine_problem(
        seed=0, duration=60.0, fps=60.0, n_features=130, sync_window=60,
        syncpoint_distance=120, true_delay=0.0423,
    )
    wins = stack_windows(prob.windows)
    print(
        f"# problem build (host): {time.time() - t0:.1f}s, "
        f"{len(prob.syncpoints)} windows",
        file=sys.stderr,
    )

    delays = jnp.asarray(np.arange(-0.2, 0.2, 0.002) + 0.0, jnp.float32)
    radius = 0.2

    t0 = time.time()
    c, d = batched_presync(
        prob.table, wins, delays, jax.random.PRNGKey(1), wide=True
    )
    fetch(d)
    print(f"# presync compile+run: {time.time() - t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    r = batched_sync(
        prob.table, wins, d, d, radius, jax.random.PRNGKey(2), wide=True
    )
    fetch(r.delay)
    print(f"# sync compile+run: {time.time() - t0:.1f}s", file=sys.stderr)

    presync_best = np.inf
    sync_best = np.inf
    final = None
    for rep in range(2):
        t0 = time.time()
        _, best = batched_presync(
            prob.table, wins, delays, jax.random.PRNGKey(10 + rep), wide=True
        )
        fetch(best)
        presync_best = min(presync_best, time.time() - t0)
        t0 = time.time()
        cur = best
        for i in range(4):
            res = batched_sync(
                prob.table, wins, cur, best, radius,
                jax.random.PRNGKey(20 + 4 * rep + i), wide=True,
            )
            cur = res.delay
        fetch(cur)
        sync_best = min(sync_best, time.time() - t0)
        final = cur

    # NOTE: batched_sync_pipeline (presync + 4 passes in one dispatch)
    # measured 1.034 s vs 1.063 s for the separate dispatches — the
    # async runtime already pipelines the tunnel round-trips — while
    # nearly tripling compile time, so the separate path is the one
    # benchmarked (and the one the pipeline driver runs).
    err_ms = np.abs(np.asarray(final, np.float64) - prob.true_delay).max() * 1e3
    print(
        f"# presync: {presync_best:.3f}s  sync(4x): {sync_best:.3f}s  "
        f"max offset err: {err_ms:.4f} ms",
        file=sys.stderr,
    )
    if err_ms > 0.5:
        print("# WARNING: accuracy above 0.5 ms target", file=sys.stderr)

    total = track_time + presync_best + sync_best
    print(
        json.dumps(
            {
                "metric": "60s GoPro-shaped clip: track+presync+sync wall-clock, 1 chip",
                "value": round(total, 3),
                "unit": "s",
                "vs_baseline": round(2.0 / total, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
