"""Time the engine-warm work in isolation (no concurrent tracking).

The r4 warm A/B showed tracking inflates 119 -> ~350 s with the warm
thread active, in BOTH slow- and fast-tunnel environments. This runs
the exact warm() body inline on an otherwise idle process with
per-phase timers, so we can see whether warm itself takes ~330 s
(tracking is then simply GIL-starved behind it) or is fast (true
amplification).

Run: PYTHONPATH=/root/repo:/root/.axon_site \
     python experiments/r4_warm_phases.py
"""

import json
import time

import jax.numpy as jnp
import numpy as np

from rssync_tpu.core.api import SyncProblem
from rssync_tpu.parallel.batch import (
    batched_presync, batched_sync, stack_windows,
)
from rssync_tpu.frontend.lens_profiles import load_lens_profile
from rssync_tpu.frontend.tracking import (
    VideoSource, auto_grid_step, grid_points, lift_rays,
    rolling_shutter_ts,
)
from rssync_tpu.pipeline.recipe import (
    DEBUG_PLOT_SIZE, _presync_grid, fill_gyro, make_syncpoints,
)


def main():
    rec = json.load(open("/tmp/e2e27k/recipe.json"))
    inp, params = rec["input"], rec["params"]
    t_all = time.time()
    tick = time.time()

    def mark(label):
        nonlocal tick
        now = time.time()
        print(f"# {label:28s} {now - tick:7.2f}s", flush=True)
        tick = now

    sp = SyncProblem(seed=0)
    fill_gyro(sp, inp["gyro_path"], inp.get("gyro_orientation"))
    mark("gyro_ingest")

    lens = load_lens_profile(
        inp["lens_profile"]["path"], inp["lens_profile"]["name"])
    frame_start, frame_end = (int(v) for v in inp["frame_range"])
    syncpoints = make_syncpoints(params, frame_start, frame_end)
    sync_window = int(params["sync_window"])
    initial_delay = float(inp.get("initial_guess", 0.0)) / 1000.0
    radius = float(inp.get("simple_presync_radius", 200.0)) / 1000.0
    step = float(inp.get("simple_presync_step", 2.0)) / 1000.0
    probe = VideoSource(inp["video_path"])
    width, height, fps = probe.width, probe.height, probe.fps
    probe.cap.release()
    pts = grid_points(width, height,
                      inp.get("grid_step") or auto_grid_step(width))
    pts_j = jnp.asarray(pts, jnp.float32)
    mark("setup")

    dummy = SyncProblem(seed=0x5EED)
    dummy._table = sp._table
    dummy._sample_rate = sp._sample_rate
    dummy._quats_start = sp._quats_start
    ra_j, rb_j = lift_rays(lens, pts_j, pts_j)
    ra = np.asarray(ra_j, np.float64)
    rb = np.asarray(rb_j, np.float64)
    mark("lift_rays")

    p0 = syncpoints[0]
    for f in range(p0, p0 + sync_window + 1):
        ts_a, ts_b = rolling_shutter_ts(
            lens, pts, pts, f / fps, (f + 1) / fps, height)
        dummy.set_track_result(f, ts_a, ts_b, ra, rb)
    mark("set_track_result x61")

    W = len(syncpoints)
    table = dummy.spline_table
    wide = dummy._wide_ok(radius)
    w_open = dummy.build_window(p0, p0 + sync_window, closed=False)
    w_closed = dummy.build_window(p0, p0 + sync_window, closed=True)
    wins_o = stack_windows([w_open] * W)
    wins_c = stack_windows([w_closed] * W)
    mark("build+stack windows")

    dummy.debug_pre_sync(initial_delay, p0, p0 + sync_window,
                         radius, DEBUG_PLOT_SIZE)
    mark("debug_pre_sync (compile+run)")

    grid = _presync_grid(initial_delay, radius, step)
    _, d0 = batched_presync(
        table, wins_o, jnp.asarray(np.asarray(grid), jnp.float32),
        dummy.next_key(), wide=wide)
    np.asarray(d0)
    mark("batched_presync (compile+run)")

    centers = jnp.full((W,), initial_delay, jnp.float32)
    res = batched_sync(table, wins_c, d0, centers, radius,
                       dummy.next_key(), wide=wide)
    np.asarray(res.delay)
    mark("batched_sync (compile+run)")

    print(f"# TOTAL {time.time() - t_all:7.2f}s")


if __name__ == "__main__":
    main()
