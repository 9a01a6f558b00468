"""Timeline the warm-vs-tracking interaction: run the e2e recipe with
a phase-marked warm thread and timestamped progress prints, so the
per-block tracking times can be aligned against what the warm thread
was doing at that moment.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
     python experiments/r4_warm_timeline.py
"""

import builtins
import json
import threading
import time

import numpy as np
import jax.numpy as jnp

from rssync_tpu.pipeline import recipe as R
from rssync_tpu.utils.timing import Timings

T0 = time.time()
_print = builtins.print


def tprint(*a, **k):
    k.setdefault("flush", True)
    _print(f"[{time.time()-T0:7.2f}]", *a, **k)


builtins.print = tprint  # timestamps on the pipeline's progress prints


def marked_warm(sp, lens, recipe, progress):
    from rssync_tpu.core.api import SyncProblem
    from rssync_tpu.frontend.tracking import (
        VideoSource, auto_grid_step, grid_points, lift_rays,
        rolling_shutter_ts,
    )
    from rssync_tpu.parallel.batch import (
        batched_presync, batched_sync, stack_windows,
    )
    import math

    inp, params = recipe["input"], recipe["params"]
    frame_start, frame_end = (int(v) for v in inp["frame_range"])
    syncpoints = R.make_syncpoints(params, frame_start, frame_end)
    sync_window = int(params["sync_window"])
    initial_delay = float(inp.get("initial_guess", 0.0)) / 1000.0
    use_presync = bool(inp.get("use_simple_presync", False))
    radius = (float(inp.get("simple_presync_radius", 200.0)) / 1000.0
              if use_presync else math.inf)
    step = float(inp.get("simple_presync_step", 2.0)) / 1000.0
    probe = VideoSource(inp["video_path"])
    width, height, fps = probe.width, probe.height, probe.fps
    probe.cap.release()
    pts = grid_points(width, height,
                      inp.get("grid_step") or auto_grid_step(width))
    pts_j = jnp.asarray(pts, jnp.float32)

    def warm():
        mark = lambda s: tprint(f"WARM {s}")
        try:
            mark("start")
            dummy = SyncProblem(seed=0x5EED)
            dummy._table = sp._table
            dummy._sample_rate = sp._sample_rate
            dummy._quats_start = sp._quats_start
            ra_j, rb_j = lift_rays(lens, pts_j, pts_j)
            ra = np.asarray(ra_j, np.float64)
            rb = np.asarray(rb_j, np.float64)
            mark("lift_rays done")
            p0 = syncpoints[0]
            for f in range(p0, p0 + sync_window + 1):
                ts_a, ts_b = rolling_shutter_ts(
                    lens, pts, pts, f / fps, (f + 1) / fps, height)
                dummy.set_track_result(f, ts_a, ts_b, ra, rb)
            mark("tracks set")
            W = len(syncpoints)
            table = dummy.spline_table
            wide = dummy._wide_ok(radius)
            w_open = dummy.build_window(p0, p0 + sync_window, closed=False)
            w_closed = dummy.build_window(p0, p0 + sync_window, closed=True)
            wins_o = stack_windows([w_open] * W)
            wins_c = stack_windows([w_closed] * W)
            mark("windows built")
            dummy.debug_pre_sync(initial_delay, p0, p0 + sync_window,
                                 radius, R.DEBUG_PLOT_SIZE)
            mark("debug_pre_sync done")
            grid = R._presync_grid(initial_delay, radius, step)
            _, d0 = batched_presync(
                table, wins_o, jnp.asarray(np.asarray(grid), jnp.float32),
                dummy.next_key(), wide=wide)
            np.asarray(d0)
            mark("batched_presync done")
            centers = jnp.full((W,), initial_delay, jnp.float32)
            res = batched_sync(table, wins_c, d0, centers, radius,
                               dummy.next_key(), wide=wide)
            np.asarray(res.delay)
            mark("batched_sync done — WARM COMPLETE")
        except Exception as e:  # noqa: BLE001
            mark(f"FAILED: {e!r}")

    t = threading.Thread(target=warm, daemon=True, name="engine-warm")
    t.start()
    return t


R._start_engine_warm = marked_warm

rec = json.load(open("/tmp/e2e27k/recipe.json"))
rec["output"]["csv_path"] = "/tmp/e2e27k/sync_tl.csv"
rec["output"]["debug_csv_path"] = "/tmp/e2e27k/debug_tl.csv"
timings = Timings()
R.run_recipe(rec, progress=True, timings=timings)
tprint("TOTAL", time.time() - T0)
_print(timings.report())
