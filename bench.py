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
    # frames enter pre-padded to the level-0 storage dims, as the real
    # pipeline ships them (pad_frames_host under the decode-ahead
    # overlap): ANY full-clip u8 device pass costs ~0.14 ms/pair on a
    # v5e (experiments/r4_pad.py), so the pad must never run on device
    from rssync_tpu.frontend.tracking import (
        _fine_plan,
        _stored_dims,
        auto_levels,
        lk_track_video_chunked,
    )
    from rssync_tpu.frontend.tracking import LK_ITERS, LK_RADIUS

    H, W = 2028, 2704
    lv = auto_levels(H, W)
    fine0 = 0 in {l for l, *_ in _fine_plan(lv, LK_ITERS, LK_RADIUS)}
    Hp, Wp = _stored_dims(H, W, "fine" if fine0 else "lane")
    n_pairs_total = 3599
    seg = 240  # pairs per dispatch (seg+1 frames resident, ~1.4 GB u8;
    #            the remote tunnel costs ~30 ms per dispatch)
    key = jax.random.PRNGKey(0)
    pts = jnp.asarray(grid_points(W, H, 200), jnp.float32)
    print(f"# features/frame: {pts.shape[0]}", file=sys.stderr)

    k0, k1, k2 = jax.random.split(key, 3)
    frames = jax.random.randint(k0, (seg + 1, Hp, Wp), 0, 255, jnp.uint8)
    fetch(frames)
    t0 = time.time()
    fetch(lk_track_video_chunked(
        frames, chunk=16, grid_step=200, logical_hw=(H, W)))
    print(f"# lk compile+warmup: {time.time() - t0:.1f}s", file=sys.stderr)

    # defeat the runtime's identical-execution dedup with a donated
    # 8-row in-place perturbation instead of a full-frame +bias add —
    # the add was itself a full u8 pass, ~0.026 ms/pair of pure
    # measurement artifact (experiments/r4_bench_track.py)
    from functools import partial as _partial

    @_partial(jax.jit, donate_argnums=0)
    def perturb(fr, b):
        return fr.at[:, :8, :].add(b)

    n_disp = (n_pairs_total + seg - 1) // seg  # 15 dispatches / clip
    biases = jax.random.randint(k1, (3 * n_disp,), 0, 100, jnp.uint8)
    fetch(biases)
    frames = perturb(frames, biases[0])  # warm the perturb executable
    fetch(lk_track_video_chunked(
        frames, chunk=16, grid_step=200, logical_hw=(H, W)))
    track_best = np.inf
    for rep in range(3):  # best-of-3: the remote device swings day to day
        t0 = time.time()
        outs = []
        for i in range(n_disp):
            frames = perturb(frames, biases[rep * n_disp + i])
            outs.append(lk_track_video_chunked(
                frames, chunk=16, grid_step=200, logical_hw=(H, W)))
        for o in outs:
            fetch(o)
        track_best = min(track_best, time.time() - t0)
    track_time = track_best
    print(
        f"# tracking: {track_best:.2f}s per 60s clip "
        f"({1e3 * track_best / (n_disp * seg):.2f} ms/pair)",
        file=sys.stderr,
    )

    # ---- on-video accuracy (same tracker code path as the timing) -------
    # 48 affine-warped textured 2.7k pairs with analytic ground-truth
    # flow (testing/texture_scene.py; host render cached on disk).
    from rssync_tpu.frontend.tracking import pad_frames_host
    from rssync_tpu.testing.texture_scene import render_scene, tracking_error

    t0 = time.time()
    tex_frames, affines = render_scene(
        seed=5, n_frames=49, height=H, width=W)
    print(f"# texture scene (host, cached): {time.time() - t0:.1f}s",
          file=sys.stderr)
    tracked = np.asarray(lk_track_video_chunked(
        jnp.asarray(pad_frames_host(np.asarray(tex_frames))),
        chunk=16, grid_step=200, logical_hw=(H, W)))
    pts_np = np.asarray(grid_points(W, H, 200), np.float64)
    track_med_px, track_p95_px = tracking_error(
        tracked, pts_np, affines, W, H)
    print(
        f"# on-video tracking error: med {track_med_px:.3f} px, "
        f"p95 {track_p95_px:.3f} px (48 textured pairs)",
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
    for rep in range(3):  # best-of-3, same rationale as tracking
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

    # ---- utilization telemetry (VERDICT r2 item 8) ----------------------
    # nominal HBM bytes per stage (analytic; v5e peak ~819 GB/s) so
    # "fast enough" is measurable against hardware, not vibes.
    PEAK_GBS = 819.0
    n_pairs = n_disp * seg
    F, Nf, D_grid, Wn = 60, 130, 200, len(prob.syncpoints)
    lane_n = 256  # feature axis padded to lanes
    # tracking: frames u8 in + pyramid levels {2,5,7} + per-point
    # extraction (search S=31 f32 at 2 fine levels + narrow buffers)
    track_bytes = n_pairs * (
        H * W * (1 + 1 / 16 + 1 / 1024 + 1 / 16384)       # u8 levels
        + Nf * (31 * 512 + 31 * 120) * 2 * 4              # extract+buf f32
        + Nf * (23 * 512) * 4                              # templates
    )
    # presync: P volumes + residual scoring per (delay, window)
    pre_bytes = D_grid * Wn * F * lane_n * 4 * (
        8       # quats a/b + P build intermediates
        + 20 * 2.5  # hypothesis residual volume (f32 + bf16 copy)
    )
    # sync: ~4 passes x (init + ~10 outer iters x ~4 loss evals)
    sync_bytes = 4 * Wn * F * lane_n * 4 * (200 * 2.5 + 10 * 4 * 8)
    for name, sec, byt in (
        ("tracking", track_time, track_bytes),
        ("presync", presync_best, pre_bytes),
        ("sync4x", sync_best, sync_bytes),
    ):
        gbs = byt / 1e9 / sec
        print(
            f"# util {name}: {sec:.3f}s, ~{byt / 1e9:.1f} GB nominal "
            f"-> {gbs:.0f} GB/s ({100 * gbs / PEAK_GBS:.0f}% of HBM peak)",
            file=sys.stderr,
        )

    # ---- platform-floor ratios (VERDICT r4 #2) ---------------------------
    # measured device floors (utils/floors.py; derivations in
    # docs/KERNELS.md "Platform floors") turn "we believe we're near
    # floor" into a per-round regression detector: a growing x_floor
    # means the stage drifted from the hardware, independent of
    # tunnel/day variance.
    from rssync_tpu.utils.floors import floor_report

    floors = floor_report(
        track_time, presync_best, sync_best,
        n_pairs=n_disp * seg, height=H, width=W,
        n_delays=len(delays), n_windows=Wn, n_frames=F,
        sync_passes=4,
    )
    for name, fr in floors.items():
        print(
            f"# floor {name}: {fr['x_floor']}x floor "
            f"({fr['measured_s']}s vs {fr['floor_s']}s)"
            + ("  ** WARN: >2x floor — investigate regression"
               if fr["warn"] else ""),
            file=sys.stderr,
        )

    # ---- compiled Pallas kernel parity (VERDICT r3 #4) -------------------
    # runs every round on the chip; the CPU suite only interprets these
    from rssync_tpu.testing.tpu_selftest import run_selftest

    t0 = time.time()
    try:
        selftest = run_selftest()
    except Exception as exc:  # report, don't sink the bench
        selftest = {"ok": False, "checks": {"exception": repr(exc)}}
    print(
        f"# pallas selftest ({time.time() - t0:.1f}s): "
        + ("PASS" if selftest["ok"] else f"FAIL {selftest['checks']}"),
        file=sys.stderr,
    )

    total = track_time + presync_best + sync_best
    print(
        json.dumps(
            {
                "metric": "60s GoPro-shaped clip: track+presync+sync wall-clock, 1 chip",
                "value": round(total, 3),
                "unit": "s",
                "vs_baseline": round(2.0 / total, 3),
                "extras": {
                    "track_s": round(track_time, 3),
                    "presync_s": round(presync_best, 3),
                    "sync4x_s": round(sync_best, 3),
                    "offset_err_ms": round(float(err_ms), 4),
                    "onvideo_track_med_px": round(track_med_px, 3),
                    "onvideo_track_p95_px": round(track_p95_px, 3),
                    "pallas_selftest": "pass" if selftest["ok"] else "FAIL",
                    "floors": floors,
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
