"""Engine-hardening edge cases (round-5 sweep): inputs at the
boundaries nothing else covers — degenerate per-frame feature counts,
all-zero epipolar matrices, the wide/narrow band boundary, degenerate
DebugPreSync grids, and empty syncpoint schedules. The invariant layer
being matched is the reference's panic set (ref core_private.cpp:76-83,
157-188): every degenerate input either produces finite output or is
rejected with a clear SyncPanic — never NaN, never an internal crash.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

import rssync_tpu  # noqa: E402
from rssync_tpu.utils.checks import SyncPanic  # noqa: E402
from synthetic import make_scene  # noqa: E402


SCENE = dict(seed=3, true_delay=0.02, n_frames=8, n_points=40)


@pytest.fixture(scope="module")
def scene():
    return make_scene(**SCENE)


def _problem(scene, mangle=None):
    sp = rssync_tpu.create_sync_problem(seed=0)
    sp.set_gyro_quaternions(
        scene.quats_wxyz, scene.gyro_rate, float(scene.gyro_ts[0])
    )
    for f, d in scene.frames.items():
        ts_a, ts_b, ra, rb = mangle(f, d) if mangle else d
        sp.set_track_result(f, ts_a, ts_b, ra, rb)
    return sp


def test_debug_presync_point_count_one_rejected(scene):
    """point_count=1 divides by zero in the reference's grid formula
    (ref :345 — SIGFPE there); here it must be a clear SyncPanic, not
    NaN output."""
    sp = _problem(scene)
    with pytest.raises(SyncPanic, match="point_count"):
        sp.debug_pre_sync(0.0, 0, 8, 0.05, 1)
    with pytest.raises(SyncPanic, match="point_count"):
        sp.debug_pre_sync(0.0, 0, 8, 0.05, 0)
    # 2 is the smallest valid grid: both endpoints, finite costs
    delays, costs = sp.debug_pre_sync(0.0, 0, 8, 0.05, 2)
    assert len(delays) == 2 and np.isfinite(costs).all()


def test_sparse_frame_counts_amid_valid(scene):
    """Frames carrying 0 or 1 correspondences between full frames:
    masked out, the remaining frames still recover the delay."""

    def mangle(f, d):
        ts_a, ts_b, ra, rb = d
        if f == 2:  # one lone feature
            return ts_a[:1], ts_b[:1], ra[:1], rb[:1]
        if f == 4:  # no features at all
            return ts_a[:0], ts_b[:0], ra[:0], rb[:0]
        return d

    sp = _problem(scene, mangle)
    cost, delay = sp.pre_sync(0.0, 0, 8, 0.002, 0.05)
    assert np.isfinite(cost)
    assert abs(delay - SCENE["true_delay"]) < 0.004
    cost, delay = sp.sync(delay, 0, 7, 0.0, 0.05)
    assert np.isfinite(cost) and np.isfinite(delay)
    assert abs(delay - SCENE["true_delay"]) < 0.001


def test_zero_flow_window_finite(scene):
    """rays_b == rays_a everywhere (a perfectly static clip): the
    epipolar rows degenerate but costs stay finite and Sync terminates
    inside its radius guard instead of NaN-ing."""
    sp = _problem(scene, lambda f, d: (d[0], d[1], d[2], d[2]))
    cost, delay = sp.pre_sync(0.0, 0, 8, 0.002, 0.05)
    assert np.isfinite(cost) and np.isfinite(delay)
    cost, delay = sp.sync(0.0, 0, 7, 0.0, 0.05)
    assert np.isfinite(cost) and np.isfinite(delay)
    assert abs(delay) <= 0.05 + 1e-6  # inside the search radius


def test_wide_narrow_boundary_parity(scene):
    """Delay swings at exactly the wide-band admission margin
    (_wide_ok: radius * rate <= WIDE_SMAX - 6): the banded fast path
    and the plain path must score the same grid identically."""
    import jax.numpy as jnp

    from rssync_tpu.core import presync as presync_mod
    from rssync_tpu.core.problem import WIDE_SMAX

    sp = _problem(scene)
    radius = (WIDE_SMAX - 6) / scene.gyro_rate  # exactly at the margin
    assert sp._wide_ok(radius)
    assert not sp._wide_ok(radius + 1.5 / scene.gyro_rate)
    win = sp.build_window(0, 8, closed=False)
    table = sp.spline_table
    # grid swinging the full +-radius, endpoints included
    delays = jnp.asarray(
        np.linspace(-radius, radius, 9), jnp.float32
    )
    key = sp.next_key()
    wide_costs = np.asarray(
        presync_mod.presync_scan(table, win, delays, key, wide=True)
    )
    narrow_costs = np.asarray(
        presync_mod.presync_scan(table, win, delays, key, wide=False)
    )
    np.testing.assert_allclose(wide_costs, narrow_costs, rtol=2e-5)


def test_empty_syncpoint_schedule(tmp_path):
    """sync_window larger than the frame range: the reference's
    syncpoint loop body never runs and the CSV is empty (ref
    :303-316) — the batched driver must do the same, not crash in
    stack_windows."""
    from rssync_tpu.pipeline.recipe import make_syncpoints, run_recipe
    from rssync_tpu.testing.synthvideo import make_clip

    assert make_syncpoints(
        {"syncpoints_format": "auto", "sync_window": 100,
         "syncpoint_distance": 10}, 0, 40,
    ) == []

    clip = make_clip(
        str(tmp_path / "clip"), seed=3, true_delay=0.01, n_frames=14,
        fps=30.0, width=320, height=240, pad=1.0,
    )
    csv = tmp_path / "sync.csv"
    rec = {
        "input": {
            "video_path": clip.video_path, "gyro_path": clip.gyro_path,
            "gyro_orientation": clip.orient, "frame_range": [0, 13],
            "lens_profile": {"path": clip.lens_path, "name": clip.lens_name},
            "initial_guess": 0.0, "use_simple_presync": True,
            "simple_presync_radius": 40.0, "simple_presync_step": 2.0,
        },
        "params": {"sync_window": 100, "syncpoints_format": "auto",
                   "syncpoint_distance": 10},
        "output": {"csv_path": str(csv), "debug_csv_path": ""},
    }
    res = run_recipe(rec, method="dis")
    assert res.syncpoints == [] and res.delays_ms == []
    assert csv.read_text() == ""


def test_sync_clips_all_empty_schedules(scene):
    """Multi-clip driver with every clip's schedule empty: per-clip
    empty results, no stacking attempted."""
    import jax

    from rssync_tpu.parallel.multi import sync_clips

    sp = _problem(scene)
    out = sync_clips(
        [sp, sp], [[], []], 60, 0.0, 0.002, 0.05,
        jax.random.PRNGKey(0),
    )
    assert out == [[], []]
