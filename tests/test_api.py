"""SyncProblem API tests: ISyncProblem semantics, both gyro intake
overloads, interval asymmetry, determinism."""

import numpy as np
import pytest

from rssync_tpu import SyncProblem, create_sync_problem
from rssync_tpu.utils.checks import SyncPanic

from synthetic import make_scene


@pytest.fixture(scope="module")
def scene():
    return make_scene(seed=5, true_delay=0.0153, n_frames=14, n_points=50)


def fill_tracks(sp, scene):
    for f, (ta, tb, ra, rb) in scene.frames.items():
        sp.set_track_result(f, ta, tb, ra, rb)


def test_end_to_end_fixed_rate(scene):
    sp = create_sync_problem(seed=0)
    sp.set_gyro_quaternions(scene.quats_wxyz, scene.gyro_rate, float(scene.gyro_ts[0]))
    fill_tracks(sp, scene)
    cost, delay = sp.pre_sync(0.0, 0, 14, 0.002, 0.2)
    assert abs(delay - scene.true_delay) < 0.003
    for _ in range(4):
        cost, delay = sp.sync(delay, 0, 13, 0.0, 0.2)
    assert abs(delay - scene.true_delay) < 5e-4


def test_variable_rate_intake_resamples(scene):
    """Feed jittered variable-rate timestamps; the 50 Hz-rounded SLERP
    resample must land close to the fixed-rate result."""
    rng = np.random.default_rng(1)
    ts = scene.gyro_ts + rng.uniform(-5e-4, 5e-4, size=scene.gyro_ts.shape)
    ts = np.sort(ts)
    ts_us = (ts * 1e6).astype(np.int64)
    sp = create_sync_problem(seed=0)
    sp.set_gyro_quaternions_us(ts_us, scene.quats_wxyz)
    assert sp._sample_rate == scene.gyro_rate  # rounds back to 200 Hz
    fill_tracks(sp, scene)
    _, delay = sp.pre_sync(0.0, 0, 14, 0.002, 0.2)
    _, delay = sp.sync(delay, 0, 13, 0.0, 0.2)
    assert abs(delay - scene.true_delay) < 1e-3


def test_camelcase_aliases(scene):
    sp = SyncProblem(seed=0)
    sp.SetGyroQuaternions(scene.quats_wxyz, scene.gyro_rate, float(scene.gyro_ts[0]))
    f = sorted(scene.frames)[0]
    ta, tb, ra, rb = scene.frames[f]
    sp.SetTrackResult(f, ta, tb, ra, rb)
    ds, cs = sp.DebugPreSync(0.0, f, f + 1, 0.05, 21)
    assert len(ds) == 21 and len(cs) == 21
    assert ds[0] == pytest.approx(-0.05)
    assert ds[-1] == pytest.approx(0.05)


def test_interval_asymmetry(scene):
    """PreSync window is [begin, end); Sync is [begin, end]
    (ref core_private.cpp:66 vs :219)."""
    sp = SyncProblem(seed=0)
    sp.set_gyro_quaternions(scene.quats_wxyz, scene.gyro_rate, float(scene.gyro_ts[0]))
    fill_tracks(sp, scene)
    w_open = sp._window(0, 5, closed=False)
    w_closed = sp._window(0, 5, closed=True)
    assert w_open.num_frames == 5
    assert w_closed.num_frames == 6


def test_determinism(scene):
    results = []
    for _ in range(2):
        sp = SyncProblem(seed=123)
        sp.set_gyro_quaternions(
            scene.quats_wxyz, scene.gyro_rate, float(scene.gyro_ts[0])
        )
        fill_tracks(sp, scene)
        results.append(sp.pre_sync(0.0, 0, 10, 0.01, 0.1))
    assert results[0] == results[1]


def test_nonfinite_rays_panic(scene):
    sp = SyncProblem()
    ta, tb, ra, rb = scene.frames[0]
    bad = ra.copy()
    bad[0, 0] = np.nan
    with pytest.raises(SyncPanic, match="rays_a"):
        sp.set_track_result(0, ta, tb, bad, rb)


def test_unordered_timestamps_panic(scene):
    sp = SyncProblem()
    ts_us = (scene.gyro_ts * 1e6).astype(np.int64)
    ts_us[10] = ts_us[9] - 100
    with pytest.raises(SyncPanic, match="out of order"):
        sp.set_gyro_quaternions_us(ts_us, scene.quats_wxyz)


def test_debug_presync_surface_has_minimum_at_truth(scene):
    sp = SyncProblem(seed=0)
    sp.set_gyro_quaternions(scene.quats_wxyz, scene.gyro_rate, float(scene.gyro_ts[0]))
    fill_tracks(sp, scene)
    delays, costs = sp.debug_pre_sync(0.0, 0, 14, 0.1, 101)
    best = delays[np.argmin(costs)]
    assert abs(best - scene.true_delay) < 0.003


def test_requires_gyro_first(scene):
    sp = SyncProblem()
    fill_tracks(sp, scene)
    with pytest.raises(RuntimeError, match="SetGyroQuaternions"):
        sp.pre_sync(0.0, 0, 5, 0.01, 0.1)
