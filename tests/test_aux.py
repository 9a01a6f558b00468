"""Aux subsystem tests: timing registry, track cache, plots, rderiv."""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from rssync_tpu.ops import spline
from rssync_tpu.utils.timing import Timings
from rssync_tpu.utils import track_cache
from rssync_tpu.core.api import SyncProblem

from synthetic import make_scene


def test_timings_registry():
    t = Timings()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert t.stages["a"].calls == 2
    assert t.stages["b"].calls == 1
    rep = t.report()
    assert "a" in rep and "b" in rep
    d = t.as_dict()
    assert d["a"]["calls"] == 2


def test_track_cache_roundtrip(tmp_path):
    scene = make_scene(seed=2, true_delay=0.01, n_frames=5, n_points=20)
    sp1 = SyncProblem()
    for f, d in scene.frames.items():
        sp1.set_track_result(f, *d)
    p = str(tmp_path / "tracks.npz")
    track_cache.save_tracks(sp1, p)
    sp2 = SyncProblem()
    n = track_cache.load_tracks(sp2, p)
    assert n == 5
    for f in scene.frames:
        a, b = sp1._frame_data[f], sp2._frame_data[f]
        np.testing.assert_array_equal(a.ts_a, b.ts_a)
        np.testing.assert_array_equal(a.rays_b, b.rays_b)


def test_track_cache_or_compute(tmp_path):
    scene = make_scene(seed=2, true_delay=0.01, n_frames=4, n_points=15)
    calls = []

    def fill(sp):
        def compute():
            calls.append(1)
            for f, d in scene.frames.items():
                sp.set_track_result(f, *d)
        return compute

    sp = SyncProblem()
    hit = track_cache.tracks_cached_or_compute(sp, str(tmp_path), "k1", fill(sp))
    assert not hit and len(calls) == 1
    sp2 = SyncProblem()
    hit = track_cache.tracks_cached_or_compute(sp2, str(tmp_path), "k1", fill(sp2))
    assert hit and len(calls) == 1
    assert len(sp2._frame_data) == 4


def test_plot_sync_and_any(tmp_path):
    from rssync_tpu.analysis.plot import plot_any, plot_sync

    frames = np.arange(0, 600, 60)
    delays = 3.0 + 0.002 * frames + np.sin(frames * 0.1) * 0.05
    csv = tmp_path / "sync.csv"
    np.savetxt(csv, np.column_stack([frames, delays]), delimiter=",")
    out = tmp_path / "sync.png"
    q = plot_sync(str(csv), fps=30.0, out_path=str(out))
    assert out.exists() and out.stat().st_size > 1000
    assert q.rmse < 0.1
    out2 = tmp_path / "any.png"
    plot_any(str(csv), out_path=str(out2))
    assert out2.exists()


def test_rotational_deriv_recovers_angular_rate():
    """Constant-rate rotation about z: rderiv vector part must equal
    the body rate (in knots^-1 units)."""
    from scipy.spatial.transform import Rotation

    rate = 0.05  # rad per knot
    n = 64
    ang = rate * np.arange(n)
    q = Rotation.from_euler("z", ang[:, None]).as_quat()  # xyzw
    quats = np.concatenate([q[:, 3:4], q[:, :3]], axis=1)
    coeffs = spline.fit_natural_cubic(quats.T)
    i0 = jnp.asarray([20, 30], jnp.int32)
    p = jnp.asarray([0.3, 0.7], jnp.float32)
    out = np.asarray(spline.rotational_deriv(jnp.asarray(coeffs, jnp.float32), i0, p))
    np.testing.assert_allclose(out[:, 3], rate, atol=1e-3)
    np.testing.assert_allclose(out[:, 1:3], 0.0, atol=1e-3)
    # the numeric variant replicates the reference's formula, which has
    # no factor 2 — it returns HALF the body rate (ndspline.cpp:37-43)
    out_n = np.asarray(
        spline.rotational_deriv_numeric(jnp.asarray(coeffs, jnp.float32), i0, p, 1e-3)
    )
    np.testing.assert_allclose(out_n[:, 3], rate / 2, atol=1e-2)


def test_recipe_track_cache_integration(tmp_path):
    """Second run_recipe with a track cache skips tracking and yields
    identical delays."""
    from rssync_tpu.pipeline.recipe import run_recipe
    from rssync_tpu.testing.synthvideo import make_clip

    clip = make_clip(
        str(tmp_path / "clip"), seed=4, true_delay=0.012, n_frames=12,
        fps=30.0, width=480, height=360, pad=1.0,
    )
    recipe = {
        "input": {
            "video_path": clip.video_path,
            "gyro_path": clip.gyro_path,
            "gyro_orientation": clip.orient,
            "frame_range": [0, 11],
            "lens_profile": {"path": clip.lens_path, "name": clip.lens_name},
            "initial_guess": 500.0,
            "use_simple_presync": True,
            "simple_presync_radius": 60.0,
            "simple_presync_step": 2.0,
        },
        "params": {"sync_window": 6, "syncpoints_format": "array",
                   "syncpoints_array": [0]},
        "output": {},
    }
    cache = str(tmp_path / "cache")
    r1 = run_recipe(recipe, track_cache_dir=cache, seed=0)
    r2 = run_recipe(recipe, track_cache_dir=cache, seed=0)
    assert r1.delays_ms == r2.delays_ms
    import os

    assert any(f.startswith("tracks_") for f in os.listdir(cache))
