"""Wide-band spline path vs the narrow per-frame path: must agree
exactly (the same coefficients are selected; only slab bookkeeping
differs)."""

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.core.problem import (
    WIDE_SMAX,
    compute_problem,
    make_spline_table,
    make_wide_bands,
    build_track_window,
)
from rssync_tpu.core import presync as presync_mod

import sys
sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
from synthetic import make_scene  # noqa: E402


def _problem():
    scene = make_scene(seed=13, true_delay=0.02, n_frames=10, n_points=40)
    table = make_spline_table(scene.quats_wxyz, scene.gyro_rate)
    frames = sorted(scene.frames)
    win = build_track_window(
        [scene.frames[f][0] for f in frames],
        [scene.frames[f][1] for f in frames],
        [scene.frames[f][2] for f in frames],
        [scene.frames[f][3] for f in frames],
        quats_start=float(scene.gyro_ts[0]),
        sample_rate=scene.gyro_rate,
    )
    return scene, table, win


def test_wide_equals_narrow_compute_problem():
    scene, table, win = _problem()
    center = 0.0
    bands = make_wide_bands(table, win, jnp.float32(center))
    max_swing = (WIDE_SMAX - 6) / float(scene.gyro_rate)
    for delay in [0.0, 0.02, -0.15, max_swing, -max_swing]:
        a = np.asarray(compute_problem(table, win, jnp.float32(delay)))
        b = np.asarray(compute_problem(table, win, jnp.float32(delay), bands))
        np.testing.assert_array_equal(a, b)


def test_wide_equals_narrow_presync_scan():
    scene, table, win = _problem()
    delays = jnp.asarray(np.arange(-0.2, 0.2, 0.01), jnp.float32)
    key = jax.random.PRNGKey(4)
    c_narrow = np.asarray(
        presync_mod.presync_scan(table, win, delays, key, wide=False)
    )
    c_wide = np.asarray(
        presync_mod.presync_scan(table, win, delays, key, wide=True)
    )
    np.testing.assert_array_equal(c_narrow, c_wide)
