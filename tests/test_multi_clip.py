"""Multi-clip batch sync: windows from clips with DIFFERENT gyro
tables and different true delays recover each clip's delay in one
batched launch, including sharded over the CPU mesh."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.core.api import SyncProblem
from rssync_tpu.parallel import mesh as pmesh
from rssync_tpu.parallel.multi import (
    batched_sync_multi,
    stack_problems,
    sync_clips,
)

from synthetic import make_scene


def _clip_problem(seed, true_delay, n_frames=12, gyro_rate=200.0, pad_extra=0.0):
    scene = make_scene(
        seed=seed, true_delay=true_delay, n_frames=n_frames, n_points=40,
        duration_pad=3.0 + pad_extra,
    )
    sp = SyncProblem(seed=seed)
    sp.set_gyro_quaternions(
        scene.quats_wxyz, scene.gyro_rate, float(scene.gyro_ts[0])
    )
    for f, d in scene.frames.items():
        sp.set_track_result(f, *d)
    return sp, scene


def test_sync_clips_recovers_per_clip_delays():
    sp1, sc1 = _clip_problem(21, 0.0123)
    # different knot count (longer pad) exercises table padding
    sp2, sc2 = _clip_problem(22, -0.0312, pad_extra=0.7)
    out = sync_clips(
        [sp1, sp2],
        [[0, 4], [2, 6]],
        sync_window_frames=5,
        initial_delay=0.0,
        presync_step=0.002,
        presync_radius=0.08,
        key=jax.random.PRNGKey(0),
    )
    assert len(out[0]) == 2 and len(out[1]) == 2
    for d in out[0]:
        assert abs(d - sc1.true_delay) < 5e-4
    for d in out[1]:
        assert abs(d - sc2.true_delay) < 5e-4


def test_multi_clip_sharded_over_mesh():
    sp1, sc1 = _clip_problem(31, 0.02)
    sp2, sc2 = _clip_problem(32, -0.015, pad_extra=0.4)
    tables, wins = stack_problems(
        [sp1.spline_table, sp1.spline_table, sp2.spline_table, sp2.spline_table],
        [
            sp1.build_window(0, 5, closed=True),
            sp1.build_window(4, 9, closed=True),
            sp2.build_window(0, 5, closed=True),
            sp2.build_window(4, 9, closed=True),
        ],
    )
    mesh = pmesh.make_mesh(jax.devices()[:4])
    wins_s = pmesh.shard_windows(wins, mesh)
    tables_s = jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(pmesh.WINDOW_AXIS)
            )
        ),
        tables,
    )
    truth = jnp.asarray(
        [sc1.true_delay, sc1.true_delay, sc2.true_delay, sc2.true_delay],
        jnp.float32,
    )
    init = pmesh.shard_vector(truth + 0.003, mesh)
    res = batched_sync_multi(
        tables_s, wins_s, init, init, 0.1, jax.random.PRNGKey(5), wide=True
    )
    err = np.abs(np.asarray(res.delay, np.float64) - np.asarray(truth))
    assert err.max() < 1e-3


def test_sync_clips_heterogeneous_recipes():
    """Per-clip sync_window / initial_guess / presync radius+step
    (VERDICT r2 item 7: no homogeneous-fleet restriction). Clip 2's
    grid is centered away from zero so only a per-clip grid finds it."""
    sp1, sc1 = _clip_problem(41, 0.0123)
    sp2, sc2 = _clip_problem(42, -0.0912, pad_extra=0.7)
    out = sync_clips(
        [sp1, sp2],
        [[0, 4], [2]],
        sync_window_frames=[5, 6],
        initial_delay=[0.0, -0.08],
        presync_step=[0.002, 0.004],
        presync_radius=[0.05, 0.04],
        key=jax.random.PRNGKey(0),
    )
    assert len(out[0]) == 2 and len(out[1]) == 1
    for d in out[0]:
        assert abs(d - sc1.true_delay) < 5e-4
    for d in out[1]:
        assert abs(d - sc2.true_delay) < 5e-4
