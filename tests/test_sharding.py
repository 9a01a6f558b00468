"""Multi-device tests on the 8-virtual-CPU mesh: batched engine
results must be identical sharded vs unsharded."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from rssync_tpu.core.problem import build_track_window, make_spline_table
from rssync_tpu.parallel import batch as pbatch
from rssync_tpu.parallel import mesh as pmesh

from synthetic import make_scene


@pytest.fixture(scope="module")
def batch_problem():
    scene = make_scene(seed=9, true_delay=0.011, n_frames=16, n_points=40)
    table = make_spline_table(scene.quats_wxyz, scene.gyro_rate)
    frames = sorted(scene.frames)

    def win(f0, f1):
        sel = [f for f in frames if f0 <= f <= f1]
        return build_track_window(
            [scene.frames[f][0] for f in sel],
            [scene.frames[f][1] for f in sel],
            [scene.frames[f][2] for f in sel],
            [scene.frames[f][3] for f in sel],
            quats_start=float(scene.gyro_ts[0]),
            sample_rate=scene.gyro_rate,
        )

    wins = pbatch.stack_windows([win(0, 3), win(4, 7), win(8, 11), win(12, 15)])
    return scene, table, wins


def test_eight_cpu_devices_present():
    assert len(jax.devices()) == 8


def test_batched_presync_sharded_matches_unsharded(batch_problem):
    scene, table, wins = batch_problem
    delays = jnp.asarray(np.arange(-0.05, 0.05, 0.002), jnp.float32)
    key = jax.random.PRNGKey(3)
    cost_u, delay_u = pbatch.batched_presync(table, wins, delays, key)

    mesh = pmesh.make_mesh(jax.devices()[:4])
    wins_s = pmesh.shard_windows(wins, mesh)
    table_s = pmesh.replicate_table(table, mesh)
    cost_s, delay_s = pbatch.batched_presync(table_s, wins_s, delays, key)
    # SPMD partitioning reorders f32 reductions -> small numeric drift
    np.testing.assert_allclose(np.asarray(cost_u), np.asarray(cost_s), rtol=1e-4)
    # argmin may only flip between near-tied grid points
    np.testing.assert_allclose(
        np.asarray(delay_u), np.asarray(delay_s), atol=0.002 + 1e-9
    )
    for d in np.asarray(delay_u):
        assert abs(d - scene.true_delay) < 0.004


def test_batched_sync_sharded_recovers_truth(batch_problem):
    scene, table, wins = batch_problem
    W = wins.frame_mask.shape[0]
    mesh = pmesh.make_mesh(jax.devices()[:4])
    wins_s = pmesh.shard_windows(wins, mesh)
    table_s = pmesh.replicate_table(table, mesh)
    init = pmesh.shard_vector(
        jnp.full((W,), scene.true_delay + 0.003, jnp.float32), mesh
    )
    res = pbatch.batched_sync(
        table_s, wins_s, init, init, 0.2, jax.random.PRNGKey(5)
    )
    for d in np.asarray(res.delay):
        assert abs(d - scene.true_delay) < 1e-3


def test_pad_to_multiple(batch_problem):
    _, table, wins = batch_problem
    padded, orig = pmesh.pad_to_multiple(wins, 8)
    assert orig == 4
    assert padded.frame_mask.shape[0] == 8
    assert float(padded.frame_mask[4:].sum()) == 0.0


def test_fused_pipeline_matches_separate(batch_problem):
    """batched_sync_pipeline (one dispatch) == presync + 4x sync with
    the same key schedule."""
    scene, table, wins = batch_problem
    delays = jnp.asarray(np.linspace(-0.05, 0.05, 21), jnp.float32)
    key = jax.random.PRNGKey(7)

    best_f, results = pbatch.batched_sync_pipeline(
        table, wins, wins, delays, 0.0, 0.1, key, wide=True, passes=4
    )

    keys = jax.random.split(key, 5)
    _, best_s = pbatch.batched_presync(table, wins, delays, keys[0], wide=True)
    W = wins.frame_mask.shape[0]
    centers = jnp.zeros((W,), jnp.float32)
    cur = best_s
    for i in range(4):
        res = pbatch.batched_sync(
            table, wins, cur, centers, 0.1, keys[i + 1], wide=True
        )
        cur = res.delay

    np.testing.assert_allclose(np.asarray(best_f), np.asarray(best_s))
    np.testing.assert_allclose(
        np.asarray(results[-1].delay), np.asarray(cur), atol=1e-7
    )
    err = np.abs(np.asarray(cur, np.float64) - scene.true_delay)
    assert err.max() < 5e-4
