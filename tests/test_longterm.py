"""Long-log / drifting-delay scenario (thesis `longtermdrift`,
BASELINE.md linearity row): a 400 s gyro log whose clock offset drifts,
synced window by window; the recovered delays must track the drift and
the linear-fit RMSE metric (the reference's accuracy measure,
python/plot_sync.py) must resolve the drift shape.

Also the long-log precision check: 400 s of timestamps exceed f32
resolution (~30 us at t=400), so this exercises the host-f64 index
splitting end to end.
"""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.analysis.metrics import sync_rmse
from rssync_tpu.parallel.batch import batched_presync, batched_sync, stack_windows
from rssync_tpu.testing.engine_problem import make_engine_problem

DRIFT = 1.0e-4  # s/s: 40 ms of drift over the 400 s log


def test_longterm_drift_tracked():
    prob = make_engine_problem(
        seed=4,
        duration=400.0,
        fps=30.0,
        n_features=40,
        sync_window=30,           # 1 s windows (thesis methodology)
        syncpoint_distance=600,   # every 20 s
        true_delay=0.021,
        delay_drift=DRIFT,
    )
    wins = stack_windows(prob.windows)
    W = len(prob.syncpoints)
    assert W >= 15

    t_centers = (np.asarray(prob.syncpoints) + prob.sync_window / 2) / prob.fps
    truth = prob.delay_at(t_centers)

    # coarse then fine, batched over all windows (delay swing stays
    # well inside the wide-band slabs at +-60 ms)
    delays = jnp.asarray(np.arange(-0.06, 0.06, 0.002) + 0.021, jnp.float32)
    _, best = batched_presync(
        prob.table, wins, delays, jax.random.PRNGKey(0), wide=True
    )
    cur = best
    for i in range(4):
        res = batched_sync(
            prob.table, wins, cur, best, 0.06, jax.random.PRNGKey(1 + i),
            wide=True,
        )
        cur = res.delay
    got = np.asarray(cur, np.float64)

    # every window's recovered delay tracks the drifting truth
    err_ms = np.abs(got - truth) * 1e3
    assert err_ms.max() < 0.5, err_ms
    assert err_ms.mean() < 0.2, err_ms

    # the reference's linearity metric resolves the drift: RMSE vs a
    # linear fit is small (the drift IS linear), while a constant-model
    # RMSE is dominated by the 40 ms swing
    frames = np.asarray(prob.syncpoints, np.float64)
    q = sync_rmse(frames, got * 1e3)
    spread = np.std(got * 1e3)
    assert q.rmse < 0.2, q.rmse
    assert spread > 2.0  # the drift is actually present in the data

    # recovered slope matches the injected drift to a few percent
    slope = np.polyfit(t_centers, got, 1)[0]
    assert abs(slope - DRIFT) < 0.1 * DRIFT
