"""Gyro angular-rate integration into orientation quaternions.

TPU-native rebuild of the driver's sequential integration loop
(ref: src/core_testcode.cpp:37-54): the reference folds
q_i = normalize(quat_from_aa(omega_i * dt_i) * q_{i-1}) one sample at a
time. Here the whole log integrates in one `lax.scan` launch.

Implementation note: quaternion composition is associative, so a
log-depth `lax.associative_scan` also works — but its unrolled HLO
makes compile time grow with the log length (seconds for a
minutes-long log), while this stage's runtime is negligible either
way; the sequential scan compiles in O(1) and keeps the reference's
per-step normalization exactly.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.ops import quat


def integrate_gyro(
    timestamps: np.ndarray, gyro: np.ndarray, dtype=jnp.float64
) -> np.ndarray:
    """Integrate angular rates into orientations.

    timestamps: (n,) seconds. gyro: (n, 3) rad/s (body rates).
    Returns (n, 4) wxyz quaternions with q_0 = identity and
    q_i = dq_i * q_{i-1}, dq_i = exp(omega_i * (t_i - t_{i-1})) —
    the left-multiply convention of ref core_testcode.cpp:41-46.

    Runs on whatever backend is active; f64 on CPU preserves the
    reference's precision for the (host-side) ingest path.
    """
    ts = np.asarray(timestamps, np.float64)
    g = np.asarray(gyro, np.float64)
    n = ts.shape[0]
    if n == 0:
        return np.zeros((0, 4))
    dt = np.diff(ts)
    aa = g[1:] * dt[:, None]  # (n-1, 3)

    if jax.config.jax_enable_x64 or dtype != jnp.float64:
        work_dtype = dtype
    else:
        work_dtype = jnp.float32
    dq = quat.from_axis_angle(jnp.asarray(aa, work_dtype))

    q0 = jnp.asarray([1.0, 0.0, 0.0, 0.0], work_dtype)
    prefix = _scan_fold(q0, dq)
    out = np.zeros((n, 4))
    out[0] = [1.0, 0.0, 0.0, 0.0]
    out[1:] = np.asarray(prefix, np.float64)
    return out


@jax.jit
def _scan_fold(q0, dq):
    # left-multiply fold q_i = normalize(dq_i * q_{i-1})
    def step(q_prev, dq_i):
        q = quat.normalize(quat.mul(dq_i, q_prev))
        return q, q

    return jax.lax.scan(step, q0, dq)[1]


def integrate_gyro_fixed_rate(gyro: np.ndarray, sample_rate: float) -> np.ndarray:
    """Fixed-rate variant (ref: core_testcode.cpp:20-35, the `#if 0`
    path): dt = 1/sample_rate for every step."""
    n = np.asarray(gyro).shape[0]
    ts = np.arange(n, dtype=np.float64) / float(sample_rate)
    return integrate_gyro(ts, gyro)
