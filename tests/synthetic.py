"""Synthetic scene generator: rotating rolling-shutter camera with a
known gyro clock delay, producing exact ray correspondences — the
ground truth is known by construction (SURVEY §4 test strategy).

A 3D point cloud is observed from a camera whose orientation follows a
smooth random angular-velocity trajectory (plus translation if
requested). Rays are generated at per-row rolling-shutter timestamps.
The gyro quaternion log is the same trajectory sampled at `gyro_rate`
but timestamped SHIFTED by `true_delay`: video time t corresponds to
gyro time t + true_delay, so the engine should recover `true_delay`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from scipy.spatial.transform import Rotation


@dataclass
class SyntheticScene:
    true_delay: float
    gyro_rate: float
    fps: float
    n_frames: int
    readout: float  # rolling shutter readout time (s)
    quats_wxyz: np.ndarray  # (n_gyro, 4) gyro orientation samples
    gyro_ts: np.ndarray  # (n_gyro,) timestamps (gyro clock, seconds)
    frames: dict = field(default_factory=dict)
    # frame -> (ts_a, ts_b, rays_a, rays_b) in VIDEO clock seconds


def _smooth_rotation_trajectory(rng, duration, rate, amp=2.0):
    """C2 orientation trajectory: integrate a band-limited random
    angular velocity at high rate, f64."""
    n = int(duration * rate) + 1
    t = np.arange(n) / rate
    # band-limited angular velocity: sum of a few sinusoids per axis
    omega = np.zeros((n, 3))
    for _ in range(4):
        freq = rng.uniform(0.2, 2.0, size=3)
        phase = rng.uniform(0, 2 * np.pi, size=3)
        a = rng.uniform(0.2, amp, size=3)
        omega += a * np.sin(2 * np.pi * freq * t[:, None] + phase)
    # integrate: q_{i} = q_{i-1} * dq  (body rates, right-multiply)
    rots = [Rotation.identity()]
    dt = 1.0 / rate
    for i in range(1, n):
        dq = Rotation.from_rotvec(omega[i] * dt)
        rots.append(rots[-1] * dq)
    return t, Rotation.concatenate(rots)


def make_scene(
    seed=0,
    true_delay=0.037,
    gyro_rate=200.0,
    fps=30.0,
    n_frames=20,
    n_points=150,
    readout=0.011,
    translation_speed=0.0,
    start_time=1.0,
    duration_pad=3.0,
    rate_jitter=0.0,
) -> SyntheticScene:
    """Build a scene. Camera at origin (or translating) looking at a
    random point cloud; intrinsics-free: we generate unit rays
    directly, as the engine consumes rays (tracking is bypassed)."""
    rng = np.random.default_rng(seed)
    duration = start_time + n_frames / fps + duration_pad
    traj_rate = 2000.0
    t_traj, rot_traj = _smooth_rotation_trajectory(rng, duration, traj_rate)

    def rot_at(t):
        # piecewise-slerp lookup on the dense trajectory
        i = np.clip(np.searchsorted(t_traj, t) - 1, 0, len(t_traj) - 2)
        t0 = t_traj[i]
        from scipy.spatial.transform import Slerp

        sl = Slerp([t0, t0 + 1.0 / traj_rate], rot_traj[[i, i + 1]])
        return sl(np.clip(t, t0, t0 + 1.0 / traj_rate))

    def pos_at(t):
        return np.array([translation_speed * t, 0.0, 0.0])

    # world points in front of the camera's average orientation
    pts = rng.normal(size=(n_points, 3)) * np.array([4.0, 4.0, 2.0]) + np.array(
        [0.0, 0.0, 10.0]
    )

    scene = SyntheticScene(
        true_delay=true_delay,
        gyro_rate=gyro_rate,
        fps=fps,
        n_frames=n_frames,
        readout=readout,
        quats_wxyz=None,
        gyro_ts=None,
    )

    # gyro log: sampled on the gyro clock; gyro time = video time + delay.
    # rate_jitter > 0 perturbs each inter-sample interval by
    # U(1-j, 1+j)/rate (monotonic, mean rate preserved) — exercises the
    # variable-rate micro-second intake path (its 50 Hz rate rounding +
    # SLERP resample, ref core_private.cpp:142-190).
    n_gyro = int(duration * gyro_rate)
    if rate_jitter > 0.0:
        dts = rng.uniform(1.0 - rate_jitter, 1.0 + rate_jitter, n_gyro - 1)
        dts /= dts.mean() * gyro_rate
        gyro_ts = np.concatenate([[0.0], np.cumsum(dts)])
    else:
        gyro_ts = np.arange(n_gyro) / gyro_rate
    video_times = gyro_ts - true_delay  # orientation is a function of video time
    quats = []
    for tv in video_times:
        # the engine applies conj(q) to camera rays to get world rays,
        # so the gyro quats must encode the world->camera rotation
        r = rot_at(np.clip(tv, 0, duration - 1e-6)).inv()
        q = r.as_quat()  # xyzw
        quats.append([q[3], q[0], q[1], q[2]])
    scene.quats_wxyz = np.asarray(quats)
    scene.gyro_ts = gyro_ts

    # per-frame correspondences
    for f in range(n_frames):
        t_a = start_time + f / fps
        t_b = start_time + (f + 1) / fps
        ts_a, ts_b, rays_a, rays_b = [], [], [], []
        for p in pts:
            # project in frame a with iterated rolling-shutter row time:
            # row depends on y-coordinate of projection; 2 fixed-point
            # iterations are plenty for these motion amplitudes.
            ta = t_a
            for _ in range(3):
                R = rot_at(ta)
                cam = R.inv().apply(p - pos_at(ta))
                if cam[2] < 1e-3:
                    break
                v = cam / np.linalg.norm(cam)
                # virtual image row from the y/z slope, mapped to [0,1]
                row01 = np.clip(0.5 + 0.5 * (cam[1] / cam[2]) / 1.0, 0, 1)
                ta = t_a + readout * row01
            R = rot_at(ta)
            cam_a = R.inv().apply(p - pos_at(ta))
            if cam_a[2] < 0.5:
                continue
            tb = t_b
            for _ in range(3):
                R = rot_at(tb)
                cam = R.inv().apply(p - pos_at(tb))
                if cam[2] < 1e-3:
                    break
                row01 = np.clip(0.5 + 0.5 * (cam[1] / cam[2]) / 1.0, 0, 1)
                tb = t_b + readout * row01
            R = rot_at(tb)
            cam_b = R.inv().apply(p - pos_at(tb))
            if cam_b[2] < 0.5:
                continue
            ts_a.append(ta)
            ts_b.append(tb)
            rays_a.append(cam_a / np.linalg.norm(cam_a))
            rays_b.append(cam_b / np.linalg.norm(cam_b))
        scene.frames[f] = (
            np.asarray(ts_a),
            np.asarray(ts_b),
            np.asarray(rays_a),
            np.asarray(rays_b),
        )
    return scene
