"""Synthetic rolling-shutter video + gyro log with known ground-truth
delay, rendered on device.

Produces everything the full pipeline consumes — an MP4 video, a
GyroFlow-style .gcsv gyro log whose clock is shifted by a chosen
`true_delay`, and a lens-profile file — so the complete
telemetry -> integration -> tracking -> PreSync -> Sync stack can be
validated (and benchmarked) end-to-end against a delay known by
construction. The reference has no equivalent; its accuracy metric is
self-consistency over real clips (SURVEY §4).

Scene model: a camera with Kannala-Brandt fisheye optics rotates along
a smooth Euler-angle sinusoid trajectory while observing an infinitely
detailed procedural 3-D texture (sum of random-frequency sinusoids of
the view direction — no texture memory, trivially vectorized). Each
image row is rendered at its own rolling-shutter timestamp.

Clock/sign conventions (derived, not copied — see discussion in
frontend/integrate.py): the driver integrates
q_i = quat_from_aa(omega_i dt) * q_{i-1} (left-multiply,
ref core_testcode.cpp:41-46) and the engine applies conj(q) to camera
rays. For the sync cost to be minimized at the true delay the
integrated q must equal R(t)^-1 (up to a constant), which happens
exactly when the logged rates are the *negated* discrete body rates
-log(R_{k-1}^-1 R_k)/dt. Physical gyros hand you +body rates; the
reference absorbs the sign in its gyro_orientation search (48
variants, all +-axis permutations — README.md:47 warns the convention
is not GyroFlow's). The generator writes +body rates and reports the
all-lowercase orientation "xyz" (full negation) as the correct orient
string, exercising the same mechanism.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from rssync_tpu.ops import lens as lens_ops
from rssync_tpu.ops import quat as quat_ops


@dataclass
class SyntheticClip:
    video_path: str
    gyro_path: str
    lens_path: str
    lens_name: str
    lens: lens_ops.Lens
    true_delay: float
    fps: float
    n_frames: int
    width: int
    height: int
    gyro_rate: float
    orient: str  # orientation string that makes the gyro log consistent


def _euler_trajectory(seed: int, n_modes: int = 3, amp: float = 0.12):
    rng = np.random.default_rng(seed)
    freqs = rng.uniform(0.3, 1.8, size=(3, n_modes))
    phases = rng.uniform(0, 2 * np.pi, size=(3, n_modes))
    amps = rng.uniform(0.3, 1.0, size=(3, n_modes)) * amp

    def angles(t):
        t = jnp.asarray(t)[..., None]
        return jnp.stack(
            [
                jnp.sum(
                    amps[i] * jnp.sin(2 * jnp.pi * freqs[i] * t + phases[i]), axis=-1
                )
                for i in range(3)
            ],
            axis=-1,
        )  # (..., 3) roll, pitch, yaw

    return angles


def _euler_to_matrix(ang):
    """Rz(yaw) @ Ry(pitch) @ Rx(roll), batched; ang (..., 3)."""
    r, p, y = ang[..., 0], ang[..., 1], ang[..., 2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    row0 = jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], -1)
    row1 = jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], -1)
    row2 = jnp.stack([-sp, cp * sr, cp * cr], -1)
    return jnp.stack([row0, row1, row2], -2)  # (..., 3, 3)


def _texture(dirs, seed: int, n_waves: int = 24):
    rng = np.random.default_rng(seed + 1000)
    scales = np.exp(rng.uniform(np.log(4.0), np.log(220.0), size=n_waves))
    axes = rng.normal(size=(n_waves, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    freqs = jnp.asarray(axes * scales[:, None], jnp.float32)  # (K, 3)
    phases = jnp.asarray(rng.uniform(0, 2 * np.pi, n_waves), jnp.float32)
    amps = jnp.asarray(1.0 / np.sqrt(scales), jnp.float32)
    v = jnp.einsum("...c,kc->...k", dirs, freqs) + phases
    val = jnp.einsum("...k,k->...", jnp.sin(v), amps)
    val = val / jnp.sum(amps)
    return (0.5 + 0.5 * jnp.tanh(2.5 * val)) * 255.0


@partial(jax.jit, static_argnames=("seed", "n_modes"))
def _render_rows(row_times, cam_rays, seed, n_modes=3):
    """Render one frame: row_times (H,) seconds; cam_rays (H, W, 3)."""
    angles = _euler_trajectory(seed, n_modes)(row_times)  # (H, 3)
    R = _euler_to_matrix(angles)  # (H, 3, 3) camera->world
    world = jnp.einsum("hij,hwj->hwi", R, cam_rays)
    return _texture(world, seed).astype(jnp.uint8)


def make_clip(
    out_dir: str,
    seed: int = 0,
    true_delay: float = 0.0275,
    fps: float = 30.0,
    n_frames: int = 60,
    width: int = 960,
    height: int = 720,
    gyro_rate: float = 200.0,
    readout: float = 0.0085,
    pad: float = 2.0,
) -> SyntheticClip:
    """Render the clip and write video/gyro/lens files into out_dir."""
    import os

    import cv2

    os.makedirs(out_dir, exist_ok=True)
    # lens: hero6-like distortion, intrinsics scaled to the render size
    s = width / 2704.0
    lens = lens_ops.Lens(
        ro=readout, fx=1186.0 * s, fy=1186.0 * s,
        cx=width * 0.5012, cy=height * 0.5033,
        k1=0.0444, k2=0.0195, k3=-0.00448, k4=-0.00204,
    )

    angles_fn = _euler_trajectory(seed)

    # camera rays per pixel (shared across frames)
    u = np.arange(width, dtype=np.float64)
    v = np.arange(height, dtype=np.float64)
    uu, vv = np.meshgrid(u, v)
    pix = jnp.asarray(np.stack([uu, vv], axis=-1), jnp.float32)
    norm_xy = lens_ops.undistort_points(lens, pix)
    cam_rays = lens_ops.rays_from_normalized(norm_xy)  # (H, W, 3)

    video_path = os.path.join(out_dir, "clip.mp4")
    writer = cv2.VideoWriter(
        video_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (width, height), False
    )
    if not writer.isOpened():
        raise RuntimeError("cv2.VideoWriter failed to open")
    for f in range(n_frames):
        t0 = f / fps
        row_times = jnp.asarray(
            t0 + readout * (np.arange(height) / height), jnp.float32
        )
        img = np.asarray(_render_rows(row_times, cam_rays, seed))
        writer.write(img)
    writer.release()

    # gyro log on the gyro clock: gyro time tau corresponds to video
    # time tau - true_delay; rates are discrete +body rates of R(t)
    duration = n_frames / fps + pad
    n_g = int(duration * gyro_rate)
    tau = np.arange(n_g) / gyro_rate  # gyro clock
    # gyro-clock tau corresponds to render-clock tau - (true_delay + pad/2):
    # the log starts pad/2 before frame 0 so +-presync-radius stays in range,
    # and the engine's recovered delay (vs render-clock timestamps) is
    # true_delay + pad/2 (exported below as .true_delay).
    t_video = tau - (true_delay + pad / 2)
    ang = np.asarray(angles_fn(t_video), np.float64)
    Rm = Rotation.from_euler("ZYX", ang[:, ::-1])  # yaw, pitch, roll
    # discrete body rates: omega_k = log(R_{k-1}^T R_k) * rate
    rel = Rm[:-1].inv() * Rm[1:]
    omega = rel.as_rotvec() * gyro_rate
    omega = np.concatenate([[omega[0]], omega])  # sample 0 pads

    gyro_path = os.path.join(out_dir, "clip.gcsv")
    with open(gyro_path, "w") as f:
        f.write("GYROFLOW IMU LOG\nversion,1.3\nid,synth\n")
        f.write("tscale,0.001\ngscale,1.0\nascale,1.0\nt,gx,gy,gz\n")
        for i in range(n_g):
            f.write(
                f"{tau[i] * 1000:.6f},{omega[i, 0]:.9f},"
                f"{omega[i, 1]:.9f},{omega[i, 2]:.9f}\n"
            )

    lens_name = "synth_cam"
    lens_path = os.path.join(out_dir, "lens.txt")
    with open(lens_path, "w") as f:
        f.write(
            f"{lens_name} {lens.ro} {lens.fx} {lens.fy} {lens.cx} {lens.cy} "
            f"{lens.k1} {lens.k2} {lens.k3} {lens.k4}\n"
        )

    return SyntheticClip(
        video_path=video_path,
        gyro_path=gyro_path,
        lens_path=lens_path,
        lens_name=lens_name,
        lens=lens,
        true_delay=true_delay + pad / 2,  # vs raw video timestamps
        fps=fps,
        n_frames=n_frames,
        width=width,
        height=height,
        gyro_rate=gyro_rate,
        orient="xyz",  # all-lowercase = negate all axes (see module doc)
    )
