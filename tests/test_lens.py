"""Lens model tests: round-trip vs the forward model and vs cv2.fisheye."""

import numpy as np
import jax.numpy as jnp
import cv2

from rssync_tpu.ops import lens as lens_ops

HERO6 = lens_ops.Lens(
    ro=0.01111, fx=1186.0, fy=1186.0, cx=1355.389, cy=1020.317,
    k1=0.04440465777694087, k2=0.01946789951179939,
    k3=-0.004476697539343917, k4=-0.002042912877740792,
)


def grid_points(w=2704, h=2028, step=200):
    pts = [[i, j] for i in range(step, w, step) for j in range(step, h, step)]
    return np.asarray(pts, dtype=np.float64)


def test_undistort_roundtrip():
    pts = grid_points()
    und = np.asarray(lens_ops.undistort_points(HERO6, jnp.asarray(pts)))
    back = np.asarray(lens_ops.distort_points(HERO6, jnp.asarray(und)))
    np.testing.assert_allclose(back, pts, atol=1e-2)  # pixels


def test_undistort_matches_cv2_fisheye():
    pts = grid_points()
    K = np.array(
        [[HERO6.fx, 0, HERO6.cx], [0, HERO6.fy, HERO6.cy], [0, 0, 1]]
    )
    D = np.array([HERO6.k1, HERO6.k2, HERO6.k3, HERO6.k4])
    ref = cv2.fisheye.undistortPoints(
        pts.reshape(1, -1, 2), K, D,
        criteria=(cv2.TERM_CRITERIA_MAX_ITER | cv2.TERM_CRITERIA_EPS, 50, 1e-12),
    ).reshape(-1, 2)
    got = np.asarray(lens_ops.undistort_points(HERO6, jnp.asarray(pts)))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_center_point_and_raw_zero_quirk():
    # raw (0,0) pixel -> (0,0) exactly (reference quirk)
    out = np.asarray(
        lens_ops.undistort_points(HERO6, jnp.asarray([[0.0, 0.0]]))
    )
    np.testing.assert_allclose(out, [[0.0, 0.0]])
    # optical center -> ~0 normalized coords
    out = np.asarray(
        lens_ops.undistort_points(HERO6, jnp.asarray([[HERO6.cx, HERO6.cy]]))
    )
    np.testing.assert_allclose(out, [[0.0, 0.0]], atol=1e-9)


def test_rays_are_unit():
    pts = grid_points()
    und = lens_ops.undistort_points(HERO6, jnp.asarray(pts))
    rays = np.asarray(lens_ops.rays_from_normalized(und))
    np.testing.assert_allclose(np.linalg.norm(rays, axis=-1), 1.0, atol=1e-6)
    assert np.all(rays[:, 2] > 0)
