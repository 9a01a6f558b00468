"""Unit tests for rssync_tpu.ops.quat against closed forms and
scipy.spatial.transform.Rotation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation, Slerp

from rssync_tpu.ops import quat


def scipy_to_wxyz(r: Rotation) -> np.ndarray:
    q = r.as_quat()  # xyzw
    return np.concatenate([q[..., 3:4], q[..., :3]], axis=-1)


def test_from_axis_angle_matches_scipy(rng):
    aa = rng.normal(size=(64, 3))
    q = np.asarray(quat.from_axis_angle(jnp.asarray(aa)))
    ref = scipy_to_wxyz(Rotation.from_rotvec(aa))
    # scipy canonicalizes sign; compare up to sign
    sign = np.sign(np.sum(q * ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(q, sign * ref, atol=1e-6)


def test_from_axis_angle_small_angle():
    aa = jnp.asarray([[1e-12, 0.0, 0.0], [0.0, 0.0, 0.0]])
    q = np.asarray(quat.from_axis_angle(aa))
    np.testing.assert_allclose(q[:, 0], 1.0, atol=1e-9)
    np.testing.assert_allclose(q[0, 1], 0.5e-12, atol=1e-15)
    # gradient stays finite through the guard
    g = jax.grad(lambda a: quat.from_axis_angle(a).sum())(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_to_axis_angle_roundtrip(rng):
    aa = rng.normal(size=(32, 3))
    aa = aa / np.linalg.norm(aa, axis=-1, keepdims=True) * rng.uniform(
        0.01, 3.0, size=(32, 1)
    )
    back = np.asarray(quat.to_axis_angle(quat.from_axis_angle(jnp.asarray(aa))))
    np.testing.assert_allclose(back, aa, atol=1e-5)


def test_mul_matches_rotation_composition(rng):
    a = Rotation.random(16, rng=np.random.default_rng(1))
    b = Rotation.random(16, rng=np.random.default_rng(2))
    qa, qb = scipy_to_wxyz(a), scipy_to_wxyz(b)
    prod = np.asarray(quat.mul(jnp.asarray(qa), jnp.asarray(qb)))
    ref = scipy_to_wxyz(a * b)
    sign = np.sign(np.sum(prod * ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(prod, sign * ref, atol=1e-6)


def test_rotate_point_matches_scipy(rng):
    r = Rotation.random(32, rng=np.random.default_rng(3))
    q = scipy_to_wxyz(r)
    p = rng.normal(size=(32, 3))
    got = np.asarray(quat.rotate_point(jnp.asarray(q), jnp.asarray(p)))
    np.testing.assert_allclose(got, r.apply(p), atol=1e-6)


def test_rotate_point_nonunit_scales_like_reference(rng):
    # reference computes q*(0,p)*conj(q): scales by |q|^2 for non-unit q
    q = jnp.asarray([2.0, 0.0, 0.0, 0.0])
    p = jnp.asarray([1.0, 2.0, 3.0])
    got = np.asarray(quat.rotate_point(q, p))
    np.testing.assert_allclose(got, 4.0 * np.asarray(p), atol=1e-6)


def test_conj_inverts_rotation(rng):
    r = Rotation.random(8, rng=np.random.default_rng(4))
    q = jnp.asarray(scipy_to_wxyz(r))
    p = jnp.asarray(rng.normal(size=(8, 3)))
    back = quat.rotate_point(quat.conj(q), quat.rotate_point(q, p))
    np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-6)


@pytest.mark.parametrize("t", [0.0, 0.25, 0.5, 0.99, 1.0])
def test_slerp_matches_scipy(t, rng):
    r = Rotation.random(2, rng=np.random.default_rng(5))
    sl = Slerp([0.0, 1.0], r)
    p = jnp.asarray(scipy_to_wxyz(r[0]))
    q = jnp.asarray(scipy_to_wxyz(r[1]))
    got = np.asarray(quat.slerp(p, q, t))
    ref = scipy_to_wxyz(sl(t))
    sign = np.sign(np.sum(got * ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, sign * ref, atol=1e-6)


def test_slerp_antipodal_flip():
    p = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    q = -jnp.asarray([np.cos(0.1), np.sin(0.1), 0.0, 0.0])
    mid = np.asarray(quat.slerp(p, q, 0.5))
    # should interpolate the short way despite the sign flip
    expect = np.array([np.cos(0.05), np.sin(0.05), 0.0, 0.0])
    np.testing.assert_allclose(mid / np.linalg.norm(mid), expect, atol=1e-6)


def test_slerp_identical_quats_small_angle_path():
    p = jnp.asarray([0.5, 0.5, 0.5, 0.5])
    out = np.asarray(quat.slerp(p, p, 0.3))
    np.testing.assert_allclose(out, np.asarray(p), atol=1e-7)


def test_slerp_batched_t(rng):
    r = Rotation.random(2, rng=np.random.default_rng(6))
    p = jnp.broadcast_to(jnp.asarray(scipy_to_wxyz(r[0])), (5, 4))
    q = jnp.broadcast_to(jnp.asarray(scipy_to_wxyz(r[1])), (5, 4))
    ts = jnp.linspace(0, 1, 5)
    out = np.asarray(quat.slerp(p, q, ts))
    sl = Slerp([0.0, 1.0], r)
    ref = scipy_to_wxyz(sl(np.asarray(ts)))
    sign = np.sign(np.sum(out * ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(out, sign * ref, atol=1e-6)


def test_squad_endpoints(rng):
    qs = scipy_to_wxyz(Rotation.random(4, rng=np.random.default_rng(7)))
    p0, p1, p2, p3 = (jnp.asarray(q) for q in qs)
    a = np.asarray(quat.squad(p0, p1, p2, p3, 0.0))
    b = np.asarray(quat.squad(p0, p1, p2, p3, 1.0))
    np.testing.assert_allclose(a, np.asarray(p1), atol=1e-6)
    np.testing.assert_allclose(b, np.asarray(p2), atol=1e-6)


def test_quad_endpoints(rng):
    qs = scipy_to_wxyz(Rotation.random(4, rng=np.random.default_rng(8)))
    p0, p1, p2, p3 = (jnp.asarray(q) for q in qs)
    a = np.asarray(quat.quad(p0, p1, p2, p3, 0.0))
    b = np.asarray(quat.quad(p0, p1, p2, p3, 1.0))
    np.testing.assert_allclose(a, np.asarray(p1), atol=1e-6)
    np.testing.assert_allclose(b, np.asarray(p2), atol=1e-6)
