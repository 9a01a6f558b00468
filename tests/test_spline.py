"""Spline fit/eval tests vs scipy natural cubic splines and the
reference's boundary semantics."""

import numpy as np
import jax.numpy as jnp
from scipy.interpolate import CubicSpline

from rssync_tpu.ops import spline


def eval_positions(coeffs, x):
    """Helper: evaluate at float64 positions x via the i0/frac split."""
    x = np.asarray(x, dtype=np.float64)
    i0 = np.floor(x).astype(np.int32)
    frac = (x - i0).astype(np.float32)
    return np.asarray(
        spline.eval_spline(jnp.asarray(coeffs, dtype=jnp.float32),
                           jnp.asarray(i0), jnp.asarray(frac))
    )


def test_matches_scipy_natural_cubic(rng):
    n = 50
    y = rng.normal(size=(3, n))
    coeffs = spline.fit_natural_cubic(y)
    assert coeffs.shape == (n, 3, 4)
    cs = [CubicSpline(np.arange(n), y[r], bc_type="natural") for r in range(3)]
    x = rng.uniform(0, n - 1, size=200)
    got = eval_positions(coeffs, x)
    ref = np.stack([c(x) for c in cs], axis=-1)
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_interpolates_knots(rng):
    y = rng.normal(size=(2, 20))
    coeffs = spline.fit_natural_cubic(y)
    got = eval_positions(coeffs, np.arange(20))
    np.testing.assert_allclose(got, y.T, atol=1e-5)


def test_extrapolation_continuity(rng):
    """Below 0 and above n-1 the reference continues with the boundary
    quadratic (c=0 at the ends makes it linear); check continuity and
    linear slope."""
    n = 12
    y = rng.normal(size=(1, n))
    coeffs = spline.fit_natural_cubic(y)
    # value continuity at the ends
    eps = 1e-4
    lo = eval_positions(coeffs, [-eps, 0.0, eps])
    np.testing.assert_allclose(lo[0], lo[1], atol=1e-3)
    hi = eval_positions(coeffs, [n - 1 - eps, n - 1.0, n - 1 + eps])
    np.testing.assert_allclose(hi[1], hi[2], atol=1e-3)
    # linearity beyond the end (natural BC -> c=0 at both ends)
    far = eval_positions(coeffs, [n - 1 + 1.0, n - 1 + 2.0, n - 1 + 3.0])
    d1 = far[1] - far[0]
    d2 = far[2] - far[1]
    np.testing.assert_allclose(d1, d2, atol=1e-3)


def test_split_index_precision():
    """The i0/frac split must keep sub-sample precision even when the
    absolute position is huge (the whole reason it exists)."""
    n = 32
    x_knots = np.arange(n)
    y = np.sin(0.3 * x_knots)[None, :]
    coeffs = spline.fit_natural_cubic(y)
    base = 20  # pretend the window starts deep into a long clip:
    # i0 conveys the large part exactly; frac is tiny.
    i0 = jnp.asarray([base], dtype=jnp.int32)
    for delta in [0.0, 1e-4, 2e-4]:
        got = np.asarray(
            spline.eval_spline(
                jnp.asarray(coeffs, dtype=jnp.float32),
                i0,
                jnp.asarray([0.25 + delta], dtype=jnp.float32),
            )
        )[0, 0]
        cs = CubicSpline(x_knots, y[0], bc_type="natural")
        assert abs(got - cs(base + 0.25 + delta)) < 1e-5


def test_deriv_matches_scipy(rng):
    n = 40
    y = rng.normal(size=(2, n))
    coeffs = spline.fit_natural_cubic(y)
    cs = [CubicSpline(np.arange(n), y[r], bc_type="natural") for r in range(2)]
    x = rng.uniform(0.5, n - 1.5, size=100)
    i0 = np.floor(x).astype(np.int32)
    frac = (x - i0).astype(np.float32)
    got = np.asarray(
        spline.eval_spline_deriv(
            jnp.asarray(coeffs, dtype=jnp.float32),
            jnp.asarray(i0), jnp.asarray(frac)
        )
    )
    ref = np.stack([c(x, 1) for c in cs], axis=-1)
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_degenerate_two_knots():
    y = np.array([[1.0, 3.0]])
    coeffs = spline.fit_natural_cubic(y)
    got = eval_positions(coeffs, [0.0, 0.5, 1.0])
    np.testing.assert_allclose(got[:, 0], [1.0, 2.0, 3.0], atol=1e-6)
