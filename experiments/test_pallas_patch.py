"""Parity test for the experimental pallas patch-gather kernel
(interpreter mode on CPU) against the XLA reference path."""

import numpy as np
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pallas_patch import extract_patches


def test_pallas_interpret_matches_xla_interior(rng):
    H, W, S = 320, 512, 24
    img = jnp.asarray(rng.integers(0, 255, (H, W)), jnp.uint8)
    # interior origins: the aligned-region design cannot reach the
    # last ~(256 - S) px of the x range (documented limitation)
    xs = rng.integers(0, W - 256, 16)
    ys = rng.integers(0, H - S - 32, 16)
    origins = jnp.asarray(np.stack([xs, ys], axis=1), jnp.int32)
    a = np.asarray(extract_patches(img, origins, S, force="pallas_interpret"))
    b = np.asarray(extract_patches(img, origins, S, force="xla"))
    np.testing.assert_array_equal(a, b)


def test_pallas_interpret_f32(rng):
    H, W, S = 256, 384, 16
    img = jnp.asarray(rng.normal(size=(H, W)), jnp.float32)
    origins = jnp.asarray([[0, 0], [100, 60], [120, 200]], jnp.int32)
    a = np.asarray(extract_patches(img, origins, S, force="pallas_interpret"))
    b = np.asarray(extract_patches(img, origins, S, force="xla"))
    np.testing.assert_array_equal(a, b)
