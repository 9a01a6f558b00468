"""Robust-loss helpers (ref: src/core_support/inline_utils.hpp:5-50).

The reference builds its loss from explicit value+jacobian tuples
(sqr_jac, log1p_jac, sum_jac, div_jac) because it differentiates by
hand; here the loss is a pure jnp composition and `jax.grad` provides
the jacobians, so only the semantic helpers remain.
"""

from __future__ import annotations

import jax.numpy as jnp

#: RANSAC / loss scale clamp bounds (ref: inline_utils.hpp:49 clamp_k).
K_MIN = 1e1
K_MAX = 1e3


def clamp_k(k):
    """Clamp the residual scale k into [1e1, 1e3] (ref: inline_utils.hpp:49)."""
    return jnp.clip(k, K_MIN, K_MAX)


def safe_normalize(v: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """v/|v|, returning v unchanged when |v| < 1e-12
    (ref: inline_utils.hpp:5-11)."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return jnp.where(n < 1e-12, v, v / jnp.maximum(n, 1e-30))


def safe_norm(v: jnp.ndarray, axis=None, eps: float = 1e-30) -> jnp.ndarray:
    """|v| with a floor so downstream divisions / gradients stay finite."""
    return jnp.maximum(jnp.linalg.norm(v, axis=axis), eps)
