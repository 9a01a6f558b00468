"""Parity tests for the Pallas RANSAC-scoring kernel (interpreter
mode on CPU) against the XLA bisection it replaces on TPU, and for
the whole-window guesser against the original per-frame vmap path."""

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.core.ransac import (
    guess_motion,
    guess_motion_window,
    sample_pairs,
)
from rssync_tpu.ops.pallas_score import (
    score_quartile_pallas,
    score_quartile_xla,
)

def _problem(rng, F=7, N=40, I=20):
    P = rng.normal(size=(3, F, N)).astype(np.float32) * 0.1
    counts = rng.integers(5, N + 1, size=(F,)).astype(np.int32)
    for f in range(F):
        P[:, f, counts[f]:] = 0.0
    Pn2 = np.sum(P * P, axis=0)
    inv = np.where(Pn2 < 1e-24, 1.0, 1.0 / np.sqrt(np.maximum(Pn2, 1e-30)))
    nP = (P * inv[None]).astype(np.float32)
    v = rng.normal(size=(3, F, I)).astype(np.float32)
    v /= np.maximum(np.linalg.norm(v, axis=0, keepdims=True), 1e-12)
    return jnp.asarray(P), jnp.asarray(nP), jnp.asarray(v), jnp.asarray(counts)


def test_kernel_matches_xla_scoring(rng):
    _, nP, v, counts = _problem(rng)
    a = np.asarray(score_quartile_pallas(nP, v, counts, interpret=True))
    b = np.asarray(score_quartile_xla(nP, v, counts))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=0)


def test_kernel_matches_xla_scoring_tiled(rng):
    """F larger than the frame tile (partial trailing tile) x 200
    hypotheses exercises the frame-axis grid (Sync's GuessMotion
    path; f_tile=16 forces partial trailing tiles like the budgeted
    tile does at Sync's real shapes)."""
    _, nP, v, counts = _problem(rng, F=37, N=24, I=200)
    a = np.asarray(score_quartile_pallas(
        nP, v, counts, interpret=True, f_tile=16))
    b = np.asarray(score_quartile_xla(nP, v, counts))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=0)


def test_kernel_matches_vmapped(rng):
    """Leading batch axes become grid dimensions."""
    B = 3
    packs = [_problem(rng) for _ in range(B)]
    nP = jnp.stack([p[1] for p in packs])
    v = jnp.stack([p[2] for p in packs])
    counts = jnp.stack([p[3] for p in packs])
    a = np.asarray(
        jax.vmap(lambda n, vv, c: score_quartile_pallas(
            n, vv, c, interpret=True))(nP, v, counts)
    )
    b = np.asarray(
        jax.vmap(score_quartile_xla)(nP, v, counts)
    )
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=0)


def test_batched_kernel_matches_vmapped(rng):
    """score_quartile_pallas_batched (multiple whole problems per
    program + batch padding) must equal the per-problem kernel and
    the XLA path bit for bit."""
    from rssync_tpu.ops.pallas_score import score_quartile_pallas_batched

    B = 5  # deliberately NOT divisible by b_tile=2 (exercises padding)
    packs = [_problem(rng) for _ in range(B)]
    nP = jnp.stack([p[1] for p in packs])
    v = jnp.stack([p[2] for p in packs])
    counts = jnp.stack([p[3] for p in packs])
    a = np.asarray(score_quartile_pallas_batched(
        nP, v, counts, interpret=True, b_tile=2))
    b = np.asarray(jax.vmap(score_quartile_xla)(nP, v, counts))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=0)
    c = np.asarray(
        jax.vmap(lambda n, vv, cc: score_quartile_pallas(
            n, vv, cc, interpret=True))(nP, v, counts)
    )
    np.testing.assert_array_equal(a, c)


def test_batched_window_guesser_matches_vmapped(rng):
    """guess_motion_window_batched == vmap(guess_motion_window) for
    the same per-batch keys (the delay-blocked PreSync restructure
    must not change selected motions)."""
    from rssync_tpu.core.ransac import guess_motion_window_batched

    B = 4
    Ps, counts = [], []
    for _ in range(B):
        P, _, _, c = _problem(rng, F=9, N=33)
        Ps.append(P)
        counts.append(c)
    P = jnp.stack(Ps)
    counts = jnp.stack(counts)
    keys = jax.random.split(jax.random.PRNGKey(11), B)
    ref = jax.vmap(
        lambda p, c, k: guess_motion_window(p, c, k, 20, impl="xla")
    )(P, counts, keys)
    got = guess_motion_window_batched(P, counts, keys, 20, impl="xla")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_window_guesser_matches_per_frame(rng):
    """guess_motion_window == vmap(guess_motion) for the same key
    split (the PreSync refactor must not change selected motions)."""
    P, _, _, counts = _problem(rng, F=9, N=33)
    key = jax.random.PRNGKey(7)
    F = P.shape[1]
    keys = jax.random.split(key, F)
    ref = jax.vmap(
        lambda p, c, k: guess_motion(p, c, k, 20), in_axes=(1, 0, 0)
    )(P, counts, keys)
    got = guess_motion_window(P, counts, key, 20, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-7)


def test_window_guesser_pair_draws_match(rng):
    """The refactor keeps the exact per-frame pair draws."""
    key = jax.random.PRNGKey(3)
    counts = jnp.asarray([5, 9, 40], jnp.int32)
    keys = jax.random.split(key, 3)
    r0_ref, r1_ref = jax.vmap(
        lambda k, c: sample_pairs(k, 20, c))(keys, counts)
    r0, r1 = jax.vmap(lambda k, c: sample_pairs(k, 20, c))(keys, counts)
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r0_ref))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r1_ref))


def test_frame_tile_known_shapes():
    """Pin the VMEM-budgeted tile at the production shapes: PreSync
    (I=20) must run whole 60-frame windows in one program; Sync
    (I=200) must land on the proven ft=16 for BOTH N=130 and N=256
    (the footprint scales with the lane-padded N — ft=32 at N=130
    OOM'd the 16 MB scoped-VMEM limit at 19.02 MB, caught by the
    bench). Non-full tiles must be 8-divisible (Mosaic block rule)."""
    from rssync_tpu.ops.pallas_score import _f_tile

    assert _f_tile(60, 20, 256) == 60   # PreSync: whole window
    assert _f_tile(60, 200, 130) == 16  # Sync, bench feature count
    assert _f_tile(60, 200, 256) == 16  # Sync, padded feature count
    for F in (37, 60, 61):
        for I in (20, 200, 400):
            ft = _f_tile(F, I, 256)
            assert ft == F or ft % 8 == 0
            assert 8 <= ft <= F or ft == F


def test_vmem_overflow_raises_and_gates():
    """When even the minimum legal frame tile (8) exceeds the VMEM
    budget (e.g. I=400 hypotheses with a lane-padded N=384), _f_tile
    must raise rather than silently return a tile that compiles into
    a Mosaic scoped-VMEM OOM, and fits_vmem must steer callers to the
    XLA path (ADVICE r3)."""
    import pytest
    from rssync_tpu.ops.pallas_score import _f_tile, fits_vmem

    assert not fits_vmem(60, 400, 300)  # 8*400*384*16 = 19.7 MB
    with pytest.raises(ValueError, match="VMEM budget"):
        _f_tile(60, 400, 300)
    assert fits_vmem(60, 200, 256)
    assert fits_vmem(60, 400, 256)  # exactly 13.1 MB, inside budget
