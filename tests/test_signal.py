"""DSP tests for ops/signal (lowpass/upsample/decimate/interpolate)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rssync_tpu.ops import signal


@pytest.fixture
def two_tone():
    """Low tone (2 Hz) + high tone (80 Hz) at 200 Hz sample rate."""
    t = np.arange(1000) / 200.0
    lo = np.sin(2 * np.pi * 2.0 * t)
    hi = np.sin(2 * np.pi * 80.0 * t)
    sig = np.stack([lo + hi, lo, hi])
    return t, lo, hi, sig


def test_lowpass_keeps_low_kills_high(two_tone):
    t, lo, hi, sig = two_tone
    out = np.asarray(signal.gyro_lowpass(jnp.asarray(sig), divider=8))
    mid = slice(200, 800)
    # channel 1 (pure low tone) passes nearly unchanged
    assert np.abs(out[1, mid] - lo[mid]).max() < 0.05
    # channel 2 (pure high tone) is strongly attenuated
    assert np.abs(out[2, mid]).max() < 0.15 * np.abs(hi[mid]).max()


def test_lowpass_zero_phase(two_tone):
    t, lo, _, _ = two_tone
    out = np.asarray(signal.gyro_lowpass(jnp.asarray(lo[None]), divider=8))[0]
    # zero-phase: cross-correlation peak at zero lag
    mid = slice(200, 800)
    lags = range(-5, 6)
    corr = [np.dot(out[mid], np.roll(lo, k)[mid]) for k in lags]
    assert lags[int(np.argmax(corr))] == 0


def test_lowpass_divider_below_two_identity(two_tone):
    _, _, _, sig = two_tone
    out = signal.gyro_lowpass(jnp.asarray(sig), divider=1)
    np.testing.assert_allclose(np.asarray(out), sig, atol=1e-6)  # f32 cast


def test_decimate(two_tone):
    _, _, _, sig = two_tone
    out = np.asarray(signal.gyro_decimate(jnp.asarray(sig), 4))
    np.testing.assert_allclose(out, sig[:, ::4], atol=1e-6)  # f32 cast


def test_upsample_reconstructs_samples(two_tone):
    t, lo, _, _ = two_tone
    out = np.asarray(signal.gyro_upsample(jnp.asarray(lo[None, :200]), 4))
    assert out.shape == (1, 800)
    # zero-stuffing divides the gain by the multiplier (replicated
    # reference behavior); after x4 compensation the filtered signal
    # must reproduce the original at the stuffing positions.
    ks = np.arange(20, 180)
    got = 4.0 * out[0, 4 * ks + 2]
    np.testing.assert_allclose(got, lo[ks], atol=0.1)


def test_interpolate_rounds_to_50hz(rng):
    ts = np.cumsum(rng.uniform(0.8, 1.2, 2000)) / 207.0  # ~207 Hz jittered
    g = np.stack([np.sin(ts), np.cos(ts), ts * 0.1])
    new_ts, new_g, rate = signal.gyro_interpolate(ts, g)
    assert rate == 200
    dt = np.diff(new_ts)
    np.testing.assert_allclose(dt, 1.0 / 200, atol=1e-12)
    np.testing.assert_allclose(new_g[0], np.sin(new_ts), atol=1e-4)
