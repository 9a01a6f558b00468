"""Gyro-signal DSP: zero-phase low-pass, upsample, decimate, and
rate-rounding linear resample.

Rebuild of the reference's gyro signal helpers
(ref: src/core_support/signal.cpp:3-85). In the reference only
`gyro_interpolate` is reachable (from the driver's disabled fixed-rate
path, core_testcode.cpp:20-35); the full set is still part of the
public math surface, so all four are provided.

Conventions follow the reference: signals are (3, N) — channels x
time. The biquad runs as a `lax.scan` over time (sequential by
nature), vectorized over channels; forward + reversed passes give the
reference's zero-phase response.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _biquad_coeffs(divider: int):
    """2nd-order Butterworth-flavored low-pass at f_nyquist/divider
    (ref: signal.cpp:5-9)."""
    ita = 1.0 / np.tan(np.pi / divider)
    q = np.sqrt(2.0)
    b0 = 1.0 / (1.0 + q * ita + ita * ita)
    b1 = 2.0 * b0
    b2 = b0
    a1 = 2.0 * (ita * ita - 1.0) * b0
    a2 = -(1.0 - q * ita + ita * ita) * b0
    return b0, b1, b2, a1, a2


def _biquad_forward(x: jnp.ndarray, coeffs) -> jnp.ndarray:
    """One causal pass, y[i] = b.x + a1 y[i-1] + a2 y[i-2], channels
    vectorized; first two outputs seeded with the inputs (ref
    signal.cpp:11-13 initializes out[0..1] from the signal)."""
    b0, b1, b2, a1, a2 = coeffs
    x0 = x[:, 0]
    x1 = x[:, 1] if x.shape[1] > 1 else x[:, 0]

    def step(state, xi):
        y1, y2, px1, px2 = state
        y = b0 * xi + b1 * px1 + b2 * px2 + a1 * y1 + a2 * y2
        return (y, y1, xi, px1), y

    init = (x1, x0, x1, x0)
    _, ys = jax.lax.scan(step, init, x[:, 2:].T)
    return jnp.concatenate([x[:, :2], ys.T], axis=1)


def gyro_lowpass(samples: jnp.ndarray, divider: int) -> jnp.ndarray:
    """Zero-phase low-pass: forward + time-reversed biquad
    (ref: signal.cpp:3-31). samples: (C, N); divider < 2 is identity.

    The reference filters in place with a two-sample write lag
    (``samples.col(i-2) = out[0]``), so after the forward pass the last
    two columns remain RAW inputs and seed the reverse pass, and the
    reverse pass likewise never overwrites the first/last two columns.
    Replicated exactly: output = [x0, x1, filtered..., x_{N-2}, x_{N-1}].
    """
    if divider < 2:
        return samples
    samples = jnp.asarray(samples)
    if samples.shape[1] < 5:
        return samples  # ref loop bodies degenerate below this length
    coeffs = _biquad_coeffs(divider)
    fwd = _biquad_forward(samples, coeffs)
    fwd = jnp.concatenate([fwd[:, :-2], samples[:, -2:]], axis=1)
    rev = _biquad_forward(fwd[:, ::-1], coeffs)[:, ::-1]
    return jnp.concatenate(
        [samples[:, :2], rev[:, 2:-2], samples[:, -2:]], axis=1
    )


def gyro_upsample(samples: jnp.ndarray, multiplier: int) -> jnp.ndarray:
    """Zero-stuffing upsample + low-pass at the new Nyquist/(4*mult)
    (ref: signal.cpp:33-51). Like the reference, the pass-band gain is
    NOT compensated (zero-stuffing divides energy by `multiplier`);
    replicated for parity and documented here."""
    if multiplier < 2:
        return samples
    samples = jnp.asarray(samples)
    C, N = samples.shape
    out = jnp.zeros((C, N * multiplier), samples.dtype)
    half = multiplier // 2
    # the reference keeps samples where (i + mult/2) % mult == 0
    positions = jnp.arange(N) * multiplier + (multiplier - half) % multiplier
    out = out.at[:, positions].set(samples)
    return gyro_lowpass(out, multiplier * 4)


def gyro_decimate(samples: jnp.ndarray, divider: int) -> jnp.ndarray:
    """Keep every divider-th sample (no pre-filter — the reference
    decimates raw, signal.cpp:53-60)."""
    if divider < 2:
        return samples
    return jnp.asarray(samples)[:, ::divider]


def gyro_interpolate(
    timestamps: np.ndarray, gyro: np.ndarray
) -> tuple[np.ndarray, np.ndarray, int]:
    """Linear resample of (3, N) rate data onto a uniform grid at the
    mean rate rounded to the nearest 50 Hz (ref: signal.cpp:62-85).
    Host-side f64 (ingest path). Returns (new_timestamps (M,),
    new_gyro (3, M), rounded_rate_hz)."""
    ts = np.asarray(timestamps, np.float64).reshape(-1)
    g = np.asarray(gyro, np.float64)
    actual_sr = ts.size / (ts[-1] - ts[0])
    rounded_sr = int(round(actual_sr / 50.0) * 50)
    first = np.ceil(ts[0] * rounded_sr)
    new_ts = []
    s = first
    while s / rounded_sr < ts[-1]:
        new_ts.append(s / rounded_sr)
        s += 1.0
    new_ts = np.asarray(new_ts)
    new_g = np.stack([np.interp(new_ts, ts, g[r]) for r in range(g.shape[0])])
    return new_ts, new_g, rounded_sr
