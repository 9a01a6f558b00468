"""Measured platform-floor model: what each pipeline stage CANNOT go
below on this device tier, so the bench can print per-stage
floor ratios and flag regressions (a ratio that grows round over
round means the stage drifted away from the hardware, independent of
tunnel/day variance).

Constants come from committed experiments (v5e, 2026-08-19):

- experiments/r4_u8pass2.py — full-resolution elementwise passes are
  bound by the platform's ELEMENTWISE ISSUE RATE (~46 Gelem/s
  observed, ~20x below VPU nameplate; wall is ~constant across u8/
  i16/bf16/f32, so bytes are not the limit). The tracker's one
  irreducible pass — the pyramid's u8->bf16 operand convert —
  measured 41.1 ms per 240 pairs of 2704x2028 = **0.171 ms/pair**,
  and Mosaic cannot beat XLA at it (pallas_conv 47.9 ms).
- experiments/r4_sync_iters.py — Sync wall = sum over passes of the
  max lane's outer iterations x **~7.7 ms/outer-iteration**
  (op-dispatch-bound; 1 window costs the same per iteration as 30
  batched). The reference's cc>5 convergence rule
  (ref core_private.cpp:316-323) makes CONVERGE_COUNT+1 = 6
  iterations the per-pass minimum — passes after the first start at
  the optimum and spend exactly 6 proving convergence.
- experiments/r4_presync_split2.py — PreSync at the reference
  operating point (200 delays x 30 windows x 60 frames) splits into
  ~95 ms P build (VPU-compute-bound banded coefficient selects; the
  fuse-into-kernel idea was disproven, would save ~3 ms) + ~120 ms
  Pallas bisection scoring already at the practical issue-rate floor.

Derivations: docs/KERNELS.md "Platform floors".
"""

from __future__ import annotations

#: measured one-elementwise-pass cost for a 2704x2028 u8 frame
#: (experiments/r4_u8pass2.py `conv`: 41.1 ms / 240 pairs)
ELEMWISE_PASS_MS_PER_MPX = 0.171 / (2704 * 2028 / 1e6)  # ~0.0312 ms/Mpx

#: measured per-outer-iteration cost of the batched Sync while_loop
#: (experiments/r4_sync_iters.py: 49 summed max-lane iterations over
#: 4 passes in ~0.375 s on a slow day, ~0.19-0.24 s typical)
SYNC_MS_PER_OUTER_ITER = 7.7

#: the reference's convergence rule needs 5 consecutive small steps
#: (cc > 5 => 6 iterations minimum per pass, ref core_private.cpp:316)
SYNC_MIN_ITERS_PER_PASS = 6

#: measured PreSync component floors at the reference operating point
#: of 200 delays x 30 windows x 60 frames x 256-lane features
_PRESYNC_REF_OP = 200 * 30 * 60
PRESYNC_FLOOR_S_AT_REF = 0.095 + 0.120


def track_floor_s(n_pairs: int, height: int, width: int) -> float:
    """One elementwise pass over every tracked pixel — the pyramid's
    u8->bf16 convert, which r4_u8pass2.py showed is irreducible."""
    mpx = height * width / 1e6
    return n_pairs * mpx * ELEMWISE_PASS_MS_PER_MPX / 1e3


def presync_floor_s(n_delays: int, n_windows: int, n_frames: int) -> float:
    """P build + scoring floors, scaled linearly in the evaluated
    (delay x window x frame) volume from the measured operating
    point (both components stream that volume)."""
    vol = n_delays * n_windows * n_frames
    return PRESYNC_FLOOR_S_AT_REF * vol / _PRESYNC_REF_OP


def sync_floor_s(passes: int) -> float:
    """Semantic floor: every pass must run >= 6 outer iterations to
    prove convergence, at the measured dispatch-bound per-iteration
    cost. Pass 0 usually needs more (it actually moves the delay), so
    real walls sit above this."""
    return passes * SYNC_MIN_ITERS_PER_PASS * SYNC_MS_PER_OUTER_ITER / 1e3


def floor_report(
    track_s: float,
    presync_s: float,
    sync_s: float,
    *,
    n_pairs: int,
    height: int,
    width: int,
    n_delays: int,
    n_windows: int,
    n_frames: int,
    sync_passes: int = 4,
    warn_ratio: float = 2.0,
) -> dict:
    """Per-stage measured/floor ratios + warnings above warn_ratio.
    Returned dict goes verbatim into the bench JSON extras."""
    floors = {
        "track": track_floor_s(n_pairs, height, width),
        "presync": presync_floor_s(n_delays, n_windows, n_frames),
        "sync4x": sync_floor_s(sync_passes),
    }
    measured = {"track": track_s, "presync": presync_s, "sync4x": sync_s}
    out: dict = {}
    for name, floor in floors.items():
        ratio = measured[name] / floor if floor > 0 else float("inf")
        out[name] = {
            "floor_s": round(floor, 3),
            "measured_s": round(measured[name], 3),
            "x_floor": round(ratio, 2),
            "warn": bool(ratio > warn_ratio),
        }
    return out
