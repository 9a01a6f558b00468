"""Float64 numpy oracle of the reference engine's math, written from
the behavioral spec in SURVEY.md §2.1 (ref: src/core/core_private.cpp).

This is a TEST-ONLY golden model: a deliberately slow, loop-heavy,
double-precision implementation used to validate the batched f32 JAX
engine. It shares the engine's keyed RANSAC draws (pairs are passed
in), so engine-vs-oracle comparisons isolate numerical differences
from sampling differences.
"""

from __future__ import annotations

import numpy as np
from scipy.interpolate import CubicSpline


class OracleSpline:
    """Natural cubic splines on a uniform grid, f64, one per quat row,
    with the reference's boundary continuation (quadratic from the end
    segments; c = 0 at the ends makes it linear)."""

    def __init__(self, quats: np.ndarray):
        # quats: (n, 4)
        self.n = quats.shape[0]
        x = np.arange(self.n)
        self.splines = [
            CubicSpline(x, quats[:, r], bc_type="natural") for r in range(4)
        ]

    def eval(self, t: float) -> np.ndarray:
        t = float(t)
        tc = np.clip(t, 0.0, self.n - 1)
        out = np.array([s(tc) for s in self.splines])
        if t < 0.0:
            d = np.array([s(0.0, 1) for s in self.splines])
            out = out + d * t
        elif t > self.n - 1:
            d = np.array([s(self.n - 1.0, 1) for s in self.splines])
            out = out + d * (t - (self.n - 1))
        return out


def quat_conj(q):
    return q * np.array([1.0, -1, -1, -1])


def quat_mul(p, q):
    pw, px, py, pz = p
    qw, qx, qy, qz = q
    return np.array(
        [
            pw * qw - px * qx - py * qy - pz * qz,
            pw * qx + px * qw + py * qz - pz * qy,
            pw * qy - px * qz + py * qw + pz * qx,
            pw * qz + px * qy - py * qx + pz * qw,
        ]
    )


def quat_rotate(q, v):
    p = np.concatenate([[0.0], v])
    return quat_mul(quat_mul(q, p), quat_conj(q))[1:]


class OracleProblem:
    """f64 mirror of OptData + the engine entry points."""

    def __init__(self, quats: np.ndarray, sample_rate: float, quats_start: float):
        self.spline = OracleSpline(np.asarray(quats, np.float64))
        self.sample_rate = float(sample_rate)
        self.quats_start = float(quats_start)
        self.frames = {}  # id -> (ts_a, ts_b, rays_a, rays_b)

    def set_track(self, frame, ts_a, ts_b, rays_a, rays_b):
        self.frames[int(frame)] = (
            np.asarray(ts_a, np.float64),
            np.asarray(ts_b, np.float64),
            np.asarray(rays_a, np.float64),
            np.asarray(rays_b, np.float64),
        )

    def compute_problem(self, frame: int, delay: float) -> np.ndarray:
        """(ref: core_private.cpp:15-32)"""
        ts_a, ts_b, rays_a, rays_b = self.frames[frame]
        at = (ts_a - self.quats_start + delay) * self.sample_rate
        bt = (ts_b - self.quats_start + delay) * self.sample_rate
        P = np.zeros((len(ts_a), 3))
        for i in range(len(ts_a)):
            qa = self.spline.eval(at[i])
            qa = qa / np.linalg.norm(qa)
            qb = self.spline.eval(bt[i])
            qb = qb / np.linalg.norm(qb)
            ar = quat_rotate(quat_conj(qa), rays_a[i])
            br = quat_rotate(quat_conj(qb), rays_b[i])
            P[i] = np.cross(ar, br)
        return P

    @staticmethod
    def guess_motion_from_pairs(P: np.ndarray, r0, r1) -> np.ndarray:
        """(ref: core_private.cpp:34-59) with externally supplied pairs."""
        def safe_normalize(m):
            n = np.linalg.norm(m)
            return m if n < 1e-12 else m / n

        nP = np.stack([safe_normalize(row) for row in P])
        best, best_med = None, np.inf
        for a, b in zip(np.asarray(r0), np.asarray(r1)):
            v = safe_normalize(np.cross(P[a], P[b]))
            res2 = np.sort((nP @ v) ** 2)
            med = res2[len(res2) // 4]
            if med < best_med:
                best_med, best = med, v
        return best

    def presync_cost(self, frames, delay, pairs_per_frame) -> float:
        """(ref: core_private.cpp:69-87) for one delay; pairs_per_frame
        maps frame id -> (r0, r1) arrays for its 20 hypotheses."""
        cost = 0.0
        for f in frames:
            P = self.compute_problem(f, delay)
            r0, r1 = pairs_per_frame[f]
            M = self.guess_motion_from_pairs(P, r0, r1)
            PM = P @ M
            k = np.clip(1.0 / np.linalg.norm(PM) * 1e2, 1e1, 1e3)
            r = PM * (k / np.linalg.norm(M))
            rho = np.log1p(r * r)
            cost += np.sqrt(np.sum(np.sqrt(rho)))
        return cost

    def frame_loss(self, frame, delay, M, var_k) -> float:
        """Full robust loss (ref: core_private.cpp:117-123)."""
        P = self.compute_problem(frame, delay)
        r = (P @ M) * (var_k / np.linalg.norm(M))
        return float(np.sum(np.log1p(r * r)))

    def guess_k(self, frame, delay, M) -> float:
        """(ref: core_private.cpp:130-133)"""
        P = self.compute_problem(frame, delay)
        return float(np.clip(1.0 / np.linalg.norm(P @ M) * 1e2, 1e1, 1e3))
