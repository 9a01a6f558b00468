"""Gyro-orientation brute force: rank all 48 axis permutation/sign
variants by PreSync cost.

Rebuild of the reference's disabled `guess_orient` main
(ref: src/core_testcode.cpp:184-233, README.md:47-48): the reference
reloads the gyro and reruns PreSync 48 times sequentially; here the
telemetry loads once, all 48 variants integrate/fit on host, and the
whole (variants x delay-grid x frames) volume evaluates as ONE vmapped
launch — the orientation axis is just one more batch dimension.
"""

from __future__ import annotations

import itertools
import json

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.core.api import SyncProblem, resample_quats_us
from rssync_tpu.core.presync import window_cost
from rssync_tpu.core.problem import SplineTable, make_spline_tables_batched
from rssync_tpu.frontend.integrate import integrate_gyro
from rssync_tpu.frontend.lens_profiles import load_lens_profile
from rssync_tpu.frontend.telemetry import apply_orientation, load_gyro
from rssync_tpu.frontend.tracking import track_frames


def all_orientations() -> list[str]:
    """All 48 = 3! axis permutations x 2^3 sign patterns."""
    out = []
    for perm in itertools.permutations("xyz"):
        for signs in itertools.product((False, True), repeat=3):
            out.append(
                "".join(c.upper() if up else c for c, up in zip(perm, signs))
            )
    return out


@jax.jit
def _variant_costs(tables: SplineTable, win, delays, key):
    """costs (V, D): vmap the PreSync cost over the orientation axis
    (tables stacked on axis 0) and the delay grid."""
    V = tables.coeffs.shape[0]
    D = delays.shape[0]
    keys = jax.random.split(key, V * D).reshape(V, D, 2)

    def per_variant(table, vkeys):
        return jax.vmap(lambda d, k: window_cost(table, win, d, k))(delays, vkeys)

    return jax.vmap(per_variant)(tables, keys)


def run_guess_orient(
    recipe,
    frames: tuple[int, int] | None = None,
    method: str = "lk",
    seed: int = 0,
    progress: bool = False,
) -> list[tuple[float, float, str]]:
    """Returns [(min_cost, argmin_delay_s, orient)] sorted by cost
    ascending (the reference prints the top 5, ref :227-231)."""
    if isinstance(recipe, (str, bytes)):
        with open(recipe) as f:
            recipe = json.load(f)

    inp = recipe["input"]
    frame_begin, frame_end = frames or (int(v) for v in inp["frame_range"])

    data = load_gyro(inp["gyro_path"], orient=None)
    variants = all_orientations()

    # integrate + resample + fit ALL 48 variants as one host batch:
    # timestamps are shared, so the resample grid, SLERP brackets, and
    # the Thomas solve run once over a (48, n)-shaped batch (the
    # reference reloads the gyro and reruns everything 48 times,
    # ref :186-231; round-1 here still looped the host stage).
    if progress:
        print(f"testing {len(variants)} orientation variants...", flush=True)
    ts_us = (data.timestamps * 1_000_000).astype(np.int64)
    oriented = np.stack(
        [apply_orientation(data.gyro, v) for v in variants]
    )  # (V, n, 3)
    quats = integrate_gyro(data.timestamps, oriented)  # (V, n, 4)
    rate_hz, new_ts, new_q = resample_quats_us(ts_us, quats)
    stacked = make_spline_tables_batched(new_q, float(rate_hz))

    sp = SyncProblem(seed=seed)
    # any variant works for the window build (rays/timestamps only);
    # feed variant 0 so quats_start/sample_rate are set
    sp.set_gyro_quaternions_us(ts_us, quats[0])

    lens = load_lens_profile(
        inp["lens_profile"]["path"], inp["lens_profile"]["name"]
    )
    track_frames(sp, lens, inp["video_path"], frame_begin, frame_end, method=method)
    win = sp.build_window(frame_begin, frame_end, closed=False)

    initial = float(inp.get("initial_guess", 0.0)) / 1000.0
    radius = float(inp.get("simple_presync_radius", 200.0)) / 1000.0
    step = float(inp.get("simple_presync_step", 2.0)) / 1000.0
    from rssync_tpu.core.presync import presync_grid

    grid = presync_grid(initial, radius, step)
    delays = jnp.asarray(np.asarray(grid), jnp.float32)

    costs = np.asarray(_variant_costs(stacked, win, delays, sp.next_key()))
    best_i = costs.argmin(axis=1)
    results = [
        (float(costs[v, best_i[v]]), float(grid[best_i[v]]), variants[v])
        for v in range(len(variants))
    ]
    results.sort(key=lambda r: r[0])
    return results
