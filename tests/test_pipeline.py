"""End-to-end pipeline tests: recipe -> CSV on a rendered clip with
known ground-truth delay; batched vs sequential parity; guess-orient."""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from rssync_tpu.analysis.metrics import sync_rmse_from_csv
from rssync_tpu.pipeline.recipe import run_recipe
from rssync_tpu.testing.synthvideo import make_clip


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    d = tmp_path_factory.mktemp("clip")
    return make_clip(
        str(d), seed=2, true_delay=0.0213, n_frames=26, fps=30.0,
        width=640, height=480, pad=1.0,
    )


def make_recipe(clip, tmp_path, **over):
    r = {
        "input": {
            "video_path": clip.video_path,
            "gyro_path": clip.gyro_path,
            "gyro_orientation": clip.orient,
            # track_frames reads frame `end` inclusively (ref semantics:
            # pairs for frames [begin, end)), so end <= n_frames - 1
            "frame_range": [0, 25],
            "lens_profile": {"type": "file", "path": clip.lens_path,
                             "name": clip.lens_name},
            # ms units; true engine delay ~= clip.true_delay (s)
            "initial_guess": 500.0,
            "use_simple_presync": True,
            "simple_presync_radius": 80.0,
            "simple_presync_step": 2.0,
        },
        "params": {
            "sync_window": 8,
            "syncpoints_format": "auto",
            "syncpoint_distance": 8,
        },
        "output": {
            "csv_path": str(tmp_path / "sync.csv"),
            "debug_csv_path": str(tmp_path / "debug.csv"),
        },
    }
    for k, v in over.items():
        sec, key = k.split("__")
        r[sec][key] = v
    return r


def test_batched_recipe_recovers_delay(clip, tmp_path):
    recipe = make_recipe(clip, tmp_path)
    res = run_recipe(recipe, batched=True)
    assert res.syncpoints == [0, 8, 16]
    for dms in res.delays_ms:
        assert abs(dms - clip.true_delay * 1000.0) < 0.5
    # CSV written in reference format
    rows = np.loadtxt(res.csv_path, delimiter=",", ndmin=2)
    np.testing.assert_array_equal(rows[:, 0], [0, 8, 16])
    # debug.csv: 200 rows of delay,cost
    dbg = np.loadtxt(res.debug_csv_path, delimiter=",", ndmin=2)
    assert dbg.shape == (200, 2)
    # loss surface minimum near the truth
    best = dbg[np.argmin(dbg[:, 1]), 0]
    assert abs(best - clip.true_delay) < 0.005
    # RMSE metric runs on the output
    q = sync_rmse_from_csv(res.csv_path)
    assert q.rmse < 0.5


def test_recipe_is_telemetry_format_independent(clip, tmp_path):
    """Re-encode the clip's gcsv rates as a Betaflight binary blackbox
    log (.bbl) and run the identical recipe: the full pipeline (ingest
    -> integrate -> track -> presync -> sync) must recover the same
    offsets up to the blackbox raw quantization. Integrates the L1
    format dispatch (SURVEY §2.3; reference lib.rs:29-37 routes every
    format through one entry point) with the end-to-end driver."""
    from gpmf_fixture import write_bbl

    from rssync_tpu.frontend.telemetry import parse_blackbox_bbl, parse_gcsv

    g = parse_gcsv(clip.gyro_path)
    times_us = np.round(g.timestamps * 1e6).astype(np.int64)
    scale = 2.0**-37  # float32-exact; rad/us per LSB -> ~7.3e-6 rad/s
    raw = np.round(g.gyro / (scale * 1e6)).astype(np.int64)
    bbl = tmp_path / "clip.bbl"
    write_bbl(str(bbl), times_us, raw, scale)
    d = parse_blackbox_bbl(str(bbl))
    np.testing.assert_allclose(d.timestamps, g.timestamps, atol=1e-9)
    np.testing.assert_allclose(d.gyro, g.gyro, atol=scale * 1e6)

    d_a = tmp_path / "gcsv_run"
    d_b = tmp_path / "bbl_run"
    d_a.mkdir()
    d_b.mkdir()
    res_a = run_recipe(make_recipe(clip, d_a), batched=True, seed=0)
    res_b = run_recipe(
        make_recipe(clip, d_b, input__gyro_path=str(bbl)),
        batched=True, seed=0,
    )
    assert res_a.syncpoints == res_b.syncpoints
    for da, db in zip(res_a.delays_ms, res_b.delays_ms):
        assert abs(da - db) < 0.05  # ms; quantization-level agreement
        assert abs(db - clip.true_delay * 1000.0) < 0.5


def test_sequential_matches_batched(clip, tmp_path):
    recipe = make_recipe(clip, tmp_path)
    res_b = run_recipe(recipe, batched=True, seed=0)
    res_s = run_recipe(recipe, batched=False, seed=0)
    assert res_b.syncpoints == res_s.syncpoints
    for a, b in zip(res_b.delays_ms, res_s.delays_ms):
        assert abs(a - b) < 0.05  # ms; different RANSAC draws
    for r in (res_b, res_s):
        for dms in r.delays_ms:
            assert abs(dms - clip.true_delay * 1000.0) < 0.5


def test_recipe_from_file_and_dis(clip, tmp_path):
    recipe = make_recipe(clip, tmp_path)
    p = tmp_path / "recipe.json"
    p.write_text(json.dumps(recipe))
    res = run_recipe(str(p), method="dis", batched=True)
    for dms in res.delays_ms:
        assert abs(dms - clip.true_delay * 1000.0) < 0.5


def test_syncpoints_array_mode(clip, tmp_path):
    recipe = make_recipe(
        clip, tmp_path, params__syncpoints_format="array",
        params__syncpoints_array=[4, 12],
    )
    res = run_recipe(recipe, batched=True)
    assert res.syncpoints == [4, 12]


def test_guess_orient_ranks_truth_first(clip, tmp_path):
    from rssync_tpu.pipeline.guess_orient import run_guess_orient

    recipe = make_recipe(clip, tmp_path)
    results = run_guess_orient(recipe, frames=(0, 12))
    assert results[0][2] == clip.orient
    # truth should clearly beat the runner-up
    assert results[0][0] < results[1][0] * 0.9


def test_multi_recipe_cli(clip, tmp_path_factory):
    """Two clips as one batched multi-clip engine run (--multi)."""
    from rssync_tpu.pipeline.recipe import run_multi_recipes

    d2 = tmp_path_factory.mktemp("clip2")
    clip2 = make_clip(
        str(d2), seed=9, true_delay=-0.0117, n_frames=26, fps=30.0,
        width=640, height=480, pad=1.0,
    )
    out = tmp_path_factory.mktemp("multi_out")
    r1 = make_recipe(clip, out)
    r1["output"]["csv_path"] = str(out / "a.csv")
    r2 = make_recipe(clip2, out)
    r2["output"]["csv_path"] = str(out / "b.csv")
    p1, p2 = str(out / "a.json"), str(out / "b.json")
    json.dump(r1, open(p1, "w"))
    json.dump(r2, open(p2, "w"))

    results = run_multi_recipes([p1, p2])
    assert len(results) == 2
    for res, c in zip(results, (clip, clip2)):
        assert res.syncpoints == [0, 8, 16]
        for dms in res.delays_ms:
            assert abs(dms - c.true_delay * 1000.0) < 0.5
    a = np.loadtxt(out / "a.csv", delimiter=",", ndmin=2)
    assert a.shape == (3, 2)


def test_multi_recipe_heterogeneous_params(clip, tmp_path):
    """Per-recipe sync_window / presync settings are supported
    (per-window delay grids); only missing use_simple_presync is
    rejected."""
    from rssync_tpu.pipeline.recipe import run_multi_recipes

    r1 = make_recipe(clip, tmp_path)
    r2 = make_recipe(
        clip, tmp_path, params__sync_window=10,
        input__simple_presync_radius=60.0, input__simple_presync_step=4.0,
    )
    results = run_multi_recipes([r1, r2], track_cache_dir=str(tmp_path / "c"))
    for res in results:
        assert res.delays_ms
        for dms in res.delays_ms:
            assert abs(dms / 1000.0 - clip.true_delay) < 5e-4

    r3 = make_recipe(clip, tmp_path, input__use_simple_presync=False)
    with pytest.raises(ValueError):
        run_multi_recipes([r1, r3])


def test_window_decode_scope_matches_full(clip, tmp_path, monkeypatch):
    """decode_scope="windows" (default) skips inter-window frames but
    produces bit-identical recipe outputs to the reference-style full
    decode (the engine never reads inter-window pairs)."""
    from rssync_tpu.frontend import tracking as T
    from rssync_tpu.frontend.tracking import _merge_pair_ranges

    assert _merge_pair_ranges([(3, 9), (0, 5), (40, 60)], 0, 50) == [
        (0, 9), (40, 50)
    ]
    assert _merge_pair_ranges([(0, 5), (5 + T.RANGE_MERGE_GAP, 30)], 0, 30) \
        == [(0, 30)]

    monkeypatch.setattr(T, "RANGE_MERGE_GAP", 0)
    over = dict(
        params__sync_window=4,
        params__syncpoints_format="array",
        params__syncpoints_array=[0, 18],
    )
    d_w = tmp_path / "w"
    d_f = tmp_path / "f"
    d_w.mkdir()
    d_f.mkdir()
    res_w = run_recipe(make_recipe(clip, d_w, **over), batched=True, seed=0)
    res_f = run_recipe(
        make_recipe(clip, d_f, **over), batched=True, seed=0,
        decode_scope="full",
    )
    assert res_w.syncpoints == res_f.syncpoints == [0, 18]
    assert res_w.delays_ms == res_f.delays_ms
    for dms in res_w.delays_ms:
        assert abs(dms - clip.true_delay * 1000.0) < 0.5
    # debug.csv (first-window loss surface) identical too
    dbg_w = np.loadtxt(res_w.debug_csv_path, delimiter=",", ndmin=2)
    dbg_f = np.loadtxt(res_f.debug_csv_path, delimiter=",", ndmin=2)
    np.testing.assert_array_equal(dbg_w, dbg_f)
