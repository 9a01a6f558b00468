"""Native C++ GPMF parser vs the Python implementation: identical
output on synthetic MP4 fixtures, through both the raw ctypes ABI and
the load_gyro dispatcher."""

import ctypes
import subprocess
from pathlib import Path

import numpy as np
import pytest

from rssync_tpu.frontend import telemetry

from gpmf_fixture import write_gpmf_mp4

NATIVE_DIR = Path(__file__).resolve().parent.parent / "native" / "gpmf"


@pytest.fixture(scope="module")
def native_lib():
    subprocess.run(["make", "-C", str(NATIVE_DIR)], check=True,
                   capture_output=True)
    lib = ctypes.CDLL(str(NATIVE_DIR / "librssync_gpmf.so"))
    lib.tp_load_gyro.restype = telemetry._TpGyroData
    lib.tp_load_gyro.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.tp_free.restype = None
    lib.tp_free.argtypes = [telemetry._TpGyroData]
    return lib


@pytest.fixture
def fixture_mp4(tmp_path, rng):
    n = 777
    t = np.arange(n) / 200.0
    g = np.stack(
        [np.sin(3 * t), np.cos(2 * t), 0.5 * np.sin(5 * t)], axis=1
    )
    p = str(tmp_path / "clip.mp4")
    write_gpmf_mp4(p, g, rate_hz=200.0, samples_per_payload=190)
    return p, t, g


def _load_native(lib, path, orient=None):
    res = lib.tp_load_gyro(path.encode(), orient.encode() if orient else None)
    assert res.samples > 0
    n = int(res.samples)
    ts = np.ctypeslib.as_array(res.timestamps, shape=(n,)).copy()
    gy = np.ctypeslib.as_array(res.gyro, shape=(n, 3)).copy()
    lib.tp_free(res)
    return ts, gy


def test_native_matches_python(native_lib, fixture_mp4):
    path, t, g = fixture_mp4
    ts_n, gy_n = _load_native(native_lib, path)
    py = telemetry.parse_mp4_gpmf(path)
    np.testing.assert_allclose(ts_n, py.timestamps, atol=1e-12)
    np.testing.assert_allclose(gy_n, py.gyro, atol=1e-12)
    np.testing.assert_allclose(gy_n, g, atol=1e-3)


def test_native_orientation(native_lib, fixture_mp4):
    path, _, g = fixture_mp4
    _, gy = _load_native(native_lib, path, orient="yZX")
    np.testing.assert_allclose(gy[:, 0], -g[:, 1], atol=1e-3)
    np.testing.assert_allclose(gy[:, 1], g[:, 2], atol=1e-3)
    np.testing.assert_allclose(gy[:, 2], g[:, 0], atol=1e-3)


def test_native_orin_remap(native_lib, tmp_path, rng):
    n = 300
    t = np.arange(n) / 200.0
    g = np.stack([np.sin(3 * t), np.cos(2 * t), 0.4 * t], axis=1)
    raw = np.stack([g[:, 2], g[:, 0], -g[:, 1]], axis=1)
    p = str(tmp_path / "o.mp4")
    write_gpmf_mp4(p, raw, rate_hz=200.0, orin=b"ZXy", orio=b"XYZ")
    _, gy = _load_native(native_lib, p)
    np.testing.assert_allclose(gy, g, atol=2e-3)


def test_native_rejects_garbage(native_lib, tmp_path):
    p = tmp_path / "junk.mp4"
    p.write_bytes(b"not an mp4 at all, just bytes" * 10)
    res = native_lib.tp_load_gyro(str(p).encode(), None)
    assert res.samples == 0
    native_lib.tp_free(res)


def test_dispatcher_prefers_native(native_lib, fixture_mp4, monkeypatch):
    """load_gyro with prefer_native uses the C++ lib for MP4s."""
    path, _, g = fixture_mp4
    # reset the cached handle so the dispatcher re-probes
    monkeypatch.setattr(telemetry, "_NATIVE_LIB", None)
    monkeypatch.setattr(telemetry, "_NATIVE_TRIED", False)
    data = telemetry.load_gyro(path, prefer_native=True)
    np.testing.assert_allclose(data.gyro, g, atol=1e-3)


def test_native_camm(native_lib, tmp_path, rng):
    from gpmf_fixture import write_camm_mp4

    n = 500
    t = np.arange(n) / 200.0
    g = np.stack([np.sin(2 * t), np.cos(3 * t), 0.2 * t], axis=1)
    p = str(tmp_path / "camm.mp4")
    write_camm_mp4(p, g, rate_hz=200.0)
    ts, gy = _load_native(native_lib, p)
    py = telemetry.parse_mp4_camm(p)
    np.testing.assert_allclose(ts, py.timestamps, atol=0)
    np.testing.assert_allclose(gy, py.gyro, atol=0)
    np.testing.assert_allclose(gy, g, atol=1e-6)  # f32 payload
    np.testing.assert_allclose(ts, t, atol=1e-4)
