"""Synthetic GoPro-style MP4+GPMF fixture writer for telemetry tests.

Builds a minimal ISO-BMFF file with one 'gpmd' metadata track whose
samples are GPMF KLV payloads containing DEVC -> STRM -> {SCAL, ORIN,
ORIO, GYRO} — enough structure to exercise the real parsing paths
(box walk, stsc/stco/stsz/stts expansion, KLV recursion, SCAL/ORIN
handling). Test-only code; the layout follows the public GPMF spec.
"""

from __future__ import annotations

import struct

import numpy as np


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _klv(key: bytes, typ: int, ssize: int, repeat: int, data: bytes) -> bytes:
    pad = (-len(data)) % 4
    return key + bytes([typ, ssize]) + struct.pack(">H", repeat) + data + b"\0" * pad


def gpmf_payload(gyro_rad_s: np.ndarray, scale: float = 1000.0,
                 orin: bytes = b"XYZ", orio: bytes = b"XYZ") -> bytes:
    """One GPMF payload: gyro (n,3) rad/s encoded as int16 with SCAL."""
    vals = np.round(gyro_rad_s * scale).astype(np.int16)
    gyro_data = b"".join(
        struct.pack(">hhh", *row) for row in vals
    )
    strm = (
        _klv(b"SCAL", ord("l"), 4, 1, struct.pack(">i", int(scale)))
        + _klv(b"ORIN", ord("c"), 1, 3, orin)
        + _klv(b"ORIO", ord("c"), 1, 3, orio)
        + _klv(b"GYRO", ord("s"), 6, len(vals), gyro_data)
    )
    devc = _klv(b"STRM", 0, 1, len(strm), strm)
    return _klv(b"DEVC", 0, 1, len(devc), devc)


def write_gpmf_mp4(
    path: str,
    gyro_rad_s: np.ndarray,
    rate_hz: float,
    samples_per_payload: int = 200,
    scale: float = 1000.0,
    orin: bytes = b"XYZ",
    orio: bytes = b"XYZ",
) -> None:
    """Write an MP4 whose gpmd track carries `gyro_rad_s` at `rate_hz`."""
    chunks = [
        gpmf_payload(gyro_rad_s[i : i + samples_per_payload], scale, orin, orio)
        for i in range(0, len(gyro_rad_s), samples_per_payload)
    ]
    timescale = 1000
    payload_durs = [
        int(round(len(gyro_rad_s[i : i + samples_per_payload]) / rate_hz * timescale))
        for i in range(0, len(gyro_rad_s), samples_per_payload)
    ]

    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    # mdat offsets known only after moov size; assemble moov with
    # placeholder stco then patch. Simpler: put mdat FIRST after ftyp.
    mdat_payload = b"".join(chunks)
    mdat = _box(b"mdat", mdat_payload)
    mdat_base = len(ftyp) + 8  # offset of first chunk data

    offs = []
    off = mdat_base
    for c in chunks:
        offs.append(off)
        off += len(c)

    mdhd = _box(
        b"mdhd",
        struct.pack(">B3x", 0)
        + struct.pack(">II", 0, 0)
        + struct.pack(">I", timescale)
        + struct.pack(">I", sum(payload_durs))
        + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _box(
        b"hdlr",
        struct.pack(">B3x", 0) + b"\0" * 4 + b"meta" + b"\0" * 12 + b"GoPro MET\0",
    )
    stsd_entry = _box(b"gpmd", b"\0" * 6 + struct.pack(">H", 1))
    stsd = _box(b"stsd", struct.pack(">B3xI", 0, 1) + stsd_entry)
    stts_rows = b""
    # run-length encode durations
    i = 0
    rows = []
    while i < len(payload_durs):
        j = i
        while j < len(payload_durs) and payload_durs[j] == payload_durs[i]:
            j += 1
        rows.append((j - i, payload_durs[i]))
        i = j
    for cnt, dur in rows:
        stts_rows += struct.pack(">II", cnt, dur)
    stts = _box(b"stts", struct.pack(">B3xI", 0, len(rows)) + stts_rows)
    stsc = _box(
        b"stsc", struct.pack(">B3xI", 0, 1) + struct.pack(">III", 1, 1, 1)
    )
    stsz = _box(
        b"stsz",
        struct.pack(">B3xII", 0, 0, len(chunks))
        + b"".join(struct.pack(">I", len(c)) for c in chunks),
    )
    stco = _box(
        b"stco",
        struct.pack(">B3xI", 0, len(offs))
        + b"".join(struct.pack(">I", o) for o in offs),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", trak)

    with open(path, "wb") as f:
        f.write(ftyp + mdat + moov)


def write_camm_mp4(
    path: str,
    gyro_rad_s: np.ndarray,
    rate_hz: float,
) -> None:
    """Write an MP4 with a 'camm' track: one little-endian packet per
    sample, type 2 = angular velocity (3x f32 rad/s), per the public
    CAMM spec (developers.google.com/streetview/publish/camm-spec)."""
    chunks = [
        struct.pack("<HH3f", 0, 2, *row) for row in np.asarray(gyro_rad_s)
    ]
    timescale = 90000
    dur = int(round(timescale / rate_hz))
    payload_durs = [dur] * len(chunks)

    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mdat = _box(b"mdat", b"".join(chunks))
    mdat_base = len(ftyp) + 8
    offs = []
    off = mdat_base
    for c in chunks:
        offs.append(off)
        off += len(c)

    mdhd = _box(
        b"mdhd",
        struct.pack(">B3x", 0)
        + struct.pack(">II", 0, 0)
        + struct.pack(">I", timescale)
        + struct.pack(">I", sum(payload_durs))
        + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _box(
        b"hdlr",
        struct.pack(">B3x", 0) + b"\0" * 4 + b"camm" + b"\0" * 12
        + b"Camera Motion Metadata\0",
    )
    stsd_entry = _box(b"camm", b"\0" * 6 + struct.pack(">H", 1))
    stsd = _box(b"stsd", struct.pack(">B3xI", 0, 1) + stsd_entry)
    stts = _box(
        b"stts",
        struct.pack(">B3xI", 0, 1) + struct.pack(">II", len(chunks), dur),
    )
    stsc = _box(
        b"stsc", struct.pack(">B3xI", 0, 1) + struct.pack(">III", 1, 1, 1)
    )
    stsz = _box(
        b"stsz",
        struct.pack(">B3xII", 0, 0, len(chunks))
        + b"".join(struct.pack(">I", len(c)) for c in chunks),
    )
    stco = _box(
        b"stco",
        struct.pack(">B3xI", 0, len(offs))
        + b"".join(struct.pack(">I", o) for o in offs),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", trak)

    with open(path, "wb") as f:
        f.write(ftyp + mdat + moov)
