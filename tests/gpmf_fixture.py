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


# ---------------------------------------------------------------------------
# Binary Betaflight blackbox (.bbl) fixture writer — blackbox data
# format v2 subset: H headers, I/P frames, SIGNED_VB / UNSIGNED_VB /
# TAG2_3S32 / TAG8_8SVB / NULL encodings, ZERO / PREVIOUS /
# STRAIGHT_LINE / AVERAGE_2 / INCREMENT predictors, S + E frames.


def _uvb(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _svb(v: int) -> bytes:
    return _uvb((v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1)


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v) << 1) - 1


def _svb2(v: int) -> bytes:
    return _uvb(_zigzag(v))


def _tag2_3s32(vals) -> bytes:
    """Encode 3 signed ints per the TAG2_3S32 scheme (always uses a
    representation wide enough for the group)."""
    a, b, c = vals
    if all(-2 <= v <= 1 for v in vals):
        return bytes([(0 << 6) | ((a & 3) << 4) | ((b & 3) << 2) | (c & 3)])
    if all(-8 <= v <= 7 for v in vals):
        return bytes([(1 << 6) | (a & 0xF), ((b & 0xF) << 4) | (c & 0xF)])
    if all(-32 <= v <= 31 for v in vals):
        return bytes([(2 << 6) | (a & 0x3F), b & 0x3F, c & 0x3F])
    lead = 3 << 6
    body = bytearray()
    for k, v in enumerate(vals):
        for sel, bits in enumerate((8, 16, 24, 32)):
            if -(1 << (bits - 1)) <= v < (1 << (bits - 1)):
                break
        lead |= sel << (2 * k)
        body += int(v & ((1 << (8 * (sel + 1))) - 1)).to_bytes(
            sel + 1, "little"
        )
    return bytes([lead]) + bytes(body)


def _tag8_8svb(vals) -> bytes:
    if len(vals) == 1:
        return _svb2(vals[0])
    hdr = 0
    body = b""
    for k, v in enumerate(vals):
        if v:
            hdr |= 1 << k
            body += _svb2(v)
    return bytes([hdr]) + body


BBL_I_FIELDS = ["loopIteration", "time",
                "gyroADC[0]", "gyroADC[1]", "gyroADC[2]",
                "motor[0]", "motor[1]"]
#                           loop time gyro        motors
BBL_I_PRED = [0, 0, 0, 0, 0, 0, 0]
BBL_I_ENC = [1, 1, 0, 0, 0, 1, 1]
BBL_P_PRED = [6, 2, 3, 3, 3, 1, 1]
BBL_P_ENC = [9, 0, 7, 7, 7, 6, 6]


def write_bbl(path: str, times_us, gyro_raw, gyro_scale: float,
              iframe_every: int = 8, with_s_frames: bool = False,
              with_events: bool = True) -> None:
    """Write a v2 blackbox log whose decoded rows are (times_us,
    gyro_raw). gyro_scale is written as a hex-float header
    (rad/us per LSB)."""
    import numpy as _np

    times_us = [int(t) for t in times_us]
    gyro_raw = _np.asarray(gyro_raw, _np.int64)
    hdr = [
        "H Product:Blackbox flight data recorder by Nicholas Sherlock",
        "H Data version:2",
        "H Field I name:" + ",".join(BBL_I_FIELDS),
        "H Field I signed:" + ",".join(
            "0" if f in ("loopIteration", "time") else "1"
            for f in BBL_I_FIELDS),
        "H Field I predictor:" + ",".join(map(str, BBL_I_PRED)),
        "H Field I encoding:" + ",".join(map(str, BBL_I_ENC)),
        "H Field P predictor:" + ",".join(map(str, BBL_P_PRED)),
        "H Field P encoding:" + ",".join(map(str, BBL_P_ENC)),
        "H gyro_scale:0x%08x" % int.from_bytes(
            struct.pack("<f", gyro_scale), "little"),
    ]
    if with_s_frames:
        hdr += [
            "H Field S name:flightModeFlags,stateFlags",
            "H Field S signed:0,0",
            "H Field S predictor:0,0",
            "H Field S encoding:1,1",
        ]
    out = bytearray(("\n".join(hdr) + "\n").encode())

    motors = [1200, 1300]
    hist = []  # decoded field rows, for predictor encoding
    for r in range(len(times_us)):
        row = [r, times_us[r], int(gyro_raw[r, 0]), int(gyro_raw[r, 1]),
               int(gyro_raw[r, 2]), motors[0] + (r % 3), motors[1]]
        if r % iframe_every == 0:
            out += b"I"
            for i, f in enumerate(BBL_I_FIELDS):
                v = row[i]
                out += _uvb(v) if BBL_I_ENC[i] == 1 else _svb2(v)
            hist = [row, row]
        else:
            prev, prev2 = hist[1], hist[0]
            out += b"P"
            resid = []
            for i in range(len(row)):
                p = BBL_P_PRED[i]
                if p == 0:
                    base = 0
                elif p == 1:
                    base = prev[i]
                elif p == 2:
                    base = 2 * prev[i] - prev2[i]
                elif p == 3:
                    base = (prev[i] + prev2[i]) // 2
                elif p == 6:
                    base = prev[i] + 1
                resid.append(row[i] - base)
            i = 0
            while i < len(row):
                e = BBL_P_ENC[i]
                if e == 9:
                    i += 1
                elif e == 0:
                    out += _svb2(resid[i])
                    i += 1
                elif e == 7:
                    out += _tag2_3s32(resid[i : i + 3])
                    i += 3
                elif e == 6:
                    j = i
                    while j < len(row) and BBL_P_ENC[j] == 6 and j - i < 8:
                        j += 1
                    out += _tag8_8svb(resid[i:j])
                    i = j
            hist = [prev, row]
        if with_s_frames and r == 2:
            out += b"S" + _uvb(3) + _uvb(1)
        if with_events and r == 4:
            out += b"E" + bytes([0]) + _uvb(times_us[r])  # sync beep
    if with_events:
        out += b"E" + bytes([255]) + b"End of log\x00"
    with open(path, "wb") as f:
        f.write(bytes(out))
