"""Measure host decode rate on the rendered 2.7k e2e clip: serial cv2
(raw-luma), the FrameFeed thread, and (where cores exist) the
multiprocess DecodePool. Establishes the decode floor that bounds the
real-video e2e wall-clock on this host.

Usage: python experiments/r4_decode.py [--frames 180] [--workers N]
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clip", default="/tmp/e2e27k/clip.mp4")
    ap.add_argument("--frames", type=int, default=180)
    ap.add_argument("--workers", type=int, default=None)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from rssync_tpu.frontend.decode_pool import DecodePool, available_workers
    from rssync_tpu.frontend.tracking import FrameFeed, VideoSource

    n = args.frames
    res = {}

    src = VideoSource(args.clip)
    t0 = time.time()
    count = 0
    for fr in src.frames(0, n):
        count += 1
    dt = time.time() - t0
    res["serial_cv2_ms_per_frame"] = round(1e3 * dt / count, 2)
    src.cap.release()

    feed = FrameFeed(args.clip, 0, n)
    t0 = time.time()
    count = sum(1 for _ in feed)
    dt = time.time() - t0
    res["framefeed_ms_per_frame"] = round(1e3 * dt / count, 2)

    w = args.workers or available_workers()
    res["pool_workers"] = w
    if w > 1:
        probe = VideoSource(args.clip)
        h, wd, raw = probe.height, probe.width, probe._raw
        probe.cap.release()
        with DecodePool(args.clip, [(0, n)], h, wd, raw, w) as pool:
            t0 = time.time()
            count = sum(1 for _ in pool.span_frames(0))
            dt = time.time() - t0
        res["pool_ms_per_frame"] = round(1e3 * dt / count, 2)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
