"""A/B: does the background engine-compile warm thread (recipe.py::
_start_engine_warm) SLOW the tracking stage it overlaps?

Context: the isolated per-block cost at the 2.7k operating point is
~2.4 s (98 MB upload at ~45 MB/s + ~4 ms device compute — measured
inline, 2026-08-18), so 28 blocks should take ~70 s; the e2e runs
recorded 298-351 s of tracking with the warm thread active. Suspects:
the warm thread's host-side tracing (GIL) and its remote-compile RPCs
sharing the single-core host + serial tunnel with frame uploads.

Runs ONE mode per invocation (separate processes keep jit caches
honest):

  python experiments/r4_warm_ab.py warm     # production behavior
  python experiments/r4_warm_ab.py nowarm   # warm thread disabled

Uses the e2e clip/recipe at /tmp/e2e27k (render with
experiments/e2e_27k.py first). Prints per-stage wall-clock.
"""

import json
import sys
import time

from rssync_tpu.pipeline import recipe as R
from rssync_tpu.utils.timing import Timings


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "warm"
    assert mode in ("warm", "nowarm"), mode
    if mode == "nowarm":
        R._start_engine_warm = lambda *a, **k: None

    rec = json.load(open("/tmp/e2e27k/recipe.json"))
    rec["output"]["csv_path"] = f"/tmp/e2e27k/sync_{mode}.csv"
    rec["output"]["debug_csv_path"] = f"/tmp/e2e27k/debug_{mode}.csv"

    timings = Timings()
    t0 = time.time()
    R.run_recipe(rec, progress=False, timings=timings)
    wall = time.time() - t0
    print(f"# mode={mode} total={wall:.1f}s")
    print(timings.report())


if __name__ == "__main__":
    main()
