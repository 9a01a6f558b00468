"""On-TPU Pallas kernel parity tests (VERDICT r3 #4).

These run the custom Mosaic kernels COMPILED on a real chip (the rest
of the suite pins the CPU backend and runs Pallas in interpreter mode
only). Skipped unless the session owns a TPU:

    RSSYNC_TPU_TESTS=1 python -m pytest tests -m tpu

``RSSYNC_TPU_TESTS=1`` stops conftest from pinning the CPU backend;
``-m tpu`` deselects the CPU suite (whose sharding tests need the
8-device virtual mesh and would fail on one chip). bench.py embeds the
same checks as a pass/fail line every round.
"""

import numpy as np
import pytest

from rssync_tpu.testing import tpu_selftest as S

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(not S.on_tpu(), reason="requires a real TPU"),
]


@pytest.mark.parametrize("name", sorted(S.CHECKS))
def test_compiled_kernel_parity(name):
    fn, tol = S.CHECKS[name]
    err = fn()
    assert np.isfinite(err)
    assert err <= tol, f"{name}: compiled-vs-XLA error {err} > {tol}"
