"""PreSync RANSAC-scoring split (round 4): where do the ~160 ms of
RANSAC (full - ponly, r3_presync_split.py) go? Variants monkeypatch
PB.window_cost:

  full        production (Pallas bisection scoring)
  fullxla     production with impl="xla" scoring
  prelude     P + nP normalize + one-hot pair selects + cross + unit
              normalize (everything BEFORE scoring); picks hypothesis 0
  meanscore   prelude + one-pass mean-of-res2 score (XLA einsum) +
              argmin select — i.e. scoring without the bisection
  ponly       P build only

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    experiments/r4_presync_split2.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rssync_tpu.core import presync as PS
from rssync_tpu.core import ransac as RS
from rssync_tpu.core.problem import compute_problem, cross_soa
from rssync_tpu.parallel import batch as PB
from rssync_tpu.parallel.batch import stack_windows
from rssync_tpu.testing.engine_problem import make_engine_problem

ORIG = PB.window_cost
ITERS = PS.PRESYNC_RANSAC_ITERS


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def _prelude(table, win, delay, key, bands):
    P = compute_problem(table, win, delay, bands)  # (3, F, N)
    F, N = P.shape[1], P.shape[2]
    keys = jax.random.split(key, F)
    r0, r1 = jax.vmap(lambda k, c: RS.sample_pairs(k, ITERS, c))(
        keys, win.counts)
    Pn2 = jnp.sum(P * P, axis=0)
    inv = jnp.where(Pn2 < 1e-24, 1.0,
                    jax.lax.rsqrt(jnp.maximum(Pn2, 1e-30)))
    nP = P * inv[None]

    def onehot(r):
        return (jnp.arange(N)[None, None, :] == r[..., None]).astype(P.dtype)

    hp = jax.lax.Precision.HIGHEST
    A = jnp.einsum("cfn,fin->cfi", P, onehot(r0), precision=hp)
    Bm = jnp.einsum("cfn,fin->cfi", P, onehot(r1), precision=hp)
    v = cross_soa(A, Bm)
    vn2 = jnp.sum(v * v, axis=0)
    vinv = jnp.where(vn2 < 1e-24, 1.0,
                     jax.lax.rsqrt(jnp.maximum(vn2, 1e-30)))
    return P, nP, v * vinv[None]


def wc_prelude(table, win, delay, key, bands=None):
    P, nP, v = _prelude(table, win, delay, key, bands)
    M = v[:, :, 0].T  # hypothesis 0 per frame, (F, 3)
    return PS.cost_with_motion(P, M, win.frame_mask)


def wc_meanscore(table, win, delay, key, bands=None):
    P, nP, v = _prelude(table, win, delay, key, bands)
    N = P.shape[2]
    res = jnp.einsum("cfi,cfn->fin", v, nP,
                     precision=jax.lax.Precision.HIGHEST)
    valid = (jnp.arange(N)[None, None, :]
             < win.counts[:, None, None])
    score = jnp.sum(jnp.where(valid, res * res, 0.0), axis=-1)  # (F, I)
    best = jnp.argmin(score, axis=-1)
    sel = (jnp.arange(v.shape[2])[None, :] == best[:, None]).astype(P.dtype)
    M = jnp.einsum("cfi,fi->fc", v, sel)
    return PS.cost_with_motion(P, M, win.frame_mask)


def wc_fullxla(table, win, delay, key, bands=None):
    P = compute_problem(table, win, delay, bands)
    M = RS.guess_motion_window(P, win.counts, key, ITERS, impl="xla")
    return PS.cost_with_motion(P, M, win.frame_mask)


def wc_ponly(table, win, delay, key, bands=None):
    P = compute_problem(table, win, delay, bands)
    return jnp.sum(P * P) * 1e-20 + delay * 0.0


def timed(name, table, wins, delays):
    PB.batched_presync.clear_cache()
    t0 = time.time()
    out = PB.batched_presync(table, wins, delays, jax.random.PRNGKey(1),
                             wide=True)
    fetch(out)
    ct = time.time() - t0
    best = np.inf
    for r in range(3):
        t0 = time.time()
        fetch(PB.batched_presync(table, wins, delays,
                                 jax.random.PRNGKey(2 + r), wide=True))
        best = min(best, time.time() - t0)
    print(f"{name:12s} {best * 1e3:9.1f} ms  [compile {ct:.0f}s]",
          file=sys.stderr, flush=True)


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    prob = make_engine_problem(
        seed=0, duration=60.0, fps=60.0, n_features=130, sync_window=60,
        syncpoint_distance=120, true_delay=0.0423)
    wins = stack_windows(prob.windows)
    delays = jnp.asarray(np.arange(-0.2, 0.2, 0.002), jnp.float32)
    table = prob.table
    sel = sys.argv[1:]
    for name, fn in (("full", ORIG), ("fullxla", wc_fullxla),
                     ("prelude", wc_prelude), ("meanscore", wc_meanscore),
                     ("ponly", wc_ponly)):
        if sel and name not in sel:
            continue
        PB.window_cost = fn
        try:
            timed(name, table, wins, delays)
        finally:
            PB.window_cost = ORIG


if __name__ == "__main__":
    main()
