"""Sync: fine alternating optimization of per-frame translation
directions and the gyro delay.

TPU-native rebuild of `SyncProblemPrivate::Sync`
(ref: src/core/core_private.cpp:211-334) and its helpers
(`FrameState::Loss/GuessMotion/GuessK`, :92-133; `Backtrack`,
src/core_support/backtrack.cpp:3-13). Structure:

  init:   motion_vec per frame from 200-hypothesis RANSAC, var_k from
          GuessK — both at the initial delay (ref :218-223).
  loop (<= 400 outer iterations, ref :309):
    1. per-frame L-BFGS on the 3-vector translation direction at the
       current delay (ref :262-296, ensmallen L_BFGS with
       MaxIterations=200, MinGradientNorm=1e-4) — here a custom
       *batched* L-BFGS vmapped over frames, with the epipolar matrix P
       hoisted out of the inner loop (it depends on delay only — the
       reference recomputes it every objective call).
    2. one Nesterov-momentum (beta=0.3) Armijo-backtracked gradient
       step on the delay (hypers 2e-4, 0.1, 1e-3, 10; ref :225-226,
       :298-305). The uninitialized `delay_v` of the reference
       (:261, UB) is initialized to 0 per SURVEY §2.1.
    3. stop after 6 consecutive steps < 1e-4 or when the delay leaves
       search_center +- search_radius (ref :316-328).

The delay gradient is analytic (`jax.grad` through the spline) instead
of the reference's central difference with step 1e-6 (:96-97) — the
numeric-diff convention cannot survive f32, and parity is defined on
the final offset (SURVEY §7 hard-parts). Everything is one jitted
program per window shape; windows batch via vmap (see parallel/).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rssync_tpu.core.problem import SplineTable, TrackWindow, compute_problem
from rssync_tpu.core.ransac import guess_motion
from rssync_tpu.ops.robust import clamp_k, safe_norm

# --- reference hyperparameters ---------------------------------------------
SYNC_RANSAC_ITERS = 200        # GuessMotion hypotheses (ref :127)
LBFGS_MAX_ITERS = 200          # ens::L_BFGS MaxIterations (ref :265)
LBFGS_MIN_GRAD = 1e-4          # ens::L_BFGS MinGradientNorm (ref :266)
LBFGS_MEM = 5
BT_SUFFICIENT_DECREASE = 2e-4  # Backtrack hypers (ref :226)
BT_DECAY = 0.1
BT_INITIAL_STEP = 1e-3
BT_MAX_ITERS = 10
DELAY_MOMENTUM = 0.3           # delay_b (ref :260)
OUTER_MAX_ITERS = 400          # ref :309
CONVERGE_STEP = 1e-4           # ref :316
CONVERGE_COUNT = 5             # ref :321 (`> 5` -> 6 consecutive)


def frame_loss(P_f: jnp.ndarray, M_f: jnp.ndarray, var_k_f) -> jnp.ndarray:
    """Full robust loss of one frame:
    sum log1p((P M)^2 * k^2 / |M|^2) (ref :99-110 / :117-123).
    P_f is SoA (3, N); padded columns are zero and contribute
    log1p(0) = 0."""
    PM = jnp.einsum("cn,c->n", P_f, M_f)
    # floor keeps ||M||^4 representable in f32 inside the gradient;
    # M is ~unit in normal operation so the floor is never active then
    M2 = jnp.maximum(jnp.sum(M_f * M_f), 1e-12)
    return jnp.sum(jnp.log1p(PM * PM * (var_k_f * var_k_f) / M2))


def window_loss(
    table: SplineTable, win: TrackWindow, delay, M: jnp.ndarray,
    var_k: jnp.ndarray, bands=None,
) -> jnp.ndarray:
    """Sum of frame losses over the window at one delay (the parallel
    reduction of ref :242-254). Computed whole-window in SoA (no
    per-frame vmap needed)."""
    P = compute_problem(table, win, delay, bands)  # (3, F, N)
    PM = jnp.einsum("cfn,fc->fn", P, M)
    M2 = jnp.maximum(jnp.sum(M * M, axis=-1), 1e-12)  # (F,)
    losses = jnp.sum(
        jnp.log1p(PM * PM * ((var_k * var_k) / M2)[:, None]), axis=-1
    )
    return jnp.sum(losses * win.frame_mask)


# --- batched L-BFGS over frames --------------------------------------------


class _LBFGSState(NamedTuple):
    x: jnp.ndarray        # (B, 3)
    f: jnp.ndarray        # (B,)
    g: jnp.ndarray        # (B, 3)
    S: jnp.ndarray        # (B, mem, 3) newest first
    Y: jnp.ndarray        # (B, mem, 3)
    rho: jnp.ndarray      # (B, mem)
    hist: jnp.ndarray     # (B,) int32 valid history length
    done: jnp.ndarray     # (B,) bool


def _two_loop_direction(st: _LBFGSState) -> jnp.ndarray:
    """Classic L-BFGS two-loop recursion, batched. Falls back to
    steepest descent when no history."""
    mem = st.S.shape[1]
    valid = (jnp.arange(mem)[None, :] < st.hist[:, None]).astype(st.x.dtype)

    q = st.g
    alphas = []
    for i in range(mem):  # newest -> oldest
        a = st.rho[:, i] * jnp.sum(st.S[:, i] * q, axis=-1) * valid[:, i]
        q = q - a[:, None] * st.Y[:, i]
        alphas.append(a)

    y0y0 = jnp.sum(st.Y[:, 0] * st.Y[:, 0], axis=-1)
    s0y0 = jnp.sum(st.S[:, 0] * st.Y[:, 0], axis=-1)
    gamma = jnp.where(st.hist > 0, s0y0 / jnp.maximum(y0y0, 1e-30), 1.0)
    r = gamma[:, None] * q

    for i in range(mem - 1, -1, -1):  # oldest -> newest
        b = st.rho[:, i] * jnp.sum(st.Y[:, i] * r, axis=-1) * valid[:, i]
        r = r + ((alphas[i] - b) * valid[:, i])[:, None] * st.S[:, i]
    return -r


def batched_lbfgs(
    value_and_grad_fn,
    x0: jnp.ndarray,
    max_iters: int = LBFGS_MAX_ITERS,
    min_grad_norm: float = LBFGS_MIN_GRAD,
    mem: int = LBFGS_MEM,
    ls_trials: int = 30,
    armijo_c1: float = 1e-4,
) -> jnp.ndarray:
    """Minimize B independent small problems simultaneously.

    value_and_grad_fn: (B, d) -> ((B,), (B, d)); must be safe on frozen
    (converged / masked) lanes. Mirrors the role of the reference's
    per-frame ensmallen L-BFGS (ref :262-296), batched: every frame of
    every window steps in lockstep, converged lanes freeze.
    """
    B, d = x0.shape
    f0, g0 = value_and_grad_fn(x0)
    st = _LBFGSState(
        x=x0,
        f=f0,
        g=g0,
        S=jnp.zeros((B, mem, d), x0.dtype),
        Y=jnp.zeros((B, mem, d), x0.dtype),
        rho=jnp.zeros((B, mem), x0.dtype),
        hist=jnp.zeros((B,), jnp.int32),
        done=jnp.linalg.norm(g0, axis=-1) < min_grad_norm,
    )

    def body(st: _LBFGSState) -> _LBFGSState:
        d_dir = _two_loop_direction(st)
        gd = jnp.sum(st.g * d_dir, axis=-1)
        # non-descent direction -> steepest descent restart
        bad = gd >= 0.0
        d_dir = jnp.where(bad[:, None], -st.g, d_dir)
        gd = jnp.where(bad, -jnp.sum(st.g * st.g, axis=-1), gd)

        # Armijo backtracking from t = 1, early exit once every live
        # lane has accepted (typically the very first trial)
        def ls_cond(carry):
            i, t, accepted, t_acc = carry
            return (i < ls_trials) & ~jnp.all(accepted)

        def ls_body(carry):
            i, t, accepted, t_acc = carry
            f_try = value_and_grad_fn(st.x + t[:, None] * d_dir)[0]
            ok = (f_try <= st.f + armijo_c1 * t * gd) & ~accepted
            t_acc = jnp.where(ok, t, t_acc)
            return i + 1, t * 0.5, accepted | ok, t_acc

        t0 = jnp.ones((B,), x0.dtype)
        _, _, accepted, t_acc = jax.lax.while_loop(
            ls_cond, ls_body,
            (jnp.asarray(0, jnp.int32), t0, st.done, jnp.zeros(B, x0.dtype)),
        )
        step_t = jnp.where(accepted & ~st.done, t_acc, 0.0)

        x_new = st.x + step_t[:, None] * d_dir
        f_new, g_new = value_and_grad_fn(x_new)
        s = x_new - st.x
        y = g_new - st.g
        sy = jnp.sum(s * y, axis=-1)
        store = (sy > 1e-10) & ~st.done

        S = jnp.where(
            store[:, None, None], jnp.roll(st.S, 1, axis=1).at[:, 0].set(s), st.S
        )
        Y = jnp.where(
            store[:, None, None], jnp.roll(st.Y, 1, axis=1).at[:, 0].set(y), st.Y
        )
        rho = jnp.where(
            store[:, None],
            jnp.roll(st.rho, 1, axis=1).at[:, 0].set(1.0 / jnp.maximum(sy, 1e-30)),
            st.rho,
        )
        hist = jnp.where(store, jnp.minimum(st.hist + 1, mem), st.hist)

        frozen = st.done
        x_out = jnp.where(frozen[:, None], st.x, x_new)
        f_out = jnp.where(frozen, st.f, f_new)
        g_out = jnp.where(frozen[:, None], st.g, g_new)
        done = frozen | (jnp.linalg.norm(g_out, axis=-1) < min_grad_norm) | (
            step_t == 0.0
        )
        return _LBFGSState(x_out, f_out, g_out, S, Y, rho, hist, done)

    # while-loop with early exit: the reference's per-frame L-BFGS stops
    # at MinGradientNorm; running a fixed 200 iterations would waste
    # ~10x wall-clock on the device (typical convergence ~15 iters).
    def cond(carry):
        i, st = carry
        return (i < max_iters) & ~jnp.all(st.done)

    def wrapped(carry):
        i, st = carry
        return i + 1, body(st)

    _, st = jax.lax.while_loop(cond, wrapped, (jnp.asarray(0, jnp.int32), st))
    return st.x


# --- delay line search (Backtrack) -----------------------------------------


def _backtrack_step(f_only, x0, fval, grad):
    """One Backtrack::Step (ref: src/core_support/backtrack.cpp:3-13):
    returns -t * grad with t from Armijo backtracking. If no trial
    satisfies the condition, t has decayed through all iterations
    (effectively zero step), exactly like the reference."""
    m = grad * grad

    def cond(carry):
        i, t, done = carry
        return (i < BT_MAX_ITERS) & ~done

    def body(carry):
        i, t, done = carry
        v1 = f_only(x0 - t * grad)
        ok = (fval - v1) >= t * BT_SUFFICIENT_DECREASE * m
        t_new = jnp.where(ok, t, t * BT_DECAY)
        return i + 1, t_new, ok

    _, t, _ = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(0, jnp.int32),
         jnp.asarray(BT_INITIAL_STEP, x0.dtype), jnp.asarray(False)),
    )
    return -t * grad


# --- full Sync --------------------------------------------------------------


class SyncResult(NamedTuple):
    cost: jnp.ndarray
    delay: jnp.ndarray
    iterations: jnp.ndarray


def init_motion(
    table: SplineTable, win: TrackWindow, delay, key: jax.Array,
    bands=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """GuessMotion (200 RANSAC iters) + GuessK per frame at `delay`
    (ref :218-223, :125-133). Returns (M (F,3), var_k (F,))."""
    P = compute_problem(table, win, delay, bands)  # (3, F, N)
    keys = jax.random.split(key, win.num_frames)
    M = jax.vmap(
        lambda p, c, k: guess_motion(p, c, k, SYNC_RANSAC_ITERS),
        in_axes=(1, 0, 0),
    )(P, win.counts, keys)
    PM = jnp.einsum("cfn,fc->fn", P, M)
    var_k = clamp_k(1e2 / safe_norm(PM, axis=1))
    return M, var_k


@partial(jax.jit, static_argnames=("wide",))
def sync_window(
    table: SplineTable,
    win: TrackWindow,
    initial_delay,
    search_center,
    search_radius,
    key: jax.Array,
    wide: bool = False,
) -> SyncResult:
    """Full Sync of one window (ref core_private.cpp:211-334).

    Returns (final simple-objective cost, final delay, outer
    iterations executed). vmap over a leading window axis for batched
    multi-syncpoint sync.

    wide=True (callers must ensure search_center +- search_radius
    stays within WIDE_SMAX knots) uses pre-extracted wide coefficient
    slabs so delay evaluations avoid per-frame band slicing.
    """
    from rssync_tpu.core.problem import make_wide_bands

    dtype = win.f0_a.dtype
    delay0 = jnp.asarray(initial_delay, dtype)
    bands = make_wide_bands(table, win, search_center) if wide else None
    M0, var_k = init_motion(table, win, delay0, key, bands)

    def delay_loss(delay, M):
        return window_loss(table, win, delay, M, var_k, bands)

    delay_vg = jax.value_and_grad(delay_loss, argnums=0)

    def motion_value_and_grad(P):
        def per_frame(p, m, k, fm):
            return frame_loss(p, m, k) * fm

        def vg(Ms):
            f, g = jax.vmap(
                jax.value_and_grad(per_frame, argnums=1),
                in_axes=(1, 0, 0, 0),
            )(P, Ms, var_k, win.frame_mask)
            return f, g

        return vg

    def cond(state):
        i, delay, v, M, cc, done = state
        return (i < OUTER_MAX_ITERS) & ~done

    def body(state):
        i, delay, v, M, cc, done = state
        # 1. motion refinement at current delay (P hoisted)
        P = compute_problem(table, win, delay, bands)
        M = batched_lbfgs(motion_value_and_grad(P), M)
        # 2. Nesterov-lookahead backtracked delay step (ref :298-305)
        x0 = delay - DELAY_MOMENTUM * v
        fval, grad = delay_vg(x0, M)
        step = _backtrack_step(lambda x: delay_loss(x, M), x0, fval, grad)
        v = DELAY_MOMENTUM * v + step
        delay = delay + v
        step_size = jnp.abs(step)
        cc = jnp.where(step_size < CONVERGE_STEP, cc + 1, 0)
        done = (cc > CONVERGE_COUNT) | (
            jnp.abs(delay - search_center) > search_radius
        )
        return i + 1, delay, v, M, cc, done

    state = (
        jnp.asarray(0, jnp.int32),
        delay0,
        jnp.zeros((), dtype),
        M0,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
    )
    i, delay, v, M, cc, done = jax.lax.while_loop(cond, body, state)
    return SyncResult(cost=delay_loss(delay, M), delay=delay, iterations=i)
