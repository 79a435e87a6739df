"""Batched masked Levenberg–Marquardt — the scipy.optimize.leastsq
replacement at the heart of the TPU rebuild (SURVEY.md §7 M1, §3.1).

The reference runs MINPACK's adaptive lmdif/lmder once per cluster inside a
Python loop; here thousands of independent small least-squares problems run
in *lockstep* as one jitted ``lax.while_loop``:

- every lane (cluster) shares the same static shapes (bucketing handles
  variable cluster sizes upstream);
- converged lanes freeze (their state stops updating) instead of exiting —
  the masked-lockstep design from SURVEY.md §7 "hard parts #2";
- damping uses Marquardt scaling (λ·diag(JᵀJ)), the same scaling MINPACK
  uses, which is what makes sub-pixel parity with scipy achievable;
- box bounds are handled by projection of the trial step (the reference
  switches to SLSQP for bounds; projected LM matches its *solutions* on
  interior optima and is TPU-friendly — SURVEY.md §7 design stance).

The solver is tolerance-compatible with scipy.optimize.leastsq defaults:
ftol/xtol default to 1.49e-8.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LMResult", "lm_solve", "lm_solve_global"]


class LMResult(NamedTuple):
    x: jax.Array          # [B, V] solution
    cost: jax.Array       # [B] final sum of squared residuals
    n_iter: jax.Array     # [B] iterations taken (int32)
    converged: jax.Array  # [B] bool — hit ftol/xtol (vs iteration cap)
    # masked-pixel count per lane; only the pallas kernel fills this
    # (it owns the fit mask) — None from the XLA solvers
    npix: Optional[jax.Array] = None


def _chol_solve_unrolled(A, g):
    """Batched SPD solve via hand-unrolled Cholesky (V static, small).

    ``jnp.linalg.solve`` (batched LU w/ pivoting) lowers to scalar-ish
    loops on TPU when it appears inside lax control flow — measured ~13 ms
    per LM iteration at B=8192, V=6 vs ~1 ms for this unrolled form, which
    is pure elementwise VPU work vectorized over the batch."""
    V = A.shape[-1]
    L = [[None] * V for _ in range(V)]
    for j in range(V):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-20))
        L[j][j] = d
        for i in range(j + 1, V):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s / d
    y = [None] * V
    for i in range(V):
        s = g[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * V
    for i in reversed(range(V)):
        s = y[i]
        for k in range(i + 1, V):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


# Unroll ceiling: the unrolled form inlines ~V^3/6 HLO ops INSIDE the
# LM while_loop body, and XLA's compile time on that is superlinear —
# measured on the axon compile server: V=24 took 184 s, V=36 took >35
# MINUTES (the dense ladder-12 bucket solver compiled to a 96 MB
# binary), while V=48 (past the old ceiling of 40, batched-library
# path) compiled in seconds.  Above the ceiling, batched Cholesky +
# triangular_solve (SPD — no pivoting) keeps the HLO compact; runtime
# stays MXU/J-sweep-bound there (V=48 probe: 1,383 solves/s vs the
# pallas kernel's 9.4 — benchmarks/probe_vmem.py).
_UNROLL_MAX_V = 20


# XLA:TPU's triangular_solve inverts diagonal blocks into SCOPED vmem
# ([B, 1, V, V] f32 ≈ 10 bytes/element with its working copies —
# measured 18.09 M for B=256, V=84 against the 16 M limit, a compile
# failure for the dense n=28 ladder bucket).  Past this product the
# damped solve switches to a row-substitution fori_loop: identical
# arithmetic (same Cholesky factor), V steps of [B, V] VPU work, no
# scoped blow-up, compact HLO.
# The 16 MB scoped budget is SHARED with the rest of the solver's stack
# (a B=160, V=84 triangular_solve still overflowed with the limit at
# 1.2M elements), so the threshold is conservative: past it the
# substitution path costs ~V extra loop steps per LM iteration, noise
# next to the [B, V, npix] Jacobian sweep that dominates these buckets.
_TRI_SOLVE_SCOPED_LIMIT = 200_000  # B*V*V elements


def _tri_substitution_solve(L, b):
    """Solve L Lᵀ x = b for lower-triangular L by forward+back
    substitution (fori_loop over rows; batched over leading dims)."""
    V = L.shape[-1]
    iota = jnp.arange(V)
    diag = jnp.diagonal(L, axis1=-2, axis2=-1)

    def fwd(i, y):
        row = jnp.take(L, i, axis=-2)                    # [..., V]
        s = jnp.sum(jnp.where(iota < i, row * y, 0.0), axis=-1)
        yi = (jnp.take(b, i, axis=-1) - s) / jnp.take(diag, i, axis=-1)
        return y.at[..., i].set(yi)

    y = jax.lax.fori_loop(0, V, fwd, jnp.zeros_like(b))

    def bwd(k, x):
        i = V - 1 - k
        col = jnp.take(L, i, axis=-1)                    # L[..., j, i]
        s = jnp.sum(jnp.where(iota > i, col * x, 0.0), axis=-1)
        xi = (jnp.take(y, i, axis=-1) - s) / jnp.take(diag, i, axis=-1)
        return x.at[..., i].set(xi)

    return jax.lax.fori_loop(0, V, bwd, jnp.zeros_like(b))


def _damped_solve(H, g, lam):
    """Solve (H + lam*diag(H) + eps*I) delta = -g, batched."""
    d = jnp.diagonal(H, axis1=-2, axis2=-1)
    d = jnp.where(d > 1e-12, d, 1e-12)
    A = H + (lam[..., None] * d)[..., None, :] * jnp.eye(
        H.shape[-1], dtype=H.dtype
    )
    # Small extra Tikhonov floor keeps Cholesky stable in float32.
    A = A + 1e-10 * jnp.eye(H.shape[-1], dtype=H.dtype)
    if H.shape[-1] <= _UNROLL_MAX_V:
        return -_chol_solve_unrolled(A, g)
    # batched SPD solve via the library Cholesky: compact HLO (the
    # unrolled form's compile time explodes past ~V=20, see
    # _UNROLL_MAX_V) and no LU pivoting overhead.  A non-SPD A yields
    # NaN rows -> the trial cost is NaN -> the step is rejected and
    # damping grows, exactly like the unrolled form's clamped sqrt.
    L = jnp.linalg.cholesky(A)
    B = int(np.prod(H.shape[:-2])) if H.ndim > 2 else 1
    V = H.shape[-1]
    if B * V * V > _TRI_SOLVE_SCOPED_LIMIT:
        return -_tri_substitution_solve(L, g)
    y = jax.lax.linalg.triangular_solve(
        L, -g[..., None], left_side=True, lower=True
    )
    return jax.lax.linalg.triangular_solve(
        L, y, left_side=True, lower=True, transpose_a=True
    )[..., 0]


def lm_solve(
    residual_fn: Callable,
    residual_jac_fn: Callable,
    x0: jax.Array,
    args: Tuple = (),
    *,
    max_iter: int = 50,
    ftol: float = 1.49e-8,
    xtol: float = 1.49e-8,
    lam0: float = 1e-3,
    lam_up: float = 4.0,
    lam_down: float = 0.25,
    lam_max: float = 1e10,
    lower: Optional[jax.Array] = None,
    upper: Optional[jax.Array] = None,
    valid: Optional[jax.Array] = None,
) -> LMResult:
    """Run lockstep LM on a batch of independent least-squares problems.

    Args:
      residual_fn: ``f(x, *args) -> r [B, N]``.
      residual_jac_fn: ``f(x, *args) -> (r [B, N], J [B, V, N])``
        (slot-major J: pixel axis last for TPU tiling).
      x0: [B, V] initial guesses.
      args: extra arrays forwarded to the residual functions.
      lower/upper: optional [V] or [B, V] box bounds (projected steps).
      valid: optional [B] bool — padding lanes (False) are never updated.

    Jit-safe: fixed shapes, ``lax.while_loop`` with an early-exit condition
    when every lane has converged.
    """
    B, V = x0.shape
    dtype = x0.dtype
    if valid is None:
        valid = jnp.ones((B,), dtype=bool)

    def clip(x):
        if lower is not None:
            x = jnp.maximum(x, lower)
        if upper is not None:
            x = jnp.minimum(x, upper)
        return x

    x0 = clip(x0)

    def cost_grad_hess(x):
        """ONE residual+Jacobian sweep → (cost, g, H)."""
        r, J = residual_jac_fn(x, *args)
        g = jnp.einsum("bvn,bn->bv", J, r,
                       precision=jax.lax.Precision.HIGHEST)
        H = jnp.einsum("bun,bvn->buv", J, J,
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(r * r, axis=-1), g, H

    # One fused sweep per iteration: (cost, g, H) are evaluated at the
    # TRIAL point and carried through the loop — on acceptance they become
    # the current state, on rejection the carried values are reused.  The
    # old structure recomputed J at an unchanged x after every rejection
    # AND paid a separate cost-only sweep per trial; iterates are
    # identical, this is purely fewer pixel sweeps (~19% measured on the
    # 3D aniso bucket).
    c0, g0, H0 = cost_grad_hess(x0)

    init = (
        jnp.zeros((), jnp.int32),
        x0,
        c0,
        g0,
        H0,
        jnp.full((B,), lam0, dtype=dtype),
        valid,
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), dtype=bool),
    )

    def cond(state):
        it = state[0]
        active = state[6]
        return (it < max_iter) & jnp.any(active)

    def body(state):
        it, x, cost, g, H, lam, active, n_iter, converged = state
        delta = _damped_solve(H, g, lam)
        x_trial = clip(x + delta)
        step = x_trial - x
        c_trial, g_trial, H_trial = cost_grad_hess(x_trial)
        better = c_trial < cost

        accept = active & better
        x_new = jnp.where(accept[:, None], x_trial, x)
        cost_new = jnp.where(accept, c_trial, cost)
        g_new = jnp.where(accept[:, None], g_trial, g)
        H_new = jnp.where(accept[:, None, None], H_trial, H)
        lam_new = jnp.where(
            accept, lam * lam_down, jnp.minimum(lam * lam_up, lam_max)
        )
        lam_new = jnp.where(active, lam_new, lam)

        # Convergence: ftol/xtol on accepted steps (MINPACK semantics), or
        # a plateau — no improving step found across ~6 orders of damping
        # (the f32 analog of MINPACK's "both actual and predicted relative
        # reductions are at most ftol"): the lane sits at a local optimum
        # to machine precision.
        xnorm = jnp.max(jnp.abs(x), axis=-1)
        snorm = jnp.max(jnp.abs(step), axis=-1)
        conv_x = accept & (snorm <= xtol * (xtol + xnorm))
        conv_f = accept & (
            (cost - c_trial) <= ftol * jnp.maximum(cost, 1e-30)
        )
        plateau = (lam_new >= 1e6 * lam0) & jnp.isfinite(cost_new)
        stuck = lam_new >= lam_max  # diverged / non-finite: freeze only
        conv_now = conv_x | conv_f | plateau
        newly_done = active & (conv_now | stuck)

        return (
            it + 1,
            x_new,
            cost_new,
            g_new,
            H_new,
            lam_new,
            active & ~newly_done,
            n_iter + active.astype(jnp.int32),
            converged | (active & conv_now),
        )

    out = jax.lax.while_loop(cond, body, init)
    _, x, cost, _, _, _, _, n_iter, converged = out
    return LMResult(x=x, cost=cost, n_iter=n_iter, converged=converged)


def lm_solve_global(
    residual_fn: Callable,
    residual_jac_fn: Callable,
    x0: jax.Array,
    global_slots,
    args: Tuple = (),
    *,
    max_iter: int = 50,
    ftol: float = 1.49e-8,
    xtol: float = 1.49e-8,
    lam0: float = 1e-3,
    lam_up: float = 4.0,
    lam_down: float = 0.25,
    lam_max: float = 1e10,
    lower: Optional[jax.Array] = None,
    upper: Optional[jax.Array] = None,
    valid: Optional[jax.Array] = None,
) -> LMResult:
    """LM with 'global'-mode slots tied across the batch (train_leastsq).

    The reference's train_leastsq builds ONE joint residual spanning many
    clusters so that 'global' parameters (e.g. inv_series coefficients) are
    shared (SURVEY.md §3.3).  Here the joint problem keeps its batch
    structure: per-lane slots stay independent, but slots flagged in
    ``global_slots`` ([V] bool) are averaged across valid lanes after every
    update and their gradient/Hessian contributions are summed — i.e. the
    exact Gauss–Newton system of the joint problem under the block
    approximation that cross-lane coupling flows only through the shared
    slots.  One shared damping factor drives all lanes so the joint cost is
    monotone.
    """
    B, V = x0.shape
    dtype = x0.dtype
    gmask = jnp.asarray(global_slots, dtype=bool)
    if valid is None:
        valid = jnp.ones((B,), dtype=bool)
    w = valid.astype(dtype)
    nvalid = jnp.maximum(jnp.sum(w), 1.0)

    def tie(x):
        """Average global slots across valid lanes, broadcast back; then
        project into the box bounds."""
        mean = jnp.sum(x * w[:, None], axis=0) / nvalid
        x = jnp.where(gmask[None, :], mean[None, :], x)
        if lower is not None:
            x = jnp.maximum(x, lower)
        if upper is not None:
            x = jnp.minimum(x, upper)
        return x

    x0 = tie(x0)

    def cost_grad_hess(x):
        """ONE sweep → (joint cost, tied g, tied H).

        Tie the shared slots: sum their gradient rows across lanes and
        solve lane-local systems with the summed diagonal blocks — a
        block-Jacobi step on the joint system, then re-tie."""
        r, J = residual_jac_fn(x, *args)
        r = r * w[:, None, ...].reshape((B,) + (1,) * (r.ndim - 1))
        J = J * w.reshape((B,) + (1,) * (J.ndim - 1))
        cost = jnp.sum(r * r)  # w is 0/1 so w² = w
        g = jnp.einsum("bvn,bn->bv", J, r,
                       precision=jax.lax.Precision.HIGHEST)
        H = jnp.einsum("bun,bvn->buv", J, J,
                       precision=jax.lax.Precision.HIGHEST)
        g_shared = jnp.sum(g * gmask[None, :], axis=0)
        g = jnp.where(gmask[None, :], g_shared[None, :] / nvalid, g)
        share2d = gmask[None, :, None] & gmask[None, None, :]
        H_shared = jnp.sum(H * share2d, axis=0)
        H = jnp.where(share2d, H_shared[None] / nvalid, H)
        return cost, g, H

    c0, g0, H0 = cost_grad_hess(x0)
    init = (
        jnp.zeros((), jnp.int32),
        x0,
        c0,
        g0,
        H0,
        jnp.asarray(lam0, dtype),
        jnp.asarray(True),
        jnp.asarray(False),
        jnp.zeros((B,), jnp.int32),
    )

    def cond(state):
        it = state[0]
        active = state[6]
        return (it < max_iter) & active

    def body(state):
        it, x, cost, g, H, lam, active, converged, it_lane = state
        delta = _damped_solve(H, g, jnp.full((B,), lam, dtype))
        x_trial = tie(x + delta)
        c_trial, g_trial, H_trial = cost_grad_hess(x_trial)
        better = c_trial < cost
        g = jnp.where(better, g_trial, g)
        H = jnp.where(better, H_trial, H)
        x_new = jnp.where(better, x_trial, x)
        cost_new = jnp.where(better, c_trial, cost)
        lam_new = jnp.where(
            better, lam * lam_down, jnp.minimum(lam * lam_up, lam_max)
        )
        conv_f = (cost - c_trial) <= ftol * jnp.maximum(cost, 1e-30)
        snorm = jnp.max(jnp.abs(x_trial - x))
        conv_x = snorm <= xtol * (xtol + jnp.max(jnp.abs(x)))
        plateau = (lam_new >= 1e6 * lam0) & jnp.isfinite(cost_new)
        conv_now = (better & (conv_f | conv_x)) | plateau
        done = conv_now | (lam_new >= lam_max)
        # Per-lane diagnostics (VERDICT r2 weak #5): record the last
        # iteration at which THIS lane's own LOCAL parameters moved
        # beyond its xtol threshold — a lane whose fit plateaued early
        # keeps its early count even though the joint lockstep loop
        # runs on.  Global slots are excluded: they move whenever any
        # lane still pulls them, which is joint progress, not this
        # lane's.
        local = (~gmask)[None, :].astype(dtype)
        lane_step = jnp.max(jnp.abs(x_trial - x) * local, axis=1)
        lane_xn = jnp.max(jnp.abs(x) * local, axis=1)
        # floor the threshold at ~8 ulp of the lane scale: accepted
        # steps at f32 rounding jitter (~1e-7·|x|) are not "movement",
        # or every lane would count every iteration under the default
        # xtol=1.49e-8 and the per-lane counts would be vacuous
        tol_lane = jnp.maximum(
            xtol * (xtol + lane_xn), 1e-6 * lane_xn
        )
        moved = better & (lane_step > tol_lane)
        it_lane = jnp.where(moved, it + 1, it_lane)
        return (
            it + 1,
            x_new,
            cost_new,
            g,
            H,
            lam_new,
            active & ~done,
            converged | conv_now,
            it_lane,
        )

    out = jax.lax.while_loop(cond, body, init)
    it, x, converged, it_lane = out[0], out[1], out[7], out[8]
    # Per-lane cost contract (SURVEY.md §1: the `cost` column is per fit):
    # one extra residual evaluation at the solution — the loop itself only
    # carries the joint summed cost, which must NOT be broadcast per lane
    # (it inflates per-lane rms by ~sqrt(B·Npix_total/Npix) and breaks
    # max_rms_dev rejection for global-mode buckets).
    r_fin = residual_fn(x, *args)
    lane_cost = jnp.sum(
        r_fin * r_fin, axis=tuple(range(1, r_fin.ndim))
    )
    # Per-lane flags: lanes move in lockstep under one shared damping
    # factor, but fit_n_iter reports each lane's own last meaningful
    # move, and a lane that stopped moving before the loop ended counts
    # as individually converged even when the joint flag is False
    # (VERDICT r2 weak #5 — the joint broadcast was misleading for the
    # diagnostics columns on global-mode buckets).
    lane_stopped = it_lane < it
    return LMResult(
        x=x,
        cost=lane_cost,
        n_iter=jnp.where(valid, it_lane, 0).astype(jnp.int32),
        converged=(jnp.full((B,), converged) | lane_stopped) & valid,
    )
