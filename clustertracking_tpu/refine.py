"""refine_leastsq / train_leastsq — the core fitting pipeline.

TPU-native rebuild of clustertracking/refine.py (SURVEY.md §3.1, §7).  The
reference iterates Python-side over frames and clusters, calling
scipy.optimize.leastsq once per cluster; here the per-cluster loop is
inverted into *bucketed batches* (SURVEY.md §7 design stance):

- clusters are bucketed by cluster size ``n``; each bucket becomes one
  jitted dispatch fitting every cluster in lockstep (ops/lm.py);
- the subimage gather, fit-region mask, parameter packing, LM solve, and
  the refit-on-shift outer loop (``max_iter``/``max_shift``) ALL run inside
  one jit — frames are stacked on device and windows are re-gathered with
  ``lax.dynamic_slice`` whenever a cluster drifts;
- failure semantics match the reference: fits whose relative RMS residual
  exceeds ``max_rms_dev`` are rejected (original values kept, ``cost`` set
  to NaN); the ``cost`` column is the masked RMS residual normalized by the
  cluster signal scale;
- ``compute_error=True`` adds per-parameter ``<name>_std`` columns from the
  Gauss–Newton covariance (cost²·(JᵀJ)⁻¹), the reference's error estimate;
- constrained buckets (constraints.py) fit a rigid pose exactly instead of
  running SLSQP; user dicts become weighted penalty rows scaled by
  ``sqrt(residual_factor)`` (reference default 1e5);
- clusters bigger than ``max_cluster_size`` spill to the host scipy path
  (hostref.py) for exact reference behavior on outliers.

API parity (reference signature shape, SURVEY.md §2):

    refine_leastsq(f, reader, diameter, separation=None,
                   fit_function='gauss', param_mode=None, param_val=None,
                   constraints=None, bounds=None, compute_error=False,
                   pos_columns=None, t_column='frame', max_iter=10,
                   max_shift=1.0, max_rms_dev=1.0, residual_factor=1e5,
                   **solver options)
"""
from __future__ import annotations

import math
import time
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from .constraints import (
    Constraint,
    pose_dim,
    pose_to_positions,
    positions_to_pose,
    wrap_constraint_dicts,
)
from .find import find_clusters
from .models.packing import build_layout
from .models.registry import ModelSpec, get_model
from .ops.gather import origins_for, radius_mask
from .ops.lm import lm_solve, lm_solve_global
from .ops.pallas_lm import pallas_available
from .ops.residual import make_model_fns
from .utils import (
    default_size_columns,
    guess_pos_columns,
    validate_tuple,
)

__all__ = ["refine_leastsq", "train_leastsq"]

_LANE_PAD = 32  # lanes are padded to multiples of this (limits retraces)


# ---------------------------------------------------------------------------
# Jitted bucket solvers (cached per static configuration)
# ---------------------------------------------------------------------------
def _gather_stack(frames, frame_idx, origins, window_shape):
    """Gather [B, Npix] windows from stacked frames [T, *S].

    Row-take + one-hot matmul: every window ROW (all dims but the minor)
    becomes one flat row index into frames reshaped to [n_rows, W], pulled
    with a single `jnp.take` (row gathers move whole contiguous 128-lane
    tiles — fast); the minor-axis columns are then extracted with a
    batched one-hot einsum that runs on the MXU.  Replaces the former
    two-stage vmapped dynamic_slice, which was scalar-core bound
    (measured ~4 µs/lane: 8 ms for a B=2048 3D bucket vs ~1 ms here —
    the HBM traffic itself is ~0.5 ms).  The one-hot product is exact
    (each output pixel is 1.0 × one input pixel)."""
    D = len(window_shape)
    B = origins.shape[0]
    W = frames.shape[-1]
    wx = window_shape[-1]
    lead = frames.shape[1:-1]          # per-frame row-grid shape
    n_row_dims = D - 1

    # static window-row offset grid [R_rows, D-1]
    row_grid = np.stack(
        [
            g.ravel()
            for g in np.meshgrid(
                *[np.arange(w) for w in window_shape[:-1]], indexing="ij"
            )
        ],
        axis=-1,
    ).astype(np.int32)                 # [R_rows, D-1]
    R_rows = row_grid.shape[0]

    stride = np.ones(n_row_dims, np.int64)
    for d in range(n_row_dims - 1, 0, -1):
        stride[d - 1] = stride[d] * lead[d]
    frame_rows = int(np.prod(lead))

    row_idx = jnp.broadcast_to(
        frame_idx.astype(jnp.int32)[:, None] * frame_rows, (B, R_rows)
    )
    for d in range(n_row_dims):
        row_idx = row_idx + (
            origins[:, d, None] + jnp.asarray(row_grid[None, :, d])
        ) * int(stride[d])
    rows = jnp.take(
        frames.reshape(-1, W), row_idx.reshape(-1), axis=0
    ).reshape(B, R_rows, W)

    ox = origins[:, -1]
    col = jax.lax.broadcasted_iota(jnp.int32, (B, W, wx), 1)
    tgt = ox[:, None, None] + jax.lax.broadcasted_iota(
        jnp.int32, (B, W, wx), 2
    )
    selX = (col == tgt).astype(frames.dtype)              # [B, W, wx]
    out = jnp.einsum(
        "brw,bwx->brx", rows, selX,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(B, -1)


@lru_cache(maxsize=256)
def _bucket_solver(
    model: ModelSpec,
    ndim: int,
    isotropic: bool,
    n: int,
    param_mode_key: tuple,
    window_shape: tuple,
    radius: tuple,
    bounds_key: tuple,
    constraint: Optional[Constraint],
    residual_factor: float,
    max_iter: int,
    max_shift: float,
    lm_max_iter: int,
    ftol: float,
    xtol: float,
    compute_error: bool,
    lm_backend: str = "auto",
    gather_backend: str = "auto",
):
    """Build the jitted lockstep solver for one bucket configuration.

    Cache key is fully static/hashable; jax.jit inside additionally keys on
    array shapes (padded batch, frame-stack shape).
    """
    layout = build_layout(
        model, ndim, isotropic, n, dict(param_mode_key)
    )
    fns = make_model_fns(model, layout, window_shape)
    pos_idx = np.array(layout.pos_param_idx)
    V = layout.n_slots
    Q = pose_dim(constraint) if (
        constraint is not None and constraint.kind == "rigid"
    ) else 0
    fit_dist = bool(constraint and constraint.fit_dist)

    # --- bounds: per-slot arrays from (name, lo, hi) tuples --------------
    lower = upper = None
    if bounds_key:
        lo = np.full(V, -np.inf, np.float32)
        hi = np.full(V, np.inf, np.float32)
        for name, b_lo, b_hi in bounds_key:
            p = layout.param_names.index(name)
            slots = layout.slot_idx[:, p]
            for s in slots:
                if s >= 0:
                    lo[s] = b_lo
                    hi[s] = b_hi
        if Q:  # pose slots are unbounded; shift other-slot bounds
            lo = np.concatenate([np.full(Q + fit_dist, -np.inf,
                                         np.float32), lo])
            hi = np.concatenate([np.full(Q + fit_dist, np.inf,
                                         np.float32), hi])
        lower, upper = jnp.asarray(lo), jnp.asarray(hi)

    rigid = constraint is not None and constraint.kind == "rigid"
    generic = constraint is not None and constraint.kind == "generic"
    pen_w = math.sqrt(residual_factor)

    def positions_of(vect, params_ref):
        """Current positions [B, n, D] implied by an optimizer vector."""
        if rigid:
            pose = vect[:, : Q + fit_dist]
            return pose_to_positions(pose, constraint)
        params = layout.vect_to_params(vect, params_ref)
        return params[..., pos_idx]

    def params_of(vect, params_ref):
        if rigid:
            pos = positions_of(vect, params_ref)
            params = layout.vect_to_params(
                vect[:, Q + fit_dist:], params_ref
            )
            return params.at[..., pos_idx].set(pos)
        return layout.vect_to_params(vect, params_ref)

    def vect_of(params, pose=None):
        v = layout.vect_from_params(params)
        if rigid:
            return jnp.concatenate([pose, v], axis=1)
        return v

    def _lane_jac(residual_fn):
        """AD Jacobian per LANE: vmap(jacfwd(per-lane residual)).

        jacfwd over the full batched residual builds a [B, Npix, B, Vc]
        intermediate before the lane-diagonal einsum — 271 GB at B=4096
        (measured OOM); per-lane jacfwd keeps it [B, Npix, Vc]."""

        def one(v, pr, px, mk, org, nm):
            return residual_fn(
                v[None], pr[None], px[None], mk[None], org[None],
                nm[None],
            )[0]

        jac_one = jax.jacfwd(one, argnums=0)

        def residual_jac(vect, params_ref, pixels, mask, origin, norm):
            r = residual_fn(vect, params_ref, pixels, mask, origin, norm)
            J = jax.vmap(jac_one)(
                vect, params_ref, pixels, mask, origin, norm
            )                                   # [B, Npix(+pen), Vc]
            return r, jnp.swapaxes(J, 1, 2)     # slot-major [B, Vc, Npix]

        return residual_jac

    if rigid:
        def residual(vect, params_ref, pixels, mask, origin, norm):
            params = params_of(vect, params_ref)
            img = fns.image_from_params(params, origin)
            # (mask / norm) first — bit-aligned with residual_jac's weight
            # and the pallas kernel (see ops/residual.py::residual_fn)
            return (img - pixels) * (mask / norm[:, None])

        # Analytic Jacobian via the chain rule: the model machinery's
        # analytic per-slot pixel Jacobian × the (tiny, per-lane jacfwd)
        # Jacobian of the pose→positions map.  AD through the full pixel
        # residual costs Q+V forward passes per lane; this costs one
        # analytic J eval + a [n, D, Q]-sized pose derivative.  Needs
        # positions in 'var' mode (the default) so J_std has per-position
        # rows; otherwise fall back to per-lane AD.
        pos_ok = all(
            layout.slot_idx[i, p] >= 0
            for i in range(layout.n_features)
            for p in layout.pos_param_idx
        )
        if pos_ok:
            pos_rows = np.array(
                [
                    layout.slot_idx[i, p]
                    for i in range(layout.n_features)
                    for p in layout.pos_param_idx
                ]
            )
            Qt = Q + fit_dist
            pose_jac_one = jax.jacfwd(
                lambda p: pose_to_positions(p[None], constraint)[0]
            )

            def residual_jac(vect, params_ref, pixels, mask, origin,
                             norm):
                params = params_of(vect, params_ref)
                vect_std = layout.vect_from_params(params)
                r, J_std = fns.residual_jac(
                    vect_std, params, pixels, mask, origin, norm
                )                                   # [B, Vstd, Npix]
                G = jax.vmap(pose_jac_one)(
                    vect[:, :Qt]
                )                                   # [B, n, D, Qt]
                Bd, _, Npx = J_std.shape
                Jpos = J_std[:, pos_rows, :].reshape(
                    Bd, layout.n_features, layout.ndim, Npx
                )
                J_pose = jnp.einsum(
                    "bndq,bndp->bqp", G, Jpos,
                    precision=jax.lax.Precision.HIGHEST,
                )
                # position slots are overridden by the pose — their
                # direct derivative is zero (damping handles the zero
                # diagonal, same as the AD path's inert columns)
                J_free = J_std.at[:, pos_rows, :].set(0.0)
                return r, jnp.concatenate([J_pose, J_free], axis=1)
        else:
            residual_jac = _lane_jac(residual)
    elif generic:
        con_fun = jax.vmap(constraint.fun)

        def residual(vect, params_ref, pixels, mask, origin, norm):
            r = fns.residual(vect, params_ref, pixels, mask, origin, norm)
            pos = positions_of(vect, params_ref)
            pen = pen_w * con_fun(pos)
            return jnp.concatenate([r, pen.reshape(r.shape[0], -1)], 1)

        residual_jac = _lane_jac(residual)
    else:
        residual = fns.residual
        residual_jac = fns.residual_jac

    use_global = bool(
        np.any(layout.global_slots)
        or (rigid and fit_dist and constraint.dist_mode == "global")
    )

    # Fused Pallas LM kernel (SURVEY.md §7 M6): whole solve in VMEM.
    # 'auto' uses it on TPU for unconstrained, non-global buckets; 'xla'
    # forces the lax.while_loop path; 'pallas' forces the kernel (interpret
    # mode off-TPU, for tests).
    from .ops.pallas_lm import pallas_available

    if lm_backend == "auto":
        use_pallas = (
            jax.default_backend() == "tpu"
            and pallas_available(model, layout, use_global, constraint,
                                 window_shape)
        )
    elif lm_backend == "pallas":
        if not pallas_available(model, layout, use_global, constraint,
                                window_shape):
            raise ValueError(
                "lm_backend='pallas' unsupported for this configuration "
                "(global-tied slots, constraints, or a fit window too "
                f"large for VMEM: {window_shape})"
            )
        use_pallas = True
    elif lm_backend == "xla":
        use_pallas = False
    else:
        raise ValueError(f"Unknown lm_backend {lm_backend!r}")
    if use_global:
        gslots = np.zeros(Q + fit_dist + V, dtype=bool) if rigid else \
            np.zeros(V, dtype=bool)
        if rigid:
            if fit_dist and constraint.dist_mode == "global":
                gslots[Q] = True
            gslots[Q + fit_dist:] = layout.global_slots
        else:
            gslots[:] = layout.global_slots

    @jax.jit
    def solve(frames, frame_idx, params0, pose0, valid, fvalid=None):
        """frames [T,*S] f32; frame_idx [B] i32; params0 [B,n,P] f32;
        pose0 [B,Q+fit_dist] (dummy [B,0] when unconstrained);
        valid [B] bool; fvalid [B,n] f32 (ladder pad gating; None for
        exact/constrained buckets)."""
        if rigid or generic:
            # constrained buckets are always exact-size; their custom
            # residual wrappers take no fvalid (a mesh caller may still
            # pass all-ones — drop it)
            fvalid = None
        B = params0.shape[0]
        frame_shape = frames.shape[1:]
        signal0 = params0[..., layout.signal_param_idx]
        norm = jnp.maximum(jnp.max(jnp.abs(signal0), axis=1), 1e-6)

        vect0 = vect_of(params0, pose0) if rigid else vect_of(params0)

        # Implicit position bounds: positions (or pose centers) stay inside
        # the frame.  Without this, a lane whose gradient vanishes (feature
        # left its window) can random-walk unboundedly; the reference's
        # serial fit is naturally confined by its fixed subimage.
        Vtot = vect0.shape[1]
        lo_np = np.full(Vtot, -np.inf, np.float32)
        hi_np = np.full(Vtot, np.inf, np.float32)
        if lower is not None:
            lo_np = np.maximum(lo_np, np.asarray(lower, np.float32))
            hi_np = np.minimum(hi_np, np.asarray(upper, np.float32))
        if rigid:
            for d in range(layout.ndim):  # pose center slots
                lo_np[d], hi_np[d] = 0.0, float(frame_shape[d] - 1)
            if fit_dist:  # a bond length is positive AND window-bounded
                lo_np[Q] = max(lo_np[Q], 1e-3)
                # Without an upper bound, one overshooting damped step
                # can inflate the bond until every feature leaves the
                # gather window — the gradient vanishes, the lane
                # plateaus on an empty mask, and the collapsed fit used
                # to be ACCEPTED at cost 0 (found via the whole-video
                # dimer_global test).  The cluster's vertices must stay
                # inside the window, so dist ≤ (window span)/(2·circ).
                from .constraints import circumradius_factor

                circ_f = circumradius_factor(
                    layout.n_features, layout.ndim
                )
                hi_np[Q] = min(
                    hi_np[Q],
                    (min(window_shape) - 1) / (2.0 * circ_f),
                )
        else:
            for d, p in enumerate(layout.pos_param_idx):
                for s in layout.slot_idx[:, p]:
                    if s >= 0:
                        lo_np[s] = 0.0
                        hi_np[s] = float(frame_shape[d] - 1)
        # Implicit size bounds: a fitted size walking through zero makes
        # r² = (dx/s)² produce 0/0 = NaN at the feature's own center
        # pixel, poisoning the whole lane (measured: 41% of dense-scale
        # recovery refits — degenerate near-coincident warm starts —
        # diverged this way).  A size larger than the window is equally
        # meaningless: the profile goes flat and the gradient vanishes.
        for p in layout.size_param_idx:
            for s in layout.slot_idx[:, p]:
                if s >= 0:
                    lo_np[s] = max(lo_np[s], 0.05)
                    hi_np[s] = min(
                        hi_np[s], float(max(window_shape))
                    )
        lo_b, hi_b = jnp.asarray(lo_np), jnp.asarray(hi_np)

        if use_pallas:
            from .ops.pallas_lm import make_pallas_lm

            pallas_solve = make_pallas_lm(
                model, layout, window_shape, lo_np, hi_np, radius,
                max_iter=lm_max_iter, ftol=ftol, xtol=xtol,
                frame_shape=frame_shape,
                constraint=constraint if rigid else None,
            )

        fused = use_pallas and getattr(pallas_solve, "fused_gather", False)

        # Pallas DMA gather for buckets the fused kernel can't take whole
        # (3D windows foremost): per-lane superset DMA at HBM stream
        # bandwidth vs the XLA row-take's ~28 GB/s effective (measured
        # 6.7 ms -> ~2 ms for a B=2048 (9,13,13) bucket).
        from .ops.pallas_gather import (
            make_pallas_gather,
            pallas_gather_available,
        )

        pgather = None
        frames_g = frames
        if (
            gather_backend == "auto"
            and jax.default_backend() == "tpu"
            and not fused
        ):
            # the DMA kernel needs 8/128-aligned frame dims; pad the
            # stack once per dispatch (origins stay valid — windows are
            # clamped inside the ORIGINAL frame, padding is only ever
            # superset-block overhang that the extraction discards)
            Hp = -(-frame_shape[-2] // 8) * 8
            Wp = -(-frame_shape[-1] // 128) * 128
            shape_g = frame_shape[:-2] + (Hp, Wp)
            if pallas_gather_available(window_shape, shape_g):
                pgather = make_pallas_gather(window_shape, shape_g)
                if shape_g != frame_shape:
                    pad = [(0, 0)] * frames.ndim
                    pad[-2] = (0, Hp - frame_shape[-2])
                    pad[-1] = (0, Wp - frame_shape[-1])
                    frames_g = jnp.pad(frames, pad)

        def gather(vect, params_ref, fidx=None, with_mask=True,
                   with_pixels=True, fv=None):
            if fidx is None:
                fidx = frame_idx
            pos = positions_of(vect, params_ref)
            origin = origins_for(pos, window_shape, frame_shape)
            # fused-gather pallas kernels DMA their own windows from the
            # frame stack in HBM — no [B, Npix] pixel array is built; the
            # [B, Npix] mask likewise only exists for XLA solves
            if not with_pixels:
                pixels = None
            elif pgather is not None:
                Npix = int(np.prod(window_shape))
                pixels = pgather(frames_g, fidx, origin)[
                    :Npix, : origin.shape[0]
                ].T
            else:
                pixels = _gather_stack(
                    frames, fidx, origin, window_shape
                )
            mask = (
                radius_mask(pos, origin, window_shape, radius, fvalid=fv)
                if with_mask else None
            )
            return pixels, mask, origin, pos

        def outer_cond(state):
            it, vect, need, rms, conv, iters = state[:6]
            return (it < max_iter) & jnp.any(need)

        def outer_body(state, sort_lanes):
            (it, vect, need, rms, conv, iters,
             vect_best, rms_best, conv_best) = state
            # Active-lane sort (VERDICT r2 item 4): rounds past the first
            # only `need` the lanes still drifting > max_shift.  Packing
            # those into the leading 128-lane tiles lets the kernel's
            # whole-tile skip (pallas_lm.py) pass frozen tiles through
            # without a single accumulate sweep — kernel math is lane-
            # independent, so the permutation is bit-exact.  XLA paths
            # gain nothing (full-batch lockstep) and skip the shuffle;
            # round 0 is peeled UNSORTED below (every valid lane is
            # active there, so the shuffle would be an identity that
            # still pays ~8 full-batch gathers — measured 16% off the
            # config-1 headline).
            if sort_lanes:
                order = jnp.argsort(
                    jnp.where(need, 0, 1), stable=True
                )
                vect_s = jnp.take(vect, order, axis=0)
                cp_s = jnp.take(params0, order, axis=0)
                fidx_s = jnp.take(frame_idx, order, axis=0)
                norm_s = jnp.take(norm, order, axis=0)
                need_s = jnp.take(need, order, axis=0)
                fv_s = (
                    None if fvalid is None
                    else jnp.take(fvalid, order, axis=0)
                )
            else:
                order = None
                vect_s, cp_s, fidx_s = vect, params0, frame_idx
                norm_s, need_s, fv_s = norm, need, fvalid
            pixels, mask, origin, pos_at = gather(
                vect_s, cp_s, fidx_s,
                with_mask=not use_pallas,
                with_pixels=not fused,
                fv=fv_s,
            )
            fv_extra = () if fvalid is None else (fvalid,)
            if use_global:
                args = (params0, pixels, mask, origin, norm) + fv_extra
                res = lm_solve_global(
                    residual, residual_jac, vect, tuple(gslots), args,
                    max_iter=lm_max_iter, ftol=ftol, xtol=xtol,
                    lower=lo_b, upper=hi_b, valid=need,
                )
            elif fused:
                res = pallas_solve(
                    vect_s, cp_s, frames, fidx_s, pos_at, origin,
                    norm_s, need_s, fvalid=fv_s
                )
            elif use_pallas:
                res = pallas_solve(
                    vect_s, cp_s, pixels, pos_at, origin, norm_s,
                    need_s, fvalid=fv_s
                )
            else:
                args = (params0, pixels, mask, origin, norm) + fv_extra
                res = lm_solve(
                    residual, residual_jac, vect, args,
                    max_iter=lm_max_iter, ftol=ftol, xtol=xtol,
                    lower=lo_b, upper=hi_b, valid=need,
                )
            if order is not None:  # scatter lanes back to input order
                unperm = lambda a: (
                    None if a is None
                    else jnp.zeros_like(a).at[order].set(a)
                )
                res = res._replace(
                    x=unperm(res.x), cost=unperm(res.cost),
                    n_iter=unperm(res.n_iter),
                    converged=unperm(res.converged),
                    npix=unperm(res.npix),
                )
                pos_at = unperm(pos_at)
            pos_new = positions_of(res.x, params0)
            shift = jnp.max(
                jnp.abs(pos_new - pos_at), axis=(1, 2)
            )
            npx_raw = (
                res.npix if res.npix is not None
                else jnp.sum(mask, axis=1)
            )
            npx = jnp.maximum(npx_raw, 1.0)
            # an empty fit mask (every feature outside its window) has
            # residual ≡ 0 — that is a FAILED fit, not a perfect one
            rms_new = jnp.where(
                npx_raw > 0.0,
                jnp.sqrt(res.cost / npx),
                jnp.inf,
            )
            rms = jnp.where(need, rms_new, rms)
            conv = jnp.where(need, res.converged, conv)
            iters = iters + jnp.where(need, res.n_iter, 0)
            # Best-round-so-far carry: re-centering the gather window
            # between rounds changes the data a lane is fit against, and
            # a degenerate warm start (near-coincident features from a
            # recovery pass) can make a LATER round strictly worse —
            # measured: signals diverge, the re-gathered cost goes to
            # inf, and 41% of dense-scale recovery refits used to return
            # rms=inf from round k>0 after a perfectly usable round 0.
            # The outer iteration continues from the latest iterate (the
            # window must follow the current positions), but the
            # REPORTED fit is the best finite round per lane.
            improved = need & (rms_new < rms_best)
            vect_best = jnp.where(improved[:, None], res.x, vect_best)
            rms_best = jnp.where(improved, rms_new, rms_best)
            conv_best = jnp.where(improved, res.converged, conv_best)
            need = need & (shift > max_shift)
            return (it + 1, res.x, need, rms, conv, iters,
                    vect_best, rms_best, conv_best)

        init = (
            jnp.int32(0),
            vect0,
            valid,
            jnp.full((B,), jnp.inf, jnp.float32),
            jnp.zeros((B,), bool),
            jnp.zeros((B,), jnp.int32),
            vect0,
            jnp.full((B,), jnp.inf, jnp.float32),
            jnp.zeros((B,), bool),
        )
        # round 0 peeled unsorted (all valid lanes active — see
        # outer_body); later rounds sort still-active lanes into the
        # leading kernel tiles
        state = outer_body(init, sort_lanes=False)
        out_state = jax.lax.while_loop(
            outer_cond, lambda s: outer_body(s, sort_lanes=use_pallas),
            state,
        )
        vect, rms, conv = out_state[6], out_state[7], out_state[8]
        iters = out_state[5]
        params = params_of(vect, params0)

        if compute_error:
            pixels, mask, origin, _ = gather(vect, params0, fv=fvalid)
            err_extra = () if fvalid is None else (fvalid,)
            r, J = residual_jac(
                vect, params0, pixels, mask, origin, norm, *err_extra
            )
            H = jnp.einsum("bun,bvn->buv", J, J,
                           precision=jax.lax.Precision.HIGHEST)
            Vc = H.shape[-1]
            # Cholesky-based inverse (VERDICT r3 weak 8): the solvers use
            # Cholesky for conditioning — the covariance of the V≈49-73
            # ladder buckets should too, not an f32 jnp.linalg.inv.  The
            # jitter scales with the diagonal (f32-eps sized) so nearly
            # singular H stays positive-definite.
            diag_max = jnp.maximum(
                jnp.max(jnp.diagonal(H, axis1=-2, axis2=-1), axis=-1),
                1e-30,
            )
            Hs = H + (3e-7 * diag_max)[:, None, None] * jnp.eye(
                Vc, dtype=H.dtype
            )
            L = jnp.linalg.cholesky(Hs)
            eye = jnp.eye(Vc, dtype=H.dtype)
            cov = jax.vmap(
                lambda l: jax.scipy.linalg.cho_solve((l, True), eye)
            )(L)
            npx = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
            dof = jnp.maximum(npx - Vc, 1.0)
            sigma2 = jnp.sum(r * r, axis=1) / dof
            var = jnp.maximum(
                jnp.diagonal(cov, axis1=-2, axis2=-1), 0.0
            ) * sigma2[:, None]
            std_vect = jnp.sqrt(var)
            if rigid:
                # Delta method: propagate the pose covariance through the
                # pose→positions map (G = ∂pos/∂vect), so constrained fits
                # report per-coordinate position stderr like the reference's
                # SLSQP covariance would.
                G = jax.vmap(
                    jax.jacfwd(
                        lambda v, pr: positions_of(v[None], pr[None])[0],
                        argnums=0,
                    )
                )(vect, params0)              # [B, n, D, Vc] (per lane)
                var_pos = jnp.einsum(
                    "bndu,buv,bndv->bnd", G, cov, G,
                    precision=jax.lax.Precision.HIGHEST,
                ) * sigma2[:, None, None]
                std_pos = jnp.sqrt(jnp.maximum(var_pos, 0.0))
                # non-pose slots keep the direct covariance mapping
                std_params = layout.vect_to_params(
                    std_vect[:, Q + fit_dist:],
                    jnp.full(params.shape, jnp.nan),
                )
                std_params = std_params.at[..., pos_idx].set(std_pos)
            else:
                std_params = layout.vect_to_params(
                    std_vect, jnp.full(params.shape, jnp.nan)
                )
        else:
            std_params = jnp.zeros((0,))

        return params, rms, conv, iters, std_params

    return solve, layout


@lru_cache(maxsize=256)
def _mesh_bucket_solver(
    mesh,
    model: ModelSpec,
    ndim: int,
    isotropic: bool,
    n: int,
    param_mode_key: tuple,
    window_shape: tuple,
    radius: tuple,
    bounds_key: tuple,
    constraint: Optional[Constraint],
    residual_factor: float,
    max_iter: int,
    max_shift: float,
    lm_max_iter: int,
    ftol: float,
    xtol: float,
    compute_error: bool,
    lm_backend: str,
):
    """Mesh-sharded bucket solver: the multi-chip user-API path.

    Lanes (the cluster batch) shard over the mesh's first axis; frames
    replicate (SURVEY.md §5 frame-parallel row — the fit stage is pure
    data parallelism).  Two routes:

    - pallas-eligible buckets (unconstrained, no global slots, TPU) run
      the fused kernel per device under shard_map — lanes are
      independent, so the map needs no collectives;
    - everything else goes through GSPMD: inputs are device_put with
      NamedShardings and XLA partitions the jitted solve, turning
      lm_solve_global's shared-slot tie (mean over lanes) into a
      cross-device all-reduce — how 'global'-mode params and
      dimer_global train data-parallel across chips.

    Returns (call, layout, backend_tag); ``call`` has the same signature
    and outputs as the single-device solver.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    lane = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    layout = build_layout(model, ndim, isotropic, n, dict(param_mode_key))
    use_global = bool(
        np.any(layout.global_slots)
        or (constraint is not None and constraint.kind == "rigid"
            and constraint.fit_dist and constraint.dist_mode == "global")
    )
    shardmap_ok = (
        lm_backend in ("auto", "pallas")
        and jax.default_backend() == "tpu"
        and constraint is None
        and not use_global
        and pallas_available(model, layout, use_global, constraint,
                             window_shape)
    )
    if shardmap_ok:
        solver, layout = _bucket_solver(
            model, ndim, isotropic, n, param_mode_key, window_shape,
            radius, bounds_key, constraint, residual_factor, max_iter,
            max_shift, lm_max_iter, ftol, xtol, compute_error,
            "auto", "auto",
        )
        # pallas_call outputs carry no varying-mesh-axes metadata, so the
        # replication/vma check must be off (kwarg name differs by version)
        try:
            from jax import shard_map
            _kw = {"check_vma": False}
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map
            _kw = {"check_rep": False}
        lane_p = P(axis)
        std_spec = lane_p if compute_error else P()
        inner = shard_map(
            lambda fr, fi, p0, ps, va, fv: solver(fr, fi, p0, ps, va, fv),
            mesh=mesh,
            in_specs=(P(), lane_p, lane_p, lane_p, lane_p, lane_p),
            out_specs=(lane_p, lane_p, lane_p, lane_p, std_spec),
            **_kw,
        )
        backend_tag = "pallas-sharded"
    else:
        # GSPMD cannot auto-partition a pallas_call, so this route pins
        # the XLA solver + XLA gather; collectives are inserted by the
        # partitioner.
        inner, layout = _bucket_solver(
            model, ndim, isotropic, n, param_mode_key, window_shape,
            radius, bounds_key, constraint, residual_factor, max_iter,
            max_shift, lm_max_iter, ftol, xtol, compute_error,
            "xla", "xla",
        )
        if constraint is not None:
            kind = "rigid" if constraint.kind == "rigid" else "penalty"
            backend_tag = f"xla-{kind}-sharded"
        elif use_global:
            backend_tag = "xla-global-sharded"
        else:
            backend_tag = "xla-sharded"

    def call(stack, fidx, params0, pose0, valid, fvalid=None):
        if fvalid is None:
            fvalid = jnp.ones(
                (np.asarray(params0).shape[0], n), jnp.float32
            )
        args = (
            jax.device_put(jnp.asarray(stack, jnp.float32), rep),
            jax.device_put(jnp.asarray(fidx), lane),
            jax.device_put(jnp.asarray(params0), lane),
            jax.device_put(jnp.asarray(pose0), lane),
            jax.device_put(jnp.asarray(valid), lane),
            jax.device_put(jnp.asarray(fvalid), lane),
        )
        return inner(*args)

    return call, layout, backend_tag


@lru_cache(maxsize=64)
def _dist_eq(
    model: ModelSpec,
    ndim: int,
    isotropic: bool,
    n: int,
    window_shape: tuple,
    radius: tuple,
):
    """Jitted pooled-normal-equation accumulator for a shared rigid
    DISTANCE (VERDICT r2 item 6 — whole-video dimer_global).

    At the fitted per-cluster geometry, positions are reparameterized as
    ``center + circ·d·u_i`` (u_i the unit offsets of the fitted shape);
    the Gauss–Newton H, g of the joint unnormalized residual w.r.t. the
    scalar ``d`` accumulate across every accepted cluster of every
    dispatch — train.py's pooled machinery applied to the pose distance
    slot.  Pixels/mask/origin are held at the current geometry (d moves
    are sub-pixel between rounds)."""
    from .constraints import circumradius_factor

    layout = build_layout(model, ndim, isotropic, n, {})
    fns = make_model_fns(model, layout, window_shape)
    pos_idx = np.array(layout.pos_param_idx)
    circ = float(circumradius_factor(n, ndim))

    @jax.jit
    def accum(frames, frame_idx, params_fit, valid, d):
        pos = params_fit[..., pos_idx]                  # [B, n, D]
        center = pos.mean(axis=1, keepdims=True)
        rel = pos - center
        u = rel / jnp.maximum(
            jnp.linalg.norm(rel, axis=-1, keepdims=True), 1e-9
        )
        frame_shape = frames.shape[1:]
        origin = origins_for(pos, window_shape, frame_shape)
        pixels = _gather_stack(frames, frame_idx, origin, window_shape)
        mask = radius_mask(pos, origin, window_shape, radius)

        def resid(dv):
            newpos = center + circ * dv * u
            params = params_fit.at[..., pos_idx].set(newpos)
            img = fns.image_from_params(params, origin)
            return (img - pixels) * mask

        r, dr = jax.jvp(resid, (d,), (jnp.ones_like(d),))
        w = valid.astype(r.dtype)[:, None]
        g = jnp.sum(dr * r * w)
        H = jnp.sum(dr * dr * w)
        cost = jnp.sum(r * r * w)
        return H, g, cost

    return accum


def _joint_global_dist(
    out, reader, con, model, ndim, isotropic, radius, separation,
    param_names, t_column, frames_per_dispatch, d0,
):
    """One video-wide bond length via damped Newton on the pooled
    normal equations over all accepted clusters (see _dist_eq)."""
    acc = out[(out["cluster_size"] == con.cluster_size)
              & out["cost"].notna()]
    if not len(acc):
        return None
    n = con.cluster_size
    P = len(param_names)
    frame_numbers = sorted(acc[t_column].unique())
    buckets = []
    for cs in range(0, len(frame_numbers), frames_per_dispatch):
        chunk = frame_numbers[cs : cs + frames_per_dispatch]
        images = _frames_of(reader, chunk, ndim)
        frame_shape = tuple(np.asarray(images[int(chunk[0])]).shape)
        vals = [images[int(t)] for t in chunk]
        if any(isinstance(v, jax.Array) for v in vals):
            stack = jnp.stack(
                [jnp.asarray(v, jnp.float32) for v in vals], axis=0
            )
        else:
            stack = jnp.asarray(
                np.stack(vals, axis=0).astype(np.float32)
            )
        frame_local = {int(t): i for i, t in enumerate(chunk)}
        sub = acc[acc[t_column].isin(chunk)]
        grp = sub.sort_values("cluster", kind="stable")
        if len(grp) % n != 0:
            continue
        B = len(grp) // n
        if B == 0:
            continue
        flat = np.zeros((len(grp), P), np.float32)
        for j, name in enumerate(param_names):
            flat[:, j] = grp[name].to_numpy(dtype=float)
        Bpad = max(_LANE_PAD, -(-B // _LANE_PAD) * _LANE_PAD)
        params_fit = np.zeros((Bpad, n, P), np.float32)
        params_fit[:B] = flat.reshape(B, n, P)
        if B < Bpad:
            params_fit[B:] = params_fit[0]
        fidx = np.zeros(Bpad, np.int32)
        fidx[:B] = [
            frame_local[int(t)]
            for t in grp[t_column].to_numpy().reshape(B, n)[:, 0]
        ]
        valid = np.zeros(Bpad, bool)
        valid[:B] = True
        wshape = _window_shape(n, ndim, radius, separation, frame_shape)
        accum = _dist_eq(model, ndim, isotropic, n, wshape,
                         tuple(radius))
        buckets.append((
            accum,
            (stack, jnp.asarray(fidx), jnp.asarray(params_fit),
             jnp.asarray(valid)),
        ))
    if not buckets:
        return None

    def eval_at(dv):
        H = g = cost = 0.0
        dj = jnp.float32(dv)
        for accum, args in buckets:
            Hb, gb, cb = accum(*args, dj)
            H += float(Hb)
            g += float(gb)
            cost += float(cb)
        return H, g, cost

    d = float(d0)
    Hx, gx, cx = eval_at(d)
    lam = 1e-3
    for _ in range(25):
        delta = -gx / max(Hx * (1.0 + lam), 1e-12)
        dt = max(d + delta, 1e-3)
        Ht, gt, ct_ = eval_at(dt)
        if ct_ < cx:
            moved = abs(dt - d)
            d, Hx, gx, cx = dt, Ht, gt, ct_
            lam = max(lam * 0.25, 1e-8)
            if moved < 1e-5 * max(abs(d), 1e-6):
                break
        else:
            lam *= 4.0
            if lam > 1e10:
                break
    return d


@lru_cache(maxsize=4)
def _result_packer(compute_error: bool):
    """Pack a bucket's five solver outputs into ONE [B, X] f32 array.

    On the axon tunnel every device→host fetch pays a ~27 ms round-trip
    floor; fetching five arrays per bucket serially cost ~135 ms/bucket
    — the measured ~100 ms/bucket fit-stage floor regardless of lane
    count.  One packed array = one fetch.  conv packs as 0/1 and iters
    as f32 (exact below 2²⁴)."""

    @jax.jit
    def pack(params, rms, conv, iters, std):
        B = params.shape[0]
        cols = [
            params.reshape(B, -1),
            rms[:, None],
            conv[:, None].astype(jnp.float32),
            iters[:, None].astype(jnp.float32),
        ]
        if compute_error:
            cols.append(std.reshape(B, -1))
        return jnp.concatenate(cols, axis=1)

    return pack


# A coarsened 8-step ladder (1,2,3,4,8,16,28,40) was measured SLOWER at
# dense scale despite halving bucket dispatches (main fit 0.87 -> 2.46 s):
# the populous size-5/6 clusters moved from the V=19 unrolled/pallas
# solver tier into the V=25 XLA tier, and the solver-tier mix dominates
# the ~54 ms/bucket dispatch round-trips it saved.
_SIZE_LADDER = (1, 2, 3, 4, 6, 8, 10, 12, 16, 20, 24, 32)


def _ladder_size(n: int) -> int:
    """Quantized bucket size for an unconstrained n-feature cluster.

    Sizes above 4 round UP to a ladder step (5→6, 7→8, 13→16, …); the
    cluster pads with INERT features (fvalid gates their model image,
    Jacobian rows, and mask pixels to exactly zero), so ONE jitted
    solver covers several sizes — long-tailed cluster-size
    distributions stop paying one multi-minute XLA compile per size,
    and lockstep lanes fill better."""
    for step in _SIZE_LADDER:
        if step >= n:
            return step
    return -(-n // 8) * 8


def _window_shape(n, ndim, radius, separation, frame_shape):
    """Static window extent per bucket: cluster bbox + radius margin.

    Connected components at threshold `separation` bound an n-chain's
    bbox by (n-1)*separation per axis (SURVEY.md §3.2 transitivity)."""
    w = []
    for d in range(ndim):
        ext = int(math.ceil((n - 1) * separation[d] + 2 * radius[d])) + 3
        w.append(min(ext, frame_shape[d]))
    return tuple(w)


# ---------------------------------------------------------------------------
# Host orchestration
# ---------------------------------------------------------------------------
def _frames_of(reader, frame_numbers, ndim=None):
    """Fetch frames as a dict {frame_no: ndarray | jax.Array}.

    Accepts a bare ndarray (a SINGLE image shared by every frame — only
    when its rank equals the fit's ``ndim``, so a [T, H, W] video stack
    is correctly indexed per frame rather than mistaken for one 3D
    z-stack), a reader supporting __getitem__, or a [T, ...] stack.
    Frames that are ALREADY device arrays (e.g. from
    pipeline._DeviceFrameCache) are kept as-is so the chunk stack
    assembles on device — no host round-trip."""
    if isinstance(reader, np.ndarray) and (
        reader.ndim == ndim
        or (ndim is None and reader.ndim in (2, 3))
    ):
        return {int(t): reader for t in frame_numbers}
    out = {}
    for t in frame_numbers:
        fr = reader[int(t)]
        out[int(t)] = fr if isinstance(fr, jax.Array) else np.asarray(fr)
    return out


def _nan_trap_raise(p, rms, model, ndim):
    """Raise FloatingPointError naming the first non-finite lane of a
    dispatch (diagnostics.debug_nans — SURVEY.md §5 sanitizers row).

    Distinguishes the two causes a user needs to tell apart: the MODEL
    FUNCTION itself returning non-finite values at the initial
    parameters (the custom-model-dict bug class — silently a rejected
    lane without the trap), vs. a solve that started finite and
    diverged.  The probe evaluates ``model.fun`` on a host r2 grid with
    the offending cluster's initial extra params."""
    bad = np.nonzero(p["valid"] & ~np.isfinite(rms))[0]
    lane = int(bad[0])
    p0 = np.asarray(p["params0"])[lane]          # [n, P]
    n, P = p0.shape
    n_extra = len(model.extra_params)
    extras = [float(v) for v in p0[0, P - n_extra:]] if n_extra else []
    probe = "model probe unavailable"
    try:
        r2 = jnp.linspace(0.0, 30.0, 61)
        vals = np.asarray(model.fun(r2, *map(jnp.float32, extras)))
        dval = np.asarray(model.dfun_dr2()(
            jnp.float32(1.0), *map(jnp.float32, extras)))
        if not np.isfinite(vals).all() or not np.isfinite(dval).all():
            probe = (
                "model.fun/dfun is NON-FINITE at the initial parameters "
                f"(first bad r2 = "
                f"{float(r2[~np.isfinite(vals)][0]) if not np.isfinite(vals).all() else 'dfun'}) "
                "— fix the custom model dict (fun/dfun must be finite "
                "on r2 >= 0)"
            )
        else:
            probe = (
                "model.fun is finite at the start — the solve DIVERGED "
                "(check initial guesses, bounds, or scaling)"
            )
    except Exception as e:  # pragma: no cover - probe is best-effort
        probe = f"model probe failed: {e!r}"
    cid = int(np.asarray(p["cids"])[min(lane, len(p["cids"]) - 1)])
    t_val = p["tvals"][min(lane, len(p["tvals"]) - 1)]
    raise FloatingPointError(
        f"non-finite fit cost in dispatch: model={model.name!r} "
        f"cluster_size={p['n']} window={p['wshape']} "
        f"lanes={int(p['valid'].sum())} (first offender: cluster {cid}, "
        f"frame {t_val}, lane {lane}; {len(bad)} lane(s) affected). "
        f"{probe}. Initial params of the offending cluster "
        f"(background, signal, pos..., size..., extras...): "
        f"{np.round(p0.astype(float), 4).tolist()}. "
        "This trap is armed by clustertracking_tpu.diagnostics."
        "debug_nans() / CT_TPU_DEBUG_NANS=1; without it this lane is "
        "silently rejected (cost NaN, originals kept)."
    )


def refine_leastsq(
    f: pd.DataFrame,
    reader,
    diameter,
    separation=None,
    fit_function="gauss",
    param_mode: Optional[dict] = None,
    param_val: Optional[dict] = None,
    constraints=None,
    bounds: Optional[dict] = None,
    compute_error: bool = False,
    pos_columns: Optional[list] = None,
    t_column: str = "frame",
    max_iter: int = 10,
    max_shift: float = 1.0,
    max_rms_dev: float = 1.0,
    residual_factor: float = 1e5,
    max_cluster_size: int = 8,
    # larger dispatch chunks amortize per-dispatch host/tunnel latency
    # and fill more lockstep lanes (each dispatch costs ~27 ms RTT on
    # the axon tunnel regardless of batch size)
    frames_per_dispatch: int = 32,
    lm_max_iter: int = 60,
    ftol: float = 1.49e-8,
    xtol: float = 1.49e-8,
    backend_find: str = "host",
    lm_backend: str = "auto",
    mesh=None,
) -> pd.DataFrame:
    """Simultaneously refine overlapping features cluster-by-cluster.

    DataFrame in/out, matching the reference contract (SURVEY.md §1):
    requires position columns (+ optionally 'signal', 'size'/'size_*',
    'frame'); adds/updates refined parameter columns, 'cluster',
    'cluster_size' and 'cost' (NaN = rejected fit).

    ``mesh`` (new capability — the reference is single-threaded,
    SURVEY.md §2): a ``jax.sharding.Mesh`` over whose first axis every
    bucket's lane (cluster) axis is data-parallel sharded; frames
    replicate and 'global'-tied slots all-reduce across devices
    (_mesh_bucket_solver).  Results match the single-device path
    lane-for-lane.
    """
    if pos_columns is None:
        pos_columns = guess_pos_columns(f)
    ndim = len(pos_columns)
    diameter = validate_tuple(diameter, ndim)
    radius = tuple(d / 2.0 for d in diameter)
    if separation is None:
        separation = diameter
    separation = validate_tuple(separation, ndim)
    model = get_model(fit_function)
    param_val = dict(param_val or {})
    con_map = wrap_constraint_dicts(constraints, ndim)

    # isotropy: explicit anisotropic size columns win
    aniso_cols = default_size_columns(ndim, False)
    isotropic = not any(c in f.columns for c in aniso_cols)
    size_cols = default_size_columns(ndim, isotropic)

    f = f.copy()
    if "cluster" not in f.columns:
        f = find_clusters(
            f, separation, pos_columns, t_column, backend=backend_find
        )
    if t_column not in f.columns:
        f[t_column] = 0

    # --- initial parameter table -----------------------------------------
    n_size = len(size_cols)
    extra_names = list(model.extra_params)
    P = 2 + ndim + n_size + len(extra_names)
    param_names = (
        ["background", "signal"] + pos_columns + size_cols + extra_names
    )

    if "size" in param_val:
        size_default_src = param_val["size"]
    elif isotropic:
        size_default_src = float(np.mean(radius)) / 2.0
    else:
        size_default_src = tuple(r / 2 for r in radius)
    default_size = np.asarray(
        validate_tuple(size_default_src, n_size), dtype=float
    )

    def initial_params(rows, images):
        """Initial parameter table for any block of feature rows (a whole
        bucket or a single spill cluster); the image-sampling signal
        fallback loops frames, not clusters."""
        k = len(rows)
        p = np.zeros((k, P))
        p[:, 0] = param_val.get(
            "background",
            rows["background"].to_numpy() if "background" in rows
            else 0.0,
        )
        pos = rows[pos_columns].to_numpy(dtype=float)
        p[:, 2 : 2 + ndim] = pos
        if "signal" in rows:
            p[:, 1] = rows["signal"].to_numpy(dtype=float)
        else:
            tarr = rows[t_column].to_numpy()
            for t in np.unique(tarr):
                m = tarr == t
                image = np.asarray(images[int(t)])
                ipos = np.clip(
                    np.round(pos[m]).astype(int), 0,
                    np.asarray(image.shape) - 1,
                )
                p[m, 1] = image[tuple(ipos.T)] - p[m, 0]
        for j, c in enumerate(size_cols):
            # explicit param_val overrides any locate-estimated column
            # (reference param_val semantics: user-forced values win)
            if "size" in param_val or c in param_val:
                p[:, 2 + ndim + j] = default_size[j] \
                    if "size" in param_val else param_val[c]
            elif c in rows:
                p[:, 2 + ndim + j] = rows[c].to_numpy(dtype=float)
            else:
                p[:, 2 + ndim + j] = default_size[j]
        for j, name in enumerate(extra_names):
            if name in param_val:
                p[:, 2 + ndim + n_size + j] = param_val[name]
            elif name in rows:
                p[:, 2 + ndim + n_size + j] = rows[name].to_numpy(
                    dtype=float
                )
            else:
                p[:, 2 + ndim + n_size + j] = model.default[name]
        return p

    param_mode_key = tuple(sorted((param_mode or {}).items()))
    bounds_key = tuple(
        sorted((k, float(v[0]), float(v[1])) for k, v in
               (bounds or {}).items())
    )

    out = f.copy()
    # Column write buffers: refined values accumulate in flat numpy
    # arrays and are assigned to the DataFrame ONCE at the end — per-row
    # .loc writes cost ~1 ms each in pandas and dominated the host time
    # at ~10⁴ clusters (measured ~30 s per 100-frame video).
    param_bufs = {}
    for name in param_names:
        if name in out.columns:
            param_bufs[name] = out[name].to_numpy(dtype=np.float64).copy()
        else:
            param_bufs[name] = np.full(len(out), np.nan)
    cost_buf = np.full(len(out), np.nan)
    conv_buf = np.zeros(len(out), dtype=bool)
    iter_buf = np.zeros(len(out), dtype=np.int64)
    row_pos = pd.Series(np.arange(len(out)), index=out.index)
    std_cols = {}
    if compute_error:
        for name in param_names:
            std_cols[name] = np.full(len(f), np.nan)

    frame_numbers = sorted(f[t_column].unique())
    frame_shape = None
    in_flight: list = []
    drain_queue: list = []
    if mesh is not None:
        # lane axis must split evenly over the mesh's first axis
        msize = int(mesh.shape[mesh.axis_names[0]])
        lane_quant = _LANE_PAD * msize // math.gcd(_LANE_PAD, msize)
    else:
        lane_quant = _LANE_PAD

    def _drain_bucket(p):
        """Fetch one queued bucket's device results and write them back."""
        from . import diagnostics

        t_fetch = time.perf_counter()
        packed = np.asarray(p["handles"])           # ONE device fetch
        n, B, valid = p["n"], p["B"], p["valid"]
        nP = n * len(param_names)
        params_fit = packed[:, :nP].reshape(-1, n, len(param_names))
        rms = packed[:, nP]
        conv = packed[:, nP + 1] > 0.5
        iters = packed[:, nP + 2].astype(np.int64)
        std = (
            packed[:, nP + 3 :].reshape(-1, n, len(param_names))
            if compute_error else None
        )
        pos_mat, layout, con = p["pos_mat"], p["layout"], p["con"]
        ok_lane = (rms <= max_rms_dev) & np.isfinite(rms) & valid
        if diagnostics.nan_debug_active() and (
            valid & ~np.isfinite(rms)
        ).any():
            _nan_trap_raise(p, rms, model, ndim)
        # mirrors _bucket_solver's use_pallas decision — a config
        # pallas_available rejects (e.g. window too big for VMEM, 3D
        # rigid pose) actually ran the XLA path and must be recorded
        ug = bool(
            np.any(layout.global_slots)
            or (con is not None and con.kind == "rigid"
                and con.fit_dist and con.dist_mode == "global")
        )
        on_pallas = (
            jax.default_backend() == "tpu"
            and lm_backend != "xla"
            and pallas_available(model, layout, ug, con, p["wshape"])
        )
        if p.get("backend_tag"):  # mesh-sharded dispatch knows its route
            backend_str = p["backend_tag"]
        elif con is not None:
            kind = "rigid" if con.kind == "rigid" else "penalty"
            backend_str = ("pallas-" if on_pallas else "xla-") + kind
        elif ug:
            backend_str = "xla-global"
        elif on_pallas:
            backend_str = "pallas"
        else:
            backend_str = "xla"
        diagnostics.record_batch(
            cluster_size=n,
            n_clusters=int(valid.sum()),
            n_lanes=p["Bpad"],
            n_converged=int((conv & valid).sum()),
            n_rejected=int((valid & ~ok_lane).sum()),
            mean_lm_iters=float(iters[valid].mean()) if valid.any()
            else 0.0,
            max_lm_iters=int(iters[valid].max()) if valid.any() else 0,
            mean_rms=float(rms[valid].mean()) if valid.any() else 0.0,
            # dispatch + this bucket's fetch; device compute overlaps
            # other buckets, so the SUM approximates the fit-stage wall
            wall_s=p["dispatch_s"] + (time.perf_counter() - t_fetch),
            backend=backend_str,
        )

        # vectorized writeback across the whole bucket; pos_mat slots
        # of ladder pad features are -1 and never written back
        rmsB, convB, itB = rms[:B], conv[:B], iters[:B]
        real = pos_mat >= 0                             # [B, n]
        flat_pos = pos_mat[real]
        # first-class failure flags (SURVEY.md §5): solver convergence
        # and iteration count per feature, accepted or not
        conv_buf[flat_pos] = np.broadcast_to(
            convB[:, None], real.shape
        )[real]
        iter_buf[flat_pos] = np.broadcast_to(
            itB[:, None], real.shape
        )[real]
        ok_l = (rmsB <= max_rms_dev) & np.isfinite(rmsB)
        if ok_l.any():
            real_ok = real[ok_l]                        # [Bok, n]
            okpos = pos_mat[ok_l][real_ok]
            pf = params_fit[:B][ok_l]                   # [Bok, n, P]
            for j, name in enumerate(param_names):
                param_bufs[name][okpos] = pf[:, :, j][real_ok]
            cost_buf[okpos] = np.broadcast_to(
                rmsB[ok_l][:, None], real_ok.shape
            )[real_ok]
            if compute_error:
                stdok = std[:B][ok_l]
                for j, name in enumerate(param_names):
                    std_cols[name][okpos] = stdok[:, :, j][real_ok]
        # rejected: keep originals, cost stays NaN

    for chunk_start in range(0, len(frame_numbers), frames_per_dispatch):
        chunk = frame_numbers[chunk_start : chunk_start + frames_per_dispatch]
        images = _frames_of(reader, chunk, ndim)
        frame_shape = tuple(images[int(chunk[0])].shape)
        vals = [images[int(t)] for t in chunk]
        if any(isinstance(v, jax.Array) for v in vals):
            # frames already on device (pipeline's device cache): stack
            # device-side, no host round-trip
            stack = jnp.stack(
                [jnp.asarray(v, jnp.float32) for v in vals], axis=0
            )
        else:
            stack = np.stack(vals, axis=0).astype(np.float32)
        frame_local = {int(t): i for i, t in enumerate(chunk)}
        sub = f[f[t_column].isin(chunk)]

        # group clusters into LADDER buckets; within a bucket, sorting
        # by cluster id makes every cluster a contiguous block, so the
        # whole bucket assembles with vectorized numpy (per-cluster
        # DataFrame filtering is O(B²) pandas and dominated host time at
        # 10⁴ clusters).  Unconstrained sizes quantize UP to a ladder
        # step (_ladder_size) with inert pad features; constrained sizes
        # keep exact buckets (rigid poses need the true n) and oversize
        # clusters keep the true size for the spill path.
        csz_all = sub["cluster_size"].to_numpy()

        def _bucket_of(c):
            c = int(c)
            if c in con_map or c > max_cluster_size:
                return c
            lad = min(_ladder_size(c), max_cluster_size)
            # a laddered bucket id must not collide with a CONSTRAINED
            # size (con_map is keyed by bucket id below): an
            # unconstrained 5-cluster must not inherit a user's
            # hexamer constraint by padding into bucket 6
            return c if lad in con_map else lad

        bucket_ids = np.array([_bucket_of(c) for c in csz_all])
        for n, grp in sub.groupby(bucket_ids):
            n = int(n)
            grp = grp.sort_values("cluster", kind="stable")
            if n > max_cluster_size:
                row_groups = [
                    g for _, g in grp.groupby("cluster", sort=False)
                ]
                _spill_scipy(
                    param_bufs, cost_buf, row_pos, row_groups, images,
                    model, ndim, isotropic, radius, separation,
                    param_names, pos_columns, size_cols, initial_params,
                    t_column, max_iter, max_shift, max_rms_dev,
                    param_mode_key, conv_buf, iter_buf,
                    std_cols if compute_error else None,
                )
                continue

            # integrity guard for user-supplied cluster columns: every
            # cluster id must appear exactly cluster_size times, within
            # one frame (find_clusters guarantees this; a hand-edited
            # DataFrame might not, and would silently corrupt the blocks)
            cid = grp["cluster"].to_numpy()
            boundaries = np.nonzero(np.diff(cid))[0] + 1
            starts = np.concatenate([[0], boundaries])
            sizes_arr = np.diff(np.concatenate([starts, [len(grp)]]))
            csz_first = grp["cluster_size"].to_numpy()[starts]
            t_arr = grp[t_column].to_numpy()
            if (
                (sizes_arr != csz_first).any()
                or (sizes_arr > n).any()
                or (t_arr != np.repeat(t_arr[starts], sizes_arr)).any()
            ):
                raise ValueError(
                    "inconsistent cluster/cluster_size columns: a cluster "
                    "id appears with the wrong multiplicity or spans "
                    "frames — re-run find_clusters"
                )
            B = len(starts)
            Bpad = max(
                lane_quant, int(np.ceil(B / lane_quant)) * lane_quant
            )
            flat = initial_params(grp, images)          # [rows, P]
            params0 = np.zeros((Bpad, n, P), dtype=np.float32)
            # pad features replicate member 0 (keeps bbox/window
            # geometry intact) with signal 0; fvalid gates them out of
            # the model, the Jacobian, and the mask entirely
            params0[:B] = np.repeat(flat[starts], n, axis=0).reshape(
                B, n, P
            )
            params0[:B, :, 1] = 0.0
            within = np.arange(len(grp)) - np.repeat(starts, sizes_arr)
            slot_flat = np.repeat(np.arange(B), sizes_arr) * n + within
            params0[:B].reshape(-1, P)[slot_flat] = flat
            fval = np.zeros((Bpad, n), dtype=np.float32)
            fval.reshape(-1)[slot_flat] = 1.0
            fidx = np.zeros(Bpad, dtype=np.int32)
            fidx[:B] = [frame_local[int(t)] for t in t_arr[starts]]
            valid = np.zeros(Bpad, dtype=bool)
            valid[:B] = True
            pos_mat = np.full((B, n), -1, dtype=np.int64)
            pos_mat.reshape(-1)[slot_flat] = row_pos[grp.index].to_numpy()
            # pad lanes replicate lane 0 (keeps shapes sane numerically)
            if B < Bpad and B > 0:
                params0[B:] = params0[0]
                fval[B:] = fval[0]

            con = con_map.get(n)
            wshape = _window_shape(n, ndim, radius, separation, frame_shape)
            if n > 1:
                # Shrink to this batch's ACTUAL cluster bounding box: the
                # static formula assumes the worst case (a straight chain,
                # (n-1)·separation per axis), but connected components at
                # threshold `separation` are usually compact — an n=6
                # dense-scene bucket measured 37² worst-case vs ~21²
                # actual, a 3× pixel saving per solve.  Quantized to
                # multiples of 8 so window shapes (jit keys) stay few.
                posb = params0[:B, :, 2 : 2 + ndim]
                ext = (posb.max(axis=1) - posb.min(axis=1)).max(axis=0)
                margin = 2.0 * max_shift + 3.0
                dyn = tuple(
                    min(
                        w,
                        max(8, int(-(-(e + 2 * r + margin) // 8) * 8)),
                    )
                    for w, e, r in zip(wshape, ext, radius)
                )
                wshape = tuple(
                    min(d, s) for d, s in zip(dyn, frame_shape)
                )
            import os as _os
            import sys as _sys
            if _os.environ.get("CT_DEBUG_BUCKETS"):
                print(f"[bucket] n={n} wshape={wshape} B={Bpad}",
                      file=_sys.stderr, flush=True)
            backend_tag = None
            if mesh is not None:
                solver, layout, backend_tag = _mesh_bucket_solver(
                    mesh, model, ndim, isotropic, n, param_mode_key,
                    wshape, radius, bounds_key, con, residual_factor,
                    max_iter, max_shift, lm_max_iter, ftol, xtol,
                    compute_error, lm_backend,
                )
            else:
                solver, layout = _bucket_solver(
                    model, ndim, isotropic, n, param_mode_key, wshape,
                    radius, bounds_key, con, residual_factor,
                    max_iter, max_shift, lm_max_iter, ftol, xtol,
                    compute_error, lm_backend,
                )
            if con is not None and con.kind == "rigid":
                pose0 = positions_to_pose(
                    params0[:, :, 2 : 2 + ndim], con
                ).astype(np.float32)
            else:
                pose0 = np.zeros((Bpad, 0), dtype=np.float32)

            from . import diagnostics

            t_dispatch = time.perf_counter()
            fv_arg = None if con is not None else jnp.asarray(fval)
            with diagnostics.stage(f"fit_bucket_n{n}"):
                handles = _result_packer(compute_error)(*solver(
                    jnp.asarray(stack), jnp.asarray(fidx),
                    jnp.asarray(params0), jnp.asarray(pose0),
                    jnp.asarray(valid), fv_arg,
                ))
            # dispatch is asynchronous — queue the device handles and
            # fetch a chunk LATER (pipelining: the device runs this
            # bucket while the host assembles the next ones, spills run
            # scipy, and on the tunnel the per-dispatch ~27 ms round
            # trips overlap instead of serializing)
            in_flight.append(dict(
                handles=handles, n=n, B=B, Bpad=Bpad, valid=valid,
                pos_mat=pos_mat, layout=layout, con=con, wshape=wshape,
                backend_tag=backend_tag,
                dispatch_s=time.perf_counter() - t_dispatch,
                # non-finite trap context (diagnostics.debug_nans): the
                # initial params + cluster ids let the trap name the
                # offending cluster and probe the model at its start
                params0=params0, cids=cid[starts], tvals=t_arr[starts],
            ))

        # keep at most one chunk's dispatches in flight (bounds device
        # memory: two chunks' frame stacks + results live at once)
        for p in drain_queue:
            _drain_bucket(p)
        drain_queue = in_flight
        in_flight = []

    for p in drain_queue:
        _drain_bucket(p)

    for name in param_names:
        out[name] = param_bufs[name]
    out["cost"] = cost_buf
    out["fit_converged"] = conv_buf
    out["fit_n_iter"] = iter_buf
    if compute_error:
        for name, col in std_cols.items():
            out[name + "_std"] = col

    # Whole-video global distance (VERDICT r2 item 6): the per-dispatch
    # lm_solve_global tie above estimates one bond length per
    # frames_per_dispatch chunk; dimer_global's contract is ONE length
    # for the whole fit.  Alternate: pooled cross-dispatch Gauss–Newton
    # on the shared distance (_joint_global_dist) ⇄ refit with the
    # distance FIXED at the joint value (exact geometry, fast rigid
    # kernel), until the joint estimate stops moving.
    gcons = [
        c for c in con_map.values()
        if c.kind == "rigid" and c.fit_dist and c.dist_mode == "global"
    ]
    if gcons:
        import dataclasses as _dc

        from .constraints import circumradius_factor

        # each refit round re-runs ONLY the affected cluster-size's rows
        # (VERDICT r3 item 8) — the other classes' fits are untouched by
        # a distance that doesn't apply to them; index and cluster ids
        # survive the subset call (refine keeps an existing 'cluster').
        refreshed = list(param_names) + [
            "cost", "fit_converged", "fit_n_iter"
        ]
        if compute_error:
            refreshed += [name + "_std" for name in param_names]
        global_dists = {}
        for gcon in gcons:
            d_prev = None
            for _ in range(3):
                acc = out[(out["cluster_size"] == gcon.cluster_size)
                          & out["cost"].notna()]
                if not len(acc):
                    break
                posf = acc[pos_columns].to_numpy(dtype=float).reshape(
                    -1, gcon.cluster_size, ndim
                )
                rel = posf - posf.mean(axis=1, keepdims=True)
                d0 = float(
                    np.linalg.norm(rel, axis=-1).mean()
                    / circumradius_factor(gcon.cluster_size, ndim)
                )
                d_star = _joint_global_dist(
                    out, reader, gcon, model, ndim, isotropic, radius,
                    separation, param_names, t_column,
                    frames_per_dispatch, d0,
                )
                if d_star is None:
                    break
                converged = d_prev is not None and (
                    abs(d_star - d_prev) <= 1e-4 * max(d_star, 1e-6)
                )
                d_prev = d_star
                if converged:
                    break
                fixed_cons = [
                    _dc.replace(c, dist=float(d_star)) if c is gcon else c
                    for c in con_map.values()
                ]
                sub_mask = out["cluster_size"] == gcon.cluster_size
                sub = refine_leastsq(
                    out[sub_mask], reader, diameter, separation,
                    fit_function=fit_function, param_mode=param_mode,
                    param_val=param_val, constraints=fixed_cons,
                    bounds=bounds, compute_error=compute_error,
                    pos_columns=pos_columns, t_column=t_column,
                    max_iter=max_iter, max_shift=max_shift,
                    max_rms_dev=max_rms_dev,
                    residual_factor=residual_factor,
                    max_cluster_size=max_cluster_size,
                    frames_per_dispatch=frames_per_dispatch,
                    lm_max_iter=lm_max_iter, ftol=ftol, xtol=xtol,
                    backend_find=backend_find, lm_backend=lm_backend,
                    mesh=mesh,
                )
                for col in refreshed:
                    if col in sub.columns:
                        out.loc[sub_mask, col] = sub[col]
            if d_prev is not None:
                global_dists[int(gcon.cluster_size)] = float(d_prev)
        if global_dists:
            # backward-compatible scalar (first constraint) + the full map
            out.attrs["global_dist"] = next(iter(global_dists.values()))
            out.attrs["global_dists"] = global_dists
    return out


def _spill_scipy(
    param_bufs, cost_buf, row_pos, row_groups, images, model, ndim,
    isotropic, radius, separation, param_names, pos_columns, size_cols,
    initial_params, t_column, max_iter, max_shift, max_rms_dev,
    param_mode_key, conv_buf=None, iter_buf=None, std_cols=None,
):
    """Host scipy path for clusters larger than the biggest bucket.

    Output parity with the batched path (VERDICT r2 item 7): sets
    ``fit_converged``/``fit_n_iter`` from scipy's ier/nfev and fills the
    ``_std`` columns from the leastsq covariance when requested."""
    from . import diagnostics
    from .hostref import fit_cluster_scipy

    t_dispatch = time.perf_counter()
    n_rej = 0
    # hostref resolves builtin and inv_series names to numpy profiles
    # with analytic Jacobians; custom models pass their (jax) fun —
    # exact but finite-differenced
    if model.name in ("gauss", "ring", "hat", "disc") or \
            model.name.startswith("inv_series_"):
        profile = model.name
    else:
        profile = model.fun
    for rows in row_groups:
        n = len(rows)
        t = int(rows[t_column].iloc[0])
        image = np.asarray(images[t])  # scipy path is host-side
        p0 = initial_params(rows, images)
        layout = build_layout(
            model, ndim, isotropic, n, dict(param_mode_key)
        )
        wshape = _window_shape(n, ndim, radius, separation, image.shape)
        norm = max(np.abs(p0[:, 1]).max(), 1e-6)
        params, rms, _, info = fit_cluster_scipy(
            image, p0, layout.slot_idx, wshape, radius, isotropic,
            profile=profile,
            norm=norm, max_iter_refit=max_iter, max_shift=max_shift,
            full_output=True,
            # bound the worst case: scipy's default maxfev is
            # ~100·(V+1) PER refit round × max_iter rounds — a single
            # non-converging oversized chain ate 182 s/cluster when the
            # whole device batch took 0.4 s (benchmarks config 5).
            # 50·(V+1) total still allows ~several full LM cycles.
            nfev_budget=min(50 * (layout.n_slots + 1), 20000),
        )
        pos = row_pos[rows.index].to_numpy()
        if conv_buf is not None:
            conv_buf[pos] = info["converged"]
        if iter_buf is not None:
            iter_buf[pos] = info["nfev"]
        if rms <= max_rms_dev and np.isfinite(rms):
            for j, name in enumerate(param_names):
                param_bufs[name][pos] = params[:, j]
            cost_buf[pos] = float(rms)
            if std_cols is not None:
                for j, name in enumerate(param_names):
                    std_cols[name][pos] = info["std"][:, j]
        else:
            n_rej += 1
    if row_groups:
        diagnostics.record_batch(
            cluster_size=len(row_groups[0]),
            n_clusters=len(row_groups),
            n_lanes=len(row_groups),
            n_converged=len(row_groups) - n_rej,
            n_rejected=n_rej,
            mean_lm_iters=0.0,
            max_lm_iters=0,
            mean_rms=0.0,
            wall_s=time.perf_counter() - t_dispatch,
            backend="scipy",
        )


# train_leastsq lives in train.py (joint cross-bucket calibration); it
# imports this module's bucket machinery, so the import sits at the bottom
# to avoid a cycle.
from .train import train_leastsq  # noqa: E402
