"""Batched residual / Jacobian construction for cluster model images.

TPU-native rebuild of clustertracking/fitfunc.py::FitFunctions.get_residual
(SURVEY.md §2, §3.1).  The reference builds one numpy residual closure per
cluster and hands it to scipy; here one jitted function evaluates the
residual and *analytic* Jacobian for a whole bucket of clusters at once:

  batch axis B = clusters, all with the same cluster size ``n`` and the
  same static window shape (SURVEY.md §7 "the batch of clusters is the
  tensor").

Model (see models/registry.py for the convention)::

    I(x)  = background + sum_i signal_i * fun(r2_i, *extras_i)
    r2_i  = sum_d ((x_d - pos_{i,d}) / size_{i,d})**2

Jacobian columns are exact chain-rule derivatives; the radial-profile
derivatives d fun/d r2 and d fun/d extra_k come from jax.grad of the scalar
profile, so custom models get analytic Jacobians too (the reference requires
a hand-written ``dfun`` for that).

TPU layout rule (load-bearing for performance): the *pixel* axis is always
last.  TPU vector memory tiles the last dim to 128 lanes; arrays shaped
``[..., Npix, D]`` or ``[B, Npix, V]`` pad their tiny trailing dim (2, 3, or
~6) up to 128 — a 20–60x memory blowup.  Hence:

    offsets [D, Npix];  dxs [B, n, D, Npix];  J [B, V, Npix]

Pixel coordinates: window origins are integer corner coordinates; the pixel
at window index (i0, i1, ...) has position origin + index (pixel centers at
integer coordinates, matching the reference's meshgrid convention).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.packing import ParamLayout
from ..models.registry import ModelSpec

__all__ = ["window_offsets", "make_model_fns", "ModelFns"]


class ModelFns(NamedTuple):
    """Jit-ready closures for one bucket (fixed layout + window shape)."""

    residual: Callable          # (vect, const, pixels, mask, origin, norm)
    residual_jac: Callable      # same args -> (r [B,Npix], J [B,V,Npix])
    image: Callable             # (vect, const, origin) -> model image
    image_from_params: Callable  # (params [B,n,P], origin) -> model image


def window_offsets(window_shape: Tuple[int, ...], dtype=jnp.float32):
    """Static [D, Npix] array of pixel index offsets for a window
    (pixel axis last — see module docstring)."""
    grids = np.meshgrid(
        *[np.arange(s) for s in window_shape], indexing="ij"
    )
    return jnp.asarray(
        np.stack([g.ravel() for g in grids], axis=0), dtype=dtype
    )


def make_model_fns(
    model: ModelSpec,
    layout: ParamLayout,
    window_shape: Tuple[int, ...],
    dtype=jnp.float32,
):
    """Build jitted model closures for one bucket.

    All close over the static layout/window and take::

        vect         [B, V]     — packed optimizer vector per cluster
        const_params [B, n, P]  — full param array supplying const values
        pixels       [B, Npix]  — flattened window pixels
        mask         [B, Npix]  — 1.0 inside the fit region, 0.0 outside
        origin       [B, D]     — integer window corner coordinates
        norm         [B]        — residual normalization (signal scale)

    returning::

        residual     -> r [B, Npix]
        residual_jac -> (r [B, Npix], J [B, V, Npix])   (slot-major J!)
    """
    D = layout.ndim
    n = layout.n_features
    V = layout.n_slots
    offsets = window_offsets(window_shape, dtype)  # [D, Npix]
    Npix = offsets.shape[1]
    n_extra = len(model.extra_params)
    extra_param_idx = tuple(
        layout.param_names.index(name) for name in model.extra_params
    )
    pos_idx = np.array(layout.pos_param_idx)
    size_idx = np.array(layout.size_param_idx)

    fun = model.fun
    dfun_f = model.dfun_f  # f-reusing form (None → fall back to dfun)
    if model.dfun is not None:
        dfun_dr2 = model.dfun  # analytic, already elementwise
    else:
        dfun_dr2 = jnp.vectorize(model.dfun_dr2())
    dfun_dex = [jnp.vectorize(model.dfun_dextra(k)) for k in range(n_extra)]

    def _split(params):
        pos = params[..., pos_idx]                          # [B, n, D]
        size = params[..., size_idx]                        # [B, n, 1|D]
        signal = params[..., layout.signal_param_idx]       # [B, n]
        bg = params[..., 0, layout.background_param_idx]    # [B]
        extras = [params[..., j] for j in extra_param_idx]  # each [B, n]
        return pos, size, signal, bg, extras

    def _geometry(pos, size, origin):
        # Window-local arithmetic for f32 precision: dx = (origin+offsets)
        # - pos computed as offsets - (pos - origin), keeping magnitudes
        # O(window) instead of O(frame).  Pixel axis last throughout.
        # NOTE: sizes divide per pixel (no hoisted-reciprocal micro-opt):
        # the pallas kernel computes the identical division, and x/s vs
        # x*(1/s) differ by ULPs that XLA's per-program fusion choices
        # amplify — hoisting broke the kernel↔XLA bit-parity contract
        # (test_pallas_matches_xla) when tried.
        rel = pos - origin[:, None, :].astype(dtype)        # [B, n, D]
        size_d = jnp.broadcast_to(size, rel.shape)          # [B, n, D]
        dx = offsets[None, None] - rel[..., None]           # [B,n,D,Npix]
        dxs = dx / size_d[..., None]
        r2 = jnp.sum(dxs * dxs, axis=-2)                    # [B, n, Npix]
        return dxs, r2

    def _profile(r2, extras):
        if n_extra:
            ex = [e[:, :, None] for e in extras]            # [B, n, 1]
            return fun(r2, *ex)
        return fun(r2)

    def image_from_params(params, origin, fvalid=None):
        pos, size, signal, bg, extras = _split(params)
        if fvalid is not None:  # ladder pad features contribute nothing
            signal = signal * fvalid
        _, r2 = _geometry(pos, size, origin)
        fvals = _profile(r2, extras)
        return bg[:, None] + jnp.sum(signal[:, :, None] * fvals, axis=1)

    def model_image_fn(vect, const_params, origin, fvalid=None):
        params = layout.vect_to_params(vect, const_params)
        return image_from_params(params, origin, fvalid)

    def residual_fn(vect, const_params, pixels, mask, origin, norm,
                    fvalid=None):
        img = model_image_fn(vect, const_params, origin, fvalid)
        # (mask / norm) FIRST — the same rounding as residual_jac_fn's
        # weight w and the pallas kernel's maskc·inv_norm (mask is 0/1,
        # so all three are bit-identical), keeping acceptance decisions
        # aligned across every solver path
        return (img - pixels) * (mask / norm[:, None])

    def residual_jac_fn(vect, const_params, pixels, mask, origin, norm,
                        fvalid=None):
        params = layout.vect_to_params(vect, const_params)
        pos, size, signal, bg, extras = _split(params)
        if fvalid is not None:
            # a pad feature (fvalid 0) contributes no model intensity and
            # ZERO Jacobian rows (its slots go inert; damping handles the
            # zero diagonal exactly like rigid inert position slots) —
            # signal gating covers every column except the signal one,
            # which is gated explicitly below
            signal = signal * fvalid
        dxs, r2 = _geometry(pos, size, origin)
        ex_b = [e[:, :, None] for e in extras]
        fvals = fun(r2, *ex_b) if n_extra else fun(r2)       # [B, n, Npix]
        if fvalid is not None:
            fvals_sig = fvals * fvalid[:, :, None]
        else:
            fvals_sig = fvals
        img = bg[:, None] + jnp.sum(signal[:, :, None] * fvals, axis=1)
        w = mask / norm[:, None]                             # [B, Npix]
        r = (img - pixels) * w

        if dfun_f is not None:  # reuse the forward value (one exp, not two)
            df = dfun_f(fvals, r2, *ex_b)
        else:
            df = dfun_dr2(r2, *ex_b) if n_extra else dfun_dr2(r2)
        sig_df = signal[:, :, None] * df                     # [B, n, Npix]

        size_bn = jnp.broadcast_to(size, pos.shape)          # [B, n, D]

        # Per-param derivative columns cols[p] : [B, n, Npix], computed
        # only for fitted params; J rows are then assembled by *static*
        # stacking (no scatter: each slot's contributor set is known at
        # trace time; shared slots sum their contributors).
        cols = {}

        p_bg = layout.background_param_idx
        if layout.slot_idx[0, p_bg] >= 0:
            # background derivative is 1·w for the single shared slot; the
            # stacker divides shared rows by nothing — store per-feature
            # w/n so the summed row equals w exactly.
            cols[p_bg] = jnp.broadcast_to(
                (w / n)[:, None, :], (w.shape[0], n, Npix)
            )

        def fitted(p):
            return layout.slot_idx[0, p] >= 0

        if fitted(layout.signal_param_idx):
            cols[layout.signal_param_idx] = fvals_sig * w[:, None, :]

        for d_axis, p in enumerate(layout.pos_param_idx):
            if fitted(p):
                s_d = size_bn[..., d_axis]                   # [B, n]
                cols[p] = (
                    sig_df * (-2.0) * dxs[:, :, d_axis, :]
                    / s_d[..., None] * w[:, None, :]
                )

        if layout.isotropic:
            p = layout.size_param_idx[0]
            if fitted(p):
                s = size[..., 0]
                cols[p] = (
                    sig_df * (-2.0) * r2 / s[:, :, None] * w[:, None, :]
                )
        else:
            for d_axis, p in enumerate(layout.size_param_idx):
                if fitted(p):
                    s_d = size[..., d_axis]
                    cols[p] = (
                        sig_df * (-2.0) * dxs[:, :, d_axis, :] ** 2
                        / s_d[:, :, None] * w[:, None, :]
                    )

        for k, p in enumerate(extra_param_idx):
            if fitted(p):
                cols[p] = (
                    signal[:, :, None] * dfun_dex[k](r2, *ex_b)
                    * w[:, None, :]
                )

        # slot v ← sum of its (feature, param) contributors (static map)
        rows = [None] * V
        for p, c in cols.items():
            slots = layout.slot_idx[:, p]
            if slots[0] == slots[-1] and n > 1:  # shared slot: sum feats
                rows[int(slots[0])] = jnp.sum(c, axis=1)
            else:
                for i in range(n):
                    rows[int(slots[i])] = c[:, i, :]
        J = jnp.stack(rows, axis=1)                          # [B, V, Npix]
        return r, J

    return ModelFns(
        residual=residual_fn,
        residual_jac=residual_jac_fn,
        image=model_image_fn,
        image_from_params=image_from_params,
    )
