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

Pixel coordinates: window origins are integer corner coordinates; the pixel
at window index (i0, i1, ...) has position origin + index (pixel centers at
integer coordinates, matching the reference's meshgrid convention).
"""
from __future__ import annotations

from functools import partial
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
    residual_jac: Callable      # same args -> (r, J)
    image: Callable             # (vect, const, origin) -> model image
    image_from_params: Callable  # (params [B,n,P], origin) -> model image


def window_offsets(window_shape: Tuple[int, ...], dtype=jnp.float32):
    """Static [Npix, D] array of pixel index offsets for a window."""
    grids = np.meshgrid(
        *[np.arange(s) for s in window_shape], indexing="ij"
    )
    return jnp.asarray(
        np.stack([g.ravel() for g in grids], axis=-1), dtype=dtype
    )


def make_model_fns(
    model: ModelSpec,
    layout: ParamLayout,
    window_shape: Tuple[int, ...],
    dtype=jnp.float32,
):
    """Build (residual_fn, residual_jac_fn, model_image_fn) for one bucket.

    All three close over the static layout/window and take::

        vect         [B, V]     — packed optimizer vector per cluster
        const_params [B, n, P]  — full param array supplying const values
        pixels       [B, Npix]  — flattened window pixels
        mask         [B, Npix]  — 1.0 inside the fit region, 0.0 outside
        origin       [B, D]     — integer window corner coordinates
        norm         [B]        — residual normalization (signal scale)

    and return::

        residual_fn     -> r [B, Npix]
        residual_jac_fn -> (r [B, Npix], J [B, Npix, V])
        model_image_fn  -> model image [B, Npix]   (unmasked, for debugging)
    """
    D = layout.ndim
    n = layout.n_features
    P = layout.n_params
    V = layout.n_slots
    offsets = window_offsets(window_shape, dtype)  # [Npix, D]
    n_extra = len(model.extra_params)
    extra_param_idx = tuple(
        layout.param_names.index(name) for name in model.extra_params
    )
    pos_idx = np.array(layout.pos_param_idx)
    size_idx = np.array(layout.size_param_idx)

    # Vectorized radial profile and its derivatives. The scalar profile is
    # elementwise in r2 with broadcastable extras, so plain broadcasting
    # works; grads come per-scalar via vmap-free broadcasting of jax.grad
    # composed over the elementwise fun.
    fun = model.fun
    dfun_dr2 = jnp.vectorize(model.dfun_dr2())
    dfun_dex = [jnp.vectorize(model.dfun_dextra(k)) for k in range(n_extra)]

    def _split(params):
        pos = params[..., pos_idx]                          # [B, n, D]
        size = params[..., size_idx]                        # [B, n, 1|D]
        signal = params[..., layout.signal_param_idx]       # [B, n]
        bg = params[..., 0, layout.background_param_idx]    # [B]
        extras = [params[..., j] for j in extra_param_idx]  # each [B, n]
        return pos, size, signal, bg, extras

    def _unpack(vect, const_params):
        params = layout.vect_to_params(vect, const_params)  # [B, n, P]
        return (params,) + _split(params)

    def _geometry(pos, size, origin):
        # Window-local arithmetic for f32 precision: dx = (origin+offsets)
        # - pos computed as offsets - (pos - origin), keeping magnitudes
        # O(window) instead of O(frame).
        rel = pos - origin[:, None, :].astype(dtype)        # [B, n, D]
        dx = offsets[None, None, :, :] - rel[:, :, None, :]  # [B,n,Npix,D]
        dxs = dx / size[:, :, None, :]
        r2 = jnp.sum(dxs * dxs, axis=-1)                    # [B, n, Npix]
        return dxs, r2

    def _profile(r2, extras):
        if n_extra:
            ex = [e[:, :, None] for e in extras]            # [B, n, 1]
            return fun(r2, *ex)
        return fun(r2)

    def image_from_params(params, origin):
        pos, size, signal, bg, extras = _split(params)
        _, r2 = _geometry(pos, size, origin)
        fvals = _profile(r2, extras)
        return bg[:, None] + jnp.sum(signal[:, :, None] * fvals, axis=1)

    def model_image_fn(vect, const_params, origin):
        params = layout.vect_to_params(vect, const_params)
        return image_from_params(params, origin)

    def residual_fn(vect, const_params, pixels, mask, origin, norm):
        img = model_image_fn(vect, const_params, origin)
        return (img - pixels) * mask / norm[:, None]

    def residual_jac_fn(vect, const_params, pixels, mask, origin, norm):
        _, pos, size, signal, bg, extras = _unpack(vect, const_params)
        dxs, r2 = _geometry(pos, size, origin)
        ex_b = [e[:, :, None] for e in extras]
        fvals = fun(r2, *ex_b) if n_extra else fun(r2)       # [B, n, Npix]
        img = bg[:, None] + jnp.sum(signal[:, :, None] * fvals, axis=1)
        w = mask / norm[:, None]                             # [B, Npix]
        r = (img - pixels) * w

        df = dfun_dr2(r2, *ex_b) if n_extra else dfun_dr2(r2)
        sig_df = signal[:, :, None] * df                     # [B, n, Npix]

        B = vect.shape[0]
        Npix = offsets.shape[0]
        J = jnp.zeros((B, Npix, V), dtype=dtype)

        def scatter(J, p, cols):
            """Accumulate per-feature columns cols[B, n, Npix] into the
            slots of param p (static index map; repeated indices add,
            which realizes shared cluster/global slots)."""
            slots = layout.slot_idx[:, p]
            if slots[0] < 0:
                return J
            cols = (cols * w[:, None, :]).transpose(0, 2, 1)  # [B,Npix,n]
            return J.at[:, :, slots].add(
                cols, indices_are_sorted=False, unique_indices=False
            )

        # background: d model / d bg = 1
        p_bg = layout.background_param_idx
        if layout.slot_idx[0, p_bg] >= 0:
            ones = jnp.ones((B, 1, Npix), dtype=dtype)
            # background is a single shared slot; scatter feature-0 only
            slots = layout.slot_idx[:1, p_bg]
            colw = (ones * w[:, None, :]).transpose(0, 2, 1)
            J = J.at[:, :, slots].add(colw)

        # signal_i: fun(r2_i)
        J = scatter(J, layout.signal_param_idx, fvals)

        # pos_{i,d}: signal_i * f'(r2_i) * (-2 * dxs_d / size_d)
        for d_axis, p in enumerate(layout.pos_param_idx):
            s_d = size[..., min(d_axis, size.shape[-1] - 1)]  # [B, n]
            cols = sig_df * (-2.0) * dxs[..., d_axis] / s_d[:, :, None]
            J = scatter(J, p, cols)

        # sizes: iso: dr2/ds = -2 r2 / s ; aniso: dr2/ds_d = -2 dxs_d^2 / s_d
        if layout.isotropic:
            p = layout.size_param_idx[0]
            s = size[..., 0]
            cols = sig_df * (-2.0) * r2 / s[:, :, None]
            J = scatter(J, p, cols)
        else:
            for d_axis, p in enumerate(layout.size_param_idx):
                s_d = size[..., d_axis]
                cols = (
                    sig_df
                    * (-2.0)
                    * dxs[..., d_axis] ** 2
                    / s_d[:, :, None]
                )
                J = scatter(J, p, cols)

        # model extras: signal_i * d fun / d extra_k
        for k, p in enumerate(extra_param_idx):
            cols = signal[:, :, None] * dfun_dex[k](r2, *ex_b)
            J = scatter(J, p, cols)

        return r, J

    return ModelFns(
        residual=residual_fn,
        residual_jac=residual_jac_fn,
        image=model_image_fn,
        image_from_params=image_from_params,
    )
