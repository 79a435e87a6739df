"""Host scipy reference fit — parity oracle, spill path, CPU baseline.

This mirrors the reference's per-cluster scipy.optimize.leastsq solve
(clustertracking/refine.py core loop, SURVEY.md §3.1) in plain numpy/scipy.
It exists for three reasons:

1. **Parity tests** — the TPU batched LM is asserted against this path on
   identical clusters ("param RMSE vs scipy", BASELINE.md fidelity metric).
2. **Spill path** — clusters larger than the biggest bucket are fit here
   (SURVEY.md §7 hard-parts #1).
3. **CPU baseline** — bench.py measures this serial loop as the
   reference-equivalent throughput (the reference publishes no numbers).

Parameter layout is the canonical one from models/packing.py:
``[background, signal, pos_0..pos_{D-1}, size (1 or D cols), extras...]``.
The model convention matches models/registry.py exactly.
"""
from __future__ import annotations

import numpy as np

from .artificial import _resolve_profile
from .utils import validate_tuple

__all__ = ["fit_cluster_scipy"]


def _model_image(params, origin, window_shape, profile, ndim, iso):
    grids = np.meshgrid(
        *[np.arange(o, o + w) for o, w in zip(origin, window_shape)],
        indexing="ij",
    )
    coords = np.stack([g.ravel() for g in grids], axis=-1)  # [Npix, D]
    img = np.full(coords.shape[0], params[0, 0])  # background (shared)
    n_size = 1 if iso else ndim
    for row in params:
        signal = row[1]
        pos = row[2 : 2 + ndim]
        size = row[2 + ndim : 2 + ndim + n_size]
        if iso:
            size = np.full(ndim, size[0])
        extras = row[2 + ndim + n_size :]
        r2 = np.sum(((coords - pos) / size) ** 2, axis=-1)
        img = img + signal * (
            profile(r2, *extras) if len(extras) else profile(r2)
        )
    return img


# numpy mirrors of models/registry.py's analytic d profile / d r2 — the
# reference passes an analytic Dfun to leastsq (fitfunc dfun, SURVEY.md
# §3.1); without one, finite differencing costs (V+1) model evaluations
# per LM iteration (measured: 8.8 s for ONE spilled 9-feature cluster,
# V=37, vs ~0.1 s with the analytic Jacobian)
def _dgauss_np(r2):
    return -0.5 * np.exp(-0.5 * r2)


def _dring_np(r2, thickness=0.2):
    r = np.sqrt(r2 + 1e-12)
    f = np.exp(-0.5 * ((r - 1.0) / thickness) ** 2)
    return f * (1.0 - r) / (thickness * thickness) * 0.5 / r


def _dhat_np(r2, disc_size=0.5):
    r = np.sqrt(r2 + 1e-12)
    edge = np.maximum(r - disc_size, 0.0)
    sigma = max(1.0 - disc_size, 1e-3)
    f = np.exp(-0.5 * (edge / sigma) ** 2)
    return f * (-edge) / (sigma * sigma) * 0.5 / r


def _ddisc_np(r2):
    r = np.sqrt(r2 + 1e-12)
    s = 1.0 / (1.0 + np.exp(-(1.0 - r) / 0.1))
    return s * (1.0 - s) * (-10.0) * 0.5 / r


_DPROFILES = {
    "gauss": _dgauss_np,
    "ring": _dring_np,
    "hat": _dhat_np,
    "disc": _ddisc_np,
}


def fit_cluster_scipy(
    image: np.ndarray,
    params0: np.ndarray,
    slot_idx: np.ndarray,
    window_shape,
    radius,
    isotropic: bool,
    profile="gauss",
    norm: float = 1.0,
    max_iter_refit: int = 10,
    max_shift: float = 1.0,
    **leastsq_kwargs,
):
    """Fit one cluster with scipy.optimize.leastsq (reference-equivalent).

    Args:
      image: full frame (2D or 3D).
      params0: [n, P] canonical initial parameters.
      slot_idx: [n, P] packing map from models/packing.py (−1 = const).
      window_shape: static subregion shape.
      radius: per-axis mask radius (diameter/2).
      isotropic: single size column vs per-axis.
      norm: residual normalization (signal scale).

    Returns (params [n, P], rms_cost, n_function_evals).
    """
    from scipy.optimize import leastsq

    image = np.asarray(image, dtype=float)
    ndim = image.ndim
    window_shape = tuple(window_shape)
    radius = np.asarray(validate_tuple(radius, ndim), dtype=float)
    dprofile = _DPROFILES.get(profile) if isinstance(profile, str) \
        else None
    profile = _resolve_profile(profile)
    n, P = params0.shape
    params = params0.astype(float).copy()
    V = int(slot_idx.max()) + 1 if slot_idx.max() >= 0 else 0

    def pack(p):
        v = np.zeros(V)
        cnt = np.zeros(V)
        for i in range(n):
            for q in range(P):
                s = slot_idx[i, q]
                if s >= 0:
                    v[s] += p[i, q]
                    cnt[s] += 1
        return v / np.maximum(cnt, 1)

    def unpack(v, p):
        out = p.copy()
        for i in range(n):
            for q in range(P):
                s = slot_idx[i, q]
                if s >= 0:
                    out[i, q] = v[s]
        return out

    nfev_total = 0
    rms = np.inf
    for _ in range(max_iter_refit):
        pos = params[:, 2 : 2 + ndim]
        origin = np.round(
            0.5 * (pos.min(0) + pos.max(0))
            - 0.5 * (np.asarray(window_shape) - 1)
        ).astype(int)
        origin = np.clip(
            origin, 0, np.asarray(image.shape) - window_shape
        )
        pixels = image[
            tuple(slice(o, o + w) for o, w in zip(origin, window_shape))
        ].ravel()
        grids = np.meshgrid(
            *[np.arange(o, o + w) for o, w in zip(origin, window_shape)],
            indexing="ij",
        )
        coords = np.stack([g.ravel() for g in grids], axis=-1)
        d = (coords[None] - pos[:, None, :]) / radius
        mask = (np.sum(d * d, axis=-1).min(0) <= 1.0).astype(float)

        def resid(v):
            p = unpack(v, params)
            img = _model_image(
                p, origin, window_shape, profile, ndim, isotropic
            )
            return (img - pixels) * mask / norm

        n_size = 1 if isotropic else ndim
        extras_fitted = any(
            slot_idx[i, q] >= 0
            for i in range(n)
            for q in range(2 + ndim + n_size, P)
        )

        def dresid(v):
            """Analytic [Npix, V] Jacobian — the reference's Dfun."""
            p = unpack(v, params)
            J = np.zeros((coords.shape[0], V))
            if slot_idx[0, 0] >= 0:  # one shared background term
                J[:, slot_idx[0, 0]] += 1.0
            for i in range(n):
                row = p[i]
                signal = row[1]
                pos = row[2 : 2 + ndim]
                size = row[2 + ndim : 2 + ndim + n_size]
                size_d = np.full(ndim, size[0]) if isotropic else size
                dxs = (coords - pos) / size_d          # [Npix, D]
                r2 = np.sum(dxs * dxs, axis=-1)
                extras = row[2 + ndim + n_size :]
                f = profile(r2, *extras) if len(extras) else profile(r2)
                df = (
                    dprofile(r2, *extras) if len(extras)
                    else dprofile(r2)
                )
                sig_df = signal * df
                if slot_idx[i, 1] >= 0:
                    J[:, slot_idx[i, 1]] += f
                for d in range(ndim):
                    s = slot_idx[i, 2 + d]
                    if s >= 0:
                        J[:, s] += sig_df * (-2.0) * dxs[:, d] / size_d[d]
                if isotropic:
                    s = slot_idx[i, 2 + ndim]
                    if s >= 0:
                        J[:, s] += sig_df * (-2.0) * r2 / size[0]
                else:
                    for d in range(ndim):
                        s = slot_idx[i, 2 + ndim + d]
                        if s >= 0:
                            J[:, s] += (
                                sig_df * (-2.0) * dxs[:, d] ** 2 / size[d]
                            )
            return J * (mask / norm)[:, None]

        kw = dict(leastsq_kwargs)
        if dprofile is not None and not extras_fitted:
            kw.setdefault("Dfun", dresid)
        v_opt, cov, info, mesg, ier = leastsq(
            resid, pack(params), full_output=True, **kw
        )
        nfev_total += info["nfev"]
        if not np.isfinite(v_opt).all():
            # degenerate cluster (e.g. near-coincident features): the
            # solve diverged — reject instead of iterating on NaNs
            return unpack(pack(params), params), np.inf, nfev_total
        params = unpack(v_opt, params)
        r = resid(v_opt)
        rms = np.sqrt(np.sum(r**2) / max(mask.sum(), 1))
        shift = np.abs(params[:, 2 : 2 + ndim] - pos).max()
        if shift <= max_shift:
            break
    return params, rms, nfev_total
