"""train_leastsq — joint calibration of 'global'-mode model parameters.

Rebuild of clustertracking/refine.py::train_leastsq (SURVEY.md §3.3): the
reference builds ONE joint residual spanning every sampled cluster so that
'global' parameters (typically the coefficients of an experimental PSF
like ``inv_series_<n>``) are shared across the whole sample, and optimizes
until ``tol``.

TPU-native structure (alternating exact solves — VERDICT round-1 item 7):

1. **Joint-within-dispatch refit** — every sampled cluster is refit with
   the trained slots in 'global' mode, so each bucket dispatch solves its
   shared parameters JOINTLY with the per-cluster parameters
   (ops/lm.py::lm_solve_global).  With a single bucket this alone is the
   exact joint solution.
2. **Exact cross-bucket global step** — at the fitted per-cluster
   parameters, the Gauss–Newton normal equations of the JOINT residual
   with respect to the shared slots are accumulated across ALL buckets
   and frame chunks (H = Σ JᵀJ, g = Σ Jᵀr over every pixel of every
   cluster) and solved with Levenberg–Marquardt damping + backtracking on
   the joint cost.

Alternating (1)⇄(2) converges to the joint optimum; unlike pooling
per-bucket estimates by a weighted *mean* (the round-1 implementation),
the pooled normal equations weight each bucket by its actual information
content, so dissimilar buckets (different cluster sizes / SNR / counts)
cannot bias the shared coefficients.  Pure block-coordinate (shared
params const in step 1) was measured to converge at ~0.8x error per
round on inv_series scenes — the joint-within-dispatch step collapses
that to one or two rounds.
"""
from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from .find import find_clusters
from .models.packing import build_layout, default_param_mode
from .models.registry import ModelSpec, get_model
from .ops.gather import origins_for, radius_mask
from .ops.residual import make_model_fns
from .refine import (
    _LANE_PAD,
    _frames_of,
    _gather_stack,
    _window_shape,
    refine_leastsq,
)
from .utils import (
    default_size_columns,
    guess_pos_columns,
    validate_tuple,
)

__all__ = ["train_leastsq"]


@lru_cache(maxsize=64)
def _global_eq(
    model: ModelSpec,
    ndim: int,
    isotropic: bool,
    n: int,
    trained_key: tuple,
    window_shape: tuple,
    radius: tuple,
):
    """Jitted joint-normal-equation accumulator for one bucket config.

    Layout: ONLY the trained parameters carry slots (mode 'global',
    one shared slot each — G slots total, in ``trained_key`` order
    because packing assigns slots in parameter order and trained_key is
    pre-sorted to parameter order); everything else is const at the
    fitted per-cluster values.  Returns (H [G,G], g [G], cost) of the
    joint residual over the bucket.
    """
    mode = {
        name: "global" if name in trained_key else "const"
        for name in _param_names(model, ndim, isotropic)
    }
    layout = build_layout(model, ndim, isotropic, n, mode)
    fns = make_model_fns(model, layout, window_shape)
    pos_idx = np.array(layout.pos_param_idx)
    tp_idx = jnp.asarray(
        [layout.param_names.index(t) for t in trained_key]
    )

    @jax.jit
    def accum(frames, frame_idx, params0, valid, xg):
        params = params0.at[..., tp_idx].set(xg[None, None, :])
        # UNNORMALIZED residuals: under uniform pixel noise the correct
        # GLS weight across lanes is 1, so bright clusters contribute
        # information ∝ signal².  The per-lane signal normalization used
        # in refine is a per-lane constant there (it cannot move a lane's
        # own optimum) but across lanes it would equalize weights and let
        # a dim, poorly-calibrated bucket drag the shared estimate
        # (measured: a 20-vs-8 mis-sized dim bucket pulled coeff_1 from
        # 0.79 to 1.09 with normalization on).
        norm = jnp.ones((params0.shape[0],), params0.dtype)
        pos = params[..., pos_idx]
        origin = origins_for(pos, window_shape, frames.shape[1:])
        pixels = _gather_stack(frames, frame_idx, origin, window_shape)
        mask = radius_mask(pos, origin, window_shape, radius)
        vect = layout.vect_from_params(params)          # [B, G]
        r, J = fns.residual_jac(
            vect, params, pixels, mask, origin, norm
        )                                               # [B,Npix],[B,G,Npix]
        w = valid.astype(r.dtype)
        rw = r * w[:, None]
        g = jnp.einsum("bgn,bn->g", J, rw,
                       precision=jax.lax.Precision.HIGHEST)
        H = jnp.einsum("bgn,bhn->gh", J * w[:, None, None], J,
                       precision=jax.lax.Precision.HIGHEST)
        cost = jnp.sum(rw * r)
        return H, g, cost

    return accum


def _param_names(model, ndim, isotropic):
    from .models.packing import param_names_for

    return param_names_for(model, ndim, isotropic)


def train_leastsq(
    f: pd.DataFrame,
    reader,
    diameter,
    separation=None,
    fit_function="inv_series_2",
    param_mode: Optional[dict] = None,
    tol: float = 1e-7,
    pos_columns: Optional[list] = None,
    t_column: str = "frame",
    max_samples: int = 512,
    max_rounds: int = 8,
    param_val: Optional[dict] = None,
    frames_per_dispatch: int = 32,
    **kwargs,
) -> dict:
    """Calibrate 'global'-mode parameters across many features/frames.

    Returns the learned values as a dict to feed back via ``param_val``
    (reference contract — SURVEY.md §3.3).  Model extras default to
    'global'; a standard parameter can be trained too via
    ``param_mode={'size': 'global'}`` (isotropic size or background —
    per-axis anisotropic sizes and positions/signal are per-feature
    quantities and cannot be tied globally).

    See the module docstring for the alternating-exact-solve structure.
    """
    if pos_columns is None:
        pos_columns = guess_pos_columns(f)
    ndim = len(pos_columns)
    model = get_model(fit_function)
    diameter_t = validate_tuple(diameter, ndim)
    radius = tuple(d / 2.0 for d in diameter_t)
    sep_t = validate_tuple(
        separation if separation is not None else diameter, ndim
    )

    if "cluster" not in f.columns:
        f = find_clusters(f, sep_t, pos_columns, t_column)
    if t_column not in f.columns:
        f = f.copy()
        f[t_column] = 0

    # sample clusters across all sizes (size mix preserved by taking ids
    # in order of appearance); huge spill-to-scipy clusters are excluded
    # (the host path cannot contribute to the joint system)
    max_n = int(kwargs.get("max_cluster_size", 8))
    sel = f[f["cluster_size"] <= max_n]
    ids = sel["cluster"].unique()[:max_samples]
    sel = sel[sel["cluster"].isin(ids)]

    aniso_cols = default_size_columns(ndim, False)
    isotropic = not any(c in f.columns for c in aniso_cols)

    # trained set: every param whose resolved mode is 'global' (extras
    # default to 'global', reference behavior), in parameter order so it
    # matches the packing slot order
    mode = dict(param_mode or {})
    for name in model.extra_params:
        mode.setdefault(name, "global")
    names = _param_names(model, ndim, isotropic)
    trained = [n for n in names if mode.get(n) == "global"]
    untrainable = [
        t for t in trained
        if t not in model.extra_params and t not in ("size", "background")
    ]
    if untrainable:
        raise ValueError(
            f"cannot train {untrainable} globally: only model extras, "
            "isotropic 'size', and 'background' are shared quantities"
        )

    # initial values: user param_val > data column mean > model default
    user_val = dict(param_val or {})
    x = np.zeros(len(trained))
    for j, t in enumerate(trained):
        if t in user_val:
            x[j] = float(user_val.pop(t))
        elif t in sel.columns:
            x[j] = float(sel[t].mean())
        elif t in model.default:
            x[j] = float(model.default[t])
        elif t == "size":
            x[j] = float(np.mean(radius)) / 2.0
        else:  # background
            x[j] = 0.0
    if not trained:
        return {}

    # refit configuration: trained columns dropped from the data so
    # param_val supplies the current shared estimate as the start value
    sel_r = sel.drop(columns=[c for c in trained if c in sel.columns])

    trained_key = tuple(trained)
    rtol = math.sqrt(tol)
    learned = dict(zip(trained, x))

    for _ in range(max_rounds):
        # ---- (1) refit, shared slots tied jointly WITHIN each dispatch --
        fitted = refine_leastsq(
            sel_r, reader, diameter, separation,
            fit_function=model, param_mode=mode,
            param_val={**user_val, **learned},
            pos_columns=pos_columns, t_column=t_column,
            ftol=tol, xtol=tol,
            frames_per_dispatch=frames_per_dispatch, **kwargs,
        )
        ok = fitted["cost"].notna()
        if not ok.any():
            break
        acc_rows = fitted[ok]
        # warm-start the cross-bucket solve from the per-dispatch joint
        # estimates (each accepted row carries its dispatch's tied value)
        x = np.array([float(acc_rows[t].mean()) for t in trained])

        # ---- (2) exact joint global step over pooled normal equations ---
        buckets = _assemble_buckets(
            acc_rows, reader, model, ndim, isotropic, radius, sep_t,
            names, t_column, frames_per_dispatch, trained_key,
        )

        def eval_at(xg):
            G = len(xg)
            H = np.zeros((G, G))
            g = np.zeros(G)
            cost = 0.0
            xg_j = jnp.asarray(xg, jnp.float32)
            for accum, args in buckets:
                Hb, gb, cb = accum(*args, xg_j)
                H += np.asarray(Hb, np.float64)
                g += np.asarray(gb, np.float64)
                cost += float(cb)
            return H, g, cost

        Hx, gx, cx = eval_at(x)
        lam = 1e-3
        x_round0 = x.copy()
        for _ in range(25):
            d = np.maximum(np.diag(Hx), 1e-12)
            A = Hx + lam * np.diag(d) + 1e-12 * np.eye(len(x))
            delta = -np.linalg.solve(A, gx)
            xt = x + delta
            Ht, gt, ct_ = eval_at(xt)
            if ct_ < cx:
                rel = (cx - ct_) / max(cx, 1e-30)
                step = float(np.max(np.abs(delta)))
                x, Hx, gx, cx = xt, Ht, gt, ct_
                lam = max(lam * 0.25, 1e-8)
                if rel < tol or step <= rtol * (rtol + np.max(np.abs(x))):
                    break
            else:
                lam *= 4.0
                if lam > 1e10:
                    break
        learned = dict(zip(trained, (float(v) for v in x)))

        # outer convergence: the shared estimate stopped moving between
        # rounds (the conditional refit then cannot move either)
        denom = np.maximum(np.abs(x_round0), 1e-12)
        if np.max(np.abs(x - x_round0) / denom) < rtol:
            break
    return learned


def _assemble_buckets(
    acc_rows, reader, model, ndim, isotropic, radius, sep_t, names,
    t_column, frames_per_dispatch, trained_key,
):
    """Device-resident (accum_fn, args) list for the joint global step.

    One entry per (frame chunk × cluster size); ``args`` stay on device
    so repeated trial evaluations of the shared parameters only move the
    G-vector.  Every parameter column exists in ``acc_rows`` (refine
    writes all of them back), so assembly is pure column reads.
    """
    frame_numbers = sorted(acc_rows[t_column].unique())
    buckets = []
    P = len(names)
    for cs in range(0, len(frame_numbers), frames_per_dispatch):
        chunk = frame_numbers[cs : cs + frames_per_dispatch]
        images = _frames_of(reader, chunk, ndim)
        frame_shape = images[int(chunk[0])].shape
        stack = jnp.asarray(
            np.stack([images[int(t)] for t in chunk]).astype(np.float32)
        )
        frame_local = {int(t): i for i, t in enumerate(chunk)}
        sub = acc_rows[acc_rows[t_column].isin(chunk)]
        for n, grp in sub.groupby("cluster_size"):
            n = int(n)
            grp = grp.sort_values("cluster", kind="stable")
            if len(grp) % n != 0:
                continue  # inconsistent block (refine guards upstream)
            B = len(grp) // n
            flat = np.zeros((len(grp), P), np.float32)
            for j, name in enumerate(names):
                flat[:, j] = grp[name].to_numpy(dtype=float)
            Bpad = max(_LANE_PAD, -(-B // _LANE_PAD) * _LANE_PAD)
            params0 = np.zeros((Bpad, n, P), np.float32)
            params0[:B] = flat.reshape(B, n, P)
            if B < Bpad:
                params0[B:] = params0[0]
            fidx = np.zeros(Bpad, np.int32)
            fidx[:B] = [
                frame_local[int(t)]
                for t in grp[t_column].to_numpy().reshape(B, n)[:, 0]
            ]
            valid = np.zeros(Bpad, bool)
            valid[:B] = True
            wshape = _window_shape(n, ndim, radius, sep_t, frame_shape)
            accum = _global_eq(
                model, ndim, isotropic, n, trained_key, wshape,
                tuple(radius),
            )
            buckets.append((
                accum,
                (stack, jnp.asarray(fidx), jnp.asarray(params0),
                 jnp.asarray(valid)),
            ))
    return buckets
