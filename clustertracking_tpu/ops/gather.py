"""Batched subregion gather + fit-region masks (masks.py parity layer).

Rebuild of clustertracking/masks.py::slice_image / mask_image and the
prepare_subimage helpers in refine.py (SURVEY.md §2, §3.1): instead of numpy
slicing one cluster at a time on the host, a whole bucket of windows is
gathered from the on-device frame with ``lax.dynamic_slice`` under ``vmap``,
and the within-radius ellipsoidal masks are computed on device from the
current feature positions — so the refit-on-shift outer loop never leaves
the chip.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .residual import window_offsets

__all__ = ["clamp_origins", "gather_windows", "radius_mask", "origins_for"]


def origins_for(pos, window_shape: Tuple[int, ...], frame_shape):
    """Integer window-corner coordinates centering each cluster's bbox.

    pos: [B, n, D] feature positions; returns [B, D] int32 origins clamped
    so every window lies inside the frame (matching the reference's
    clamped slice_image origins)."""
    lo = jnp.min(pos, axis=1)
    hi = jnp.max(pos, axis=1)
    center = 0.5 * (lo + hi)
    w = jnp.asarray(window_shape, dtype=pos.dtype)
    origin = jnp.round(center - 0.5 * (w - 1.0)).astype(jnp.int32)
    return clamp_origins(origin, window_shape, frame_shape)


def clamp_origins(origin, window_shape, frame_shape):
    maxi = jnp.asarray(
        [fs - ws for fs, ws in zip(frame_shape, window_shape)],
        dtype=jnp.int32,
    )
    return jnp.clip(origin, 0, maxi)


def gather_windows(frame, origins, window_shape: Tuple[int, ...]):
    """Gather [B, *window_shape] windows from one frame at int origins.

    ``origins`` must already be clamped (``clamp_origins``); XLA's
    dynamic_slice clamps anyway, but the mesh coordinates must agree with
    the slice actually taken."""

    def one(origin):
        return jax.lax.dynamic_slice(frame, tuple(origin), window_shape)

    out = jax.vmap(one)(origins)
    return out.reshape(out.shape[0], -1)  # [B, Npix]


def radius_mask(pos, origin, window_shape: Tuple[int, ...], radius,
                dtype=jnp.float32, fvalid=None):
    """1.0 where a pixel lies within the (ellipsoidal) radius of ANY
    feature of the cluster, else 0.0 — mask_image parity.

    pos: [B, n, D]; origin: [B, D] int; radius: length-D sequence;
    fvalid: optional [B, n] (ladder pad features claim no pixels).
    """
    offsets = window_offsets(window_shape, dtype)          # [D, Npix]
    rel = pos - origin[:, None, :].astype(dtype)           # [B, n, D]
    r = jnp.asarray(radius, dtype=dtype)
    d = (offsets[None, None] - rel[..., None]) / r[:, None]  # [B,n,D,Npix]
    r2 = jnp.sum(d * d, axis=-2)
    if fvalid is not None:
        r2 = jnp.where(fvalid[:, :, None] > 0.5, r2, jnp.inf)
    return (jnp.min(r2, axis=1) <= 1.0).astype(dtype)      # [B, Npix]
