"""On-device candidate feature location (the trackpy.locate /
grey_dilation delegation, pulled in-scope per SURVEY.md §2 "External:
candidate location").

The reference pipeline seeds find_clusters with above-threshold local
maxima from trackpy's grey_dilation.  On TPU: local maxima come from a
``lax.reduce_window`` max-pool (window = separation), candidates are
compacted to a *fixed-size* coordinate list with ``jax.lax.top_k`` over the
masked response — static shapes throughout, padding flagged by ``valid``.

Sub-pixel is not needed here (refine_leastsq does that); candidates are
integer pixel positions, optionally refined by a centroid step.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["grey_dilation", "local_maxima"]


@partial(jax.jit, static_argnames=("separation", "max_features"))
def local_maxima(
    image,
    separation: Tuple[int, ...],
    max_features: int,
    threshold: float = 0.0,
):
    """Strict local maxima over a per-axis ``separation`` window.

    Returns (coords [max_features, D] int32, values [max_features],
    valid [max_features] bool), brightest-first.  Ties within a window are
    broken toward the lexicographically-first pixel via an index epsilon,
    mirroring grey_dilation's deterministic pick.
    """
    D = image.ndim
    window = tuple(int(s) | 1 for s in separation)  # odd windows
    img = image.astype(jnp.float32)

    def dilate(x):
        return jax.lax.reduce_window(
            x,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=window,
            window_strides=(1,) * D,
            padding="SAME",
        )

    # pass 1: window maxima; pass 2: exact tie-break on plateaus — among
    # value-tied candidates in a window, only the lowest flat index wins
    # (grey_dilation's deterministic pick).
    cand = (img >= dilate(img)) & (img > threshold)
    n_total = int(np.prod(image.shape))
    neg_idx = jnp.where(
        cand,
        -jnp.arange(n_total, dtype=jnp.float32).reshape(image.shape),
        -jnp.inf,
    )
    is_max = cand & (neg_idx >= dilate(neg_idx))

    # Compact candidates to the fixed-size output WITHOUT a full-image
    # sort (lax.top_k over the whole frame is a device sort — seconds per
    # 512² frame on TPU): O(N) cumsum scatter into max_features slots,
    # then sort only the compacted list so the brightest-first contract
    # (and its lowest-flat-index tie-break) is preserved.
    flags = is_max.reshape(-1)
    rank = jnp.cumsum(flags.astype(jnp.int32)) - 1
    dest = jnp.where(
        flags & (rank < max_features), rank, max_features
    )
    vals_c = jnp.full((max_features + 1,), -jnp.inf, jnp.float32)
    vals_c = vals_c.at[dest].set(img.reshape(-1), mode="drop")[:-1]
    idx_c = jnp.zeros((max_features + 1,), jnp.int32)
    idx_c = idx_c.at[dest].set(
        jnp.arange(n_total, dtype=jnp.int32), mode="drop"
    )[:-1]
    # brightest first; ties broken toward the lower flat index (stable
    # sort over the raster-ordered compacted list)
    order = jnp.argsort(-vals_c, stable=True)
    vals = vals_c[order]
    flat_idx = idx_c[order]
    coords = jnp.stack(
        jnp.unravel_index(flat_idx, image.shape), axis=-1
    ).astype(jnp.int32)
    valid = jnp.isfinite(vals)
    return coords, vals, valid


def grey_dilation(
    image,
    separation,
    percentile: float = 64.0,
    max_features: int = 1024,
    threshold=None,
):
    """trackpy.grey_dilation-compatible wrapper: threshold defaults to the
    given percentile of the image. Returns (coords, signal, valid)."""
    image = jnp.asarray(image)
    if threshold is None:
        threshold = float(np.percentile(np.asarray(image), percentile))
    sep = separation if hasattr(separation, "__len__") else (
        (separation,) * image.ndim
    )
    sep = tuple(int(round(s)) for s in sep)
    return local_maxima(image, sep, max_features, threshold)
