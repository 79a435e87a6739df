"""On-device candidate feature location (the trackpy.locate /
grey_dilation delegation, pulled in-scope per SURVEY.md §2 "External:
candidate location").

The reference pipeline seeds find_clusters with above-threshold local
maxima from trackpy's grey_dilation.  On TPU: local maxima come from a
``lax.reduce_window`` max-pool (window = separation), candidates are
compacted to a *fixed-size* coordinate list — static shapes throughout,
padding flagged by ``valid``.

Two selection paths with identical results when the frame has at most
``max_features`` candidates:

- ``local_maxima``: O(N) cumsum compaction + a sort of only the compacted
  list.  When a frame OVERFLOWS (more candidates than ``max_features``),
  this path keeps the first ``max_features`` in raster order — callers
  must check the returned candidate count and re-run overflowed frames
  through ``local_maxima_topk`` (what ``grey_dilation`` and the pipeline
  do), because raster-order truncation silently drops bright features low
  in the frame.
- ``local_maxima_topk``: exact brightest-first selection via a full-frame
  ``lax.top_k`` — a device sort, measured seconds per 512² frame on TPU,
  so it is only dispatched for the (rare) saturated frames.

Sub-pixel is not needed here (refine_leastsq does that); candidates are
integer pixel positions.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["grey_dilation", "local_maxima", "local_maxima_topk",
           "feature_sizes", "gaussian_blur", "boxcar_background",
           "bandpass", "tile_threshold_map"]


@partial(jax.jit, static_argnames=("sigmas",))
def gaussian_blur(stack, sigmas: Tuple[float, ...]):
    """Separable Gaussian smoothing of a frame stack, on device.

    The matched filter for locating Gaussian features in noise: peak
    SNR improves by ~1/(2^{D/2}·||k||₂) (for sigma_k == feature sigma,
    ≈2.8× in 2D at sigma 1.6), which is what lets the recovery pass see
    residual lobes below the raw-pixel noise gate (VERDICT r4 detection
    item).  Kernels are normalized (sum 1) and truncated at 3σ;
    reflect padding keeps edge response flat.  One conv dispatch per
    spatial axis over the whole [T, *S] stack.

    stack:  [T, *S] f32
    sigmas: per-spatial-axis smoothing σ in pixels (static)
    """
    out = stack.astype(jnp.float32)
    D = out.ndim - 1
    for ax, sig in enumerate(sigmas):
        if sig <= 0:
            continue
        r = max(1, int(np.ceil(3.0 * sig)))
        x = np.arange(-r, r + 1, dtype=np.float32)
        k = np.exp(-0.5 * (x / sig) ** 2)
        k = jnp.asarray(k / k.sum())
        axis = 1 + ax
        moved = jnp.moveaxis(out, axis, -1)
        lead = moved.shape[:-1]
        n = moved.shape[-1]
        flat = moved.reshape(-1, 1, n)
        flat = jnp.pad(flat, ((0, 0), (0, 0), (r, r)), mode="reflect")
        conv = jax.lax.conv_general_dilated(
            flat, k.reshape(1, 1, -1),
            window_strides=(1,), padding="VALID",
        )
        out = jnp.moveaxis(conv.reshape(*lead, n), -1, axis)
    return out


@partial(jax.jit, static_argnames=("sizes",))
def boxcar_background(stack, sizes: Tuple[int, ...]):
    """Separable boxcar (uniform) average of a frame stack, on device —
    the long-length-scale background estimate of the bandpass filter.
    ``sizes``: odd per-axis window lengths in pixels (static).  Reflect
    padding keeps the estimate flat at the edges."""
    out = stack.astype(jnp.float32)
    for ax, n in enumerate(sizes):
        n = int(n) | 1
        if n <= 1:
            continue
        r = n // 2
        k = jnp.full((n,), 1.0 / n, jnp.float32)
        axis = 1 + ax
        moved = jnp.moveaxis(out, axis, -1)
        lead = moved.shape[:-1]
        m = moved.shape[-1]
        flat = moved.reshape(-1, 1, m)
        flat = jnp.pad(flat, ((0, 0), (0, 0), (r, r)), mode="reflect")
        conv = jax.lax.conv_general_dilated(
            flat, k.reshape(1, 1, -1),
            window_strides=(1,), padding="VALID",
        )
        out = jnp.moveaxis(conv.reshape(*lead, m), -1, axis)
    return out


@partial(jax.jit, static_argnames=("noise_size", "boxcar_size", "clip"))
def bandpass(stack, noise_size: Tuple[float, ...],
             boxcar_size: Tuple[int, ...], clip: bool = True):
    """trackpy-style bandpass: Gaussian-smooth at the noise length scale,
    subtract the boxcar background at the feature-diameter scale, clip
    at zero (VERDICT r4 item 5 — what makes candidate location usable on
    real microscopy with non-uniform illumination: a sloped or vignetted
    background otherwise floods one corner with false candidates and
    starves another against any frame-global threshold).

    Reference: trackpy ``bandpass`` (SURVEY.md §2 "External: candidate
    location" row; the default preprocessing inside ``trackpy.locate``).

    ``clip=False`` returns the UNCLIPPED difference — thresholds must be
    derived from it: after the zero clip, a mostly-background frame has
    >50% of its pixels at exactly 0, so median and MAD of the clipped
    output are 0 and the noise floor collapses (measured: a flat-field
    scene flooded with every smoothed noise peak above zero).
    """
    smooth = gaussian_blur(stack, noise_size)
    bg = boxcar_background(stack, boxcar_size)
    out = smooth - bg
    return jnp.maximum(out, 0.0) if clip else out


def _per_tile(x, tile: int):
    """[T, *S] -> [T, *nt, tile**D] grouped tile pixels (reflect-padded)."""
    T = x.shape[0]
    spatial = x.shape[1:]
    D = len(spatial)
    nt = tuple(-(-s // tile) for s in spatial)
    pad = tuple(n * tile - s for n, s in zip(nt, spatial))
    x = jnp.pad(
        x, ((0, 0),) + tuple((0, p) for p in pad), mode="reflect"
    )
    shp = (T,)
    for n in nt:
        shp += (n, tile)
    x = x.reshape(shp)
    perm = (0,) + tuple(1 + 2 * d for d in range(D)) + tuple(
        2 + 2 * d for d in range(D)
    )
    return jnp.transpose(x, perm).reshape((T,) + nt + (tile**D,)), nt


@partial(jax.jit, static_argnames=("tile", "k", "bg_sigma"))
def tile_threshold_map(stack, tile: int = 64, k: float = 6.0,
                       bg_sigma: float = 2.0):
    """Locally adaptive threshold map: per-tile LOCAL BACKGROUND
    (median of the tile's raw pixels) + ``k``·1.4826·per-tile NOISE
    (MAD of a high-passed copy), bilinearly upsampled to pixel
    resolution — the noise floor for frames whose background varies
    across the field of view (VERDICT r4 item 5: a frame-GLOBAL floor
    floods bright regions with noise maxima and starves dim ones).

    The two statistics are deliberately separated: taking the MAD of
    the RAW tile folds the tile's own background variation into the
    "noise" term, inflating the floor wherever the background has a
    gradient (measured: an illumination-edge tile produced thresholds
    ~6× the local background + noise, starving every feature within a
    tile-width of the edge).  High-passing at ``bg_sigma`` px first
    (subtract a Gaussian blur; for white noise the residual std is
    ≥97% of the raw noise std at bg_sigma = 2, so no correction factor
    is needed) leaves the MAD measuring sensor noise alone; features
    occupy few pixels per tile, so the median/MAD are robust to them.

    stack: [T, *S] f32.  Returns [T, *S] f32 thresholds.
    """
    T = stack.shape[0]
    spatial = stack.shape[1:]
    D = len(spatial)
    x = stack.astype(jnp.float32)
    hp = x - gaussian_blur(x, (float(bg_sigma),) * D)
    xt, nt = _per_tile(x, tile)
    ht, _ = _per_tile(hp, tile)
    med = jnp.median(xt, axis=-1)
    hmed = jnp.median(ht, axis=-1)
    mad = jnp.median(jnp.abs(ht - hmed[..., None]), axis=-1)
    thr = med + k * 1.4826 * mad                     # [T, *nt]
    # bilinear upsample tile centers back to pixel resolution
    out = jax.image.resize(
        thr, (T,) + tuple(n * tile for n in nt), method="linear"
    )
    return out[(slice(None),) + tuple(slice(0, s) for s in spatial)]


def _candidate_mask(image, separation: Tuple[int, ...], threshold):
    """Strict local-maxima mask with grey_dilation's deterministic
    tie-break: among value-tied pixels within a window, only the lowest
    flat index wins."""
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

    # pass 1: window maxima; pass 2: exact tie-break on plateaus
    cand = (img >= dilate(img)) & (img > threshold)
    n_total = int(np.prod(image.shape))
    neg_idx = jnp.where(
        cand,
        -jnp.arange(n_total, dtype=jnp.float32).reshape(image.shape),
        -jnp.inf,
    )
    is_max = cand & (neg_idx >= dilate(neg_idx))
    return img, is_max


@partial(jax.jit, static_argnames=("separation", "max_features"))
def local_maxima(
    image,
    separation: Tuple[int, ...],
    max_features: int,
    threshold: float = 0.0,
):
    """Local maxima compacted to a fixed-size list, brightest-first.

    Returns (coords [max_features, D] int32, values [max_features],
    valid [max_features] bool, n_cand int32).  ``n_cand`` is the TOTAL
    number of candidates in the frame; when ``n_cand > max_features`` the
    compaction kept the first ``max_features`` in RASTER order (not the
    brightest) — re-run such frames through :func:`local_maxima_topk`.
    """
    img, is_max = _candidate_mask(image, separation, threshold)
    n_total = int(np.prod(image.shape))

    # Compact candidates to the fixed-size output WITHOUT a full-image
    # sort (lax.top_k over the whole frame is a device sort — seconds per
    # 512² frame on TPU): O(N) cumsum scatter into max_features slots,
    # then sort only the compacted list so the brightest-first ordering
    # (and its lowest-flat-index tie-break) holds whenever the frame did
    # not overflow.
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
    n_cand = jnp.sum(flags.astype(jnp.int32))
    return coords, vals, valid, n_cand


@partial(jax.jit, static_argnames=("separation", "max_features"))
def local_maxima_topk(
    image,
    separation: Tuple[int, ...],
    max_features: int,
    threshold: float = 0.0,
):
    """Exact brightest-first selection via full-frame ``lax.top_k``.

    Same contract as :func:`local_maxima`, but on an overflowed frame the
    GLOBALLY brightest ``max_features`` candidates are kept (XLA top_k
    returns lower indices first among equal values, matching the
    lowest-flat-index tie-break).  Costs a device sort of the whole frame
    — use only for frames :func:`local_maxima` reports as overflowed.
    """
    img, is_max = _candidate_mask(image, separation, threshold)
    key = jnp.where(is_max, img, -jnp.inf).reshape(-1)
    vals, flat_idx = jax.lax.top_k(key, max_features)
    coords = jnp.stack(
        jnp.unravel_index(flat_idx.astype(jnp.int32), image.shape),
        axis=-1,
    ).astype(jnp.int32)
    valid = jnp.isfinite(vals)
    n_cand = jnp.sum(is_max.astype(jnp.int32))
    return coords, vals, valid, n_cand


def grey_dilation(
    image,
    separation,
    percentile: float = 64.0,
    max_features: int = 1024,
    threshold=None,
):
    """trackpy.grey_dilation-compatible wrapper: threshold defaults to the
    given percentile of the image. Returns (coords, signal, valid).

    Overflow-safe: if the frame has more candidates than ``max_features``,
    the exact top-k path re-runs so the returned set is the globally
    brightest ``max_features`` (a saturation warning is logged)."""
    import logging

    image = jnp.asarray(image)
    if threshold is None:
        threshold = float(np.percentile(np.asarray(image), percentile))
    sep = separation if hasattr(separation, "__len__") else (
        (separation,) * image.ndim
    )
    sep = tuple(int(round(s)) for s in sep)
    coords, vals, valid, n_cand = local_maxima(
        image, sep, max_features, threshold
    )
    if int(n_cand) > max_features:
        logging.getLogger(__name__).warning(
            "grey_dilation: %d candidates exceed max_features=%d; "
            "keeping the brightest (raise max_features or threshold)",
            int(n_cand), max_features,
        )
        coords, vals, valid, n_cand = local_maxima_topk(
            image, sep, max_features, threshold
        )
    return coords, vals, valid


@partial(jax.jit, static_argnames=("window_shape", "radius", "per_axis"))
def feature_sizes(stack, coords, valid, window_shape, radius, bg,
                  noise=None, per_axis: bool = False):
    """Per-candidate isotropic size estimate (trackpy.locate's 'size'
    column — radius of gyration of the background-subtracted intensity
    in the feature's own window).

    The reference pipeline's candidate locator (trackpy.locate) reports
    a per-feature size from image moments, and refine_leastsq's default
    'const' size mode then holds the fit at that estimate — without it
    every fit runs at the diameter-derived default (radius/2), which for
    a PSF 40% narrower biases every overlapping-cluster fit (measured on
    the dense benchmark).  One vmapped gather + masked moment reduction
    per frame chunk; integer-peak windows, static shapes.

    stack:  [T, *S] f32 frames
    coords: [T, K, D] int32 candidate positions (integer peaks)
    valid:  [T, K] bool
    radius: length-D floats (diameter/2) — moment mask radii
    bg:     [T] f32 per-frame background level (median)
    noise:  optional [T] f32 per-frame noise sigma (robust, e.g.
            1.4826·MAD); the moment weight floors at bg + noise, else
            rectified noise (E[max(N(0,s),0)] > 0 on every empty pixel,
            heaviest at large r) inflates the second moment
    Returns [T, K] f32 sigma estimates: sqrt(<r²>/D) with <r²> the
    background-subtracted, mask-bounded second moment about the peak.
    For a D-dim Gaussian <r²> = D·sigma² (mild truncation bias at the
    mask edge, ~4% low at radius ≈ 2.8 sigma)."""
    from .gather import clamp_origins, gather_windows
    from .residual import window_offsets

    T = stack.shape[0]
    D = stack.ndim - 1
    frame_shape = stack.shape[1:]
    w = jnp.asarray(window_shape, jnp.int32)
    offsets = window_offsets(window_shape)                 # [D, Npix]
    r = jnp.asarray(radius, jnp.float32)

    # Moment mask TIGHTER than the feature radius: at colloid densities
    # a neighbor feature inside the full diameter/2 mask inflates the
    # second moment for ~half the candidates (measured +25% median bias
    # on the dense benchmark).  The truncation this causes is corrected
    # below assuming a Gaussian profile.  Anisotropic radii (z-stacks)
    # scale each axis to the min-radius frame first, so the mask is
    # ellipsoidal in pixels and the elongated axis isn't squashed
    # against a spherical cutoff.
    r_np = np.asarray(radius, dtype=np.float32)
    Rm = 0.40 * float(np.min(r_np))
    Rm2 = Rm * Rm
    axis_ratio = jnp.asarray(r_np / np.min(r_np))          # [D], ≥ 1

    if noise is None:
        noise = jnp.zeros((T,), jnp.float32)

    def per_frame(frame, pos, bg_t, ns_t):
        origin = clamp_origins(
            pos - (w - 1) // 2, window_shape, frame_shape
        )                                                  # [K, D]
        win = gather_windows(frame, origin, window_shape)  # [K, Npix]
        rel = (pos - origin).astype(jnp.float32)           # [K, D]
        # axis-SCALED offsets: moments and mask live in the min-radius
        # frame; per-axis sizes scale back by axis_ratio at the end
        d = (
            (offsets[None] - rel[..., None])
            / axis_ratio[None, :, None]
        )                                                  # [K, D, Npix]
        r2_px = jnp.sum(d * d, axis=1)                     # [K, Npix]
        inmask = r2_px <= Rm2
        mass = jnp.maximum(win - bg_t - ns_t, 0.0) * inmask
        m0 = jnp.maximum(jnp.sum(mass, axis=1), 1e-6)
        # CENTRAL second moment: the integer peak is up to 0.5 px off
        # the true center; moments about the intensity centroid remove
        # that bias exactly
        m1 = jnp.sum(mass[:, None, :] * d, axis=2) / m0[:, None]
        rg2 = (
            jnp.sum(mass * r2_px, axis=1) / m0
            - jnp.sum(m1 * m1, axis=1)
        )
        # Truncation correction on the SAME discrete pixel grid: the
        # mask holds only ~20 pixels at a handful of distinct radii, so
        # a continuous-Gaussian moment model is badly wrong (measured:
        # estimates swung 1.07→3.38 across nearby mask radii, and the
        # measured moment can exceed the continuous model's σ→∞ limit).
        # Instead invert the discrete masked moment
        #   m(σ) = Σ_mask r²·e^{-r²/2σ²} / Σ_mask e^{-r²/2σ²}
        # (monotone in σ) by bisection, per candidate, on its own
        # (edge-clamped) pixel offsets.
        def m_disc(sig):  # sig [K]
            wgt = jnp.exp(
                -r2_px / jnp.maximum(2.0 * sig * sig, 1e-12)[:, None]
            ) * inmask
            w0 = jnp.maximum(jnp.sum(wgt, axis=1), 1e-9)
            return jnp.sum(wgt * r2_px, axis=1) / w0

        lo_s = jnp.full_like(rg2, 0.3)
        hi_s = jnp.full_like(rg2, 1.5 * Rm)
        for _ in range(24):
            mid = 0.5 * (lo_s + hi_s)
            too_small = m_disc(mid) < rg2
            lo_s = jnp.where(too_small, mid, lo_s)
            hi_s = jnp.where(too_small, hi_s, mid)
        sig_iso = 0.5 * (lo_s + hi_s)
        if not per_axis:
            return sig_iso
        # Per-axis sizes (anisotropic z-stack PSFs): the corrected
        # scaled-frame sigma carries the truncation fix; the per-axis
        # central moments carry the SHAPE; axis_ratio maps back to
        # pixel units.  For mild residual anisotropy in the scaled
        # frame the mask truncation factor is shared across axes, so
        # σ_d ≈ σ_iso · sqrt(D · m2_d / rg²) · ratio_d.
        m2 = (
            jnp.sum(mass[:, None, :] * (d * d), axis=2) / m0[:, None]
            - m1 * m1
        )                                                  # [K, D]
        shape_r = jnp.sqrt(jnp.maximum(
            D * m2 / jnp.maximum(rg2, 1e-9)[:, None], 1e-6
        ))
        return sig_iso[:, None] * shape_r * axis_ratio[None, :]

    sizes = jax.vmap(per_frame)(stack, coords, bg, noise)
    # clip to sane feature scales: [0.5 px, per-axis radius]
    if per_axis:
        sizes = jnp.clip(sizes, 0.5, jnp.asarray(r_np)[None, None, :])
        return jnp.where(valid[..., None], sizes, 0.0)
    sizes = jnp.clip(sizes, 0.5, float(np.min(r_np)))
    return jnp.where(valid, sizes, 0.0)
