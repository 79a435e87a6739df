"""Fused Pallas LM kernel — the whole lockstep Levenberg–Marquardt solve
for one bucket runs inside VMEM (SURVEY.md §7 M6).

The XLA path (ops/lm.py) materializes the Jacobian [B, V, Npix] in HBM every
LM iteration (~33 MB at B=8192 for a dimer) and round-trips residual/trial
evaluations through HBM between fused regions; measured cost ~2.3 ms per LM
iteration at B=8192.  This kernel instead keeps *everything* — pixels, mask,
packed parameter vector, Jacobian rows, normal equations, damping state —
resident in VMEM for the entire solve of a 128-cluster tile, so HBM is
touched exactly once on the way in and once on the way out.

Layout rule (the TPU-native core of the design): **the cluster batch is the
128-wide lane axis**.  Every scalar-per-cluster quantity (a parameter slot,
λ, cost) is a ``[1, TILE_B]`` row; every pixel field is ``[Npix, TILE_B]``
(Npix on sublanes, padded to a multiple of 8).  The hand-unrolled Cholesky
solve of the V×V normal equations then becomes pure elementwise VPU code on
rows — all 128 lanes solve their own system simultaneously, no matrix op
ever has a tiny trailing dim.

Numerics are kept identical to ops/lm.py::lm_solve (same damping schedule,
acceptance rule, ftol/xtol/plateau convergence tests), so the scipy-parity
guarantees of the XLA path carry over; tests assert pallas-vs-XLA agreement
lane by lane.

Per-tile early exit: the while_loop condition is per 128-lane tile, so a
tile whose clusters all converge in 8 iterations stops at 8 even when some
other tile needs 40 — strictly better than the XLA path's global lockstep.

Reference parity: this replaces MINPACK lmdif/lmder under
scipy.optimize.leastsq in clustertracking/refine.py::refine_leastsq
(SURVEY.md §3.1 "THE compute kernel").
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.packing import ParamLayout
from ..models.registry import ModelSpec
from .lm import LMResult

__all__ = ["make_pallas_lm", "pallas_available"]


# VMEM planning.  The lane axis of every vreg pads to 128, so shrinking
# the lane tile below 128 does NOT shrink the working set — the knob that
# does is the PIXEL axis: H/g are accumulated over pixel chunks so full
# [Npix, 128] Jacobian rows never materialize.  Resident per tile: the
# pixel/mask inputs ([Npix, 128] each) + one chunk's temporaries.
_VMEM_BUDGET = 12 * 1024 * 1024  # headroom under the 16MB/core limit
_CHUNK_BUDGET = 6 * 1024 * 1024  # chunk temporaries' share

# Hard cap on free slots per lane: the per-chunk Jacobian rows, the H
# upper triangle, and the fully unrolled per-lane Cholesky all occupy
# Mosaic stack together, and the compiler's scoped-vmem allocator
# (16.00M limit) charges their peak live set.  Calibrated on hardware
# (v5e): V=49 (size-16 chain bucket, 2D) compiles and runs; V=60
# (size-20 chain) demands 21.55M scoped and fails to compile — in both
# the pixel-resident and the HBM-streaming variant.  Buckets past the
# cap take the XLA cho_solve path instead (correct, slower — only the
# extreme chain tail lands there).
_MAX_KERNEL_SLOTS = 50


def _scoped_demand(n_slots: int, chunk: int, resident_rows: int,
                   tile_b: int = 128) -> int:
    """Calibrated model of Mosaic's scoped-vmem (stack) demand, bytes.

    The dominant term is NOT the chunk temporaries (Mosaic recycles the
    fori_loop body's registers — measured: CL 208 → 96 moved demand by
    only 0.34M) but ~12 live copies of the Hessian upper triangle + the
    packed accumulator that the LM while_loop carries (acc0, carry
    in/out, trial, accept-select pairs).  Fit on v5e hardware OOM
    reports / compiles (see benchmarks/probe_vmem.py):

      Vk=48 Npix=3200 CL=208 resident: pred 18.77M  meas 18.74M (OOM)
      Vk=48 Npix=3200 CL=96  resident: pred 18.44M  meas 18.40M (OOM)
      Vk=48 Npix=3200 CL=200 stream:   pred 15.39M  compiles
      Vk=60          CL=168 stream:    pred 23.0M   meas 21.55M (OOM)
      Vk=14 Npix=4136 CL=384 res+mask: pred  6.1M   compiles, full rate

    ``resident_rows`` counts [*, tile_b] f32 rows held resident for the
    whole solve (pixel block + mask scratch + DMA/window scratch).
    """
    tri = n_slots * (n_slots + 1) // 2
    nacc = -(-(1 + n_slots + tri) // 8) * 8
    rows = 12 * (tri + nacc) + resident_rows + ((n_slots + 10) * chunk) // 10
    return rows * tile_b * 4


# Acceptance bounds under the hard 16.00M scoped-vmem limit.  Resident
# predictions above were exact to ±0.04M → 1.5M slack; the streaming
# prediction overestimated the one hard case by 1.5M and the known-good
# stream shape (Vk=48, the dense ladder-16 recovery bucket) sits at
# 15.39M predicted / compiles on hardware, so its bound admits it.
_RES_SAFE = int(14.5 * 1024 * 1024)
_STREAM_SAFE = int(15.7 * 1024 * 1024)


def _pick_chunk(n_slots: int, npix: int) -> int:
    """Pixel-chunk length (multiple of 8) whose temporaries fit VMEM.

    Per chunk ≈ (V Jacobian rows + ~10 geometry/profile temporaries) ×
    [chunk, 128] f32; plus 2 resident [Npix, 128] inputs (pixel block +
    the resident fit mask).  Returns 0 when the resident inputs exceed
    VMEM or the modeled scoped-vmem demand (_scoped_demand) exceeds
    _RES_SAFE — the caller then switches to the HBM-streaming variant
    (_pick_chunk_stream).
    """
    if n_slots > _MAX_KERNEL_SLOTS:
        return 0
    # pixels + the resident fit mask both occupy [Npix, 128] f32; they
    # must fit alongside one chunk's temporaries (_CHUNK_BUDGET), so the
    # resident-path gate is ~6k voxels — larger windows stream from HBM
    # (_pick_chunk_stream), which stays compute-bound (~22 flops/byte)
    resident = 2 * npix * 128 * 4
    if resident > _VMEM_BUDGET - _CHUNK_BUDGET:
        return 0
    per_row = (n_slots + 10) * 128 * 4
    chunk = min(int(_CHUNK_BUDGET - 0) // per_row, npix)
    # Multi-chunk windows: cap the chunk length at 384 voxels.  The
    # dead-chunk skip is per chunk across the whole 128-lane tile, so
    # finer chunks resolve the live/dead boundary of the center-out
    # voxel order more precisely; with the fit mask resident (one read
    # per chunk instead of a ~50-op recompute) the per-chunk overhead
    # no longer penalizes the finer tiling.  Measured on v5e (16³
    # tetramer): CL 512 → 113k solves/s, 384 → 117k, 256 → 116k.
    if chunk < npix:
        chunk = min(chunk, 384)
    chunk = (chunk // 8) * 8
    if chunk <= 0:
        return 0
    # High-slot buckets (dense ladder chains): the Hessian-carry term
    # alone can blow the 16M stack at ANY chunk length — stream instead
    if _scoped_demand(n_slots, chunk, 2 * npix) > _RES_SAFE:
        return 0
    return chunk


# Streamed windows are bandwidth-bound at ~Npix·B·4 bytes per LM sweep;
# beyond ~64³ voxels per window even that is past any practical cluster
# size (the reference caps clusters far smaller) — reject so the spill
# path gets it rather than a pathological kernel.
_STREAM_NPIX_CAP = 1 << 18


def _pick_chunk_stream(n_slots: int, npix: int) -> int:
    """Chunk length when pixels STREAM from HBM per chunk (VERDICT r2
    item 2): no [Npix, 128] array is ever resident — only the [CL, 128]
    DMA landing buffer plus the chunk temporaries occupy VMEM, so any
    window up to _STREAM_NPIX_CAP fits (3D z-stack windows, big rigid
    tetramer boxes).  The cost is one HBM read of the pixel block per
    accumulate sweep — ~22 flops/byte of VPU work rides on it, so the
    sweep stays compute-bound."""
    if n_slots > _MAX_KERNEL_SLOTS or npix > _STREAM_NPIX_CAP:
        return 0
    per_row = (n_slots + 10) * 128 * 4
    chunk = int(_CHUNK_BUDGET // (per_row + 2 * 128 * 4))
    chunk = min((chunk // 8) * 8, -(-npix // 8) * 8)
    if chunk <= 0:
        return 0
    # nothing resident, but the Hessian-carry stack term still applies
    # (V=60: 21.55M measured, streaming too) — past it, the XLA path
    if _scoped_demand(n_slots, chunk, 0) > _STREAM_SAFE:
        return 0
    return chunk


def _rigid_kernel_slots(layout: ParamLayout, constraint):
    """Compact slot bookkeeping for a rigid-constrained kernel.

    The rigid vect refine.py builds is [pose (Qt), std slots (V)] where
    the n·D position slots inside the std segment are INERT (their
    Jacobian rows are zero; positions come from the pose).  The kernel
    drops them: compact x = [pose, non-position std slots].  Returns
    (Qt, keep, drop, remap) where keep/drop index the FULL vect and
    remap maps a std slot index to its compact row (-1 for positions).
    """
    from ..constraints import pose_dim

    n = layout.n_features
    # 2D: center(2)+angle; 3D dimer: center(3)+polar+azimuth (+ dist)
    Qt = pose_dim(constraint) + int(constraint.fit_dist)
    pos_slots = {
        int(layout.slot_idx[i, p])
        for i in range(n)
        for p in layout.pos_param_idx
    }
    keep = list(range(Qt))
    remap = np.full(layout.n_slots, -1, np.int32)
    for s in range(layout.n_slots):
        if s not in pos_slots:
            remap[s] = len(keep)
            keep.append(Qt + s)
    drop = [Qt + s for s in sorted(pos_slots)]
    return Qt, keep, drop, remap


def _rigid_supported(layout: ParamLayout, constraint) -> bool:
    """Rigid constraints the kernel inlines: 2D n-gon poses, the 3D
    dimer axis pose, and 3D rotation-vector poses (trimer/tetramer/
    n-gon — Rodrigues + the SO(3) right Jacobian, all closed form);
    global-tied distances stay on the XLA path."""
    if constraint.kind != "rigid":
        return False
    if layout.ndim not in (2, 3):
        return False
    if constraint.fit_dist and constraint.dist_mode == "global":
        return False
    # every position must be a fitted slot for the pose chain rule
    return all(
        layout.slot_idx[i, p] >= 0
        for i in range(layout.n_features)
        for p in layout.pos_param_idx
    )


# MXU crossover: the kernel's lane-major layout accumulates the
# Hessian as Vk(Vk+1)/2 VPU row-reductions per pixel chunk, while the
# XLA path's J^T J is an MXU matmul (~85 Tflop/s f32 measured vs ~2.5
# Tflop/s VPU).  Measured on v5e, identical problems, same iterates
# (benchmarks/probe_vmem.py, gauss chains, 20 LM iters):
#     Vk=24: kernel    84.6 solves/s   XLA  2,590/s   (31x)
#     Vk=48: kernel     9.4 solves/s   XLA  1,383/s   (147x)
# while at small Vk the kernel wins (config 1, Vk=6: 2.7M/s; config 4,
# Vk=14 3D aniso: 145.6k/s — mostly-dead 3D windows ride the kernel's
# dead-chunk skip, which XLA lacks).  Unconstrained buckets at/above
# the threshold route to ops/lm.py; rigid buckets keep the kernel —
# pose compaction keeps their Vk far below it and the XLA rigid path
# is gather-bound (~5k/s measured round 2).
_MXU_CROSSOVER_SLOTS = 20


def pallas_available(model: ModelSpec, layout: ParamLayout,
                     use_global: bool, constraint,
                     window_shape=None) -> bool:
    """Whether the fused kernel covers this bucket configuration.

    Not covered (falls back to ops/lm.py): cross-lane-tied 'global' slots
    (need a cross-tile reduction), generic penalty constraints,
    zero-slot layouts, unconstrained buckets past the MXU crossover
    (_MXU_CROSSOVER_SLOTS — the XLA path's matmul J^T J is faster
    there), and windows beyond the streaming cap (~64³ voxels).
    Windows whose pixels exceed resident VMEM stream from HBM
    chunk-by-chunk instead of being rejected (VERDICT r2 item 2).
    """
    if use_global or layout.n_slots == 0:
        return False
    n_slots = layout.n_slots
    if constraint is not None:
        if not _rigid_supported(layout, constraint):
            return False
        _, keep, _, _ = _rigid_kernel_slots(layout, constraint)
        n_slots = len(keep)
    elif n_slots >= _MXU_CROSSOVER_SLOTS:
        return False
    if window_shape is not None:
        npix = int(np.prod(window_shape))
        if (_pick_chunk(n_slots, npix) == 0
                and _pick_chunk_stream(n_slots, npix) == 0):
            return False
    return True


def _row(a, i):
    """Row i of a [R, TB] ref/array as a [1, TB] array."""
    return a[i : i + 1, :]


def make_pallas_lm(
    model: ModelSpec,
    layout: ParamLayout,
    window_shape: tuple,
    lo: np.ndarray,
    hi: np.ndarray,
    radius: tuple = None,
    *,
    max_iter: int = 60,
    ftol: float = 1.49e-8,
    xtol: float = 1.49e-8,
    lam0: float = 1e-3,
    lam_up: float = 4.0,
    lam_down: float = 0.25,
    lam_max: float = 1e10,
    tile_b: Optional[int] = None,
    interpret: Optional[bool] = None,
    chunk_len: Optional[int] = None,
    streaming: Optional[bool] = None,
    fused_gather: Optional[bool] = None,
    frame_shape: Optional[tuple] = None,
    constraint=None,
):
    """Build the fused LM solver for one bucket configuration.

    Returns ``solve(vect0 [B,V], const_params [B,n,P], pixels [B,Npix],
    pos_at [B,n,D], origin [B,D] int32, norm [B], valid [B] bool) ->
    LMResult`` — a drop-in for ops/lm.py::lm_solve with the residual
    closed over (gauss-family sum-of-profiles model, analytic Jacobian).

    The within-radius fit mask is computed INSIDE the kernel from the
    gather-time positions ``pos_at`` and the static ``radius`` (identical
    semantics to ops/gather.py::radius_mask) — passing a precomputed
    [B, Npix] mask costs ~4 ms of XLA prologue + 5.5 MB of HBM traffic
    per dispatch at B=8192.

    With a rigid ``constraint`` (2D), ``vect0``/``lo``/``hi`` use the
    refine.py rigid layout [pose (center, angle, dist?), std slots]; the
    kernel solves a compact vector (inert position slots dropped) with
    the pose→positions trig and its chain-rule Jacobian inlined — the
    reference's SLSQP constrained fit (clustertracking/constraints.py)
    reparameterized per SURVEY.md §7, at full kernel rate.  Returned x
    uses the full layout (position slots keep their clipped initial
    values, exactly like the XLA path's zero-delta inert slots).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    D = layout.ndim
    n = layout.n_features
    P = layout.n_params
    V = layout.n_slots
    slot_idx = layout.slot_idx  # [n, P] int, -1 = const
    rigid = constraint is not None
    if rigid:
        if not _rigid_supported(layout, constraint):
            raise ValueError(
                f"pallas kernel does not support constraint "
                f"{constraint!r} (needs rigid, 2D, positions fitted, "
                "non-global dist)"
            )
        from ..constraints import circumradius_factor

        Qt, keep_idx, drop_idx, slot_remap = _rigid_kernel_slots(
            layout, constraint
        )
        fit_dist = bool(constraint.fit_dist)
        circ = float(circumradius_factor(n, layout.ndim))
        alphas = [2.0 * math.pi * i / n for i in range(n)]  # 2D n-gon
        fixed_dist = None if fit_dist else float(constraint.dist)
        dist_row = Qt - 1  # compact row of the fitted distance
        if layout.ndim == 3 and n > 2:
            from ..constraints import base_vertices

            base3 = base_vertices(n, 3).tolist()  # [n][3] python floats
        else:
            base3 = None
        Vk = len(keep_idx)  # compact kernel vector length
        lo_full = np.asarray(lo, np.float32)
        hi_full = np.asarray(hi, np.float32)
        lo = lo_full[keep_idx]
        hi = hi_full[keep_idx]
    else:
        Qt, keep_idx, drop_idx, slot_remap = 0, None, None, None
        Vk = V
    Npix = int(np.prod(window_shape))
    if tile_b is None:
        tile_b = 128
    if streaming is None:  # auto: stream iff resident pixels don't fit
        streaming = chunk_len is None and _pick_chunk(Vk, Npix) == 0
    if chunk_len is None:
        chunk_len = (_pick_chunk_stream(Vk, Npix) if streaming
                     else _pick_chunk(Vk, Npix))
    if chunk_len == 0:
        raise ValueError(
            f"window {window_shape} x {Vk} slots exceeds "
            "the streaming cap; use the XLA path"
        )
    # Multi-chunk windows iterate a fori_loop so each chunk's temporaries
    # are loop-local (an unrolled chunk sweep makes Mosaic's stack
    # allocation grow with the number of chunks — measured OOM at 11
    # chunks).  The pixel axis is padded to a whole number of equal chunks;
    # the padded tail carries mask=0 so it contributes nothing.  Chunks
    # are EQUALIZED (ceil(Npix/n_chunks) rounded to a sublane tile), not
    # left at the max-fit length — at Npix=1521/V=14 the max-fit chunk
    # of 488 padded to 1952 pixels, 28% wasted accumulate work.
    n_chunks = -(-Npix // chunk_len)
    if n_chunks > 1:
        CL = -(-(-(-Npix // n_chunks)) // 8) * 8
    else:
        CL = Npix
    Npix_pad = n_chunks * CL
    # Center-out voxel ordering (3D multi-chunk resident path): voxels
    # sorted by distance from the window center, so in-mask voxels pack
    # into the LEADING chunks and the tail chunks go fully dead — the
    # per-chunk mask-empty skip then drops most of a 3D box's accumulate
    # work (a 16³ tetramer window is ~85% out-of-mask; the union of
    # spheres hugs the window center because the gather centers the
    # cluster; edge-clamped lanes shift off-center, which only makes
    # fewer chunks skippable — never wrong, the mask stays exact).
    # Voxel coordinates ride along as ONE packed f32 column
    # (z·65536 + y·256 + x — exact below 2²⁴; window dims < 256 by the
    # streaming cap), since iota can no longer derive them.
    use_ctab = (
        len(window_shape) == 3 and n_chunks > 1 and not streaming
    )
    if use_ctab:
        grids = np.meshgrid(
            *[np.arange(w) for w in window_shape], indexing="ij"
        )
        ctr = [(w - 1) / 2.0 for w in window_shape]
        d2c = sum((g - c) ** 2 for g, c in zip(grids, ctr)).ravel()
        _perm = np.argsort(d2c, kind="stable").astype(np.int32)
        _packed = (
            grids[0].ravel()[_perm] * 65536
            + grids[1].ravel()[_perm] * 256
            + grids[2].ravel()[_perm]
        ).astype(np.float32)
        _ctab_np = np.zeros((Npix_pad, 1), np.float32)
        _ctab_np[:Npix, 0] = _packed
    else:
        _perm = _ctab_np = None
    # Resident-mask eligibility: the calibrated scoped-vmem model
    # (_scoped_demand), counting the pixel input block + the mask
    # scratch resident, must clear _RES_SAFE at the ACTUAL tile width.
    # _pick_chunk already applied the same test at tile_b=128, so for
    # default tiles this is a recheck; ineligible buckets keep the
    # per-chunk mask recompute (the round-2 behavior).
    mask_res_plain = (not streaming) and _scoped_demand(
        Vk, CL, 2 * Npix_pad, tile_b
    ) <= _RES_SAFE
    n_extra = len(model.extra_params)
    extra_p = tuple(layout.param_names.index(nm) for nm in model.extra_params)
    pos_p = layout.pos_param_idx
    size_p = layout.size_param_idx
    sig_p = layout.signal_param_idx
    bg_p = layout.background_param_idx
    fun = model.fun
    dfun_f = model.dfun_f  # f-reusing form: saves one exp/pixel/feature
    dfun = model.dfun if model.dfun is not None else \
        jnp.vectorize(model.dfun_dr2())
    dfun_dex = [jnp.vectorize(model.dfun_dextra(k)) for k in range(n_extra)]

    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    if radius is None:
        radius = tuple((ws - 1) / 2.0 for ws in window_shape)
    radius = tuple(float(r) for r in radius)

    def kernel_impl(pix_of_chunk, vect_ref, cp_ref, pos_ref, org_ref,
                    aux_ref, xout_ref, stats_ref, ctab_ref=None,
                    mask_ref=None):
        """Shared LM body; ``pix_of_chunk(c0) -> [CL, TB]`` supplies pixel
        chunks (from a VMEM input ref, or from the DMA-gathered scratch in
        the fused-gather kernel).  ``ctab_ref`` (center-out ordering)
        carries packed per-voxel coordinates when iota cannot.

        ``mask_ref`` (a [Npix_pad, TB] VMEM scratch, non-streaming paths)
        holds the fit mask RESIDENT: the mask depends only on the
        gather-time positions/origins — fixed for the whole solve — yet
        it used to be recomputed per chunk per LM sweep (~50 [CL, TB]
        ops: 4-feature ellipsoid tests), which on a mostly-dead 3D box
        was ~20%% of kernel time.  Now it is computed ONCE per solve and
        each sweep just re-reads it (bit-identical values)."""
        from jax.experimental import pallas as pl

        norm = _row(aux_ref, 0)               # [1, TB]
        valid = _row(aux_ref, 1) > 0.5        # [1, TB] bool
        inv_norm = 1.0 / norm                 # [1, TB]
        org = org_ref[:]                      # [D, TB] f32
        cp = cp_ref[:]                        # [n*P, TB]
        pos_at = pos_ref[:]                   # [n*D, TB]
        # ladder pad features (aux rows 3..3+n): fv == 0 ⇒ the feature
        # contributes no model intensity, no Jacobian rows (slots go
        # inert) and claims no mask pixels
        fv = [_row(aux_ref, 3 + i) for i in range(n)]

        def chunk_off(c0):
            """In-register voxel offsets for pixel slice [c0, c0+CL).

            Generated from iota (pallas kernels cannot capture array
            constants) or unpacked from the center-out coordinate table.
            """
            ids = jax.lax.broadcasted_iota(jnp.int32, (CL, 1), 0) + c0
            if ctab_ref is not None:
                pk = ctab_ref[pl.ds(c0, CL), 0:1].astype(jnp.int32)
                zi = pk // 65536
                rem = pk - zi * 65536
                yi = rem // 256
                off = [
                    zi.astype(jnp.float32),
                    yi.astype(jnp.float32),
                    (rem - yi * 256).astype(jnp.float32),
                ]
            else:
                off = []
                stride = Npix
                for d in range(D):
                    stride //= window_shape[d]
                    off.append(((ids // stride) % window_shape[d])
                               .astype(jnp.float32))
            return ids, off

        def chunk_geom(c0):
            """Offsets + fit mask for pixel slice [c0, c0+CL) — no pixel
            read, so an all-empty chunk can be skipped BEFORE its DMA.

            The mask matches ops/gather.py::radius_mask: 1.0 where the
            pixel lies within the (ellipsoidal) radius of ANY feature at
            its gather-time position, 0.0 outside and on the padded
            chunk tail.
            """
            ids, off = chunk_off(c0)
            inside = None
            for i in range(n):
                r2m = None
                for d in range(D):
                    rel = _row(pos_at, i * D + d) - _row(org, d)
                    dm = (off[d] - rel) * (1.0 / radius[d])
                    r2m = dm * dm if r2m is None else r2m + dm * dm
                hit = (r2m <= 1.0) & (fv[i] > 0.5)
                inside = hit if inside is None else (inside | hit)
            if Npix_pad > Npix:
                inside = inside & (ids < Npix)
            maskc = inside.astype(jnp.float32)
            return maskc, off

        def krow(s):
            """Compact kernel row for std slot s (identity when no
            constraint; pose-shifted remap when rigid)."""
            return int(slot_remap[s]) if rigid else int(s)

        def prow(x, i, p):
            """Parameter (feature i, param p) as a [1, TB] row."""
            s = int(slot_idx[i, p])
            if s >= 0:
                return _row(x, krow(s))
            return _row(cp, i * P + p)

        def clip(x):
            rows = []
            for v in range(Vk):
                r = _row(x, v)
                if np.isfinite(lo[v]):
                    r = jnp.maximum(r, lo[v])
                if np.isfinite(hi[v]):
                    r = jnp.minimum(r, hi[v])
                rows.append(r)
            return jnp.concatenate(rows, axis=0)

        def sweep_consts(x):
            """[1, TB] rows that depend on x but not the pixel chunk.

            Hoisted out of the per-chunk loop: these used to be
            recomputed inside every chunk of every accumulate sweep (the
            3D Rodrigues + right-Jacobian block alone is ~700 row ops);
            they are pure per-lane algebra, so computing them once per
            sweep is bit-identical."""
            pc = {"bg": prow(x, 0, bg_p)}
            pc["sig"] = [prow(x, i, sig_p) * fv[i] for i in range(n)]
            pc["ex"] = [
                [prow(x, i, p) for p in extra_p] for i in range(n)
            ]
            pc["sizes"] = [
                [prow(x, i, p) for p in size_p] for i in range(n)
            ]
            if not rigid:
                pc["rels"] = [
                    [prow(x, i, pos_p[d]) - _row(org, d)
                     for d in range(D)]
                    for i in range(n)
                ]
                return pc
            if D == 2:
                # pose rows: positions are center + R_c·(sin, cos)(θ+αᵢ)
                # — constraints.py::pose_to_positions inlined (2D n-gon)
                cy, cx, th = _row(x, 0), _row(x, 1), _row(x, 2)
                Rc = circ * (_row(x, dist_row) if fit_dist else fixed_dist)
                pc["Rc"] = Rc
                pc["sc"] = [
                    (jnp.sin(th + alphas[i]), jnp.cos(th + alphas[i]))
                    for i in range(n)
                ]
                pc["rels"] = [
                    [cy + Rc * pc["sc"][i][0] - _row(org, 0),
                     cx + Rc * pc["sc"][i][1] - _row(org, 1)]
                    for i in range(n)
                ]
                return pc
            cz, cy, cx = _row(x, 0), _row(x, 1), _row(x, 2)
            Rc = circ * (_row(x, dist_row) if fit_dist else fixed_dist)
            pc["Rc"] = Rc
            if n == 2:
                # 3D dimer axis pose: positions = center ± R_c·u with
                # u = (cosθ, sinθ·sinφ, sinθ·cosφ) in (z, y, x) —
                # constraints.py::pose_to_positions (n=2, 3D) inlined
                th3, ph3 = _row(x, 3), _row(x, 4)
                sth, cth = jnp.sin(th3), jnp.cos(th3)
                sph, cph = jnp.sin(ph3), jnp.cos(ph3)
                u3 = (cth, sth * sph, sth * cph)
                # ∂u/∂θ and ∂u/∂φ (closed form)
                pc["u3"] = u3
                pc["du_dth"] = (-sth, cth * sph, cth * cph)
                pc["du_dph"] = (
                    jnp.zeros_like(sth), sth * cph, -sth * sph
                )
                pc["rels"] = [
                    [
                        cz + sgn * Rc * u3[0] - _row(org, 0),
                        cy + sgn * Rc * u3[1] - _row(org, 1),
                        cx + sgn * Rc * u3[2] - _row(org, 2),
                    ]
                    for sgn in (1.0, -1.0)
                ]
                return pc
            if True:
                # 3D rotation-vector pose (trimer/tetramer/n-gon):
                # pos_i = center + R_c·R(v)·b_i with R via Rodrigues;
                # ∂(R b)/∂v = −R·[b]×·J_r(v), J_r the SO(3) right
                # Jacobian = I − B[v]× + C[v]×² (verified vs jacfwd of
                # constraints.py::pose_to_positions to f32 eps).  All
                # 3×3 matrices live as [1, TB] rows — pure VPU algebra,
                # mirrors constraints.py::_rodrigues component order.
                v3 = [_row(x, 3), _row(x, 4), _row(x, 5)]
                th2 = v3[0] * v3[0] + v3[1] * v3[1] + v3[2] * v3[2]
                theta = jnp.sqrt(jnp.maximum(th2, 1e-24))
                small = theta < 1e-3
                sA = jnp.where(
                    small, 1.0 - th2 / 6.0, jnp.sin(theta) / theta
                )
                sB = jnp.where(
                    small, 0.5 - th2 / 24.0,
                    (1.0 - jnp.cos(theta)) / jnp.maximum(th2, 1e-24),
                )
                sC = jnp.where(
                    small, 1.0 / 6.0 - th2 / 120.0,
                    (theta - jnp.sin(theta))
                    / jnp.maximum(th2 * theta, 1e-30),
                )
                zero = jnp.zeros_like(theta)
                Km = [
                    [zero, -v3[2], v3[1]],
                    [v3[2], zero, -v3[0]],
                    [-v3[1], v3[0], zero],
                ]
                K2 = [
                    [
                        sum(Km[a][k] * Km[k][b] for k in range(3))
                        for b in range(3)
                    ]
                    for a in range(3)
                ]
                eye = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
                Rm = [
                    [
                        eye[a][b] + sA * Km[a][b] + sB * K2[a][b]
                        for b in range(3)
                    ]
                    for a in range(3)
                ]
                Jr = [
                    [
                        eye[a][b] - sB * Km[a][b] + sC * K2[a][b]
                        for b in range(3)
                    ]
                    for a in range(3)
                ]
                Rb3 = []   # per feature: R·b_i rows [3]
                M3 = []    # per feature: −R [b_i]× J_r rows [3][3]
                for bi in base3:
                    Rb3.append([
                        Rm[a][0] * bi[0] + Rm[a][1] * bi[1]
                        + Rm[a][2] * bi[2]
                        for a in range(3)
                    ])
                    hb = [
                        [0.0, -bi[2], bi[1]],
                        [bi[2], 0.0, -bi[0]],
                        [-bi[1], bi[0], 0.0],
                    ]
                    T = [
                        [
                            sum(hb[p][k] * Jr[k][q] for k in range(3))
                            for q in range(3)
                        ]
                        for p in range(3)
                    ]
                    M3.append([
                        [
                            -sum(Rm[a][p] * T[p][q] for p in range(3))
                            for q in range(3)
                        ]
                        for a in range(3)
                    ])
            pc["Rb3"] = Rb3
            pc["M3"] = M3
            pc["rels"] = [
                [
                    cz + Rc * Rb3[i][0] - _row(org, 0),
                    cy + Rc * Rb3[i][1] - _row(org, 1),
                    cx + Rc * Rb3[i][2] - _row(org, 2),
                ]
                for i in range(n)
            ]
            return pc

        def chunk_eval(x, pc, pixc, maskc, off, with_jac):
            """Residual (and J rows) for one pixel chunk.

            Chunking bounds the VMEM working set: only [CL, TB] fields
            are live, so any window size fits (see _pick_chunk).  ``pc``
            holds the per-sweep [1, TB] constants from sweep_consts."""
            wc = maskc * inv_norm                    # [CL, TB]
            img = jnp.broadcast_to(pc["bg"], wc.shape)
            Jrows = [None] * Vk if with_jac else None

            def add(v, contrib):
                if Jrows[v] is None:
                    Jrows[v] = contrib
                else:
                    Jrows[v] = Jrows[v] + contrib

            # background: one shared slot, dI/dbg = 1 (added once, not per
            # feature — the model has a single background per cluster)
            if with_jac and slot_idx[0, bg_p] >= 0:
                add(krow(int(slot_idx[0, bg_p])), wc)
            if rigid:
                Rc = pc["Rc"]
                if D == 2:
                    pass
                elif n == 2:
                    u3 = pc["u3"]
                    du_dth = pc["du_dth"]
                    du_dph = pc["du_dph"]
                else:
                    Rb3, M3 = pc["Rb3"], pc["M3"]

            for i in range(n):
                sig = pc["sig"][i]
                ex = pc["ex"][i]
                sizes = pc["sizes"][i]
                rels = pc["rels"][i]
                if rigid and D == 2:
                    si, ci = pc["sc"][i]
                dxs = []
                r2 = None
                for d in range(D):
                    s_d = sizes[0] if layout.isotropic else sizes[d]
                    rel = rels[d]
                    dx = (off[d] - rel) / s_d               # [CL, TB]
                    dxs.append(dx)
                    r2 = dx * dx if r2 is None else r2 + dx * dx
                f = fun(r2, *ex) if n_extra else fun(r2)
                img = img + sig * f
                if not with_jac:
                    continue
                if dfun_f is not None:  # reuse f: one exp, not two
                    sig_df = sig * dfun_f(f, r2, *ex)
                else:
                    sig_df = sig * (dfun(r2, *ex) if n_extra else dfun(r2))
                if slot_idx[i, sig_p] >= 0:
                    add(krow(int(slot_idx[i, sig_p])), f * wc * fv[i])
                if rigid and D == 2:
                    # chain rule through the pose map: ∂r/∂pose =
                    # Σ_d (∂r/∂pos_d)·(∂pos_d/∂pose), closed-form trig
                    s0 = sizes[0]
                    s1 = sizes[0] if layout.isotropic else sizes[1]
                    cy_c = sig_df * (-2.0) * dxs[0] / s0 * wc
                    cx_c = sig_df * (-2.0) * dxs[1] / s1 * wc
                    add(0, cy_c)                       # ∂pos/∂center = I
                    add(1, cx_c)
                    add(2, Rc * (ci * cy_c - si * cx_c))   # ∂/∂θ
                    if fit_dist:
                        add(dist_row, circ * (si * cy_c + ci * cx_c))
                elif rigid and n == 2:
                    # 3D dimer chain rule: pos_i = center + s·R_c·u
                    sgn = 1.0 if i == 0 else -1.0
                    g = []
                    for d in range(3):
                        s_d = sizes[0] if layout.isotropic else sizes[d]
                        g.append(
                            sig_df * (-2.0) * dxs[d] / s_d * wc
                        )
                    add(0, g[0])                       # ∂pos/∂center = I
                    add(1, g[1])
                    add(2, g[2])
                    add(3, sgn * Rc * (
                        du_dth[0] * g[0] + du_dth[1] * g[1]
                        + du_dth[2] * g[2]
                    ))
                    add(4, sgn * Rc * (
                        du_dph[1] * g[1] + du_dph[2] * g[2]
                    ))
                    if fit_dist:
                        add(dist_row, sgn * circ * (
                            u3[0] * g[0] + u3[1] * g[1] + u3[2] * g[2]
                        ))
                elif rigid:
                    # rotation-vector chain rule: ∂pos_i/∂v = R_c·M_i
                    g = []
                    for d in range(3):
                        s_d = sizes[0] if layout.isotropic else sizes[d]
                        g.append(
                            sig_df * (-2.0) * dxs[d] / s_d * wc
                        )
                    add(0, g[0])                       # ∂pos/∂center = I
                    add(1, g[1])
                    add(2, g[2])
                    for q in range(3):
                        add(3 + q, Rc * (
                            M3[i][0][q] * g[0] + M3[i][1][q] * g[1]
                            + M3[i][2][q] * g[2]
                        ))
                    if fit_dist:
                        add(dist_row, circ * (
                            Rb3[i][0] * g[0] + Rb3[i][1] * g[1]
                            + Rb3[i][2] * g[2]
                        ))
                else:
                    for d in range(D):
                        if slot_idx[i, pos_p[d]] >= 0:
                            s_d = sizes[0] if layout.isotropic else sizes[d]
                            add(
                                int(slot_idx[i, pos_p[d]]),
                                sig_df * (-2.0) * dxs[d] / s_d * wc,
                            )
                if layout.isotropic:
                    if slot_idx[i, size_p[0]] >= 0:
                        add(
                            krow(int(slot_idx[i, size_p[0]])),
                            sig_df * (-2.0) * r2 / sizes[0] * wc,
                        )
                else:
                    for d in range(D):
                        if slot_idx[i, size_p[d]] >= 0:
                            add(
                                krow(int(slot_idx[i, size_p[d]])),
                                sig_df * (-2.0) * dxs[d] * dxs[d]
                                / sizes[d] * wc,
                            )
                for k, p in enumerate(extra_p):
                    if slot_idx[i, p] >= 0:
                        add(
                            krow(int(slot_idx[i, p])),
                            sig * dfun_dex[k](r2, *ex) * wc,
                        )
            r = (img - pixc) * wc
            return (r, Jrows) if with_jac else r

        def _rsum(a):
            return jnp.sum(a, axis=0, keepdims=True)  # [CL, TB] → [1, TB]

        # Packed accumulator layout for the chunk fori_loop: row 0 = cost,
        # rows 1..V = gradient, then the V(V+1)/2 upper-triangle H rows;
        # padded to a sublane-tile multiple (loop carries must be full
        # vregs, same Mosaic constraint as the outer while_loop state).
        tri = {}
        for u in range(Vk):
            for v in range(u, Vk):
                tri[(u, v)] = len(tri)
        NACC = 1 + Vk + len(tri)
        NACCp = -(-NACC // 8) * 8

        def _chunk_rows(x, pc, c0, with_jac, pixc, maskc, off):
            """One chunk's contribution as a list of NACC [1, TB] rows."""
            if not with_jac:
                r = chunk_eval(x, pc, pixc, maskc, off, with_jac=False)
                return [_rsum(r * r)]
            r, Jrows = chunk_eval(x, pc, pixc, maskc, off, with_jac=True)
            rows = [_rsum(r * r)]
            rows += [_rsum(Jrows[v] * r) for v in range(Vk)]
            for u in range(Vk):
                for v in range(u, Vk):
                    rows.append(_rsum(Jrows[u] * Jrows[v]))
            return rows

        def fill_mask():
            """Write the fit mask into the resident scratch — once per
            solve (it depends only on gather-time positions)."""
            if n_chunks == 1:
                mask_ref[:] = chunk_geom(0)[0]
                return

            def body(ci, carry):
                mask_ref[pl.ds(ci * CL, CL), :] = chunk_geom(ci * CL)[0]
                return carry

            jax.lax.fori_loop(0, n_chunks, body, 0)

        def _accumulate(x, with_jac):
            n_rows = NACC if with_jac else 1
            n_pad = (NACCp if with_jac else 8) - n_rows
            TBk = norm.shape[1]
            pc = sweep_consts(x)

            def pack(rows):
                if n_pad > 0:  # 0-row vectors are invalid in Mosaic
                    rows = rows + [jnp.zeros((n_pad, TBk), jnp.float32)]
                return jnp.concatenate(rows, axis=0)

            def packed(c0):
                """Chunk contribution, skipping DMA + eval for a chunk
                whose fit mask is empty on EVERY lane of the tile — a
                zero contribution by construction (wc ≡ 0 ⇒ r ≡ 0 and
                every J row ≡ 0), so the skip is bit-exact.  3D windows
                are mostly out-of-mask corner voxels (a 16³ tetramer box
                is ~70% outside the union of spheres), so whole raveled
                z-slabs drop out."""
                if mask_ref is not None:
                    maskc = mask_ref[pl.ds(c0, CL), :]
                else:
                    maskc, _ = chunk_geom(c0)

                def live():
                    off = chunk_off(c0)[1]
                    return pack(
                        _chunk_rows(x, pc, c0, with_jac,
                                    pix_of_chunk(c0), maskc, off)
                    )

                def dead():
                    return jnp.zeros((n_rows + n_pad, TBk), jnp.float32)

                if n_chunks == 1:
                    return live()  # nothing to skip
                return jax.lax.cond(jnp.any(maskc > 0.0), live, dead)

            if n_chunks == 1:
                return packed(0)

            def body(ci, acc):
                return acc + packed(ci * CL)

            init = jnp.zeros((n_rows + n_pad, TBk), jnp.float32)
            return jax.lax.fori_loop(0, n_chunks, body, init)

        def unpack_gh(acc):
            """(g rows, H dict-of-rows) from a packed accumulator."""
            g = [_row(acc, 1 + v) for v in range(Vk)]
            H = [[None] * Vk for _ in range(Vk)]
            for (u, v), k in tri.items():
                H[u][v] = _row(acc, 1 + Vk + k)
                H[v][u] = H[u][v]  # symmetric (shared row, no copy)
            return g, H

        def damped_solve(H, g, lam):
            """Unrolled row-wise Cholesky of (H + λ·diag(H) + εI)x = -g.

            H: dict-of-dicts of [1, TB] rows (upper triangle u<=v),
            g: list of V rows.  All elementwise VPU code over lanes."""
            A = [[None] * Vk for _ in range(Vk)]
            for u in range(Vk):
                for v in range(u, Vk):
                    A[u][v] = H[u][v]
            for v in range(Vk):
                d = jnp.maximum(H[v][v], 1e-12)
                A[v][v] = H[v][v] + lam * d + 1e-10
            L = [[None] * Vk for _ in range(Vk)]
            for j in range(Vk):
                s = A[j][j]
                for k in range(j):
                    s = s - L[j][k] * L[j][k]
                dj = jnp.sqrt(jnp.maximum(s, 1e-20))
                L[j][j] = dj
                inv_dj = 1.0 / dj
                for i2 in range(j + 1, Vk):
                    s = A[j][i2]  # upper-triangle storage: A[min][max]
                    for k in range(j):
                        s = s - L[i2][k] * L[j][k]
                    L[i2][j] = s * inv_dj
            y = [None] * Vk
            for i2 in range(Vk):
                s = -g[i2]
                for k in range(i2):
                    s = s - L[i2][k] * y[k]
                y[i2] = s / L[i2][i2]
            xs = [None] * Vk
            for i2 in reversed(range(Vk)):
                s = y[i2]
                for k in range(i2 + 1, Vk):
                    s = s - L[k][i2] * xs[k]
                xs[i2] = s / L[i2][i2]
            return jnp.concatenate(xs, axis=0)  # [V, TB]

        # One fused accumulation sweep per LM iteration: (cost, g, H) are
        # evaluated at the TRIAL point and the packed accumulator rides
        # through the loop state — on rejection the carried rows are
        # reused instead of recomputing J at an unchanged x plus a
        # separate cost-only sweep per trial.  Iterates are identical to
        # the two-sweep structure (same values, same accept decisions).
        x0 = clip(vect_ref[:])
        TB = norm.shape[1]
        # Whole-tile skip (VERDICT r2 item 4): refine.py's refit-on-
        # shift outer loop sorts still-active lanes into the leading
        # tiles; a tile whose lanes are all frozen (valid=False) skips
        # the accumulate sweeps entirely and passes x through, so
        # rounds past the first cost ~(active fraction) of a full
        # solve instead of two full sweeps per frozen tile.
        any_active = jnp.any(valid)

        @pl.when(jnp.logical_not(any_active))
        def _():
            xout_ref[:] = x0
            stats_ref[:] = jnp.zeros((8, TB), jnp.float32)

        @pl.when(any_active)
        def _():
            if mask_ref is not None:
                fill_mask()
            acc0 = _accumulate(x0, with_jac=True)
            c0 = _row(acc0, 0)

            # Loop state must carry full-sublane-tile vectors (Mosaic cannot
            # yield padded [1, TB] vregs through scf loops): x is padded to a
            # multiple of 8 rows; the five per-lane scalar rows (cost, lam,
            # active, n_iter, converged) are packed into one [8, TB] array.
            Vpad = -(-Vk // 8) * 8

            def pack_x(x):
                return jnp.concatenate(
                    [x, jnp.zeros((Vpad - Vk, TB), x.dtype)], axis=0
                ) if Vpad > Vk else x

            def pack_s(cost, lam, active, n_iter, converged):
                return jnp.concatenate([
                    cost, lam, active.astype(jnp.float32), n_iter,
                    converged.astype(jnp.float32),
                    jnp.zeros((3, TB), jnp.float32),
                ], axis=0)

            def cond(state):
                it, _, s, _ = state
                return (it < max_iter) & jnp.any(_row(s, 2) > 0.5)

            def body(state):
                it, xp, s, acc = state
                x = xp[:Vk, :]
                cost = _row(s, 0)
                lam = _row(s, 1)
                active = _row(s, 2) > 0.5
                n_iter = _row(s, 3)
                converged = _row(s, 4) > 0.5
                g, H = unpack_gh(acc)
                delta = damped_solve(H, g, lam)
                x_trial = clip(x + delta)
                step = x_trial - x
                acc_t = _accumulate(x_trial, with_jac=True)
                c_trial = _row(acc_t, 0)
                better = c_trial < cost

                accept = active & better
                x_new = jnp.where(accept, x_trial, x)
                cost_new = jnp.where(accept, c_trial, cost)
                acc_new = jnp.where(accept, acc_t, acc)
                lam_new = jnp.where(
                    accept, lam * lam_down, jnp.minimum(lam * lam_up, lam_max)
                )
                lam_new = jnp.where(active, lam_new, lam)

                # convergence tests — bit-for-bit the ops/lm.py::lm_solve rules
                # (xnorm includes the dropped inert position slots via aux
                # row 2, so rigid-compact x matches the XLA full-vector norm)
                xnorm = jnp.maximum(
                    jnp.max(jnp.abs(x), axis=0, keepdims=True),
                    _row(aux_ref, 2),
                )
                snorm = jnp.max(jnp.abs(step), axis=0, keepdims=True)
                conv_x = accept & (snorm <= xtol * (xtol + xnorm))
                conv_f = accept & (
                    (cost - c_trial) <= ftol * jnp.maximum(cost, 1e-30)
                )
                plateau = (lam_new >= 1e6 * lam0) & jnp.isfinite(cost_new)
                stuck = lam_new >= lam_max
                conv_now = conv_x | conv_f | plateau
                newly_done = active & (conv_now | stuck)

                return (
                    it + 1,
                    pack_x(x_new),
                    pack_s(
                        cost_new,
                        lam_new,
                        active & ~newly_done,
                        n_iter + active.astype(jnp.float32),
                        converged | (active & conv_now),
                    ),
                    acc_new,
                )

            init = (
                jnp.zeros((), jnp.int32),
                pack_x(x0),
                pack_s(
                    c0,
                    jnp.full((1, TB), lam0, jnp.float32),
                    valid,
                    jnp.zeros((1, TB), jnp.float32),
                    jnp.zeros((1, TB), bool),
                ),
                acc0,
            )
            _, xp, s, _ = jax.lax.while_loop(cond, body, init)

            # masked-pixel count (for the caller's rms normalization;
            # chunk_geom needs no pixel DMA).  Chunked even with the
            # resident mask: one whole-[Npix_pad, TB] read materializes
            # on the Mosaic stack (measured +~Npix_pad·TB·4 scoped).
            if mask_ref is not None and n_chunks > 1:
                def np_body(ci, acc):
                    m = _rsum(mask_ref[pl.ds(ci * CL, CL), :])
                    return acc + jnp.concatenate(
                        [m, jnp.zeros((7, TB), jnp.float32)], axis=0
                    )
                npix = _row(
                    jax.lax.fori_loop(
                        0, n_chunks, np_body,
                        jnp.zeros((8, TB), jnp.float32),
                    ),
                    0,
                )
            elif mask_ref is not None:
                npix = _rsum(mask_ref[:])
            elif n_chunks == 1:
                npix = _rsum(chunk_geom(0)[0])
            else:
                def np_body(ci, acc):
                    m = _rsum(chunk_geom(ci * CL)[0])
                    return acc + jnp.concatenate(
                        [m, jnp.zeros((7, TB), jnp.float32)], axis=0
                    )
                npix = _row(
                    jax.lax.fori_loop(
                        0, n_chunks, np_body,
                        jnp.zeros((8, TB), jnp.float32),
                    ),
                    0,
                )

            xout_ref[:] = xp[:Vk, :]
            stats_ref[0:1, :] = _row(s, 0)   # cost
            stats_ref[1:2, :] = _row(s, 3)   # n_iter
            stats_ref[2:3, :] = _row(s, 4)   # converged
            stats_ref[3:4, :] = _row(s, 1)   # lam
            stats_ref[4:5, :] = npix
            stats_ref[5:8, :] = jnp.zeros((3, TB), jnp.float32)

    def kernel(*refs):
        from jax.experimental import pallas as pl

        if not mask_res_plain:
            refs = refs + (None,)
        if use_ctab:
            (vect_ref, cp_ref, pix_ref, pos_ref, org_ref, aux_ref,
             ctab_ref, xout_ref, stats_ref, mask_scratch) = refs
        else:
            (vect_ref, cp_ref, pix_ref, pos_ref, org_ref, aux_ref,
             xout_ref, stats_ref, mask_scratch) = refs
            ctab_ref = None
        kernel_impl(
            lambda c0: pix_ref[pl.ds(c0, CL), :],
            vect_ref, cp_ref, pos_ref, org_ref, aux_ref,
            xout_ref, stats_ref, ctab_ref, mask_scratch,
        )

    def kernel_stream(vect_ref, cp_ref, pix_hbm, pos_ref, org_ref,
                      aux_ref, xout_ref, stats_ref, pix_scratch, sem):
        """HBM-streaming variant (VERDICT r2 item 2): the [Npix, B]
        pixel block never becomes VMEM-resident — each accumulate sweep
        DMAs one [CL, TILE_B] chunk at a time into a landing buffer, so
        windows far past the resident gate (3D z-stacks, 32³ rigid
        boxes) run at kernel rate instead of falling to the XLA path
        (measured 5k/s for 3D rigid)."""
        from jax.experimental import pallas as pl

        col0 = pl.program_id(0) * tile_b

        def pix_of_chunk(c0):
            dma = pltpu.make_async_copy(
                pix_hbm.at[pl.ds(pl.multiple_of(c0, 8), CL),
                           pl.ds(col0, tile_b)],
                pix_scratch, sem,
            )
            dma.start()
            dma.wait()
            return pix_scratch[:]

        kernel_impl(pix_of_chunk, vect_ref, cp_ref, pos_ref, org_ref,
                    aux_ref, xout_ref, stats_ref)

    # Fused-gather block geometry (2D only): a DMA from a tiled HBM
    # memref needs 8/128-aligned offsets AND shapes in the two minor
    # dims, so each lane fetches an aligned superset block
    # [R_BLK, W_BLK] at (oy//8*8, ox//128*128) (edge-clamped on the
    # host), and the exact wy×wx window is extracted in-kernel with two
    # batched one-hot matmuls on the MXU.
    if len(window_shape) == 2:
        # The block must cover the worst-case in-block offset PLUS the
        # window: the corner rounds DOWN to the nearest aligned multiple,
        # so dy <= 7 (R_BLK >= wy + 7) and dx <= 127 (W_BLK >= wx + 127).
        # Exception: when the frame itself is no wider than the block,
        # the edge clamp (corner = min(aligned, W - W_BLK)) bounds the
        # offset by W_BLK - wx, so capping W_BLK at the frame width stays
        # correct and keeps narrow frames eligible.
        _R_BLK = -(-(window_shape[0] + 7) // 8) * 8
        _W_BLK = -(-(window_shape[1] + 127) // 128) * 128
        if frame_shape is not None and len(frame_shape) == 2:
            _W_BLK = min(_W_BLK, -(-frame_shape[1] // 128) * 128)
    else:
        _R_BLK = _W_BLK = 0
    # fused-gather variant: resident = repacked-window scratch + mask
    # scratch + the double-buffered DMA landing blocks (no pixel input
    # block — frames stay in HBM)
    mask_res_fused = _scoped_demand(
        Vk, CL, 2 * Npix_pad + 2 * _R_BLK * _W_BLK, tile_b
    ) <= _RES_SAFE

    def kernel_fused(sidx_ref, frames_ref, vect_ref, cp_ref, pos_ref,
                     org_ref, sub_ref, aux_ref, xout_ref, stats_ref,
                     blk_scratch, pix_scratch, sems, mask_scratch=None):
        """DMA-gather variant: aligned window-superset blocks are pulled
        straight from the frame stack in HBM — one DMA descriptor per
        lane, double-buffered across grid tiles so the scalar core issues
        tile i+1's copies while the VPU runs tile i's LM iterations —
        instead of an XLA gather (scalar-core bound: ~6 ms per dispatch
        at B=8192 even in its two-stage form)."""
        from jax.experimental import pallas as pl

        i = pl.program_id(0)
        nt = pl.num_programs(0)
        wy, wx = window_shape
        R, Wb = _R_BLK, _W_BLK

        def dma(k, tile, slot):
            # sidx is flat [(fi, oy8, ox128) x Bpad] — a 2D SMEM operand
            # pads its minor dim to a full tile (4 MB for [8192, 3])
            row = (tile * tile_b + k) * 3
            oy8 = pl.multiple_of(sidx_ref[row + 1], 8)
            ox128 = pl.multiple_of(sidx_ref[row + 2], 128)
            src = frames_ref.at[
                sidx_ref[row], pl.ds(oy8, R), pl.ds(ox128, Wb)
            ]
            return pltpu.make_async_copy(
                src, blk_scratch.at[slot, k], sems.at[slot, k]
            )

        @pl.when(i == 0)
        def _():
            for k in range(tile_b):
                dma(k, 0, 0).start()

        @pl.when(i + 1 < nt)
        def _():
            for k in range(tile_b):
                dma(k, i + 1, (i + 1) % 2).start()

        for k in range(tile_b):
            dma(k, i, i % 2).wait()

        # Skip the window extraction for an all-frozen tile (kernel_impl
        # skips its own sweeps via the same aux flag; the DMA waits above
        # stay unconditional so the semaphore slots drain)
        @pl.when(jnp.any(_row(aux_ref, 1) > 0.5))
        def _():
            # wait must use a slot-static ref: read both, select by parity
            blk = jnp.where(
                (i % 2 == 0),
                blk_scratch[0], blk_scratch[1],
            )                                         # [TB, R, Wb]

            # one-hot selection tensors from the sub-block offsets (dy,
            # dx); Mosaic iota is integer-only: select in int32 and cast
            dy = sub_ref[0:1, :].T[:, :, None].astype(jnp.int32)
            dx = sub_ref[1:2, :].T[:, :, None].astype(jnp.int32)
            io_r = jax.lax.broadcasted_iota(jnp.int32, (tile_b, wy, R), 1)
            io_y = jax.lax.broadcasted_iota(jnp.int32, (tile_b, wy, R), 2)
            selY = (io_y == dy + io_r).astype(jnp.float32)  # [TB, wy, R]
            io_c = jax.lax.broadcasted_iota(jnp.int32, (tile_b, wx, Wb), 1)
            io_x = jax.lax.broadcasted_iota(jnp.int32, (tile_b, wx, Wb), 2)
            selX = (io_x == dx + io_c).astype(jnp.float32)  # [TB, wx, Wb]

            tmp = jax.lax.dot_general(
                selY, blk, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                         # [TB, wy, Wb]
            win = jax.lax.dot_general(
                tmp, selX, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                         # [TB, wy, wx]

            # repack [TB, wy, wx] → [Npix(_pad), TB] row-block by row-
            # block (Mosaic cannot reshape across unaligned trailing
            # dims); chunks then slice the scratch ref with pl.ds
            for j in range(wy):
                pix_scratch[j * wx:(j + 1) * wx, :] = win[:, j, :].T
            if Npix_pad > Npix:
                pix_scratch[Npix:, :] = jnp.zeros(
                    (Npix_pad - Npix, tile_b), jnp.float32
                )

        kernel_impl(
            lambda c0: pix_scratch[pl.ds(c0, CL), :],
            vect_ref, cp_ref, pos_ref, org_ref, aux_ref,
            xout_ref, stats_ref, None, mask_scratch,
        )

    def _compact_in(vect0):
        """Kernel x0 (compact for rigid) + the dropped-slot norm row.

        The dropped inert position slots still contribute to the XLA
        path's max-abs convergence norm; their (clipped, constant)
        magnitude rides along as aux row 2 so conv_x matches bit-exactly.
        """
        if not rigid:
            return vect0, jnp.zeros(vect0.shape[:1], vect0.dtype)
        stale = jnp.clip(
            vect0[:, jnp.asarray(drop_idx)],
            jnp.asarray(lo_full[drop_idx]),
            jnp.asarray(hi_full[drop_idx]),
        )
        xn = jnp.max(jnp.abs(stale), axis=1)
        return vect0[:, jnp.asarray(keep_idx)], xn

    def _expand_out(vect0, xk):
        """Scatter the compact solution back into the full rigid layout;
        inert position slots return their clipped initial values (exactly
        the XLA path's zero-delta behavior)."""
        if not rigid:
            return xk
        full = jnp.clip(
            vect0, jnp.asarray(lo_full), jnp.asarray(hi_full)
        )
        return full.at[:, jnp.asarray(keep_idx)].set(xk)

    def solve(vect0, const_params, pixels, pos_at, origin, norm, valid,
              fvalid=None):
        B = vect0.shape[0]
        Bpad = max(tile_b, -(-B // tile_b) * tile_b)
        pad = Bpad - B

        def padB(a, fill=None):
            if pad == 0:
                return a
            if fill is None:  # replicate lane 0 (numerically benign)
                rep = jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])
            else:
                rep = jnp.full((pad,) + a.shape[1:], fill, a.dtype)
            return jnp.concatenate([a, rep], axis=0)

        vc, xn = _compact_in(vect0)
        vT = padB(vc).T                                       # [Vk, Bp]
        cpT = padB(const_params).reshape(Bpad, n * P).T       # [nP, Bp]
        pixT = padB(pixels).T                                 # [Npix, Bp]
        if use_ctab:  # center-out voxel order (see _perm above)
            pixT = jnp.take(pixT, jnp.asarray(_perm), axis=0)
        posT = padB(pos_at).reshape(Bpad, n * D).T            # [nD, Bp]
        orgT = padB(origin).astype(jnp.float32).T             # [D, Bp]
        if fvalid is None:
            fvalid = jnp.ones((B, n), norm.dtype)
        aux = jnp.concatenate(
            [jnp.stack(
                [padB(norm), padB(valid, fill=False).astype(norm.dtype),
                 padB(xn)],
                axis=0,
            ), padB(fvalid.astype(norm.dtype)).T],
            axis=0,
        )                                                     # [3+n, Bp]
        if Npix_pad > Npix:  # equal-chunk padding; in-kernel tail mask
            zt = jnp.zeros((Npix_pad - Npix, Bpad), jnp.float32)
            pixT = jnp.concatenate([pixT, zt], axis=0)

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        grid = (Bpad // tile_b,)

        def spec(rows):
            return pl.BlockSpec(
                (rows, tile_b), lambda i: (0, i),
                memory_space=pltpu.VMEM,
            )

        if streaming:
            xT, stats = pl.pallas_call(
                kernel_stream,
                grid=grid,
                in_specs=[
                    spec(Vk), spec(n * P),
                    pl.BlockSpec(memory_space=pl.ANY),
                    spec(n * D), spec(D), spec(3 + n),
                ],
                out_specs=[spec(Vk), spec(8)],
                out_shape=[
                    jax.ShapeDtypeStruct((Vk, Bpad), jnp.float32),
                    jax.ShapeDtypeStruct((8, Bpad), jnp.float32),
                ],
                scratch_shapes=[
                    pltpu.VMEM((CL, tile_b), jnp.float32),
                    pltpu.SemaphoreType.DMA,
                ],
                interpret=interpret,
            )(vT, cpT, pixT, posT, orgT, aux)
        else:
            specs = [
                spec(Vk), spec(n * P), spec(Npix_pad), spec(n * D),
                spec(D), spec(3 + n),
            ]
            ops = (vT, cpT, pixT, posT, orgT, aux)
            if use_ctab:
                # every tile reads the SAME coordinate table block
                specs.append(pl.BlockSpec(
                    (Npix_pad, 1), lambda i: (0, 0),
                    memory_space=pltpu.VMEM,
                ))
                ops = ops + (jnp.asarray(_ctab_np),)
            xT, stats = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=specs,
                out_specs=[spec(Vk), spec(8)],
                out_shape=[
                    jax.ShapeDtypeStruct((Vk, Bpad), jnp.float32),
                    jax.ShapeDtypeStruct((8, Bpad), jnp.float32),
                ],
                scratch_shapes=(
                    # resident fit mask — filled once per solve
                    [pltpu.VMEM((Npix_pad, tile_b), jnp.float32)]
                    if mask_res_plain else []
                ),
                interpret=interpret,
            )(*ops)

        return LMResult(
            x=_expand_out(vect0, xT.T[:B]),
            cost=stats[0, :B],
            n_iter=stats[1, :B].astype(jnp.int32),
            converged=stats[2, :B] > 0.5,
            npix=stats[4, :B],
        )

    def solve_fused(vect0, const_params, frames, frame_idx, pos_at,
                    origin, norm, valid, fvalid=None):
        """Fused-gather entry: windows are DMA'd from ``frames`` in HBM
        inside the kernel — no [B, Npix] pixel array ever exists.

        frames [T, *S] f32; frame_idx [B] i32; origin [B, D] i32 (already
        clamped so every window is in bounds)."""
        B = vect0.shape[0]
        Bpad = max(tile_b, -(-B // tile_b) * tile_b)
        pad = Bpad - B

        def padB(a, fill=None):
            if pad == 0:
                return a
            if fill is None:
                rep = jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])
            else:
                rep = jnp.full((pad,) + a.shape[1:], fill, a.dtype)
            return jnp.concatenate([a, rep], axis=0)

        vc, xn = _compact_in(vect0)
        vT = padB(vc).T
        cpT = padB(const_params).reshape(Bpad, n * P).T
        posT = padB(pos_at).reshape(Bpad, n * D).T
        orgT = padB(origin).astype(jnp.float32).T
        if fvalid is None:
            fvalid = jnp.ones((B, n), norm.dtype)
        aux = jnp.concatenate(
            [jnp.stack(
                [padB(norm), padB(valid, fill=False).astype(norm.dtype),
                 padB(xn)],
                axis=0,
            ), padB(fvalid.astype(norm.dtype)).T],
            axis=0,
        )
        # Aligned DMA block corners (edge-clamped) + sub-block offsets.
        # Pad lanes point at frame 0, corner 0 (a valid, inert window).
        H, W = frames.shape[1], frames.shape[2]
        org_p = padB(origin, fill=0)
        oy8 = jnp.minimum((org_p[:, 0] // 8) * 8, H - _R_BLK)
        ox128 = jnp.minimum((org_p[:, 1] // 128) * 128, W - _W_BLK)
        sidx = jnp.stack(
            [padB(frame_idx, fill=0), oy8, ox128], axis=1
        ).astype(jnp.int32).reshape(-1)
        sub = jnp.stack(
            [(org_p[:, 0] - oy8).astype(jnp.float32),
             (org_p[:, 1] - ox128).astype(jnp.float32)],
            axis=0,
        )                                         # [2, Bpad]

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        grid = (Bpad // tile_b,)

        def spec(rows):
            return pl.BlockSpec(
                (rows, tile_b), lambda i, s: (0, i),
                memory_space=pltpu.VMEM,
            )

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),  # frames stay in HBM
                spec(Vk), spec(n * P), spec(n * D), spec(D), spec(2),
                spec(3 + n),
            ],
            out_specs=[spec(Vk), spec(8)],
            scratch_shapes=[
                pltpu.VMEM((2, tile_b, _R_BLK, _W_BLK), jnp.float32),
                pltpu.VMEM((Npix_pad, tile_b), jnp.float32),
                pltpu.SemaphoreType.DMA((2, tile_b)),
            ] + (
                # resident fit mask — filled once per solve
                [pltpu.VMEM((Npix_pad, tile_b), jnp.float32)]
                if mask_res_fused else []
            ),
        )
        xT, stats = pl.pallas_call(
            kernel_fused,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((Vk, Bpad), jnp.float32),
                jax.ShapeDtypeStruct((8, Bpad), jnp.float32),
            ],
            interpret=interpret,
        )(sidx, frames.astype(jnp.float32), vT, cpT, posT, orgT, sub, aux)

        return LMResult(
            x=_expand_out(vect0, xT.T[:B]),
            cost=stats[0, :B],
            n_iter=stats[1, :B].astype(jnp.int32),
            converged=stats[2, :B] > 0.5,
            npix=stats[4, :B],
        )

    # Fused-gather eligibility: 2D windows; frame dims must admit the
    # aligned superset blocks (H%8==0, W%128==0, frame >= block) so the
    # edge-clamped DMA corners stay provably aligned; double-buffered
    # block scratch must fit VMEM alongside the LM working set.
    fused_ok = (
        len(window_shape) == 2
        and not streaming  # fused keeps a [Npix, TB] scratch resident
        and _R_BLK > 0
        and 2 * tile_b * _R_BLK * _W_BLK * 4 <= 7_000_000
    )
    if fused_ok and frame_shape is not None:
        H, W = frame_shape
        fused_ok = (
            H % 8 == 0 and W % 128 == 0
            and H >= _R_BLK and W >= _W_BLK
        )
    elif frame_shape is None:
        fused_ok = False
    if fused_gather is None:
        fused_gather = fused_ok
    elif fused_gather and not fused_ok:
        raise ValueError(
            f"fused gather unavailable for window {window_shape} / "
            f"frame {frame_shape} (needs 2D window, H%8==0, W%128==0, "
            "frame >= DMA block, VMEM budget)"
        )
    if fused_gather:
        solve_fused.fused_gather = True
        return solve_fused
    solve.fused_gather = False
    return solve
