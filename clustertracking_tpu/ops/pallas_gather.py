"""Pallas window-gather kernel: per-cluster pixel windows via direct DMA.

Replaces the XLA row-take gather for buckets the fused-gather LM kernel
(ops/pallas_lm.py) cannot take whole — 3D z-stacks foremost.  The XLA
row gather moves ~28 GB/s effective (measured: 6.7 ms for a B=2048
(9,13,13) bucket, 240k scattered 768-byte rows); a per-lane async DMA of
the aligned window-superset block runs at HBM stream bandwidth, and the
exact window is cut out in-VMEM with one-hot matmuls on the MXU.

Design:

- one grid step processes ``tile_g`` lanes; per lane ONE DMA descriptor
  copies the superset block ``[wz, R_BLK, W_BLK]`` (2D: wz = 1) from the
  frame stack in HBM into VMEM scratch, double-buffered across grid
  steps so the scalar core issues step i+1's copies while the VPU/MXU
  extracts step i's windows;
- corner alignment: the sublane (y) corner rounds down to a multiple of
  8 (so R_BLK ≥ wy + 7), the lane (x) corner to a multiple of 128
  (W_BLK ≥ wx + 127) when the frame width is itself 128-aligned,
  otherwise the whole frame width is copied (corner 0 — trivially
  aligned, any W);  the z corner needs no alignment (z is a major dim);
- extraction: one-hot selY [wy, R_BLK] / selX [wx, W_BLK] per lane from
  the in-block offsets (dy, dx), applied as two batched ``dot_general``s
  — exactly the scheme of the fused kernel, hoisted into its own kernel
  so the LM solve can keep its full 128-lane tile while the gather uses
  a small tile that fits the 3D blocks in VMEM.

Output: pixels ``[Npix_pad8, Bpad]`` f32 — the lane-major layout the
pixel-input Pallas LM solver consumes (refine.py transposes for the XLA
solver when needed).

Reference parity: implements the subimage slicing of
clustertracking/masks.py::slice_image for the bucketed batch
(SURVEY.md §2 "Masks / subregions"), as a TPU DMA kernel.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["make_pallas_gather", "pallas_gather_available"]

_VMEM_BLOCKS_BUDGET = 8 * 1024 * 1024  # double-buffered DMA blocks


def _geometry(window_shape, frame_shape):
    """(wz, wy, wx, R_BLK, W_BLK, full_width) — superset-block geometry.

    Returns None when no in-bounds aligned corner scheme exists."""
    if len(window_shape) == 2:
        wz = 1
        wy, wx = window_shape
        H, W = frame_shape
        Z = 1
    elif len(window_shape) == 3:
        wz, wy, wx = window_shape
        Z, H, W = frame_shape
    else:
        return None
    if wz > Z:
        return None
    R_BLK = -(-(wy + 7) // 8) * 8
    if H % 8 != 0 or H < R_BLK:
        return None
    # DMA slice widths must be 128-aligned (Mosaic: "slice shape along
    # the minor dim must be aligned to tiling") — refine pads frames to
    # a 128-multiple width when needed
    if W % 128 != 0:
        return None
    W_BLK = min(-(-(wx + 127) // 128) * 128, W)
    if W < W_BLK:
        return None
    full_width = W_BLK == W
    return wz, wy, wx, R_BLK, W_BLK, full_width


def _pick_tile(wz, wy, wx, R_BLK, W_BLK, Npix8):
    """Largest lane tile whose whole VMEM working set fits.

    Accounts for the double-buffered DMA blocks, the output block (whose
    lane dim pads to 128 regardless of the tile), and the extraction
    temporaries (sel one-hots + per-z dot products, all [TG, ~wy|wx,
    W_BLK]-shaped with W_BLK on the lane axis)."""
    out_bytes = Npix8 * 128 * 4
    w8 = -(-max(wy, wx) // 8) * 8
    for cand in (32, 16, 8, 4, 2, 1):
        blocks = 2 * cand * wz * R_BLK * W_BLK * 4
        temps = 5 * cand * w8 * W_BLK * 4
        if blocks + temps + out_bytes <= _VMEM_BLOCKS_BUDGET:
            return cand
    return 0


def pallas_gather_available(window_shape, frame_shape) -> bool:
    g = _geometry(tuple(window_shape), tuple(frame_shape))
    if g is None:
        return False
    wz, wy, wx, R_BLK, W_BLK, _ = g
    Npix8 = -(-wz * wy * wx // 8) * 8
    return _pick_tile(wz, wy, wx, R_BLK, W_BLK, Npix8) > 0


def make_pallas_gather(
    window_shape: Tuple[int, ...],
    frame_shape: Tuple[int, ...],
    tile_g: Optional[int] = None,
    interpret: Optional[bool] = None,
):
    """Build ``gather(frames, frame_idx, origin) -> pixels [Npix_pad8, Bpad]``.

    frames [T, *frame_shape] f32; frame_idx [B] i32; origin [B, D] i32
    already clamped so every window is in bounds (ops/gather.py::
    origins_for).  Npix_pad8 = Npix rounded up to a sublane tile; padded
    rows are zero.  Bpad = B rounded up to tile_g; padded lanes replicate
    a valid window (frame 0, corner 0).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    g = _geometry(tuple(window_shape), tuple(frame_shape))
    if g is None:
        raise ValueError(
            f"pallas gather unavailable for window {window_shape} / "
            f"frame {frame_shape}"
        )
    wz, wy, wx, R_BLK, W_BLK, full_width = g
    D = len(window_shape)
    is3d = D == 3
    Npix = int(np.prod(window_shape))
    Npix8 = -(-Npix // 8) * 8
    if tile_g is None:
        tile_g = _pick_tile(wz, wy, wx, R_BLK, W_BLK, Npix8)
    if tile_g == 0:
        raise ValueError(
            f"superset blocks for window {window_shape} exceed VMEM"
        )

    def kernel(sidx_ref, frames_ref, out_ref, blk, sems):
        i = pl.program_id(0)
        nt = pl.num_programs(0)

        def dma(k, tile, slot):
            # sidx rows: (frame, z0, oy8, ox_c, dy, dx) per lane; frames
            # are always [T, Z, H, W] (Z = 1 for 2D)
            row = (tile * tile_g + k) * 6
            oy8 = pl.multiple_of(sidx_ref[row + 2], 8)
            if full_width:
                xs = 0
            else:
                xs = pl.multiple_of(sidx_ref[row + 3], 128)
            src = frames_ref.at[
                sidx_ref[row],
                pl.ds(sidx_ref[row + 1], wz),
                pl.ds(oy8, R_BLK),
                pl.ds(xs, W_BLK),
            ]
            return pltpu.make_async_copy(
                src, blk.at[slot, k], sems.at[slot, k]
            )

        @pl.when(i == 0)
        def _():
            for k in range(tile_g):
                dma(k, 0, 0).start()

        @pl.when(i + 1 < nt)
        def _():
            for k in range(tile_g):
                dma(k, i + 1, (i + 1) % 2).start()

        for k in range(tile_g):
            dma(k, i, i % 2).wait()

        # slot-static read, parity select (same trick as the fused kernel)
        b = jnp.where((i % 2 == 0), blk[0], blk[1])
        # b: [TG, wz, R_BLK, W_BLK] (wz axis present even in 2D)

        # per-lane one-hots from the SMEM scalar offsets (a VMEM [2, TG]
        # input is not a legal block at small TG — lane dims must be
        # 128-divisible)
        io_r = jax.lax.broadcasted_iota(jnp.int32, (wy, R_BLK), 0)
        io_y = jax.lax.broadcasted_iota(jnp.int32, (wy, R_BLK), 1)
        io_c = jax.lax.broadcasted_iota(jnp.int32, (wx, W_BLK), 0)
        io_x = jax.lax.broadcasted_iota(jnp.int32, (wx, W_BLK), 1)
        selY_l, selX_l = [], []
        for k in range(tile_g):
            row = (i * tile_g + k) * 6
            dy = sidx_ref[row + 4]
            dx = sidx_ref[row + 5]
            selY_l.append((io_y == dy + io_r).astype(jnp.float32))
            selX_l.append((io_x == dx + io_c).astype(jnp.float32))
        selY = jnp.stack(selY_l, axis=0)          # [TG, wy, R_BLK]
        selX = jnp.stack(selX_l, axis=0)          # [TG, wx, W_BLK]

        # per z-plane: [TG, wy, R]×[TG, R, W] → [TG, wy, W] → ×selXᵀ →
        # [TG, wy, wx]  (3D×3D batched dots — Mosaic rejects 4D operands;
        # W_BLK stays on the LANE axis throughout so nothing pads a tiny
        # minor dim up to 128)
        for z in range(wz):
            bz = b[:, z]
            tmp = jax.lax.dot_general(
                selY, bz, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                     # [TG, wy, W]
            win_z = jax.lax.dot_general(
                tmp, selX, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                     # [TG, wy, wx]
            for j in range(wy):
                out_ref[
                    0, pl.ds((z * wy + j) * wx, wx), :
                ] = win_z[:, j, :].T
        if Npix8 > Npix:
            out_ref[0, Npix:, :] = jnp.zeros(
                (Npix8 - Npix, tile_g), jnp.float32
            )

    Z = frame_shape[0] if is3d else 1
    H = frame_shape[-2]
    W = frame_shape[-1]

    def gather(frames, frame_idx, origin):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        B = frame_idx.shape[0]
        Bpad = -(-B // tile_g) * tile_g
        pad = Bpad - B

        def padB(a):
            if pad == 0:
                return a
            return jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
            )

        fi = padB(frame_idx.astype(jnp.int32))
        org = padB(origin.astype(jnp.int32))
        if is3d:
            z0 = jnp.minimum(org[:, 0], Z - wz)
            oy = org[:, 1]
            ox = org[:, 2]
        else:
            z0 = jnp.zeros_like(fi)
            oy = org[:, 0]
            ox = org[:, 1]
        oy8 = jnp.minimum((oy // 8) * 8, H - R_BLK)
        if full_width:
            ox_c = jnp.zeros_like(ox)
        else:
            ox_c = jnp.minimum((ox // 128) * 128, W - W_BLK)
        sidx = jnp.stack(
            [fi, z0, oy8, ox_c, oy - oy8, ox - ox_c], axis=1
        ).reshape(-1)

        # output is [G, Npix8, tile_g] per grid step (a (1, Npix8, TG)
        # block — trailing dims equal to the array's, which is the only
        # legal block shape at a lane tile < 128); callers get the
        # lane-major [Npix8, Bpad] via one cheap XLA transpose
        n_tiles = Bpad // tile_g
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(
                (1, Npix8, tile_g), lambda i, s: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM(
                    (2, tile_g, wz, R_BLK, W_BLK), jnp.float32
                ),
                pltpu.SemaphoreType.DMA((2, tile_g)),
            ],
        )
        frames4 = frames.astype(jnp.float32)
        if not is3d:
            frames4 = frames4.reshape(frames4.shape[0], 1, H, W)
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (n_tiles, Npix8, tile_g), jnp.float32
            ),
            interpret=interpret,
        )(sidx, frames4)
        return jnp.moveaxis(out, 0, 1).reshape(Npix8, Bpad)

    gather.tile_g = tile_g
    return gather
