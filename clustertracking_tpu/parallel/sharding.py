"""Multi-chip data parallelism: shard the cluster batch over a Mesh.

The reference has NO parallelism of any kind (SURVEY.md §2); this module is
new design per SURVEY.md §5/§7 M9: the fit stage is embarrassingly parallel
over clusters/frames, so the batch (lane) axis is sharded across devices
with ``jax.sharding`` + jit — XLA inserts the collectives.  Collectives
actually exercised:

- ``lm_solve_global``'s shared-slot tie (mean over lanes) becomes a
  cross-device all-reduce when lanes are sharded — this is how
  'global'-mode parameters (train_leastsq, dimer_global) train data-
  parallel across chips;
- batch statistics (converged counts, mean cost) reduce with psum.

Frames are replicated (small relative to HBM) or sharded by the frame axis
when the lane→frame mapping is block-aligned; v1 replicates.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.registry import get_model
from ..refine import _bucket_solver

__all__ = ["make_mesh", "sharded_fit", "fit_step_spec"]


def make_mesh(devices=None, axis: str = "data") -> Mesh:
    """1D data-parallel mesh over all (or given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def fit_step_spec(mesh: Mesh, axis: str = "data"):
    """Shardings for (frames, frame_idx, params0, pose0, valid) inputs:
    lanes sharded over the mesh axis, frames replicated."""
    lane = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    return (rep, lane, lane, lane, lane)


def sharded_fit(
    mesh: Mesh,
    fit_function,
    ndim: int,
    isotropic: bool,
    n: int,
    window_shape: tuple,
    radius: tuple,
    param_mode: Optional[dict] = None,
    axis: str = "data",
    **solver_kw,
):
    """Build a device-sharded bucket fit.

    Returns ``fit(frames, frame_idx, params0, pose0, valid)`` where the
    lane axis of every per-cluster array is sharded over ``axis``.  The
    returned callable places inputs and jit-compiles with those shardings;
    batch size must be divisible by the mesh size.
    """
    model = get_model(fit_function)
    defaults = dict(
        param_mode_key=tuple(sorted((param_mode or {}).items())),
        bounds_key=(),
        constraint=None,
        residual_factor=1e5,
        max_iter=10,
        max_shift=1.0,
        lm_max_iter=60,
        ftol=1.49e-8,
        xtol=1.49e-8,
        compute_error=False,
        # GSPMD auto-partitions the XLA solver; lm_backend='pallas'/'auto'
        # instead runs the fused kernel per device under shard_map (lanes
        # are independent, so the map needs no collectives).  Global-tied
        # slots keep the XLA path (their tie is a cross-device reduce).
        lm_backend="xla",
        # GSPMD cannot auto-partition a pallas_call, so the sharded path
        # keeps the XLA row-take gather (the DMA gather kernel is a
        # single-chip optimization; under shard_map it would be per-shard
        # anyway and is not exercised multi-chip in this environment)
        gather_backend="xla",
    )
    defaults.update(solver_kw)
    solver, layout = _bucket_solver(
        model, ndim, isotropic, n,
        defaults["param_mode_key"], tuple(window_shape), tuple(radius),
        defaults["bounds_key"], defaults["constraint"],
        defaults["residual_factor"], defaults["max_iter"],
        defaults["max_shift"], defaults["lm_max_iter"],
        defaults["ftol"], defaults["xtol"], defaults["compute_error"],
        defaults["lm_backend"], defaults["gather_backend"],
    )
    shardings = fit_step_spec(mesh, axis)

    use_shard_map = (
        defaults["lm_backend"] in ("pallas", "auto")
        and defaults["constraint"] is None
        and not np.any(
            layout.global_slots
        )
    )
    if use_shard_map:
        # pallas_call outputs carry no varying-mesh-axes metadata, so the
        # replication/vma check must be off (kwarg name differs by version)
        try:
            from jax import shard_map
            _kw = {"check_vma": False}
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map
            _kw = {"check_rep": False}

        lane = P(axis)
        # std (5th output) is per-lane when compute_error is on; without
        # it the solver returns a shape-(0,) placeholder, which must be
        # declared replicated
        std_spec = lane if defaults["compute_error"] else P()
        mapped = shard_map(
            solver,
            mesh=mesh,
            in_specs=(P(), lane, lane, lane, lane),
            out_specs=(lane, lane, lane, lane, std_spec),
            **_kw,
        )

        def fit(frames, frame_idx, params0, pose0, valid):
            args = tuple(
                jax.device_put(jnp.asarray(a), s)
                for a, s in zip(
                    (frames, frame_idx, params0, pose0, valid), shardings
                )
            )
            return mapped(*args)

        return fit, layout

    def fit(frames, frame_idx, params0, pose0, valid):
        args = tuple(
            jax.device_put(jnp.asarray(a), s)
            for a, s in zip(
                (frames, frame_idx, params0, pose0, valid), shardings
            )
        )
        return solver(*args)

    return fit, layout
