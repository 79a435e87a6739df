"""Pallas kernel under shard_map: lane-sharded fused solve on the mesh.

Runs on the conftest's 8-device virtual CPU mesh (kernel in interpret
mode).  Each device solves its own lane shard — no collectives — and the
results must match the single-device solve.
"""
import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _example_batch
from clustertracking_tpu.models.registry import get_model
from clustertracking_tpu.parallel.sharding import make_mesh, sharded_fit
from clustertracking_tpu.refine import _bucket_solver

WINDOW = (9, 9)


def _problem(B):
    frames, fidx, params0, pose0, valid = _example_batch(
        B=B, frame_size=128, grid_pitch=16
    )
    return tuple(
        np.asarray(a) for a in (frames, fidx, params0, pose0, valid)
    )


def test_sharded_pallas_matches_single_device():
    mesh = make_mesh(jax.devices()[:4])
    B = 8  # tiny: interpret mode; shards of 2 lanes
    frames, fidx, params0, pose0, valid = _problem(B)
    kw = dict(lm_max_iter=6, max_iter=1)

    fit_p, layout = sharded_fit(
        mesh, "gauss", 2, True, 2, WINDOW, (4.5, 4.5),
        lm_backend="pallas", **kw,
    )
    out_p = fit_p(frames, fidx, params0, pose0, valid)

    solver, _ = _bucket_solver(
        get_model("gauss"), 2, True, 2, (), WINDOW, (4.5, 4.5), (),
        None, 1e5, 1, 1.0, 6, 1.49e-8, 1.49e-8, False, "pallas",
    )
    out_s = solver(
        jnp.asarray(frames), jnp.asarray(fidx), jnp.asarray(params0),
        jnp.asarray(pose0), jnp.asarray(valid),
    )
    np.testing.assert_allclose(
        np.asarray(out_p[0]), np.asarray(out_s[0]), atol=2e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out_p[3]), np.asarray(out_s[3])  # iteration counts
    )


def test_sharded_pallas_compute_error_std_per_lane():
    """compute_error under shard_map: the std output is per-lane sharded
    (round-1 advisor finding: it was declared replicated and the path
    was gated off — now the out_spec matches)."""
    mesh = make_mesh(jax.devices()[:4])
    B = 8
    frames, fidx, params0, pose0, valid = _problem(B)
    kw = dict(lm_max_iter=6, max_iter=1, compute_error=True)

    fit_p, layout = sharded_fit(
        mesh, "gauss", 2, True, 2, WINDOW, (4.5, 4.5),
        lm_backend="pallas", **kw,
    )
    out_p = fit_p(frames, fidx, params0, pose0, valid)

    solver, _ = _bucket_solver(
        get_model("gauss"), 2, True, 2, (), WINDOW, (4.5, 4.5), (),
        None, 1e5, 1, 1.0, 6, 1.49e-8, 1.49e-8, True, "pallas",
    )
    out_s = solver(
        jnp.asarray(frames), jnp.asarray(fidx), jnp.asarray(params0),
        jnp.asarray(pose0), jnp.asarray(valid),
    )
    std_p = np.asarray(out_p[4])
    std_s = np.asarray(out_s[4])
    assert std_p.shape == std_s.shape == (B, 2, 5)
    np.testing.assert_allclose(std_p, std_s, rtol=1e-4, atol=1e-7)
    # stds differ lane to lane (per-lane, not one shard broadcast)
    assert np.ptp(std_p[:, 0, 2]) > 0
