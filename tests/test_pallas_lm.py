"""Pallas fused-LM kernel parity vs the XLA lm_solve path.

Runs the kernel in interpreter mode on CPU (conftest forces
JAX_PLATFORMS=cpu) with numerics that must match ops/lm.py::lm_solve
bit-for-bit — same damping schedule, acceptance rule, convergence tests.
Small sizes/iteration caps keep interpreter mode fast.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clustertracking_tpu.models.packing import build_layout
from clustertracking_tpu.models.registry import get_model
from clustertracking_tpu.ops.gather import origins_for, radius_mask
from clustertracking_tpu.ops.lm import lm_solve
from clustertracking_tpu.ops.pallas_lm import make_pallas_lm, pallas_available
from clustertracking_tpu.ops.residual import make_model_fns

WINDOW = (9, 9)
MAX_IT = 6


def _problem(model_name, n, B=4, param_mode=None, seed=0):
    import clustertracking_tpu.artificial as artificial

    model = get_model(model_name)
    layout = build_layout(model, 2, True, n, param_mode or {})
    fns = make_model_fns(model, layout, WINDOW)
    rng = np.random.default_rng(seed)
    P = layout.n_params
    size = 64
    frames = np.zeros((B, size, size), np.float32)
    params0 = np.zeros((B, n, P), np.float32)
    for b in range(B):
        center = np.array([32.0, 32.0]) + rng.uniform(-1, 1, 2)
        true = artificial.draw_cluster(
            frames[b], center, size=1.8, separation=4.0, n=n,
            signal=100.0, angle=rng.uniform(0, np.pi),
            feat_func=model_name if model_name in ("gauss",) else "gauss",
        )
        params0[b, :, 1] = 100.0
        params0[b, :, 2:4] = true + rng.uniform(-0.2, 0.2, true.shape)
        params0[b, :, 4] = 1.8
        for j, name in enumerate(model.extra_params):
            params0[b, :, 5 + j] = model.default[name]
    fidx = np.arange(B, dtype=np.int32)
    valid = np.ones(B, bool)
    return model, layout, fns, map(jnp.asarray, (frames, fidx, params0)), \
        jnp.asarray(valid)


def _solve_both(model, layout, fns, frames, fidx, params0, valid,
                radius=(3.0, 3.0)):
    pos0 = params0[..., list(layout.pos_param_idx)]
    frame_shape = frames.shape[1:]
    origin = origins_for(pos0, WINDOW, frame_shape)

    def gather_one(fi, org):
        win = jax.lax.dynamic_slice(
            frames, (fi, org[0], org[1]), (1,) + WINDOW
        )
        return win.reshape(-1)

    pixels = jax.vmap(gather_one)(fidx, origin)
    mask = radius_mask(pos0, origin, WINDOW, radius)
    norm = jnp.maximum(
        jnp.max(jnp.abs(params0[..., layout.signal_param_idx]), axis=1),
        1e-6,
    )
    vect0 = layout.vect_from_params(params0)
    V = layout.n_slots
    lo = np.full(V, -np.inf, np.float32)
    hi = np.full(V, np.inf, np.float32)
    for d, p in enumerate(layout.pos_param_idx):
        for s in layout.slot_idx[:, p]:
            if s >= 0:
                lo[s] = 0.0
                hi[s] = float(frame_shape[d] - 1)

    args = (params0, pixels, mask, origin, norm)
    res_xla = lm_solve(
        fns.residual, fns.residual_jac, vect0, args, max_iter=MAX_IT,
        lower=jnp.asarray(lo), upper=jnp.asarray(hi), valid=valid,
    )
    psolve = make_pallas_lm(
        model, layout, WINDOW, lo, hi, radius, max_iter=MAX_IT,
        interpret=True, fused_gather=False,
    )
    res_pal = psolve(vect0, params0, pixels, pos0, origin, norm, valid)
    # the kernel's in-kernel mask must match radius_mask pixel-for-pixel
    np.testing.assert_allclose(
        np.asarray(res_pal.npix), np.asarray(mask.sum(axis=1))
    )
    return res_xla, res_pal


@pytest.mark.parametrize(
    "model_name,n,param_mode",
    [
        ("gauss", 1, None),
        ("gauss", 2, None),
        ("gauss", 2, {"size": "var", "background": "cluster"}),
        ("ring", 1, {"thickness": "cluster"}),
    ],
)
def test_pallas_matches_xla(model_name, n, param_mode):
    model, layout, fns, arrs, valid = _problem(model_name, n,
                                               param_mode=param_mode)
    frames, fidx, params0 = arrs
    res_xla, res_pal = _solve_both(
        model, layout, fns, frames, fidx, params0, valid
    )
    np.testing.assert_allclose(
        np.asarray(res_pal.x), np.asarray(res_xla.x), rtol=0, atol=2e-5
    )
    np.testing.assert_array_equal(
        np.asarray(res_pal.n_iter), np.asarray(res_xla.n_iter)
    )
    np.testing.assert_array_equal(
        np.asarray(res_pal.converged), np.asarray(res_xla.converged)
    )


def test_pallas_invalid_lanes_frozen():
    model, layout, fns, arrs, _ = _problem("gauss", 2)
    frames, fidx, params0 = arrs
    valid = jnp.asarray(np.array([True, False, True, False]))
    res_xla, res_pal = _solve_both(
        model, layout, fns, frames, fidx, params0, valid
    )
    x0 = np.asarray(layout.vect_from_params(params0))
    x_p = np.asarray(res_pal.x)
    # invalid lanes keep their (clipped) initial vector
    np.testing.assert_allclose(x_p[1], x0[1], atol=1e-6)
    np.testing.assert_allclose(x_p[3], x0[3], atol=1e-6)


def test_pallas_available_gates():
    model = get_model("gauss")
    layout = build_layout(model, 2, True, 2, {})
    assert pallas_available(model, layout, False, None)
    assert not pallas_available(model, layout, True, None)


def test_pallas_multichunk_matches_singlechunk():
    """Forcing a small pixel chunk (fori_loop accumulation path) must give
    identical results to the single-chunk path."""
    model, layout, fns, arrs, valid = _problem("gauss", 2)
    frames, fidx, params0 = arrs
    res_xla, res_single = _solve_both(
        model, layout, fns, frames, fidx, params0, valid
    )
    # multi-chunk: 81 pixels in chunks of 24 (pad to 96, tail masked)
    pos0 = params0[..., list(layout.pos_param_idx)]
    frame_shape = frames.shape[1:]
    origin = origins_for(pos0, WINDOW, frame_shape)

    def gather_one(fi, org):
        win = jax.lax.dynamic_slice(
            frames, (fi, org[0], org[1]), (1,) + WINDOW
        )
        return win.reshape(-1)

    pixels = jax.vmap(gather_one)(fidx, origin)
    mask = radius_mask(pos0, origin, WINDOW, (3.0, 3.0))
    norm = jnp.maximum(
        jnp.max(jnp.abs(params0[..., layout.signal_param_idx]), axis=1),
        1e-6,
    )
    vect0 = layout.vect_from_params(params0)
    V = layout.n_slots
    lo = np.full(V, -np.inf, np.float32)
    hi = np.full(V, np.inf, np.float32)
    for d, p in enumerate(layout.pos_param_idx):
        for s in layout.slot_idx[:, p]:
            if s >= 0:
                lo[s] = 0.0
                hi[s] = float(frame_shape[d] - 1)
    from clustertracking_tpu.ops.pallas_lm import make_pallas_lm

    psolve = make_pallas_lm(
        model, layout, WINDOW, lo, hi, (3.0, 3.0), max_iter=MAX_IT,
        interpret=True, chunk_len=24, fused_gather=False,
    )
    res_multi = psolve(vect0, params0, pixels, pos0, origin, norm, valid)
    np.testing.assert_allclose(
        np.asarray(res_multi.x), np.asarray(res_single.x),
        rtol=0, atol=2e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(res_multi.n_iter), np.asarray(res_single.n_iter)
    )


def test_pallas_fused_gather_matches():
    """The DMA-gather kernel (aligned window-superset blocks pulled from
    HBM inside the kernel, exact window extracted by one-hot matmuls)
    must agree with the pixel-input kernel exactly."""
    model, layout, fns, arrs, valid = _problem("gauss", 2)
    frames, fidx, params0 = arrs
    # fused gather needs W % 128 == 0: pad frame width (content unchanged)
    frames = jnp.asarray(np.pad(np.asarray(frames), ((0, 0), (0, 0),
                                                     (0, 64))))
    res_xla, res_pix = _solve_both(
        model, layout, fns, frames, fidx, params0, valid
    )
    pos0 = params0[..., list(layout.pos_param_idx)]
    frame_shape = frames.shape[1:]
    origin = origins_for(pos0, WINDOW, frame_shape)
    norm = jnp.maximum(
        jnp.max(jnp.abs(params0[..., layout.signal_param_idx]), axis=1),
        1e-6,
    )
    vect0 = layout.vect_from_params(params0)
    V = layout.n_slots
    lo = np.full(V, -np.inf, np.float32)
    hi = np.full(V, np.inf, np.float32)
    for d, p in enumerate(layout.pos_param_idx):
        for s in layout.slot_idx[:, p]:
            if s >= 0:
                lo[s] = 0.0
                hi[s] = float(frame_shape[d] - 1)
    psolve = make_pallas_lm(
        model, layout, WINDOW, lo, hi, (3.0, 3.0), max_iter=MAX_IT,
        interpret=True, fused_gather=True, frame_shape=frame_shape,
    )
    assert psolve.fused_gather
    res_fused = psolve(vect0, params0, frames, fidx, pos0, origin, norm,
                       valid)
    np.testing.assert_allclose(
        np.asarray(res_fused.x), np.asarray(res_pix.x), rtol=0, atol=2e-5
    )
    np.testing.assert_array_equal(
        np.asarray(res_fused.n_iter), np.asarray(res_pix.n_iter)
    )
    np.testing.assert_allclose(
        np.asarray(res_fused.npix), np.asarray(res_pix.npix)
    )


def test_pallas_fused_gather_straddles_128_boundary():
    """Windows whose 128-aligned DMA corner leaves an in-block x offset
    near 127 (origin_x mod 128 ~ 119..127) must still be fully covered by
    the fetched block.  Regression: with W_BLK=128 the columns past the
    block edge read as zeros and fits silently diverged by tens of px."""
    import clustertracking_tpu.artificial as artificial

    model = get_model("gauss")
    layout = build_layout(model, 2, True, 2, {})
    rng = np.random.default_rng(3)
    B, n, P = 6, 2, layout.n_params
    H, W = 64, 256
    frames = np.zeros((B, H, W), np.float32)
    params0 = np.zeros((B, n, P), np.float32)
    # centers chosen so origin_x sweeps across the col-128 tile boundary
    xs = [118.0, 121.5, 124.0, 126.5, 129.0, 133.0]
    for b in range(B):
        center = np.array([32.0 + rng.uniform(-1, 1), xs[b]])
        true = artificial.draw_cluster(
            frames[b], center, size=1.8, separation=4.0, n=n,
            signal=100.0, angle=rng.uniform(0, np.pi),
        )
        params0[b, :, 1] = 100.0
        params0[b, :, 2:4] = true + rng.uniform(-0.2, 0.2, true.shape)
        params0[b, :, 4] = 1.8
    frames = jnp.asarray(frames)
    fidx = jnp.arange(B, dtype=jnp.int32)
    params0 = jnp.asarray(params0)
    valid = jnp.ones(B, bool)

    pos0 = params0[..., list(layout.pos_param_idx)]
    frame_shape = frames.shape[1:]
    origin = origins_for(pos0, WINDOW, frame_shape)
    # the scenario must actually exercise a boundary-straddling window
    ox = np.asarray(origin)[:, 1]
    assert ((ox % 128 + WINDOW[1]) > 128).any()

    def gather_one(fi, org):
        win = jax.lax.dynamic_slice(
            frames, (fi, org[0], org[1]), (1,) + WINDOW
        )
        return win.reshape(-1)

    pixels = jax.vmap(gather_one)(fidx, origin)
    norm = jnp.maximum(
        jnp.max(jnp.abs(params0[..., layout.signal_param_idx]), axis=1),
        1e-6,
    )
    vect0 = layout.vect_from_params(params0)
    V = layout.n_slots
    lo = np.full(V, -np.inf, np.float32)
    hi = np.full(V, np.inf, np.float32)
    psolve_pix = make_pallas_lm(
        model, layout, WINDOW, lo, hi, (3.0, 3.0), max_iter=MAX_IT,
        interpret=True, fused_gather=False,
    )
    res_pix = psolve_pix(vect0, params0, pixels, pos0, origin, norm, valid)
    psolve = make_pallas_lm(
        model, layout, WINDOW, lo, hi, (3.0, 3.0), max_iter=MAX_IT,
        interpret=True, fused_gather=True, frame_shape=frame_shape,
    )
    res_fused = psolve(vect0, params0, frames, fidx, pos0, origin, norm,
                       valid)
    np.testing.assert_allclose(
        np.asarray(res_fused.x), np.asarray(res_pix.x), rtol=0, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(res_fused.npix), np.asarray(res_pix.npix)
    )


def _rigid_scene(n, true_d=5.0, n_clusters=4, seed=11, size=2.5):
    """n_clusters rigid n-mers on a grid, perturbed initial guesses."""
    import pandas as pd
    import clustertracking_tpu.artificial as artificial

    rng = np.random.default_rng(seed)
    img = np.zeros((96, 96))
    centers = [(24, 24), (24, 70), (70, 24), (70, 70)][:n_clusters]
    rows, truth = [], []
    for c in centers:
        true = artificial.draw_cluster(
            img, c, size=size, separation=true_d, n=n, signal=180.0,
            angle=rng.uniform(0, np.pi),
        )
        truth.append(true)
        for p in true + rng.uniform(-0.3, 0.3, true.shape):
            rows.append({"frame": 0, "y": p[0], "x": p[1],
                         "signal": 180.0, "size": size})
    return img, pd.DataFrame(rows), np.concatenate(truth)


@pytest.mark.parametrize("n,conf", [
    (2, "dimer"), (3, "trimer"), (2, "dimer_global_cluster"),
])
def test_pallas_rigid_matches_xla(n, conf):
    """Rigid-constrained buckets in the kernel (pose chain rule inlined)
    must match the XLA rigid path lane-by-lane: same positions, same
    cost, geometry satisfied exactly."""
    import clustertracking_tpu as ct
    from clustertracking_tpu.constraints import dimer, dimer_global, trimer

    true_d = 5.0
    con = {
        "dimer": lambda: dimer(true_d, ndim=2),
        "trimer": lambda: trimer(true_d, ndim=2),
        "dimer_global_cluster": lambda: dimer_global(
            ndim=2, mode="cluster"
        ),
    }[conf]()
    img, f, truth = _rigid_scene(n, true_d)
    common = dict(diameter=9, separation=5.5, constraints=con,
                  param_val={"size": 2.5})
    out_x = ct.refine_leastsq(f, img, lm_backend="xla", **common)
    out_p = ct.refine_leastsq(f, img, lm_backend="pallas", **common)

    cols = ["y", "x", "signal", "size"]
    np.testing.assert_allclose(
        out_p[cols].to_numpy(), out_x[cols].to_numpy(),
        rtol=0, atol=5e-4,
    )
    # Noiseless scene: both paths converge to the f32 noise floor
    # (cost ~ 5e-7 = residuals at machine precision of the signal scale).
    # The rigid XLA path's pose-chain Jacobian rounds differently from
    # the kernel's inlined trig, so the ITERATE paths diverge (measured
    # 5-20 vs 15-32 iterations) while both land at the floor — the cost
    # comparison is therefore noise-floor-to-noise-floor, atol-bound.
    np.testing.assert_allclose(
        out_p["cost"].to_numpy(), out_x["cost"].to_numpy(),
        rtol=1e-3, atol=3e-7,
    )
    # geometry conserved EXACTLY by the pose parameterization
    pos = out_p[["y", "x"]].to_numpy().reshape(-1, n, 2)
    for cl in pos:
        d = np.linalg.norm(cl[None] - cl[:, None], axis=-1)
        off = d[~np.eye(n, dtype=bool)]
        if conf == "dimer_global_cluster":
            assert np.ptp(off) < 1e-4  # rigid within the cluster
            assert abs(off[0] - true_d) < 0.05  # learned length ~ truth
        else:
            np.testing.assert_allclose(off, true_d, atol=1e-4)
    # and ground truth recovered sub-pixel
    assert np.abs(pos.reshape(-1, 2) - truth).max() < 0.02


def test_pallas_rigid_fused_gather_matches():
    """Rigid kernel + in-kernel DMA gather (the TPU config-3 hot path):
    must agree with the rigid pixel-input kernel exactly."""
    import clustertracking_tpu as ct
    from clustertracking_tpu.constraints import dimer

    img, f, truth = _rigid_scene(2, 5.0)
    img = np.pad(img, ((0, 0), (0, 128 - img.shape[1] % 128)))
    common = dict(diameter=9, separation=5.5,
                  constraints=dimer(5.0, ndim=2),
                  param_val={"size": 2.5})
    out_x = ct.refine_leastsq(f, img, lm_backend="xla", **common)
    out_p = ct.refine_leastsq(f, img, lm_backend="pallas", **common)
    cols = ["y", "x", "signal", "size"]
    np.testing.assert_allclose(
        out_p[cols].to_numpy(), out_x[cols].to_numpy(), rtol=0, atol=5e-4
    )


def test_pallas_rigid_3d_dimer_matches_xla():
    """3D dimer axis pose inlined in the kernel (center + polar/azimuth
    trig chain rule) must match the XLA rigid path and conserve the bond
    exactly."""
    import pandas as pd
    import clustertracking_tpu as ct
    import clustertracking_tpu.artificial as artificial

    rng = np.random.default_rng(7)
    true_d = 5.0
    img = np.zeros((48, 64, 64))
    rows = []
    for c in [(20, 20, 20), (28, 44, 40)]:
        true = artificial.draw_cluster(
            img, np.asarray(c, float), size=2.0, separation=true_d,
            n=2, signal=150.0, angle=rng.uniform(0, np.pi),
        )
        for p in true + rng.uniform(-0.25, 0.25, true.shape):
            rows.append({"frame": 0, "z": p[0], "y": p[1], "x": p[2],
                         "signal": 150.0, "size": 2.0})
    f = pd.DataFrame(rows)
    con = ct.dimer(true_d, ndim=3)
    common = dict(diameter=9, separation=6, constraints=con,
                  param_val={"size": 2.0})
    out_x = ct.refine_leastsq(f, img, lm_backend="xla", **common)
    out_p = ct.refine_leastsq(f, img, lm_backend="pallas", **common)

    cols = ["z", "y", "x", "signal"]
    np.testing.assert_allclose(
        out_p[cols].to_numpy(), out_x[cols].to_numpy(),
        rtol=0, atol=1e-3,
    )
    pos = out_p[["z", "y", "x"]].to_numpy().reshape(-1, 2, 3)
    for cl in pos:
        d = np.linalg.norm(cl[0] - cl[1])
        assert abs(d - true_d) < 1e-4  # bond conserved exactly


def test_pallas_rigid_3d_tetramer_matches_xla():
    """3D rotation-vector pose (Rodrigues + SO(3) right Jacobian)
    inlined in the kernel: tetramer fits must match the XLA rigid path
    and conserve every edge exactly."""
    import pandas as pd
    import clustertracking_tpu as ct
    import clustertracking_tpu.artificial as artificial

    rng = np.random.default_rng(11)
    # small geometry keeps the dynamic window at (16,16,16) = 4096
    # voxels — within the kernel's VMEM residency; larger windows fall
    # back to the XLA path by design (pallas_available gates them)
    true_d = 3.2
    img = np.zeros((48, 64, 64))
    rows = []
    for c in [(22, 22, 22), (26, 44, 40)]:
        true = artificial.draw_cluster(
            img, np.asarray(c, float), size=1.5, separation=true_d,
            n=4, signal=150.0, angle=rng.uniform(0, np.pi),
        )
        for p in true + rng.uniform(-0.2, 0.2, true.shape):
            rows.append({"frame": 0, "z": p[0], "y": p[1], "x": p[2],
                         "signal": 150.0, "size": 1.5})
    f = pd.DataFrame(rows)
    con = ct.tetramer(true_d)
    common = dict(diameter=7, separation=4.0, constraints=con,
                  param_val={"size": 1.5})
    out_x = ct.refine_leastsq(f, img, lm_backend="xla", **common)
    out_p = ct.refine_leastsq(f, img, lm_backend="pallas", **common)

    cols = ["z", "y", "x", "signal"]
    np.testing.assert_allclose(
        out_p[cols].to_numpy(), out_x[cols].to_numpy(),
        rtol=0, atol=2e-3,
    )
    pos = out_p[["z", "y", "x"]].to_numpy().reshape(-1, 4, 3)
    for cl in pos:
        d = np.linalg.norm(cl[None] - cl[:, None], axis=-1)
        edges = d[~np.eye(4, dtype=bool)]
        np.testing.assert_allclose(edges, true_d, atol=1e-3)


def test_pallas_streaming_matches_resident():
    """HBM-streaming pixel path (VERDICT r2 item 2): forcing streaming
    on a window that also fits resident must give bit-identical results
    — streaming only changes where chunks are read from, not the math."""
    model, layout, fns, arrs, valid = _problem("gauss", 2)
    frames, fidx, params0 = arrs
    pos0 = params0[..., list(layout.pos_param_idx)]
    frame_shape = frames.shape[1:]
    origin = origins_for(pos0, WINDOW, frame_shape)

    def gather_one(fi, org):
        win = jax.lax.dynamic_slice(
            frames, (fi, org[0], org[1]), (1,) + WINDOW
        )
        return win.reshape(-1)

    pixels = jax.vmap(gather_one)(fidx, origin)
    norm = jnp.maximum(
        jnp.max(jnp.abs(params0[..., layout.signal_param_idx]), axis=1),
        1e-6,
    )
    vect0 = layout.vect_from_params(params0)
    V = layout.n_slots
    lo = np.full(V, -np.inf, np.float32)
    hi = np.full(V, np.inf, np.float32)
    for d, p in enumerate(layout.pos_param_idx):
        for s in layout.slot_idx[:, p]:
            if s >= 0:
                lo[s] = 0.0
                hi[s] = float(frame_shape[d] - 1)

    kw = dict(max_iter=MAX_IT, interpret=True, fused_gather=False,
              chunk_len=24)
    res_res = make_pallas_lm(
        model, layout, WINDOW, lo, hi, (3.0, 3.0), streaming=False, **kw
    )(vect0, params0, pixels, pos0, origin, norm, valid)
    res_str = make_pallas_lm(
        model, layout, WINDOW, lo, hi, (3.0, 3.0), streaming=True, **kw
    )(vect0, params0, pixels, pos0, origin, norm, valid)
    np.testing.assert_array_equal(
        np.asarray(res_str.x), np.asarray(res_res.x)
    )
    np.testing.assert_array_equal(
        np.asarray(res_str.n_iter), np.asarray(res_res.n_iter)
    )
    np.testing.assert_array_equal(
        np.asarray(res_str.cost), np.asarray(res_res.cost)
    )


def test_pallas_available_streams_large_windows():
    """Windows past the resident-VMEM gate are now covered (streaming)
    — the round-2 gate rejected them (VERDICT r2 item 2)."""
    model = get_model("gauss")
    layout = build_layout(model, 3, True, 4, {})
    # 32**3 = 32768 voxels: resident [Npix,128] f32 = 16.8 MB > VMEM
    assert pallas_available(model, layout, False, None, (32, 32, 32))
    # beyond the streaming cap still rejects
    assert not pallas_available(model, layout, False, None, (80, 80, 80))


def test_scoped_vmem_gate_and_mxu_crossover_routing():
    """High-slot buckets must never reach the kernel's failure modes.

    (a) Scoped-vmem model: dense ladder-16 chains (Vk=48, ~3.2k-px bbox
    windows, the shape the recovery pass produces at 10k features/frame)
    blow Mosaic's 16M stack on the RESIDENT path at any chunk length
    (measured 18.74M at CL=208 and 18.40M at CL=96 on v5e — the demand
    is ~12 loop-carried copies of the Hessian triangle, not chunk
    temporaries); the calibrated _scoped_demand model must reject
    resident and keep streaming viable (it compiles on hardware).

    (b) MXU crossover: even where the kernel compiles, the XLA path's
    matmul J^T J crushes the VPU row-reduction at high slot counts
    (measured Vk=24: 2,590 vs 84.6 solves/s; Vk=48: 1,383 vs 9.4 —
    benchmarks/probe_vmem.py), so unconstrained buckets at Vk >= 20
    route to ops/lm.py via pallas_available."""
    from clustertracking_tpu.ops.pallas_lm import (
        _pick_chunk, _pick_chunk_stream, _scoped_demand)

    assert _pick_chunk(48, 3200) == 0          # resident would OOM
    assert _pick_chunk_stream(48, 3200) > 0    # streaming compiles
    assert _pick_chunk(50, 2000) == 0
    assert _pick_chunk_stream(50, 2000) == 0   # past streaming too
    # model reproduces the measured OOM reports to ~0.1M
    assert abs(_scoped_demand(48, 208, 2 * 3200) - 18.74e6) < 2e5
    assert abs(_scoped_demand(48, 96, 2 * 3200) - 18.40e6) < 2e5
    # every shipped benchmark bucket keeps its resident path + chunk
    for vk, npix, cl in [(6, 169, 168), (11, 4096, 384),
                         (14, 1521, 384), (14, 4136, 384)]:
        assert _pick_chunk(vk, npix) == cl, (vk, npix)

    # (b): unconstrained chains of 8+ gauss features (Vk >= 24) go XLA;
    # config-4-class (Vk=14) and small clusters stay on the kernel
    model = get_model("gauss")
    assert not pallas_available(
        model, build_layout(model, 2, True, 8, {}), False, None)
    assert pallas_available(
        model, build_layout(model, 3, False, 2, {}), False, None)
    assert pallas_available(
        model, build_layout(model, 2, True, 4, {}), False, None)


def test_pallas_3d_multichunk_ctab_matches_xla():
    """Unconstrained 3D multi-chunk path (center-out voxel ordering +
    per-chunk mask skip): refine via the kernel must match the XLA
    solver on the same aniso z-stack dimers (the config-4 class)."""
    import pandas as pd
    import clustertracking_tpu as ct
    import clustertracking_tpu.artificial as artificial

    rng = np.random.default_rng(6)
    img = np.zeros((32, 48, 48))
    rows = []
    for c in [(14.0, 14.0, 14.0), (16.0, 34.0, 30.0)]:
        true = artificial.draw_cluster(
            img, np.asarray(c), size=(1.5, 2.2, 2.2), separation=4.5,
            n=2, signal=150.0, angle=rng.uniform(0, np.pi),
        )
        for p in true + rng.uniform(-0.2, 0.2, true.shape):
            rows.append({"frame": 0, "z": p[0], "y": p[1], "x": p[2],
                         "signal": 150.0})
    f = pd.DataFrame(rows)
    f["size_z"], f["size_y"], f["size_x"] = 1.4, 2.1, 2.1
    common = dict(
        diameter=(7, 9, 9), separation=5.0,
        param_mode={"size_z": "var", "size_y": "var", "size_x": "var"},
    )
    out_x = ct.refine_leastsq(f, img, lm_backend="xla", **common)
    out_p = ct.refine_leastsq(f, img, lm_backend="pallas", **common)
    assert out_p["cost"].notna().all()
    cols = ["z", "y", "x", "signal", "size_z", "size_y"]
    np.testing.assert_allclose(
        out_p[cols].to_numpy(), out_x[cols].to_numpy(),
        rtol=0, atol=2e-3,
    )
    true_all = np.array(
        [[14.0, 14.0, 14.0], [16.0, 34.0, 30.0]]
    )  # cluster centers; member positions checked via truth rows
    err = np.abs(
        out_p[["z", "y", "x"]].to_numpy().reshape(2, 2, 3).mean(axis=1)
        - true_all
    ).max()
    assert err < 0.05
