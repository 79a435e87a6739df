"""Constrained fits: exact geometry conservation + ground-truth recovery
(SURVEY.md §4: constrained dimers/trimers/tetramers; geometry conserved)."""
import numpy as np
import pandas as pd
import pytest

import clustertracking_tpu as ct
from clustertracking_tpu import artificial
from clustertracking_tpu.constraints import (
    base_vertices,
    dimer,
    dimer_global,
    pose_to_positions,
    positions_to_pose,
    tetramer,
    trimer,
)


def _pairwise_min(pos):
    d = np.linalg.norm(pos[None] - pos[:, None], axis=-1)
    return np.where(np.eye(len(pos), dtype=bool), np.inf, d).min()


def test_pose_roundtrip_2d():
    import jax.numpy as jnp

    con = trimer(5.0, ndim=2)
    rng = np.random.default_rng(0)
    pos = np.asarray(
        pose_to_positions(
            jnp.asarray(
                np.array([[20.0, 25.0, 0.7]], dtype=np.float32)
            ),
            con,
        )
    )
    pose = positions_to_pose(pos, con)
    pos2 = np.asarray(
        pose_to_positions(jnp.asarray(pose.astype(np.float32)), con)
    )
    np.testing.assert_allclose(pos, pos2, atol=1e-5)
    # edge length is exactly the constraint distance
    assert _pairwise_min(pos[0]) == pytest.approx(5.0, rel=1e-6)


def test_pose_roundtrip_3d_tetramer():
    import jax.numpy as jnp

    con = tetramer(4.0)
    pose = np.array([[12.0, 13.0, 11.0, 0.3, -0.5, 0.8]], np.float32)
    pos = np.asarray(pose_to_positions(jnp.asarray(pose), con))
    d = np.linalg.norm(pos[0, None] - pos[0][:, None, :], axis=-1)
    off = d[~np.eye(4, dtype=bool)]
    np.testing.assert_allclose(off, 4.0, rtol=1e-5)  # all 6 edges equal
    pose2 = positions_to_pose(pos, con)
    pos2 = np.asarray(
        pose_to_positions(jnp.asarray(pose2.astype(np.float32)), con)
    )
    np.testing.assert_allclose(pos, pos2, atol=1e-4)


def test_constrained_dimer_fit():
    """Fixed-distance dimer: recovered geometry satisfies the constraint
    EXACTLY and positions match ground truth sub-pixel."""
    img = np.zeros((64, 64))
    true = artificial.draw_cluster(
        img, (32, 32), size=3.0, separation=5.0, n=2, signal=200.0,
        angle=0.8,
    )
    rng = np.random.default_rng(2)
    f = pd.DataFrame(true + rng.uniform(-0.4, 0.4, true.shape),
                     columns=["y", "x"])
    f["frame"] = 0
    out = ct.refine_leastsq(
        f, img, diameter=9, separation=5.5,
        constraints=dimer(5.0, ndim=2), param_val={"size": 3.0},
    )
    pos = out[["y", "x"]].to_numpy()
    assert np.linalg.norm(pos[0] - pos[1]) == pytest.approx(5.0, abs=1e-4)
    assert np.abs(pos - true).max() < 0.01


def test_constrained_trimer_fit():
    img = np.zeros((64, 64))
    true = artificial.draw_cluster(
        img, (32, 32), size=2.5, separation=5.0, n=3, signal=200.0,
        angle=0.4,
    )
    rng = np.random.default_rng(3)
    f = pd.DataFrame(true + rng.uniform(-0.4, 0.4, true.shape),
                     columns=["y", "x"])
    f["frame"] = 0
    out = ct.refine_leastsq(
        f, img, diameter=9, separation=5.5,
        constraints=trimer(5.0, ndim=2), param_val={"size": 2.5},
    )
    pos = out[["y", "x"]].to_numpy()
    d = np.linalg.norm(pos[None] - pos[:, None], axis=-1)
    np.testing.assert_allclose(
        d[~np.eye(3, dtype=bool)], 5.0, atol=1e-4
    )
    assert np.abs(pos - true).max() < 0.01


def test_constrained_tetramer_fit_3d():
    img = np.zeros((28, 28, 28))
    true = artificial.draw_cluster(
        img, (14, 14, 14), size=1.8, separation=3.5, n=4, signal=150.0,
        angle=0.3,
    )
    rng = np.random.default_rng(4)
    f = pd.DataFrame(true + rng.uniform(-0.3, 0.3, true.shape),
                     columns=["z", "y", "x"])
    f["frame"] = 0
    out = ct.refine_leastsq(
        f, img, diameter=7, separation=4.0,
        constraints=tetramer(3.5), param_val={"size": 1.8},
    )
    pos = out[["z", "y", "x"]].to_numpy()
    d = np.linalg.norm(pos[None] - pos[:, None], axis=-1)
    np.testing.assert_allclose(
        d[~np.eye(4, dtype=bool)], 3.5, atol=1e-3
    )
    assert np.abs(pos - true).max() < 0.05


def test_dimer_global_learns_shared_distance():
    """dimer_global: one shared bond length learned across all clusters."""
    img = np.zeros((96, 96))
    rng = np.random.default_rng(5)
    true_d = 5.0
    centers = [(20, 20), (20, 70), (70, 20), (70, 70), (45, 45)]
    all_true = []
    f_rows = []
    for i, c in enumerate(centers):
        true = artificial.draw_cluster(
            img, c, size=2.5, separation=true_d, n=2, signal=150.0,
            angle=rng.uniform(0, np.pi),
        )
        all_true.append(true)
        f_rows.append(true + rng.uniform(-0.3, 0.3, true.shape))
    f = pd.DataFrame(np.concatenate(f_rows), columns=["y", "x"])
    f["frame"] = 0
    out = ct.refine_leastsq(
        f, img, diameter=9, separation=5.5,
        constraints=dimer_global(ndim=2), param_val={"size": 2.5},
    )
    pos = out[["y", "x"]].to_numpy().reshape(-1, 2, 2)
    dists = np.linalg.norm(pos[:, 0] - pos[:, 1], axis=-1)
    # all clusters share ONE fitted distance, close to truth
    assert np.ptp(dists) < 1e-3
    assert abs(dists[0] - true_d) < 0.02
    assert np.abs(pos - np.stack(all_true)).max() < 0.05


def test_generic_constraint_dict():
    """Reference-style {'type':'eq','fun':...} dict → penalty rows."""
    import jax.numpy as jnp

    img = np.zeros((64, 64))
    true = artificial.draw_cluster(
        img, (32, 32), size=3.0, separation=5.0, n=2, signal=200.0,
        angle=0.8,
    )
    f = pd.DataFrame(true + 0.3, columns=["y", "x"])
    f["frame"] = 0

    def bond_length(pos, target):
        return jnp.linalg.norm(pos[0] - pos[1]) - target

    out = ct.refine_leastsq(
        f, img, diameter=9, separation=5.5,
        constraints={"type": "eq", "fun": bond_length, "args": (5.0,),
                     "cluster_size": 2},
        param_val={"size": 3.0},
    )
    pos = out[["y", "x"]].to_numpy()
    # penalty weight sqrt(1e5) → constraint satisfied to ~1e-5 relative
    assert np.linalg.norm(pos[0] - pos[1]) == pytest.approx(5.0, abs=1e-3)
    assert np.abs(pos - true).max() < 0.02


def test_constraint_wrong_ndim_raises():
    with pytest.raises(ValueError):
        ct.refine_leastsq(
            pd.DataFrame({"y": [1.0], "x": [1.0], "frame": [0]}),
            np.zeros((16, 16)),
            diameter=5,
            constraints=dimer(3.0, ndim=3),
        )


def test_constrained_compute_error():
    """compute_error with a rigid constraint: position stds come from the
    delta method through the pose map — finite, positive, right order."""
    img = np.zeros((64, 64))
    true = artificial.draw_cluster(
        img, (32, 32), size=3.0, separation=5.0, n=2, signal=200.0,
        angle=0.8,
    )
    img += np.random.default_rng(8).normal(0, 2.0, img.shape)
    rng = np.random.default_rng(9)
    f = pd.DataFrame(true + rng.uniform(-0.3, 0.3, true.shape),
                     columns=["y", "x"])
    f["frame"] = 0
    out = ct.refine_leastsq(
        f, img, diameter=9, separation=5.5,
        constraints=dimer(5.0, ndim=2), param_val={"size": 3.0},
        compute_error=True,
    )
    assert "y_std" in out.columns
    assert np.isfinite(out["y_std"]).all()
    assert (out["y_std"] > 0).all()
    assert (out["y_std"] < 0.3).all()
    # signal is an unconstrained slot: still mapped directly
    assert np.isfinite(out["signal_std"]).all()


def test_dimer_global_whole_video_single_distance():
    """VERDICT r2 item 6: dimer_global must learn ONE bond length for
    the WHOLE video, not one per frames_per_dispatch chunk.  Two 2-frame
    dispatches whose per-chunk data would individually converge to
    different distances (few noisy dimers in chunk 2 vs many clean in
    chunk 1) must end with a single shared distance near truth on every
    cluster of every frame."""
    rng = np.random.default_rng(9)
    true_d = 5.0
    T = 4
    frames = np.zeros((T, 96, 96), np.float32)
    rows = []
    for t in range(T):
        # chunk 1 (frames 0-1): 4 clean dimers; chunk 2 (frames 2-3):
        # 1 noisy dimer -> its chunk-local estimate would be biased
        centers = ([(20, 20), (20, 70), (70, 20), (70, 70)]
                   if t < 2 else [(45, 45)])
        for c in centers:
            true = artificial.draw_cluster(
                frames[t], c, size=2.5, separation=true_d, n=2,
                signal=150.0, angle=rng.uniform(0, np.pi),
            )
            for p in true + rng.uniform(-0.3, 0.3, true.shape):
                rows.append({"frame": t, "y": p[0], "x": p[1],
                             "signal": 150.0})
        if t >= 2:
            frames[t] += rng.normal(0, 6.0, frames[t].shape
                                    ).astype(np.float32)
    f = pd.DataFrame(rows)
    out = ct.refine_leastsq(
        f, frames, diameter=9, separation=5.5,
        constraints=dimer_global(ndim=2), param_val={"size": 2.5},
        frames_per_dispatch=2,
    )
    ok = out["cost"].notna()
    assert ok.all(), "fits rejected"
    pos = out[["y", "x"]].to_numpy().reshape(-1, 2, 2)
    dists = np.linalg.norm(pos[:, 0] - pos[:, 1], axis=-1)
    # ONE distance across BOTH dispatches (the round-2 gap: ptp was
    # zero within a chunk but chunk means differed)
    assert np.ptp(dists) < 1e-3, dists
    assert abs(float(np.mean(dists)) - true_d) < 0.05
    assert abs(out.attrs["global_dist"] - true_d) < 0.05


def test_two_global_distance_constraints_coexist():
    """VERDICT r3 item 8: EVERY dist_mode='global' constraint gets the
    whole-video joint solve, not just the first — dimers and trimers
    with two distinct true bond lengths must each recover their own,
    and each joint refit touches only its own cluster-size's rows."""
    from clustertracking_tpu.constraints import Constraint

    rng = np.random.default_rng(12)
    d_dimer, d_trimer = 5.0, 6.5
    T = 2
    frames = np.zeros((T, 128, 128), np.float32)
    rows = []
    for t in range(T):
        for c in [(20, 20), (20, 100), (100, 60)]:
            true = artificial.draw_cluster(
                frames[t], c, size=2.5, separation=d_dimer, n=2,
                signal=150.0, angle=rng.uniform(0, np.pi),
            )
            for p in true + rng.uniform(-0.3, 0.3, true.shape):
                rows.append({"frame": t, "y": p[0], "x": p[1],
                             "signal": 150.0})
        for c in [(64, 24), (100, 110)]:
            true = artificial.draw_cluster(
                frames[t], c, size=2.5, separation=d_trimer, n=3,
                signal=150.0, angle=rng.uniform(0, np.pi),
            )
            for p in true + rng.uniform(-0.3, 0.3, true.shape):
                rows.append({"frame": t, "y": p[0], "x": p[1],
                             "signal": 150.0})
    f = pd.DataFrame(rows)
    trimer_global = Constraint(
        "rigid", 3, 2, None, dist_mode="global", name="trimer_global"
    )
    out = ct.refine_leastsq(
        f, frames, diameter=9, separation=7.5,
        constraints=[dimer_global(ndim=2), trimer_global],
        param_val={"size": 2.5},
    )
    assert out["cost"].notna().all(), "fits rejected"
    # each class recovered ITS OWN shared distance
    gd = out.attrs["global_dists"]
    assert abs(gd[2] - d_dimer) < 0.05, gd
    assert abs(gd[3] - d_trimer) < 0.05, gd
    p2 = out[out["cluster_size"] == 2][["y", "x"]].to_numpy()
    p2 = p2.reshape(-1, 2, 2)
    dist2 = np.linalg.norm(p2[:, 0] - p2[:, 1], axis=-1)
    assert np.ptp(dist2) < 1e-3 and abs(dist2.mean() - d_dimer) < 0.05
    p3 = out[out["cluster_size"] == 3][["y", "x"]].to_numpy()
    p3 = p3.reshape(-1, 3, 2)
    e3 = np.concatenate([
        np.linalg.norm(p3[:, i] - p3[:, j], axis=-1)
        for i, j in [(0, 1), (0, 2), (1, 2)]
    ])
    assert np.ptp(e3) < 1e-2 and abs(e3.mean() - d_trimer) < 0.05
