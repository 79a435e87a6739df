"""Motion analysis: recover known diffusion constants from synthetic rigid
Brownian trajectories (SURVEY.md §4 motion tests)."""
import numpy as np
import pandas as pd
import pytest

from clustertracking_tpu import link, motion


def _brownian_dimer(D_trans=0.05, D_rot=0.02, T=400, sep=5.0, seed=0):
    """Synthesize a rigid dimer doing translational+rotational Brownian
    motion (unit timestep): returns a linked-features-style DataFrame."""
    rng = np.random.default_rng(seed)
    center = np.array([50.0, 50.0])
    theta = 0.3
    rows = []
    for t in range(T):
        u = np.array([np.sin(theta), np.cos(theta)])
        for i, s in enumerate((+1, -1)):
            p = center + s * (sep / 2) * u
            rows.append(
                {"frame": t, "y": p[0], "x": p[1], "cluster": 0,
                 "particle": i}
            )
        center = center + rng.normal(0, np.sqrt(2 * D_trans), 2)
        theta = theta + rng.normal(0, np.sqrt(2 * D_rot))
    return pd.DataFrame(rows)


def test_cluster_trajectories_structure():
    f = _brownian_dimer(T=10)
    traj = motion.cluster_trajectories(f)
    assert len(traj) == 10
    assert {"y", "x", "angle", "cluster_traj"} <= set(traj.columns)
    assert traj["cluster_size"].eq(2).all()


def test_orientation_angle():
    f = pd.DataFrame(
        {"frame": [0, 0], "y": [10.0, 10.0], "x": [12.0, 8.0],
         "cluster": [0, 0], "particle": [0, 1]}
    )
    traj = motion.cluster_trajectories(f)
    # member 0 sits along +x from the center → angle 0
    assert traj["angle"].iloc[0] == pytest.approx(0.0, abs=1e-9)


def test_recover_diffusion_constants():
    D_trans, D_rot = 0.05, 0.02
    f = _brownian_dimer(D_trans, D_rot, T=600)
    est = motion.diffusion_constants(f, max_lagtime=4)
    assert est["n_steps"] > 1000
    assert est["D_trans"] == pytest.approx(D_trans, rel=0.25)
    assert est["D_rot"] == pytest.approx(D_rot, rel=0.25)


def test_body_frame_displacements():
    f = _brownian_dimer(T=50)
    traj = motion.cluster_trajectories(f)
    steps = motion.body_frame_displacements(traj)
    assert len(steps) == 49
    assert {"d_par", "d_perp", "d_angle"} <= set(steps.columns)
    # magnitudes consistent with lab-frame displacement
    lab = np.diff(traj.sort_values("frame")[["y", "x"]].to_numpy(), axis=0)
    body = steps[["d_par", "d_perp"]].to_numpy()
    np.testing.assert_allclose(
        np.linalg.norm(lab, axis=1), np.linalg.norm(body, axis=1),
        rtol=1e-6,
    )


def test_msd_linear_in_lag():
    f = _brownian_dimer(D_trans=0.05, D_rot=0.0, T=800)
    traj = motion.cluster_trajectories(f)
    m = motion.msd(traj, ["y", "x"], max_lagtime=5)
    slopes = m["msd"] / m["lagt"]
    assert slopes.std() / slopes.mean() < 0.2  # roughly linear
