"""Full-pipeline integration: CoordinateReader fake video → find → refine
→ link → motion, asserting against the generating coordinates — the
reference's "video test without a real microscope" (SURVEY.md §3.5, §4)."""
import numpy as np
import pandas as pd
import pytest

import clustertracking_tpu as ct
from clustertracking_tpu import artificial, motion


def _make_video(T=12, n_dimers=3, seed=0, noise=0.0):
    """Rigid dimers random-walking over T frames; returns (truth_df,
    reader)."""
    rng = np.random.default_rng(seed)
    sep = 5.0
    centers = rng.uniform(15, 80, (n_dimers, 2))
    angles = rng.uniform(0, np.pi, n_dimers)
    rows = []
    for t in range(T):
        for k in range(n_dimers):
            u = np.array([np.sin(angles[k]), np.cos(angles[k])])
            for s in (+1, -1):
                p = centers[k] + s * (sep / 2) * u
                rows.append(
                    {"frame": t, "y": p[0], "x": p[1], "signal": 200.0,
                     "dimer": k}
                )
        centers += rng.normal(0, 0.4, centers.shape)
        angles += rng.normal(0, 0.1, n_dimers)
    truth = pd.DataFrame(rows)
    reader = artificial.CoordinateReader(
        truth, (96, 96), size=2.5, noise_level=noise
    )
    return truth, reader


def test_full_pipeline_noiseless():
    truth, reader = _make_video()
    # initial guesses: truth + perturbation (stand-in for a locator)
    rng = np.random.default_rng(1)
    f0 = truth.copy()
    f0["y"] += rng.uniform(-0.3, 0.3, len(f0))
    f0["x"] += rng.uniform(-0.3, 0.3, len(f0))
    f0 = f0.drop(columns=["signal"])

    refined = ct.refine_leastsq(
        f0, reader, diameter=9, separation=6.0, param_val={"size": 2.5}
    )
    assert refined["cost"].notna().all()
    err = np.abs(
        refined[["y", "x"]].to_numpy() - truth[["y", "x"]].to_numpy()
    )
    assert err.max() < 0.01  # sub-pixel on every feature of every frame

    linked = ct.link(refined, search_range=2.5)
    # each of the 6 physical particles forms one full-length track
    counts = linked.groupby("particle").size()
    assert (counts == truth["frame"].nunique()).all()
    assert linked["particle"].nunique() == 6


def test_full_pipeline_with_noise_and_motion():
    truth, reader = _make_video(T=16, n_dimers=2, noise=3.0, seed=2)
    rng = np.random.default_rng(3)
    f0 = truth.copy()
    f0["y"] += rng.uniform(-0.3, 0.3, len(f0))
    f0["x"] += rng.uniform(-0.3, 0.3, len(f0))
    f0 = f0.drop(columns=["signal"])

    refined = ct.refine_leastsq(
        f0, reader, diameter=9, separation=6.0, param_val={"size": 2.5}
    )
    ok = refined["cost"].notna()
    assert ok.mean() > 0.9
    err = np.abs(
        refined.loc[ok, ["y", "x"]].to_numpy()
        - truth.loc[ok, ["y", "x"]].to_numpy()
    )
    assert np.sqrt((err**2).mean()) < 0.1  # sub-pixel under noise

    linked = ct.link(refined[ok], search_range=2.5)
    traj = motion.cluster_trajectories(linked)
    assert traj["cluster_size"].eq(2).mean() > 0.9


def test_pipeline_three_frame_chunks():
    """Frame chunking must not change results (dispatch invariance)."""
    truth, reader = _make_video(T=6, n_dimers=2)
    rng = np.random.default_rng(4)
    f0 = truth.drop(columns=["signal"]).copy()
    f0["y"] += rng.uniform(-0.2, 0.2, len(f0))
    f0["x"] += rng.uniform(-0.2, 0.2, len(f0))
    kw = dict(diameter=9, separation=6.0, param_val={"size": 2.5})
    out_a = ct.refine_leastsq(f0, reader, frames_per_dispatch=8, **kw)
    out_b = ct.refine_leastsq(f0, reader, frames_per_dispatch=2, **kw)
    np.testing.assert_allclose(
        out_a[["y", "x"]].to_numpy(), out_b[["y", "x"]].to_numpy(),
        atol=1e-5,
    )
