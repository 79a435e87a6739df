"""Multi-chip via the USER-FACING API (VERDICT r2 item 1).

refine_leastsq / link / track take ``mesh=`` and must produce the same
results as the single-device path — verified lane-for-lane on the
8-device virtual CPU mesh (conftest.py).  The reference has no parallel
counterpart (SURVEY.md §2); the contract being tested is OUR invariance
guarantee: sharding is a deployment knob, never a semantics change.
"""
import jax
import numpy as np
import pandas as pd
import pytest
from scipy.spatial import cKDTree

import clustertracking_tpu as ct
from clustertracking_tpu import artificial
from clustertracking_tpu.parallel.sharding import make_mesh


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs a multi-device (virtual) mesh")
    return make_mesh(devs)


def _dimer_video(T=4, shape=(80, 80), seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    centers = np.array([[20.0, 20.0], [20.0, 60.0], [60.0, 40.0]])
    angles = np.array([0.3, 1.2, 2.0])
    for t in range(T):
        for k in range(len(centers)):
            u = np.array([np.sin(angles[k]), np.cos(angles[k])])
            for s in (1, -1):
                p = centers[k] + s * 2.5 * u
                rows.append(
                    {"frame": t, "y": p[0], "x": p[1], "signal": 200.0}
                )
        centers += rng.normal(0, 0.3, centers.shape)
        angles += rng.normal(0, 0.05, angles.shape)
    truth = pd.DataFrame(rows)
    return truth, artificial.CoordinateReader(truth, shape, size=2.0)


def _perturbed(truth, seed=7):
    rng = np.random.default_rng(seed)
    f = truth.copy()
    f[["y", "x"]] += rng.uniform(-0.3, 0.3, (len(f), 2))
    return f.drop(columns=["signal"])


def test_refine_mesh_matches_single_device(mesh):
    truth, reader = _dimer_video()
    f = _perturbed(truth)
    kw = dict(diameter=7, separation=6.0, param_val={"size": 2.0})
    out1 = ct.refine_leastsq(f, reader, **kw)
    outm = ct.refine_leastsq(f, reader, mesh=mesh, **kw)
    for col in ["y", "x", "signal", "cost"]:
        np.testing.assert_allclose(
            outm[col].to_numpy(), out1[col].to_numpy(),
            rtol=1e-5, atol=1e-5, err_msg=col,
        )
    assert (outm["fit_converged"] == out1["fit_converged"]).all()


def test_refine_mesh_global_tie_across_devices(mesh):
    """'global'-mode slots must tie across ALL lanes — under the mesh
    that tie is a cross-device all-reduce (the collective SURVEY.md §5
    prescribes)."""
    truth, reader = _dimer_video(T=4)
    f = _perturbed(truth, seed=3)
    kw = dict(
        diameter=7, separation=6.0, param_mode={"size": "global"},
        param_val={"size": 2.2}, frames_per_dispatch=4,
    )
    outm = ct.refine_leastsq(f, reader, mesh=mesh, **kw)
    sizes = outm.loc[outm["cost"].notna(), "size"].to_numpy()
    assert sizes.size
    assert np.ptp(sizes) < 1e-5, "global slot not tied across shards"
    # and it agrees with the single-device estimate
    out1 = ct.refine_leastsq(f, reader, **kw)
    np.testing.assert_allclose(
        sizes.mean(),
        out1.loc[out1["cost"].notna(), "size"].mean(),
        rtol=1e-4,
    )


def test_link_mesh_matches_host(mesh):
    rng = np.random.default_rng(11)
    T, N = 16, 6
    pos = np.cumsum(
        np.concatenate(
            [rng.uniform(10, 90, (1, N, 2)),
             rng.normal(0, 0.3, (T - 1, N, 2))]
        ),
        axis=0,
    )
    rows = []
    for t in range(T):
        for k in range(N):
            rows.append({"frame": t, "y": pos[t, k, 0],
                         "x": pos[t, k, 1]})
    f = pd.DataFrame(rows)
    out_h = ct.link(f, 3.0, backend="host")
    out_m = ct.link(f, 3.0, mesh=mesh)
    assert out_m["particle"].nunique() == N
    # identical partitions (ids may be renumbered)
    pairs = set(zip(out_h["particle"], out_m["particle"]))
    assert len(pairs) == N


def test_track_mesh_end_to_end(mesh):
    truth, reader = _dimer_video(T=6)
    out = ct.track(
        reader, diameter=7, separation=6.0, search_range=2.0,
        param_val={"size": 2.0}, threshold=20.0, mesh=mesh,
    )
    counts = out.groupby("particle").size()
    assert out["particle"].nunique() == 6
    assert (counts == truth["frame"].nunique()).all()
    for t in sorted(truth["frame"].unique()):
        got = out[out["frame"] == t][["y", "x"]].to_numpy()
        want = truth[truth["frame"] == t][["y", "x"]].to_numpy()
        d, _ = cKDTree(want).query(got)
        assert d.max() < 0.01


def test_checkpoint_with_recover_passes(tmp_path):
    """VERDICT r2 item 9: recover_passes must compose with
    checkpoint_dir (per-chunk recovery) instead of being silently
    dropped."""
    rng = np.random.default_rng(4)
    T = 4
    rows = []
    for t in range(T):
        for c in [(24.0, 24.0), (24.0, 72.0), (72.0, 40.0)]:
            pos = artificial.gen_cluster_locations(
                np.asarray(c) + rng.uniform(-1, 1, 2), 2,
                hard_radius=1.75, ndim=2, angle=rng.uniform(0, np.pi),
            )
            for p in pos:
                rows.append({"frame": t, "y": p[0], "x": p[1],
                             "signal": 150.0})
    truth = pd.DataFrame(rows)
    reader = [
        artificial.draw_spots(
            (96, 96),
            truth[truth["frame"] == t][["y", "x"]].to_numpy(),
            1.6, 150.0,
        ).astype(np.float32)
        for t in range(T)
    ]
    kw = dict(
        diameter=9, separation=6, search_range=3.0,
        param_val={"size": 1.6}, param_mode={"size": "const"},
        recover_passes=1, checkpoint_every=2,
    )
    out_ck = ct.track(reader, checkpoint_dir=str(tmp_path), **kw)
    # recovery must have found the hidden partners of the blended pairs
    assert len(out_ck) == len(truth)
    for t in range(T):
        got = out_ck[out_ck["frame"] == t][["y", "x"]].to_numpy()
        want = truth[truth["frame"] == t][["y", "x"]].to_numpy()
        d, _ = cKDTree(got).query(want, k=1)
        assert d.max() < 0.25
