"""train_leastsq: learning 'global' model parameters from image data.

Reference parity (SURVEY.md §3.3): calibrate the trainable coefficients of
an experimental-PSF model (inv_series) against frames whose features were
drawn with KNOWN coefficients, then assert recovery.  Mixed cluster sizes
exercise the cross-bucket block-coordinate rounds.
"""
import numpy as np
import pandas as pd

import clustertracking_tpu as ct
from clustertracking_tpu import artificial

# ground-truth inverse-series PSF: 1 / (1 + a1 r2 + a2 r2²)
A1, A2 = 0.8, 0.25


def _psf(r2):
    return 1.0 / (1.0 + A1 * r2 + A2 * r2 * r2)


def _scene(mixed=True, n_spots=12, seed=3):
    rng = np.random.default_rng(seed)
    img = np.zeros((160, 160))
    rows = []
    k = 0
    # non-overlapping centers on a jittered grid (isolated spots unless
    # a dimer is drawn deliberately)
    grid = [
        (y, x)
        for y in range(25, 140, 28)
        for x in range(25, 140, 28)
    ]
    rng.shuffle(grid)
    centers = iter(grid)
    while k < n_spots:
        n = (2 if (mixed and k % 3 == 0) else 1)
        center = np.asarray(next(centers), float) + rng.uniform(-3, 3, 2)
        if n == 1:
            pos = np.atleast_2d(
                center + 0.0
            )
            artificial.draw_feature(img, pos[0], 2.0, 180.0, _psf,
                                    cutoff_sigmas=8.0)
        else:
            pos = artificial.draw_cluster(
                img, center, size=2.0, separation=5.0, n=2,
                signal=180.0, angle=rng.uniform(0, np.pi),
                feat_func=_psf, cutoff_sigmas=8.0,
            )
        for p in pos:
            rows.append({"frame": 0, "y": p[0], "x": p[1],
                         "signal": 180.0, "size": 2.0})
            k += 1
    return img, pd.DataFrame(rows)


def test_train_inv_series_recovers_coefficients():
    img, f = _scene(mixed=False)
    learned = ct.train_leastsq(
        f, img, diameter=11, separation=6,
        fit_function="inv_series_2",
        param_mode={"size": "const"},
    )
    assert abs(learned["coeff_1"] - A1) < 0.05
    assert abs(learned["coeff_2"] - A2) < 0.05


def test_train_mixed_cluster_sizes():
    """Cross-bucket joint training: singles AND dimers contribute to the
    same shared coefficients (block-coordinate rounds)."""
    img, f = _scene(mixed=True)
    learned = ct.train_leastsq(
        f, img, diameter=11, separation=6,
        fit_function="inv_series_2",
        param_mode={"size": "const"},
    )
    assert abs(learned["coeff_1"] - A1) < 0.07
    assert abs(learned["coeff_2"] - A2) < 0.07


def test_train_feeds_back_into_refine():
    """Learned params via param_val improve fits vs the default model."""
    img, f = _scene(mixed=False)
    learned = ct.train_leastsq(
        f, img, diameter=11, separation=6,
        fit_function="inv_series_2", param_mode={"size": "const"},
    )
    f0 = f.copy()
    f0["y"] += 0.3
    f0["x"] -= 0.2
    out = ct.refine_leastsq(
        f0, img, diameter=11, separation=6,
        fit_function="inv_series_2", param_mode={"size": "const"},
        param_val=learned,
    )
    err = np.hypot(out["y"] - f["y"], out["x"] - f["x"])
    assert float(err.max()) < 0.03


def test_train_joint_beats_mean_pooling():
    """VERDICT round-1 item 7: dissimilar buckets where count-weighted
    mean-pooling of per-bucket estimates demonstrably biases the shared
    coefficients, while the pooled-normal-equation joint solve weights
    buckets by information content and recovers truth.

    Scene: 20 dim singles (signal 18) whose const size is mis-calibrated
    (2.4 vs true 2.0 — their per-bucket coeff estimate compensates and
    lands far from truth) + 4 bright dimers (signal 220, correct size),
    Gaussian noise. Count weighting is 20:8 toward the biased bucket;
    information weighting is ~150:1 toward the correct one.
    """
    rng = np.random.default_rng(7)
    img = np.zeros((200, 200))
    rows = []
    grid = [(y, x) for y in range(20, 190, 24) for x in range(20, 190, 24)]
    rng.shuffle(grid)
    it = iter(grid)
    for _ in range(20):
        c = np.asarray(next(it), float) + rng.uniform(-3, 3, 2)
        artificial.draw_feature(img, c, 2.0, 18.0, _psf, cutoff_sigmas=8.0)
        rows.append({"frame": 0, "y": c[0], "x": c[1],
                     "signal": 18.0, "size": 2.4})
    for _ in range(4):
        c = np.asarray(next(it), float)
        pos = artificial.draw_cluster(
            img, c, size=2.0, separation=5.0, n=2, signal=220.0,
            angle=rng.uniform(0, np.pi), feat_func=_psf, cutoff_sigmas=8.0,
        )
        for p in pos:
            rows.append({"frame": 0, "y": p[0], "x": p[1],
                         "signal": 220.0, "size": 2.0})
    img = img + rng.normal(0, 2.0, img.shape)
    f = pd.DataFrame(rows)
    kw = dict(diameter=11, separation=6, fit_function="inv_series_2",
              param_mode={"size": "const"})

    joint = ct.train_leastsq(f, img, **kw)
    assert abs(joint["coeff_1"] - A1) < 0.03
    assert abs(joint["coeff_2"] - A2) < 0.03

    # what accepted-count-weighted mean pooling (the round-1 scheme)
    # would produce from the two per-bucket estimates
    f_cl = ct.find_clusters(f, 6)
    fs = f_cl[f_cl.cluster_size == 1]
    fd = f_cl[f_cl.cluster_size == 2]
    es = ct.train_leastsq(fs, img, **kw)
    ed = ct.train_leastsq(fd, img, **kw)
    ns, nd = len(fs), len(fd)
    pooled = {k: (ns * es[k] + nd * ed[k]) / (ns + nd) for k in es}
    assert abs(pooled["coeff_1"] - A1) > 0.1   # mean pooling is biased
    assert abs(pooled["coeff_2"] - A2) > 0.1


def test_train_with_mesh():
    """train_leastsq's refit rounds run mesh-sharded when a mesh is
    passed (the kwarg flows to refine_leastsq); learned coefficients
    must match the single-device result."""
    import jax

    from clustertracking_tpu.parallel.sharding import make_mesh

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs a multi-device (virtual) mesh")
    img, f = _scene(mixed=False, n_spots=8)
    kw = dict(diameter=13, separation=14.0, fit_function="inv_series_2",
              max_rounds=2)
    learned_1 = ct.train_leastsq(f, img, **kw)
    learned_m = ct.train_leastsq(f, img, mesh=make_mesh(), **kw)
    for k in learned_1:
        assert abs(learned_m[k] - learned_1[k]) < 1e-3, (
            k, learned_m[k], learned_1[k]
        )
    assert abs(learned_m["coeff_1"] - A1) < 0.05
