"""Realistic-frame robustness tier (VERDICT r4 item 5 + missing item 2).

The reference workflow's candidate stage is trackpy.locate, whose
default pipeline BAND-PASSES (boxcar background subtraction + Gaussian
smoothing) before grey dilation — that is what makes it usable on real
microscopy with uneven illumination, uint8/uint16 camera dtypes, and
clipped (saturated) peaks.  This tier pins: (1) raw-threshold locate
demonstrably fails on a vignetted background (flood of false
candidates), (2) ``preprocess='bandpass'`` rescues it, (3) the per-tile
threshold map handles residual non-uniformity, (4) integer camera
dtypes flow through locate+refine, (5) saturated peaks still refine to
sub-pixel positions (symmetric clipping preserves the centroid).
"""
import numpy as np
import pandas as pd
from scipy.spatial import cKDTree

import clustertracking_tpu as ct
from clustertracking_tpu import artificial


def _vignetted_scene(seed=5, n_feat=24, signal=25.0, noise=2.0):
    """Dark frame with a bright flat-topped illumination blob (inverse
    vignetting): the frame-global MAD floor lands at the DARK background
    level, so every noise local-max inside the bright plateau clears it
    — the flood failure mode of thresholding raw pixels — while features
    in the dark field near the blob starve."""
    rng = np.random.default_rng(seed)
    H = W = 256
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    r = np.sqrt((yy - 128.0) ** 2 + (xx - 128.0) ** 2)
    bg = 100.0 * np.exp(-0.5 * (r / 70.0) ** 6)
    img = bg.copy()
    truth = []
    for k in range(n_feat):
        pos = (
            float(rng.uniform(16, H - 16)), float(rng.uniform(16, W - 16))
        )
        artificial.draw_feature(img, pos, 1.6, signal)
        truth.append(pos)
    img += rng.normal(0, noise, img.shape).astype(np.float32)
    return img.astype(np.float32), np.asarray(truth)


def _score(f, truth, r=2.0):
    if not len(f):
        return 0, 0
    pos = f[["y", "x"]].to_numpy()
    d, _ = cKDTree(truth).query(pos, k=1)
    ghosts = int((d > r).sum())
    d2, _ = cKDTree(pos).query(truth, k=1)
    found = int((d2 < r).sum())
    return found, ghosts


def test_raw_locate_floods_on_vignette():
    """The failure mode exists: raw thresholds flood the bright blob."""
    img, truth = _vignetted_scene()
    f_raw = ct.locate(img, diameter=9, separation=(5, 5),
                      max_features=4096)
    _, ghosts = _score(f_raw, truth)
    assert ghosts > 10 * len(truth), (
        f"expected the raw path to flood (>10x false candidates), "
        f"got {ghosts} ghosts for {len(truth)} truth"
    )


def test_bandpass_locate_rescues_vignette():
    img, truth = _vignetted_scene()
    f_bp = ct.locate(img, diameter=9, separation=(5, 5),
                     max_features=4096, preprocess="bandpass")
    found, ghosts = _score(f_bp, truth)
    assert found >= 0.9 * len(truth), (found, len(truth))
    assert ghosts <= 0.2 * len(truth), ghosts


def test_tile_threshold_rescues_vignette():
    """The per-tile (local background + local noise) floor alone — no
    bandpass — also stops the flood: each tile's threshold sits above
    its own local background."""
    img, truth = _vignetted_scene()
    f_t = ct.locate(img, diameter=9, separation=(5, 5),
                    max_features=4096, threshold_tile=16)
    found, ghosts = _score(f_t, truth)
    assert found >= 0.9 * len(truth), (found, len(truth))
    assert ghosts <= 0.2 * len(truth), ghosts


def test_track_bandpass_on_vignetted_video():
    """End-to-end: track() with preprocess='bandpass' on a vignetted
    uint16 video recovers the features the raw path drowns."""
    rng = np.random.default_rng(9)
    H = W = 192
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    bg = 80.0 * np.exp(
        -((yy - 96.0) ** 2 + (xx - 96.0) ** 2) / (2.0 * 30.0**2)
    )
    n_frames, n_feat = 3, 12
    start = rng.uniform(20, H - 20, (n_feat, 2))
    frames = []
    truth_rows = []
    for t in range(n_frames):
        img = bg.copy()
        for k in range(n_feat):
            p = start[k] + 0.3 * t
            artificial.draw_feature(img, p, 1.6, 60.0)
            truth_rows.append({"frame": t, "y": p[0], "x": p[1]})
        img += rng.normal(0, 2.0, img.shape)
        frames.append(
            np.clip(img * 50.0, 0, 65535).astype(np.uint16)
        )
    truth = pd.DataFrame(truth_rows)
    out = ct.track(
        frames, diameter=9, separation=6, search_range=3.0,
        preprocess="bandpass", max_features=256,
    )
    ok = out[out["cost"].notna()]
    for t in range(n_frames):
        tr = truth[truth["frame"] == t][["y", "x"]].to_numpy()
        ot = ok[ok["frame"] == t][["y", "x"]].to_numpy()
        assert len(ot), f"frame {t}: nothing tracked"
        d, _ = cKDTree(ot).query(tr, k=1)
        assert (d < 1.0).sum() >= 0.8 * len(tr), (t, (d < 1.0).sum())


def test_uint8_dtype_flows_through():
    """uint8 camera frames (pims bread-and-butter) locate + refine."""
    img = np.zeros((96, 96), np.float32)
    truth = [(30.3, 40.6), (60.7, 25.2), (70.1, 70.9)]
    for p in truth:
        artificial.draw_feature(img, p, 1.8, 120.0)
    img8 = np.clip(img + 10.0, 0, 255).astype(np.uint8)
    f = ct.locate(img8, diameter=9, separation=(5, 5))
    assert len(f) == 3, f
    f["frame"] = 0
    f = ct.find_clusters(f, 7)
    out = ct.refine_leastsq(f, img8, diameter=9, separation=7)
    assert out["cost"].notna().all()
    d, _ = cKDTree(np.asarray(truth)).query(
        out[["y", "x"]].to_numpy(), k=1
    )
    assert (d < 0.1).all(), d


def test_saturated_peaks_still_refine():
    """Clipped (saturated) peaks — ubiquitous in real data — keep their
    sub-pixel position: the clipping is symmetric about the center, so
    the Gaussian fit's centroid survives even though signal/size bias."""
    img = np.zeros((96, 96), np.float32)
    truth = [(30.4, 40.7), (62.2, 28.6)]
    for p in truth:
        artificial.draw_feature(img, p, 2.0, 400.0)  # peaks ~400
    rng = np.random.default_rng(2)
    img += rng.normal(0, 1.0, img.shape).astype(np.float32)
    img8 = np.clip(img, 0, 255).astype(np.uint8)   # tops clipped at 255
    assert (np.asarray(img8) == 255).sum() >= 4     # really saturated
    f = ct.locate(img8, diameter=11, separation=(7, 7))
    f["frame"] = 0
    f = ct.find_clusters(f, 9)
    out = ct.refine_leastsq(f, img8, diameter=11, separation=9)
    ok = out[out["cost"].notna()]
    assert len(ok) == 2, out
    d, _ = cKDTree(np.asarray(truth)).query(ok[["y", "x"]].to_numpy())
    assert (d < 0.3).all(), d
