"""On-device synthesis (ops/synth.py) vs the host-numpy oracle
(artificial.py) — same feature table must render the same frames up to
the static-window truncation tail."""
import numpy as np
import pandas as pd
import pytest

from clustertracking_tpu import artificial
from clustertracking_tpu.ops.synth import frames_from_df, render_frames


def _coords_df(T=3, n_per=5, shape=(48, 64), seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for t in range(T):
        pos = artificial.gen_random_locations(shape, n_per, margin=6,
                                              rng=rng)
        for p in pos:
            rows.append({"y": p[0], "x": p[1],
                         "signal": rng.uniform(50, 150), "frame": t})
    return pd.DataFrame(rows)


def test_frames_match_coordinate_reader():
    shape = (48, 64)
    f = _coords_df(shape=shape)
    size = 2.0
    reader = artificial.CoordinateReader(f, shape, size)
    stack = np.asarray(frames_from_df(f, shape, size))
    assert stack.shape == (3,) + shape
    for t in range(3):
        ref = reader[t]
        # truncation tail of the 5-sigma window: exp(-12.5)*signal
        assert np.max(np.abs(stack[t] - ref)) < 1e-3


def test_edge_features_do_not_corrupt_frame():
    """A feature whose window hangs off the frame must clip, not wrap or
    scatter into clamped edge pixels."""
    shape = (32, 32)
    f = pd.DataFrame(
        {"y": [1.0, 30.5], "x": [0.5, 31.0],
         "signal": [100.0, 80.0], "frame": [0, 0]}
    )
    ref = artificial.draw_spots(shape, f[["y", "x"]].to_numpy(), 2.0,
                                f["signal"].to_numpy())
    dev = np.asarray(frames_from_df(f, shape, 2.0))[0]
    assert np.max(np.abs(dev - ref)) < 1e-3


def test_render_frames_profiles_and_noise():
    pos = np.array([[16.0, 16.0]], np.float32)
    sig = np.array([100.0], np.float32)
    sz = np.array([[3.0, 3.0]], np.float32)
    fidx = np.array([0], np.int32)
    for prof in ("gauss", "disc", "ring"):
        extras = (np.array([0.2], np.float32),) if prof == "ring" else ()
        img = np.asarray(render_frames(
            pos, sig, sz, fidx, 1, (32, 32), fit_function=prof,
            window=(31, 31), extras=extras,
        ))[0]
        host = np.zeros((32, 32))
        artificial.draw_feature(
            host, (16, 16), 3.0, 100.0, feat_func=prof,
            cutoff_sigmas=5.0,
            **({"thickness": 0.2} if prof == "ring" else {}),
        )
        assert np.max(np.abs(img - host)) < 1e-2

    noisy = np.asarray(render_frames(
        pos, sig, sz, fidx, 1, (32, 32), window=(31, 31),
        noise_level=2.0, seed=3,
    ))[0]
    clean = np.asarray(render_frames(
        pos, sig, sz, fidx, 1, (32, 32), window=(31, 31),
    ))[0]
    resid = noisy - clean
    assert 1.0 < resid.std() < 3.0


def test_render_then_refine_recovers_truth():
    """Device-rendered frames are good enough to drive the full fit."""
    from clustertracking_tpu import refine_leastsq

    shape = (64, 64)
    f = pd.DataFrame({
        "y": [20.0, 24.0, 44.5], "x": [30.0, 33.0, 14.25],
        "signal": [120.0, 110.0, 90.0], "frame": [0, 0, 0],
    })
    frames = np.asarray(frames_from_df(f, shape, 2.0))
    f0 = f.copy()
    f0[["y", "x"]] += np.random.default_rng(0).uniform(
        -0.4, 0.4, (3, 2)
    )
    out = refine_leastsq(f0, frames[0], diameter=9, separation=7,
                         param_val={"size": 2.0},
                         param_mode={"size": "const"})
    got = out[["y", "x"]].to_numpy()
    assert np.abs(got - f[["y", "x"]].to_numpy()).max() < 0.01
