"""Synthetic-data oracle sanity (artificial.py parity suite)."""
import numpy as np
import pandas as pd
import pytest

from clustertracking_tpu import artificial


def test_draw_feature_peak_at_position():
    img = np.zeros((32, 32))
    artificial.draw_feature(img, (16, 20), size=2.0, signal=100.0)
    assert img[16, 20] == pytest.approx(100.0, rel=1e-6)
    assert np.unravel_index(img.argmax(), img.shape) == (16, 20)


def test_draw_feature_sigma_convention():
    img = np.zeros((64, 64))
    artificial.draw_feature(img, (32, 32), size=3.0, signal=100.0)
    # one sigma along x: exp(-0.5)
    assert img[32, 35] == pytest.approx(100.0 * np.exp(-0.5), rel=1e-6)


def test_draw_cluster_separation():
    img = np.zeros((64, 64))
    for n in (2, 3, 4):
        pos = artificial.draw_cluster(
            np.zeros((64, 64)), (32, 32), 2.0, separation=6.0, n=n
        )
        d = np.linalg.norm(pos[None] - pos[:, None], axis=-1)
        nn = np.where(np.eye(n), np.inf, d).min()
        assert nn == pytest.approx(6.0, rel=1e-6)


def test_gen_nonoverlapping(rng):
    pos = artificial.gen_nonoverlapping_locations(
        (100, 100), 30, separation=8, margin=5, rng=rng
    )
    d = np.linalg.norm(pos[None] - pos[:, None], axis=-1)
    d[np.eye(len(pos), dtype=bool)] = np.inf
    assert d.min() >= 8
    assert pos.min() >= 5 and pos.max() <= 94


def test_crop_pad_out_of_bounds():
    img = np.arange(16.0).reshape(4, 4)
    out = artificial.crop_pad(img, (-1, 2), (3, 3))
    assert out.shape == (3, 3)
    assert out[0].sum() == 0  # padded row
    assert out[1, 0] == img[0, 2]


def test_coordinate_reader_renders_frames():
    f = pd.DataFrame(
        {"y": [10.0, 20.0], "x": [10.0, 25.0], "frame": [0, 1],
         "signal": [50.0, 80.0]}
    )
    reader = artificial.CoordinateReader(f, (32, 32), size=2.0)
    assert len(reader) == 2
    assert reader[0][10, 10] == pytest.approx(50.0, rel=1e-6)
    assert reader[1][20, 25] == pytest.approx(80.0, rel=1e-6)
    assert reader[0][20, 25] < 1.0  # feature absent in frame 0
    assert reader.frame_shape == (32, 32)


def test_coordinate_reader_noise_deterministic():
    f = pd.DataFrame({"y": [10.0], "x": [10.0], "frame": [0]})
    r1 = artificial.CoordinateReader(f, (16, 16), 2.0, noise_level=0.1)
    r2 = artificial.CoordinateReader(f, (16, 16), 2.0, noise_level=0.1)
    np.testing.assert_array_equal(r1[0], r2[0])


def test_simulated_image():
    sim = artificial.SimulatedImage((48, 48), size=2.0, signal=100.0)
    sim.draw_cluster((24, 24), separation=5.0, n=3)
    assert len(sim.coords) == 3
    assert sim().max() > 50
    df = sim.coords_df()
    assert set(df.columns) >= {"y", "x", "frame"}


def test_draw_spots_bitdepth():
    img = artificial.draw_spots(
        (32, 32), [[16, 16]], 2.0, signal=1.0, bitdepth=8
    )
    assert img.dtype == np.uint8
    assert img.max() == 255


def test_3d_draw():
    img = np.zeros((24, 24, 24))
    artificial.draw_feature(img, (12, 12, 12), size=(1.5, 2.0, 2.0),
                            signal=10.0)
    assert img[12, 12, 12] == pytest.approx(10.0, rel=1e-6)
