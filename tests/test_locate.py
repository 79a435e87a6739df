"""On-device candidate location (grey_dilation replacement)."""
import numpy as np
import pytest

from clustertracking_tpu import artificial
from clustertracking_tpu.ops.locate import grey_dilation, local_maxima


def test_finds_isolated_features():
    img = np.zeros((64, 64), np.float32)
    truth = np.array([[10, 12], [30, 40], [50, 20]], float)
    for p in truth:
        artificial.draw_feature(img, p, 2.0, signal=100.0)
    coords, vals, valid, _ = local_maxima(img, (5, 5), max_features=8,
                                       threshold=10.0)
    coords = np.asarray(coords)[np.asarray(valid)]
    assert len(coords) == 3
    got = coords[np.lexsort(coords.T[::-1])]
    want = truth[np.lexsort(truth.T[::-1])].astype(int)
    np.testing.assert_array_equal(got, want)


def test_threshold_excludes_dim_features():
    img = np.zeros((64, 64), np.float32)
    artificial.draw_feature(img, (10, 10), 2.0, signal=100.0)
    artificial.draw_feature(img, (40, 40), 2.0, signal=5.0)
    coords, vals, valid, _ = local_maxima(img, (5, 5), max_features=8,
                                       threshold=20.0)
    assert int(np.asarray(valid).sum()) == 1


def test_brightest_first_and_padding():
    img = np.zeros((32, 32), np.float32)
    artificial.draw_feature(img, (8, 8), 1.5, signal=50.0)
    artificial.draw_feature(img, (20, 20), 1.5, signal=150.0)
    coords, vals, valid, _ = local_maxima(img, (5, 5), max_features=4,
                                       threshold=1.0)
    vals = np.asarray(vals)
    assert np.asarray(valid).sum() == 2
    assert vals[0] > vals[1]  # brightest first
    assert tuple(np.asarray(coords)[0]) == (20, 20)


def test_plateau_gives_single_maximum():
    img = np.zeros((32, 32), np.float32)
    img[10:12, 10:12] = 7.0  # 2x2 exact plateau
    coords, vals, valid, _ = local_maxima(img, (5, 5), max_features=4,
                                       threshold=1.0)
    assert int(np.asarray(valid).sum()) == 1


def test_grey_dilation_percentile_threshold(rng):
    img = rng.normal(0, 1, (64, 64)).astype(np.float32)
    artificial.draw_feature(img, (32, 32), 2.0, signal=60.0)
    coords, vals, valid = grey_dilation(img, 7, percentile=99.9,
                                        max_features=16)
    coords = np.asarray(coords)[np.asarray(valid)]
    assert any((abs(c[0] - 32) <= 1 and abs(c[1] - 32) <= 1)
               for c in coords)


def test_dense_frame_counts():
    img = np.zeros((128, 128), np.float32)
    truth = artificial.gen_nonoverlapping_locations(
        (128, 128), 40, separation=9, margin=6, rng=3
    )
    for p in truth:
        artificial.draw_feature(img, p, 2.0, signal=100.0)
    coords, vals, valid, _ = local_maxima(img, (7, 7), max_features=64,
                                       threshold=20.0)
    assert int(np.asarray(valid).sum()) == len(truth)


def test_overflow_keeps_brightest():
    """When a frame has more candidate maxima than max_features, the
    pipeline must keep the globally BRIGHTEST ones, not the first in
    raster order.  Regression: the cumsum compaction alone kept 8 dim
    top-row maxima and silently dropped 4 bright bottom-row ones."""
    from clustertracking_tpu.ops.locate import local_maxima_topk

    img = np.zeros((64, 64), np.float32)
    dim = [(6, 6 + 7 * k) for k in range(8)]       # top row, val 10
    bright = [(56, 8 + 12 * k) for k in range(4)]  # bottom row, val 100
    for y, x in dim:
        img[y, x] = 10.0
    for y, x in bright:
        img[y, x] = 100.0

    coords, vals, valid, n_cand = local_maxima(
        img, (5, 5), max_features=4, threshold=1.0
    )
    assert int(n_cand) == 12  # overflow is detected and reported

    # the exact path returns precisely the bright maxima
    coords, vals, valid, n_cand = local_maxima_topk(
        img, (5, 5), max_features=4, threshold=1.0
    )
    assert int(n_cand) == 12
    got = {tuple(c) for c in np.asarray(coords)[np.asarray(valid)]}
    assert got == set(bright)
    assert (np.asarray(vals)[np.asarray(valid)] == 100.0).all()

    # grey_dilation composes the two: overflow triggers the exact path
    coords, vals, valid = grey_dilation(
        img, 5, max_features=4, threshold=1.0
    )
    got = {tuple(c) for c in np.asarray(coords)[np.asarray(valid)]}
    assert got == set(bright)


def test_topk_matches_compaction_when_no_overflow():
    img = np.zeros((64, 64), np.float32)
    truth = artificial.gen_nonoverlapping_locations(
        (64, 64), 12, separation=9, margin=6, rng=5
    )
    rngv = np.random.default_rng(2)
    for p in truth:
        artificial.draw_feature(img, p, 2.0,
                                signal=float(rngv.uniform(50, 150)))
    from clustertracking_tpu.ops.locate import local_maxima_topk

    a = local_maxima(img, (5, 5), max_features=16, threshold=10.0)
    b = local_maxima_topk(img, (5, 5), max_features=16, threshold=10.0)
    ok = np.asarray(a[2])
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
    np.testing.assert_array_equal(np.asarray(a[0])[ok],
                                  np.asarray(b[0])[ok])
    np.testing.assert_array_equal(np.asarray(a[1])[ok],
                                  np.asarray(b[1])[ok])


def test_pipeline_locate_threshold_modes():
    """Default pipeline threshold = percentile floored at median+6·MAD
    (a documented deviation from trackpy's raw percentile rule); passing
    an explicit threshold pins the pure-percentile behavior."""
    from clustertracking_tpu.pipeline import locate

    rng = np.random.default_rng(0)
    img = rng.normal(10.0, 2.0, (128, 128)).astype(np.float32)
    artificial.draw_feature(img, (40, 60), 2.0, signal=80.0)
    artificial.draw_feature(img, (90, 30), 2.0, signal=70.0)

    # default: MAD floor suppresses noise maxima; only real features pass
    f = locate(img, diameter=9, separation=5)
    assert len(f) == 2
    got = f[["y", "x"]].to_numpy().astype(int)
    got = got[np.lexsort(got.T[::-1])]
    np.testing.assert_array_equal(got, [[40, 60], [90, 30]])

    # pure-percentile mode (trackpy's default rule) via explicit threshold:
    # the 64th percentile of a Gaussian background sits at background level,
    # so noise maxima flood in — exactly the behavior the floor deviates from
    thr = float(np.percentile(img, 64.0))
    f_pct = locate(img, diameter=9, separation=5, threshold=thr,
                   max_features=8192)
    assert len(f_pct) > 50
    # and the real features are still among them
    vals = f_pct["signal"].to_numpy()
    assert vals.max() > 60.0


def test_locate_size_estimate():
    """locate's 'size' column (trackpy parity): truncation-corrected
    radius of gyration recovers the drawn sigma to ~10% for isolated
    features and stays accurate under moderate noise."""
    import numpy as np
    from clustertracking_tpu import artificial, locate

    rng = np.random.default_rng(5)
    for sigma in (1.3, 1.6, 2.2):
        img = np.zeros((128, 128), np.float32)
        for k in range(9):
            p = np.array([20.0 + 30 * (k // 3), 20.0 + 30 * (k % 3)])
            artificial.draw_feature(img, p + rng.uniform(-2, 2, 2),
                                    sigma, 150.0)
        img += rng.normal(0, 2.0, img.shape).astype(np.float32)
        f = locate(img, diameter=11, separation=(5, 5))
        est = f["size"].median()
        assert abs(est - sigma) < 0.12 * sigma + 0.05, (sigma, est)


def test_locate_size_estimate_3d_aniso():
    """3D locate emits per-axis size columns recovering an anisotropic
    PSF (z elongated, like a confocal stack)."""
    import numpy as np
    from clustertracking_tpu import artificial, locate

    rng = np.random.default_rng(9)
    img = np.zeros((48, 96, 96), np.float32)
    true_sz = np.array([2.4, 1.4, 1.4])
    for k in range(8):
        p = np.array([24.0, 24.0 + 48 * (k // 4),
                      16.0 + 20 * (k % 4)]) + rng.uniform(-1.5, 1.5, 3)
        artificial.draw_feature(img, p, true_sz, 150.0)
    img += rng.normal(0, 1.0, img.shape).astype(np.float32)
    f = locate(img, diameter=(13, 9, 9), separation=(7, 5, 5))
    assert {"size", "size_z", "size_y", "size_x"} <= set(f.columns)
    est = f[["size_z", "size_y", "size_x"]].median().to_numpy()
    # anisotropy direction and rough magnitude recovered
    assert est[0] > 1.3 * est[1], est
    assert np.all(np.abs(est - true_sz) < 0.35 * true_sz + 0.1), est


def test_gaussian_blur_noise_reduction():
    """Matched-filter building block: smoothing reduces white-noise std
    by ~||k||2 and halves a matched feature's peak (2D)."""
    import jax.numpy as jnp
    import numpy as np
    from clustertracking_tpu import artificial
    from clustertracking_tpu.ops.locate import gaussian_blur

    rng = np.random.default_rng(0)
    sigma = 1.6
    noise = rng.normal(0, 1.0, (1, 128, 128)).astype(np.float32)
    sm = np.asarray(gaussian_blur(jnp.asarray(noise), (sigma, sigma)))
    # ||k||2 for a normalized 2D Gaussian ~ 1/(2*sqrt(pi)*sigma)
    expect = 1.0 / (2.0 * np.sqrt(np.pi) * sigma)
    assert abs(sm.std() / expect - 1.0) < 0.15, (sm.std(), expect)

    img = np.zeros((1, 64, 64), np.float32)
    artificial.draw_feature(img[0], (32.0, 32.0), sigma, 100.0)
    smf = np.asarray(gaussian_blur(jnp.asarray(img), (sigma, sigma)))
    assert abs(smf.max() / img.max() - 0.5) < 0.05


def test_locate_matched_filter_finds_subgate_feature():
    """A feature whose raw peak sits BELOW the 6-sigma MAD gate is found
    by the matched-filter locate path and missed by the raw path."""
    import numpy as np
    import pandas as pd
    from clustertracking_tpu import artificial
    from clustertracking_tpu.pipeline import _locate_frames

    rng = np.random.default_rng(3)
    sigma, noise_std = 1.6, 2.0
    img = np.zeros((128, 128), np.float32)
    # raw gate is ~ med + 6*noise_std = 12; peak 8 is below it, but
    # smoothed peak 8/2 = 4 clears the smoothed gate 6*2.0*0.176 ~ 2.1
    artificial.draw_feature(img, (64.0, 64.0), sigma, 8.0)
    img += rng.normal(0, noise_std, img.shape).astype(np.float32)

    class R:
        def __getitem__(self, t):
            return img

        def __len__(self):
            return 1

    kw = dict(diameter=9, locate_separation=(3, 3), threshold=None,
              percentile=64, max_features=64, t_column="frame")
    raw = _locate_frames(R(), [0], **kw)
    mf = _locate_frames(R(), [0], match_sigma=sigma, **kw)

    def hit(f):
        if not len(f):
            return False
        d = np.hypot(f["y"] - 64.0, f["x"] - 64.0)
        return bool((d < 1.5).min() < 1.5) and float(d.min()) < 1.5

    assert hit(mf), mf
    assert not hit(raw), raw
    # amplitude rescale: recovered signal near the true peak value
    d = np.hypot(mf["y"] - 64.0, mf["x"] - 64.0)
    sig_est = float(mf.loc[d.idxmin(), "signal"])
    assert 4.0 < sig_est < 14.0, sig_est


def test_locate_polydisperse_sizes():
    """Two size populations in ONE frame (sigma=1.5 and sigma=3) both
    survive the robust size-shrink band (VERDICT r4 item 6): the former
    hard +/-15%-of-median clip crushed a legitimate 2x spread, seeding
    every big-population fit with a ~2x-wrong PSF width."""
    import numpy as np
    from scipy.spatial import cKDTree

    import clustertracking_tpu as ct
    from clustertracking_tpu import artificial

    img = np.zeros((256, 256), np.float32)
    rng = np.random.default_rng(7)
    truth_pos, truth_size = [], []
    k = 0
    for y in range(24, 232, 28):
        for x in range(24, 232, 28):
            pos = (y + rng.uniform(-2, 2), x + rng.uniform(-2, 2))
            size = 1.5 if k % 2 == 0 else 3.0
            artificial.draw_feature(img, pos, size, 200.0)
            truth_pos.append(pos)
            truth_size.append(size)
            k += 1
    img += rng.normal(0, 2.0, img.shape).astype(np.float32)

    f = ct.locate(img, diameter=15, separation=(9, 9), max_features=256)
    assert len(f) >= 0.9 * len(truth_pos), len(f)
    d, j = cKDTree(np.asarray(truth_pos)).query(
        f[["y", "x"]].to_numpy(), k=1
    )
    ok = d < 2.0
    assert ok.sum() >= 0.9 * len(truth_pos), ok.sum()
    est = f["size"].to_numpy()[ok]
    true = np.asarray(truth_size)[j[ok]]
    med_small = float(np.median(est[true == 1.5]))
    med_big = float(np.median(est[true == 3.0]))
    # both modes recover near their own width, not the pooled median
    assert 1.0 < med_small < 2.0, med_small
    assert 2.4 < med_big < 3.8, med_big
