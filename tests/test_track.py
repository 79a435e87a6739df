"""ct.track: composed locate→find→refine→link pipeline (SURVEY.md §3.4)."""
import numpy as np
import pandas as pd
from scipy.spatial import cKDTree

import clustertracking_tpu as ct
from clustertracking_tpu import artificial


def _dimer_video(T=6, shape=(80, 80), seed=0):
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


def test_track_end_to_end():
    truth, reader = _dimer_video()
    out = ct.track(
        reader, diameter=7, separation=6.0, search_range=2.0,
        param_val={"size": 2.0}, threshold=20.0,
    )
    # six full-length trajectories
    counts = out.groupby("particle").size()
    assert out["particle"].nunique() == 6
    assert (counts == truth["frame"].nunique()).all()
    # every refined position matches a generating coordinate sub-pixel
    for t in sorted(truth["frame"].unique()):
        got = out[out["frame"] == t][["y", "x"]].to_numpy()
        want = truth[truth["frame"] == t][["y", "x"]].to_numpy()
        d, _ = cKDTree(want).query(got)
        assert d.max() < 0.01


def test_locate_single_frame():
    img = np.zeros((64, 64), np.float32)
    artificial.draw_feature(img, (20.0, 30.0), 2.0, signal=100.0)
    f = ct.locate(img, diameter=7, threshold=10.0)
    assert len(f) == 1
    assert abs(f["y"].iloc[0] - 20) <= 1 and abs(f["x"].iloc[0] - 30) <= 1
    assert f["signal"].iloc[0] > 90


def test_track_host_link_backend():
    truth, reader = _dimer_video(T=4)
    out = ct.track(
        reader, diameter=7, separation=6.0, search_range=2.0,
        param_val={"size": 2.0}, threshold=20.0, link_backend="host",
    )
    assert out["particle"].nunique() == 6


def test_recover_passes_finds_merged_features():
    """Dimers at separation ~2.2·sigma have a single intensity maximum —
    invisible to any local-maxima locator. A recovery pass (render the
    fit, subtract, re-locate the residual) must find the hidden partner
    and the refit must place both features accurately."""
    import numpy as np
    import pandas as pd
    from clustertracking_tpu import artificial

    rng = np.random.default_rng(4)
    T = 3
    rows = []
    for t in range(T):
        for k, c in enumerate([(24.0, 24.0), (24.0, 72.0), (72.0, 40.0)]):
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
    import clustertracking_tpu as ct

    kw = dict(diameter=9, separation=6, search_range=3.0,
              param_val={"size": 1.6}, param_mode={"size": "const"})
    with ct.diagnostics.collect() as s0:
        out0 = ct.track(reader, **kw)
    with ct.diagnostics.collect() as s1:
        out1 = ct.track(reader, recover_passes=1, **kw)

    # without recovery, blended dimers lose their partner
    assert len(out0) < len(truth)
    # with recovery every feature is found and accurately placed
    assert len(out1) == len(truth)
    assert s1.ledger.get("recovered_candidates", 0) > 0
    # the recovery ledger attributes every residual candidate: located
    # minus the per-gate drops minus survivors must balance (the gates
    # are: on-top-of-fit, redundant second lobe, over-cap, then the
    # post-refit prunes counted inside ghosts_pruned)
    led = s1.ledger
    assert led["residual_candidates"] >= led["recovered_candidates"]
    n_gates = (
        led.get("recovery_dropped_on_top_of_fit", 0)
        + led.get("recovery_dropped_redundant_lobe", 0)
        + led.get("recovery_dropped_over_cap", 0)
    )
    assert (
        led["residual_candidates"]
        + led.get("recovery_split_probes", 0)
        - n_gates
        == led["recovered_candidates"]
    )
    if led.get("ghosts_pruned"):
        assert led["ghosts_pruned"] == (
            led.get("recovery_rejected_likelihood", 0)
            + led.get("recovery_pruned_zero_signal", 0)
            + led.get("recovery_pruned_low_signal", 0)
            + led.get("recovery_pruned_displacement", 0)
            + led.get("recovery_pruned_duplicate", 0)
        )
    from scipy.spatial import cKDTree

    for t in range(T):
        tg = truth[truth["frame"] == t][["y", "x"]].to_numpy()
        og = out1[out1["frame"] == t][["y", "x"]].to_numpy()
        tree = cKDTree(og)
        d, _ = tree.query(tg, k=1)
        assert d.max() < 0.25, d.max()


def test_dense_recovery_coverage():
    """Dense-scene recovery end-to-end at reduced scale (config-5
    density): one pass must lift coverage well above the no-recovery
    baseline without flooding ghosts.  Pins the size-estimation +
    blend-split + likelihood-accept chain."""
    import numpy as np
    from scipy.spatial import cKDTree
    import sys
    sys.path.insert(0, ".")
    from benchmarks.suite import _video
    import clustertracking_tpu as ct

    reader, truth = _video(1, 500, (224, 224), 5.0, seed=11)
    kw = dict(diameter=9, separation=6, search_range=3.0,
              link_backend="host", max_features=2048,
              max_cluster_size=24)
    out0 = ct.track(reader, recover_passes=0, **kw)
    out1 = ct.track(reader, recover_passes=1, **kw)

    def cov(out):
        tr = truth[truth["frame"] == 0][["y", "x"]].to_numpy()
        ot = out[out["cost"].notna()][["y", "x"]].to_numpy()
        d, _ = cKDTree(ot).query(tr, k=1)
        d2, _ = cKDTree(tr).query(ot, k=1)
        return (d < 1.0).mean(), int((d2 > 1.5).sum())

    c0, g0 = cov(out0)
    c1, g1 = cov(out1)
    assert c1 > c0 + 0.05, (c0, c1)   # recovery buys real coverage
    assert c1 > 0.85, c1
    assert g1 <= max(2 * g0, 15), (g0, g1)  # ghosts stay controlled

    # pass 2: the noise-evidence gate applies to ALL clusters on passes
    # ≥2 (the real blends were recovered in pass 1 — residual lobes on
    # already-fitted clusters are fit imperfection, the measured pass-2
    # ghost leak), so a second pass must not flood ghosts nor lose the
    # pass-1 coverage
    out2 = ct.track(reader, recover_passes=2, **kw)
    c2, g2 = cov(out2)
    assert c2 >= c1 - 0.01, (c1, c2)
    assert g2 <= g1 + max(g1 // 2, 5), (g1, g2)


def test_split_probe_recovers_absorbed_pairs():
    """Pairs at ~1.4·sigma separation merge into ONE blob with a single
    maximum, and the main fit absorbs both members into one wider
    Gaussian so well that no residual PEAK clears the locate gate.  The
    quadrupole split-probe (signal-excess originals split along their
    residual-quadrupole axis) must still recover both members; with the
    probe disabled the pairs stay lost, which pins that the coverage
    comes from the probe and not the lobe machinery."""
    import numpy as np
    import pandas as pd
    from scipy.spatial import cKDTree

    import clustertracking_tpu as ct
    from clustertracking_tpu import artificial, pipeline

    rng = np.random.default_rng(4)
    rows = []
    img = np.zeros((128, 128), np.float32)
    # 4 well-separated singles (the signal-median reference population)
    for k in range(4):
        p = np.array([15.0 + 12 * k + rng.uniform(-1, 1),
                      20.0 + rng.uniform(-1, 1)])
        rows.append(p)
    # 2 close pairs: d = 2.2 px at sigma 1.6 → single intensity maximum
    for k in range(2):
        c = np.array([40.0 + 30 * k + rng.uniform(-1, 1),
                      85.0 + rng.uniform(-1, 1)])
        ang = rng.uniform(0, np.pi)
        v = np.array([np.sin(ang), np.cos(ang)])
        rows.append(c + 1.1 * v)
        rows.append(c - 1.1 * v)
    truth = np.asarray(rows)
    for p in truth:
        artificial.draw_feature(img, p, 1.6, 150.0)
    img += rng.normal(0, 2.0, img.shape).astype(np.float32)
    reader = [img]

    kw = dict(diameter=9, separation=6, search_range=3.0,
              max_cluster_size=8)

    def tracked(out):
        ot = out[out["cost"].notna()][["y", "x"]].to_numpy()
        d, _ = cKDTree(ot).query(truth, k=1)
        return int((d < 1.0).sum())

    old = pipeline._SPLIT_SIG_EXCESS
    try:
        pipeline._SPLIT_SIG_EXCESS = None
        n_off = tracked(ct.track(reader, recover_passes=1, **kw))
        pipeline._SPLIT_SIG_EXCESS = old
        with ct.diagnostics.collect() as stats:
            n_on = tracked(ct.track(reader, recover_passes=1, **kw))
    finally:
        pipeline._SPLIT_SIG_EXCESS = old
    assert stats.ledger.get("recovery_split_probes", 0) > 0
    assert n_off < len(truth), n_off
    assert n_on == len(truth), (n_off, n_on)
