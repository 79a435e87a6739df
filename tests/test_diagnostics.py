"""Observability: per-batch fit statistics (SURVEY.md §5 aux-subsystem)."""
import numpy as np
import pandas as pd

import clustertracking_tpu as ct
from clustertracking_tpu import artificial


def _scene():
    img = np.zeros((96, 96))
    rows = []
    for center, n in [((25, 25), 2), ((25, 70), 2), ((70, 30), 1)]:
        pos = artificial.draw_cluster(
            img, center, size=2.5, separation=5.0, n=n, signal=150.0,
            angle=0.5,
        )
        for p in pos:
            rows.append({"frame": 0, "y": p[0] + 0.2, "x": p[1] - 0.2,
                         "signal": 150.0, "size": 2.5})
    return img, pd.DataFrame(rows)


def test_collect_batches():
    img, f = _scene()
    with ct.diagnostics.collect() as stats:
        out = ct.refine_leastsq(f, img, diameter=9, separation=5.5)
    assert out["cost"].notna().all()
    sizes = sorted(b.cluster_size for b in stats.batches)
    assert sizes == [1, 2]  # one dispatch per bucket
    total = sum(b.n_clusters for b in stats.batches)
    assert total == 3
    s = stats.summary()
    assert s["n_clusters"] == 3
    assert s["n_rejected"] == 0
    assert s["clusters_per_sec"] > 0
    assert 0 < s["lane_occupancy"] <= 1


def test_collect_nested_restores():
    with ct.diagnostics.collect() as outer:
        with ct.diagnostics.collect() as inner:
            ct.diagnostics.record_batch(
                cluster_size=1, n_clusters=1, n_lanes=32, n_converged=1,
                n_rejected=0, mean_lm_iters=3.0, max_lm_iters=3,
                mean_rms=0.01, wall_s=0.1, backend="xla",
            )
        assert len(inner.batches) == 1
        assert len(outer.batches) == 0  # inner scope didn't leak


def test_rejections_counted():
    img, f = _scene()
    with ct.diagnostics.collect() as stats:
        out = ct.refine_leastsq(
            f, img, diameter=9, separation=5.5, max_rms_dev=1e-12
        )
    assert out["cost"].isna().all()
    assert stats.summary()["n_rejected"] == 3


def _nan_model():
    import jax.numpy as jnp

    # sqrt(r2 - 1) is NaN inside r2 < 1 — the center of every feature:
    # the canonical broken custom model dict
    return {
        "name": "broken",
        "params": (),
        "fun": lambda r2: jnp.sqrt(r2 - 1.0),
        "default": {},
    }


def test_nan_trap_raises_with_bucket_config():
    """VERDICT r4 item 9: with the trap armed, a custom model dict that
    produces non-finite residuals surfaces a clear FloatingPointError
    naming the bucket config — instead of a silent rejected lane."""
    import pytest

    img, f = _scene()
    with ct.diagnostics.debug_nans():
        with pytest.raises(FloatingPointError) as ei:
            ct.refine_leastsq(
                f, img, diameter=9, separation=5.5,
                fit_function=_nan_model(),
            )
    msg = str(ei.value)
    assert "broken" in msg            # model name
    assert "cluster_size" in msg      # bucket config
    assert "NON-FINITE" in msg        # cause attribution: model, not solve


def test_nan_without_trap_is_silent_rejection():
    """Default semantics unchanged: cost NaN, originals kept."""
    img, f = _scene()
    out = ct.refine_leastsq(
        f, img, diameter=9, separation=5.5, fit_function=_nan_model(),
    )
    assert out["cost"].isna().all()
    # originals kept
    np.testing.assert_allclose(out["y"], f["y"])
