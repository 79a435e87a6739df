"""Checkpoint/resume for long-video tracking (SURVEY.md §5 aux-subsystem —
the reference has no persistence; this is the new capability the survey
calls for: per-chunk streaming with resumable linker state)."""
import numpy as np
import pandas as pd
import pytest

import clustertracking_tpu as ct
from clustertracking_tpu.artificial import CoordinateReader
from clustertracking_tpu.link import Linker


def _video(n_frames=8, n_clusters=6, seed=11):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(20, 100, (n_clusters, 2))
    angles = rng.uniform(0, np.pi, n_clusters)
    rows = []
    for t in range(n_frames):
        centers = np.clip(centers + rng.normal(0, 0.4, centers.shape),
                          15, 105)
        angles = angles + rng.normal(0, 0.1, n_clusters)
        offs = 2.5 * np.stack([np.sin(angles), np.cos(angles)], -1)
        for k in range(n_clusters):
            for sgn in (+1, -1):
                p = centers[k] + sgn * offs[k]
                rows.append({"frame": t, "y": p[0], "x": p[1],
                             "signal": 150.0})
    f = pd.DataFrame(rows)
    return CoordinateReader(f, (120, 120), size=1.6), f


def test_linker_state_roundtrip():
    rng = np.random.default_rng(0)
    lk = Linker(3.0, memory=1)
    pos0 = rng.uniform(0, 50, (5, 2))
    lk.advance(0, pos0)
    lk2 = Linker.from_state(lk.state())
    pos1 = pos0 + rng.normal(0, 0.3, pos0.shape)
    ids_a = lk.advance(1, pos1)
    ids_b = lk2.advance(1, pos1)
    np.testing.assert_array_equal(ids_a, ids_b)


def test_checkpoint_resume_matches_single_shot(tmp_path):
    reader, truth = _video()
    common = dict(diameter=7, separation=5.5, search_range=3.0)

    # single-shot (host linker — same Linker the checkpoint path uses)
    ref = ct.track(reader, link_backend="host", **common)

    # checkpointed in 3-frame chunks, interrupted after the first chunk
    ck = tmp_path / "ck"
    ct.track(reader, checkpoint_dir=str(ck), checkpoint_every=3,
             n_frames=3, **common)
    assert (ck / "state.json").exists()
    import json

    assert json.loads((ck / "state.json").read_text())["next_frame"] == 3

    # resume to completion
    out = ct.track(reader, checkpoint_dir=str(ck), checkpoint_every=3,
                   **common)

    ref_s = ref.sort_values(["frame", "y", "x"]).reset_index(drop=True)
    out_s = out.sort_values(["frame", "y", "x"]).reset_index(drop=True)
    assert len(ref_s) == len(out_s)
    np.testing.assert_allclose(
        out_s[["y", "x"]].to_numpy(), ref_s[["y", "x"]].to_numpy(),
        atol=1e-5,
    )
    np.testing.assert_array_equal(
        out_s["particle"].to_numpy(), ref_s["particle"].to_numpy()
    )

    # resuming a COMPLETE checkpoint is a no-op returning the same result
    again = ct.track(reader, checkpoint_dir=str(ck), checkpoint_every=3,
                     **common)
    assert len(again) == len(out)
