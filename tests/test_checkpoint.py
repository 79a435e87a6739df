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


def test_checkpoint_survives_hard_kill(tmp_path):
    """SIGKILL mid-run (not a clean stop): the atomic persists leave a
    consistent checkpoint, and resume completes with correct results."""
    import os
    import signal
    import subprocess
    import sys
    import time

    ck = tmp_path / "ck"
    video_script = r"""
import jax; jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, {repo!r})
import numpy as np, pandas as pd
import clustertracking_tpu as ct
from clustertracking_tpu.artificial import CoordinateReader
rng = np.random.default_rng(11)
centers = rng.uniform(20, 100, (6, 2)); angles = rng.uniform(0, np.pi, 6)
rows = []
for t in range(8):
    centers = np.clip(centers + rng.normal(0, 0.4, centers.shape), 15, 105)
    angles = angles + rng.normal(0, 0.1, 6)
    offs = 2.5 * np.stack([np.sin(angles), np.cos(angles)], -1)
    for k in range(6):
        for sgn in (+1, -1):
            p = centers[k] + sgn * offs[k]
            rows.append({{"frame": t, "y": p[0], "x": p[1], "signal": 150.0}})
f = pd.DataFrame(rows)
reader = CoordinateReader(f, (120, 120), size=1.6)
out = ct.track(reader, diameter=7, separation=5.5, search_range=3.0,
               checkpoint_dir={ck!r}, checkpoint_every=2)
print("DONE", len(out), out["particle"].nunique(), flush=True)
"""
    import os as _os

    repo = _os.getcwd()
    script = video_script.format(repo=repo, ck=str(ck))

    # first run: kill it as soon as the first checkpoint lands
    p = subprocess.Popen([sys.executable, "-u", "-c", script])
    deadline = time.time() + 120
    state = ck / "state.json"
    while time.time() < deadline:
        if state.exists():
            break
        if p.poll() is not None:
            break  # finished before we could kill — still a valid test
        time.sleep(0.2)
    if p.poll() is None:
        os.kill(p.pid, signal.SIGKILL)
        p.wait()
        assert state.exists(), "no checkpoint was written before the kill"

    # second run: resume to completion
    r = subprocess.run(
        [sys.executable, "-u", "-c", script], capture_output=True,
        text=True, timeout=300,
    )
    assert "DONE" in r.stdout, r.stdout + r.stderr
    n_rows, n_traj = map(int, r.stdout.split("DONE")[1].split())
    assert n_rows == 8 * 12  # every feature of every frame tracked
    assert n_traj == 12
