"""Trajectory linking: reference (trackpy-style) semantics on synthetic
trajectories (SURVEY.md §2 external-linking parity)."""
import numpy as np
import pandas as pd
import pytest

import clustertracking_tpu as ct
from clustertracking_tpu import link


def _traj_df(trajs, start=0):
    """trajs: list of [(frame, y, x), ...] per particle."""
    rows = []
    for pts in trajs:
        for t, y, x in pts:
            rows.append({"frame": t, "y": y, "x": x})
    return pd.DataFrame(rows)


def test_two_straight_trajectories():
    f = _traj_df([
        [(t, 10.0 + 0.5 * t, 10.0) for t in range(5)],
        [(t, 30.0, 30.0 + 0.5 * t) for t in range(5)],
    ])
    out = link(f, search_range=2.0)
    assert out["particle"].nunique() == 2
    for _, g in out.groupby("particle"):
        assert len(g) == 5


def test_out_of_range_starts_new_particle():
    f = _traj_df([[(0, 10.0, 10.0), (1, 10.0, 20.0)]])
    out = link(f, search_range=5.0)
    assert out["particle"].nunique() == 2


def test_memory_bridges_gap():
    pts = [(0, 10.0, 10.0), (1, 10.5, 10.0), (3, 11.5, 10.0)]
    f = _traj_df([pts])
    out_nomem = link(f, search_range=2.0, memory=0)
    assert out_nomem["particle"].nunique() == 2
    out_mem = link(f, search_range=2.0, memory=1)
    assert out_mem["particle"].nunique() == 1


def test_nearest_wins_on_contention():
    """Two tracks, two candidates: greedy by distance matches each to its
    nearest (documented tie-breaking contract)."""
    f = pd.DataFrame(
        {
            "frame": [0, 0, 1, 1],
            "y": [10.0, 14.0, 10.5, 13.6],
            "x": [10.0, 10.0, 10.0, 10.0],
        }
    )
    out = link(f, search_range=5.0)
    p = out["particle"].to_numpy()
    assert p[0] == p[2] and p[1] == p[3] and p[0] != p[1]


def test_original_order_preserved():
    f = _traj_df([[(1, 10.0, 10.0)], [(0, 20.0, 20.0)]])
    out = link(f, search_range=2.0)
    assert list(out.index) == list(f.index)


def test_3d_linking():
    f = pd.DataFrame(
        {
            "frame": [0, 1, 2],
            "z": [5.0, 5.4, 5.8],
            "y": [10.0, 10.0, 10.0],
            "x": [10.0, 10.2, 10.4],
        }
    )
    out = link(f, search_range=1.0)
    assert out["particle"].nunique() == 1


def test_many_random_walkers(rng):
    """Well-separated random walkers all link into full-length tracks."""
    n, T = 12, 20
    starts = rng.uniform(10, 90, (n, 2))
    # keep walkers far apart relative to step size
    starts = starts[
        np.argsort(starts[:, 0])
    ]
    rows = []
    pos = starts.copy()
    for t in range(T):
        pos = pos + rng.normal(0, 0.3, pos.shape)
        for i in range(n):
            rows.append({"frame": t, "y": pos[i, 0], "x": pos[i, 1]})
    f = pd.DataFrame(rows)
    out = link(f, search_range=3.0)
    # every frame-0 particle persists through all T frames
    counts = out.groupby("particle").size()
    assert (counts == T).sum() >= n - 2  # allow rare close encounters


def test_subnet_optimal_beats_greedy():
    """Contended subnet where greedy-by-distance strands a track: the
    optimal assignment links both features (trackpy's subnet objective:
    min Σd², unlinked feature costs search_range²)."""
    f = pd.DataFrame({
        "y": [0.0, 0.0, 0.0, 0.0],
        "x": [0.0, 1.0, 0.55, 1.8],
        "frame": [0, 0, 1, 1],
    })
    out = link(f, search_range=1.0, backend="host")
    p = out["particle"].to_numpy()
    # greedy would give B→f1 (0.45) and strand A and f2 → 3 tracks;
    # optimal links A→f1 (0.55) and B→f2 (0.8) → 2 tracks
    assert len(np.unique(p)) == 2
    assert p[2] == p[0]  # (0,0.55) continues the x=0 track
    assert p[3] == p[1]  # (0,1.8) continues the x=1 track


def test_subnet_optimal_matches_bruteforce(rng):
    """Random contended frames: the incremental linker's per-frame
    assignment cost equals the brute-force optimum of the trackpy subnet
    objective."""
    from itertools import permutations

    from clustertracking_tpu.link import Linker

    sr = 1.0
    for trial in range(25):
        n_t = int(rng.integers(1, 5))
        n_f = int(rng.integers(1, 5))
        tracks = rng.uniform(0, 3, (n_t, 2))
        feats = rng.uniform(0, 3, (n_f, 2))

        lk = Linker(sr, 0)
        lk.advance(0, tracks)
        ids = lk.advance(1, feats)
        # cost of the linker's assignment
        got = 0.0
        for j in range(n_f):
            if ids[j] < n_t:  # linked to an existing track
                got += float(np.sum((feats[j] - tracks[ids[j]]) ** 2))
            else:
                got += sr ** 2

        # brute force over all injective feature→track∪{null} maps
        best = np.inf
        slots = list(range(n_t)) + [-1] * n_f
        for perm in set(permutations(slots, n_f)):
            cost = 0.0
            ok = True
            for j, s in enumerate(perm):
                if s < 0:
                    cost += sr ** 2
                else:
                    d2 = float(np.sum((feats[j] - tracks[s]) ** 2))
                    if d2 > sr ** 2:
                        ok = False
                        break
                    cost += d2
            if ok:
                best = min(best, cost)
        assert got == pytest.approx(best, abs=1e-9), trial


def test_filter_stubs():
    """trackpy's post-link stub filter: drop tracks shorter than the
    threshold (in distinct frames)."""
    import pandas as pd
    import clustertracking_tpu as ct

    rows = []
    for t in range(12):
        rows.append({"frame": t, "y": 10.0 + 0.1 * t, "x": 10.0})
    for t in (3, 4):  # 2-frame stub
        rows.append({"frame": t, "y": 40.0, "x": 40.0})
    f = ct.link(pd.DataFrame(rows), search_range=2.0)
    out = ct.filter_stubs(f, threshold=5)
    assert out["particle"].nunique() == 1
    assert len(out) == 12
    # threshold below the stub length keeps both
    assert ct.filter_stubs(f, threshold=2)["particle"].nunique() == 2
    import pytest
    with pytest.raises(ValueError):
        ct.filter_stubs(pd.DataFrame(rows))
