"""Device (lax.scan mutual-NN) linker vs host reference linker."""
import numpy as np
import pandas as pd
import pytest

from clustertracking_tpu import link


def _walkers(rng, n=8, T=12, step=0.3, span=(10, 90)):
    starts = np.stack(
        [np.linspace(span[0], span[1], n),
         np.linspace(span[0], span[1], n)], axis=-1
    )
    rows = []
    pos = starts.copy()
    for t in range(T):
        pos = pos + rng.normal(0, step, pos.shape)
        for i in range(n):
            rows.append({"frame": t, "y": pos[i, 0], "x": pos[i, 1]})
    return pd.DataFrame(rows)


def _tracks_as_sets(out):
    """Compare assignments up to particle-id relabeling."""
    return sorted(
        tuple(sorted(map(tuple, g[["frame", "y"]].to_numpy().tolist())))
        for _, g in out.groupby("particle")
    )


def test_device_matches_host_unambiguous(rng):
    f = _walkers(rng)
    out_h = link(f, search_range=3.0, backend="host")
    out_d = link(f, search_range=3.0, backend="device")
    assert _tracks_as_sets(out_h) == _tracks_as_sets(out_d)


def test_device_memory_bridges_gap():
    rows = [
        {"frame": 0, "y": 10.0, "x": 10.0},
        {"frame": 1, "y": 10.5, "x": 10.0},
        {"frame": 3, "y": 11.5, "x": 10.0},
    ]
    # a second steady particle keeps frame 2 non-empty
    rows += [{"frame": t, "y": 50.0, "x": 50.0} for t in range(4)]
    f = pd.DataFrame(rows)
    out0 = link(f, search_range=2.0, memory=0, backend="device")
    assert out0["particle"].iloc[2] != out0["particle"].iloc[0]
    out1 = link(f, search_range=2.0, memory=1, backend="device")
    assert out1["particle"].iloc[2] == out1["particle"].iloc[0]
    # the steady particle is one track in both
    steady = out1.iloc[3:]
    assert steady["particle"].nunique() == 1


def test_device_new_particles_on_entry(rng):
    rows = [{"frame": 0, "y": 10.0, "x": 10.0}]
    rows += [{"frame": 1, "y": 10.2, "x": 10.0},
             {"frame": 1, "y": 40.0, "x": 40.0}]
    f = pd.DataFrame(rows)
    out = link(f, search_range=2.0, backend="device")
    assert out["particle"].nunique() == 2
    assert out["particle"].iloc[0] == out["particle"].iloc[1]


def test_device_varying_counts(rng):
    """Features appearing/disappearing across frames (ragged → padded)."""
    rows = []
    for t in range(6):
        rows.append({"frame": t, "y": 20.0 + 0.2 * t, "x": 20.0})
        if t % 2 == 0:
            rows.append({"frame": t, "y": 60.0, "x": 60.0 + 0.2 * t})
    f = pd.DataFrame(rows)
    out = link(f, search_range=2.0, memory=1, backend="device")
    main = out[out["y"] < 40]
    assert main["particle"].nunique() == 1
    blink = out[out["y"] > 40]
    assert blink["particle"].nunique() == 1  # memory=1 bridges gaps


def test_device_link_empty():
    import pandas as pd

    from clustertracking_tpu import link

    empty = pd.DataFrame(columns=["y", "x", "frame"])
    out = link(empty, 3.0, backend="device")
    assert len(out) == 0 and "particle" in out.columns


def test_device_link_frame_gap_respects_memory():
    """An empty frame between sightings counts against `memory`, exactly
    like the host linker (the time axis must not compress)."""
    import numpy as np
    import pandas as pd

    from clustertracking_tpu import link

    # one particle seen at t=0 and t=2; nothing at t=1
    f = pd.DataFrame(
        {"frame": [0, 2], "y": [10.0, 10.2], "x": [10.0, 10.1]}
    )
    # memory=0: the track dies during the empty frame -> two particles
    out0_d = link(f.copy(), 3.0, memory=0, backend="device")
    out0_h = link(f.copy(), 3.0, memory=0, backend="host")
    assert out0_d["particle"].nunique() == 2
    assert out0_h["particle"].nunique() == 2
    # memory=1: the gap is bridged -> one particle
    out1_d = link(f.copy(), 3.0, memory=1, backend="device")
    out1_h = link(f.copy(), 3.0, memory=1, backend="host")
    assert out1_d["particle"].nunique() == 1
    assert out1_h["particle"].nunique() == 1


def test_device_auction_matches_host_on_contended_subnet():
    """Ambiguous crossing where greedy/mutual-NN strands a track: the
    device auction must reach the same subnet-optimal assignment as the
    host Hungarian (min Σd², unlinked feature costs search_range²)."""
    import pandas as pd

    from clustertracking_tpu import link

    f = pd.DataFrame({
        "y": [0.0, 0.0, 0.0, 0.0],
        "x": [0.0, 1.0, 0.55, 1.8],
        "frame": [0, 0, 1, 1],
    })
    out_h = link(f.copy(), 1.0, backend="host")
    out_d = link(f.copy(), 1.0, backend="device")
    ph = out_h["particle"].to_numpy()
    pd_ = out_d["particle"].to_numpy()
    assert len(np.unique(ph)) == 2
    assert len(np.unique(pd_)) == 2
    # identical continuation structure
    assert (ph[2] == ph[0]) and (pd_[2] == pd_[0])
    assert (ph[3] == ph[1]) and (pd_[3] == pd_[1])


def test_device_auction_matches_host_random_crossings(rng):
    """Random dense frames with many contended subnets: device auction
    and host Hungarian must produce identical assignment COSTS (the
    objective value pins optimality; id numbering may differ)."""
    import pandas as pd

    from clustertracking_tpu import link

    sr = 1.2
    for trial in range(6):
        n = 14
        a = rng.uniform(0, 6, (n, 2))
        b = a + rng.normal(0, 0.5, (n, 2))  # crowded, ambiguous moves
        f = pd.DataFrame({
            "y": np.concatenate([a[:, 0], b[:, 0]]),
            "x": np.concatenate([a[:, 1], b[:, 1]]),
            "frame": [0] * n + [1] * n,
        })
        def cost(out):
            p = out["particle"].to_numpy()
            c = 0.0
            for j in range(n):
                match = np.nonzero(p[:n] == p[n + j])[0]
                if len(match):
                    c += float(np.sum((b[j] - a[match[0]]) ** 2))
                else:
                    c += sr ** 2
            return c
        ch = cost(link(f.copy(), sr, backend="host"))
        cd = cost(link(f.copy(), sr, backend="device"))
        assert abs(ch - cd) < 1e-4, (trial, ch, cd)


def test_binned_matches_dense_device(rng):
    """The binned auction (VERDICT r2 item 5) prunes candidates by
    spatial cell but must produce the same assignments as the dense
    device auction on ordinary data."""
    f = _walkers(rng, n=10, T=10)
    out_d = link(f, search_range=3.0, backend="device")
    out_b = link(f, search_range=3.0, backend="device-binned")
    assert _tracks_as_sets(out_d) == _tracks_as_sets(out_b)


def test_binned_matches_host_random_crossings(rng):
    """Contended crossings: the binned auction reaches the same
    assignment COST as the host Hungarian optimum."""
    sr = 1.2
    for trial in range(4):
        n = 14
        a = rng.uniform(0, 6, (n, 2))
        b = a + rng.normal(0, 0.5, (n, 2))
        f = pd.DataFrame({
            "y": np.concatenate([a[:, 0], b[:, 0]]),
            "x": np.concatenate([a[:, 1], b[:, 1]]),
            "frame": [0] * n + [1] * n,
        })

        def cost(out):
            p = out["particle"].to_numpy()
            c = 0.0
            for j in range(n):
                match = np.nonzero(p[:n] == p[n + j])[0]
                if len(match):
                    c += float(np.sum((b[j] - a[match[0]]) ** 2))
                else:
                    c += sr ** 2
            return c

        ch = cost(link(f.copy(), sr, backend="host"))
        cb = cost(link(f.copy(), sr, backend="device-binned"))
        assert abs(ch - cb) < 1e-4, (trial, ch, cb)


def test_binned_memory_bridges_gap():
    rows = [
        {"frame": 0, "y": 10.0, "x": 10.0},
        {"frame": 1, "y": 10.5, "x": 10.0},
        {"frame": 3, "y": 11.5, "x": 10.0},
    ]
    rows += [{"frame": t, "y": 50.0, "x": 50.0} for t in range(4)]
    f = pd.DataFrame(rows)
    out0 = link(f, search_range=2.0, memory=0, backend="device-binned")
    assert out0["particle"].iloc[2] != out0["particle"].iloc[0]
    out1 = link(f, search_range=2.0, memory=1, backend="device-binned")
    assert out1["particle"].iloc[2] == out1["particle"].iloc[0]
    steady = out1.iloc[3:]
    assert steady["particle"].nunique() == 1


def test_binned_cell_boundary_pairs():
    """A feature must see a track one cell over (the 3x3 neighborhood):
    pairs straddling cell boundaries at distance just under
    search_range must link."""
    sr = 5.0
    rows = []
    # steps of +4.9 px per frame cross cell lines repeatedly
    for t in range(6):
        rows.append({"frame": t, "y": 7.0, "x": 3.0 + 4.9 * t})
        rows.append({"frame": t, "y": 40.0, "x": 60.0 - 4.9 * t})
    f = pd.DataFrame(rows)
    out = link(f, sr, backend="device-binned")
    assert out["particle"].nunique() == 2
    assert (out.groupby("particle").size() == 6).all()
