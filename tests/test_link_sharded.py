"""Frame-sharded linking + boundary stitching vs single-scan linking.

Runs on the conftest's 8-device virtual CPU mesh — the multi-chip link
design from SURVEY.md §5 (each device links its frame range; boundaries
stitch via head/tail greedy matching)."""
import numpy as np
import jax
import pytest

from clustertracking_tpu.ops.link import link_on_device
from clustertracking_tpu.parallel.linking import link_sharded
from clustertracking_tpu.parallel.sharding import make_mesh


def _trajectories(T=16, N=10, seed=4, step=0.4):
    rng = np.random.default_rng(seed)
    start = rng.uniform(10, 90, (N, 2))
    pos = np.zeros((T, N, 2), np.float32)
    pos[0] = start
    for t in range(1, T):
        pos[t] = pos[t - 1] + rng.normal(0, step, (N, 2))
    valid = np.ones((T, N), bool)
    return pos, valid


def _canon(parts, valid):
    """Partition signature: group label per (t, k), first-appearance ids."""
    out = np.full(parts.shape, -1, np.int64)
    mapping = {}
    for t in range(parts.shape[0]):
        for k in range(parts.shape[1]):
            if not valid[t, k]:
                continue
            p = int(parts[t, k])
            if p not in mapping:
                mapping[p] = len(mapping)
            out[t, k] = mapping[p]
    return out


def test_sharded_matches_single_scan():
    pos, valid = _trajectories()
    single = np.asarray(link_on_device(pos, valid, 3.0, 0))
    sharded = link_sharded(pos, valid, 3.0, 0, n_shards=4)
    np.testing.assert_array_equal(
        _canon(single, valid), _canon(sharded, valid)
    )


def test_sharded_on_mesh():
    pos, valid = _trajectories(T=24)
    mesh = make_mesh(jax.devices()[:4])
    single = np.asarray(link_on_device(pos, valid, 3.0, 0))
    sharded = link_sharded(pos, valid, 3.0, 0, mesh=mesh)
    np.testing.assert_array_equal(
        _canon(single, valid), _canon(sharded, valid)
    )


def test_sharded_with_memory_gap_at_boundary():
    """A particle vanishing exactly across a shard cut reconnects when
    memory allows."""
    pos, valid = _trajectories(T=16, N=6)
    # particle 0 is missing in frames 7 and 8 (the 4-shard cut is at 8)
    valid[7, 0] = False
    valid[8, 0] = False
    single = np.asarray(link_on_device(pos, valid, 3.0, 2))
    sharded = link_sharded(pos, valid, 3.0, 2, n_shards=4)
    np.testing.assert_array_equal(
        _canon(single, valid), _canon(sharded, valid)
    )
    # the track really is one trajectory end-to-end
    assert sharded[6, 0] == sharded[9, 0]


def test_sharded_uneven_frames():
    pos, valid = _trajectories(T=13)
    single = np.asarray(link_on_device(pos, valid, 3.0, 0))
    sharded = link_sharded(pos, valid, 3.0, 0, n_shards=4)
    np.testing.assert_array_equal(
        _canon(single, valid), _canon(sharded, valid)
    )


def test_sharded_dense_routes_to_binned():
    """K>2048 dense frames under a mesh must take the BINNED in-shard
    linker (VERDICT r3 item 6): the dense [K, K·(memory+2)] auction
    matrix at K=4096, memory=0 would be 4096×8192 f32 per shard step —
    the allocation the binned candidate graph exists to avoid — and the
    partition must still match the single-scan result."""
    rng = np.random.default_rng(7)
    T, N = 8, 4096
    # well-separated walkers on a large field so linking is unambiguous
    gx, gy = np.meshgrid(np.arange(64), np.arange(64))
    start = np.stack(
        [gy.ravel() * 10.0 + 5.0, gx.ravel() * 10.0 + 5.0], axis=-1
    ).astype(np.float32)[:N]
    pos = np.zeros((T, N, 2), np.float32)
    pos[0] = start
    for t in range(1, T):
        pos[t] = pos[t - 1] + rng.normal(0, 0.3, (N, 2)).astype(np.float32)
    valid = np.ones((T, N), bool)

    mesh = make_mesh(jax.devices()[:4])
    sharded = link_sharded(pos, valid, 3.0, 0, mesh=mesh)  # backend='auto'
    from clustertracking_tpu.ops.link import link_on_device_binned

    single = np.asarray(link_on_device_binned(
        pos, valid, 3.0, 0,
        bounds=((0.0, 640.0), (0.0, 640.0)),
    ))
    np.testing.assert_array_equal(
        _canon(single, valid), _canon(sharded, valid)
    )
    assert len(np.unique(sharded[sharded >= 0])) == N


def test_sharded_backend_honored_via_public_link():
    """ct.link(f, mesh=..., backend='device-binned') runs the binned
    in-shard linker and records it (link_backend attr + ledger)."""
    import pandas as pd
    import clustertracking_tpu as ct

    pos, valid = _trajectories(T=16)
    rows = []
    for t in range(pos.shape[0]):
        for k in range(pos.shape[1]):
            rows.append({"frame": t, "y": pos[t, k, 0], "x": pos[t, k, 1]})
    f = pd.DataFrame(rows)
    mesh = make_mesh(jax.devices()[:4])
    out_auto = ct.link(f, 3.0, mesh=mesh)
    out_binned = ct.link(f, 3.0, mesh=mesh, backend="device-binned")
    assert out_auto.attrs["link_backend"] == "sharded:device"
    assert out_binned.attrs["link_backend"] == "sharded:device-binned"
    # same partition either way
    key = lambda o: o.groupby("particle")["frame"].count().sort_values()
    assert out_auto["particle"].nunique() == pos.shape[1]
    assert out_binned["particle"].nunique() == pos.shape[1]
    with pytest.raises(ValueError):
        ct.link(f, 3.0, mesh=mesh, backend="host")


def test_contended_crossing_at_shard_boundary():
    """Two trajectories crossing AT the shard cut where greedy sorted-
    by-distance stitching and the Hungarian optimum differ (VERDICT r2
    item 8): tails end at x=0.0 and 1.0; heads begin at x=0.55 and 1.8.
    Greedy pairs (B,C) [d=0.45] stranding A and D; the optimum pairs
    (A,C)+(B,D) [0.3025+0.64 < 0.2025+2·SR²] and continues both."""
    T, S = 8, 2
    Ts = T // S
    pos = np.full((T, 2, 2), 50.0, np.float32)
    valid = np.ones((T, 2), bool)
    # two walkers at fixed y, converging in x toward the cut at t=4
    xa = [0.0, 0.0, 0.0, 0.0, 0.55, 0.55, 0.55, 0.55]
    xb = [1.0, 1.0, 1.0, 1.0, 1.80, 1.80, 1.80, 1.80]
    for t in range(T):
        pos[t, 0] = (50.0, 20.0 + xa[t])
        pos[t, 1] = (50.0, 20.0 + xb[t])
    single = np.asarray(link_on_device(pos, valid, 1.0, 0))
    sharded = link_sharded(pos, valid, 1.0, 0, n_shards=S)
    n_single = len(np.unique(single[single >= 0]))
    n_sharded = len(np.unique(sharded[sharded >= 0]))
    assert n_single == 2
    assert n_sharded == 2, (
        f"boundary stitch stranded a track: {n_sharded} trajectories"
    )
    np.testing.assert_array_equal(
        _canon(single, valid), _canon(sharded, valid)
    )


def test_sharded_track_spans_two_cuts():
    """VERDICT r4 item 8: with short shards (Ts <= memory) a track whose
    memory-window absence swallows a WHOLE shard must still bridge —
    the adjacent-only stitch fragmented it where the single-scan linker
    reconnects."""
    pos, valid = _trajectories(T=12, N=5, step=0.2)
    # 4 shards of 3 frames; particle 0 vanishes frames 3..6 (4 frames =
    # memory), i.e. across BOTH the 3|4 and 6|7 cuts, covering shard 1
    # entirely.  memory=4 allows the 5-frame gap (last seen 2, next 7).
    for t in range(3, 7):
        valid[t, 0] = False
    single = np.asarray(link_on_device(pos, valid, 3.0, 4))
    sharded = link_sharded(pos, valid, 3.0, 4, n_shards=4)
    np.testing.assert_array_equal(
        _canon(single, valid), _canon(sharded, valid)
    )
    assert sharded[2, 0] == sharded[7, 0]


def test_sharded_two_cut_gap_not_overmerged():
    """The multi-boundary reach must not re-consume a stitched tail: a
    DEAD track (gap > memory) near a live one stays fragmented exactly
    like the single scan says."""
    pos, valid = _trajectories(T=12, N=5, step=0.2)
    # particle 1 dies at frame 2 for good (gap exceeds memory)
    for t in range(3, 12):
        valid[t, 1] = False
    # particle 0 vanishes over shard 1 as above, reappears at 7
    for t in range(3, 7):
        valid[t, 0] = False
    single = np.asarray(link_on_device(pos, valid, 3.0, 4))
    sharded = link_sharded(pos, valid, 3.0, 4, n_shards=4)
    np.testing.assert_array_equal(
        _canon(single, valid), _canon(sharded, valid)
    )
