"""Cluster discovery: reference semantics (transitive, <=separation) on
hand-placed geometries; device label-propagation vs host union-find parity
(SURVEY.md §4 cluster-finding tests)."""
import numpy as np
import pandas as pd
import pytest

from clustertracking_tpu import find_clusters
from clustertracking_tpu.ops.find import (
    connected_components,
    cluster_sizes,
    host_connected_components,
)


def _df(coords, frame=0):
    f = pd.DataFrame(np.asarray(coords, dtype=float), columns=["y", "x"])
    f["frame"] = frame
    return f


def test_pair_below_separation_merges():
    f = find_clusters(_df([[10, 10], [10, 14]]), separation=5)
    assert f["cluster"].nunique() == 1
    assert (f["cluster_size"] == 2).all()


def test_pair_above_separation_stays_split():
    f = find_clusters(_df([[10, 10], [10, 16]]), separation=5)
    assert f["cluster"].nunique() == 2
    assert (f["cluster_size"] == 1).all()


def test_distance_exactly_separation_merges():
    """cKDTree.query_pairs uses <= r (reference contract)."""
    f = find_clusters(_df([[10, 10], [10, 15]]), separation=5)
    assert f["cluster"].nunique() == 1


def test_transitive_chain_forms_one_cluster():
    """A-B-C chain where only consecutive pairs overlap → ONE cluster
    (connected components, not cliques) — SURVEY.md §3.2."""
    f = find_clusters(_df([[10, 10], [10, 14], [10, 18]]), separation=5)
    assert f["cluster"].nunique() == 1
    assert (f["cluster_size"] == 3).all()


def test_per_frame_isolation():
    f = pd.concat([_df([[10, 10]], 0), _df([[10, 11]], 1)])
    f = find_clusters(f.reset_index(drop=True), separation=5)
    assert f["cluster"].nunique() == 2  # different frames never merge


def test_anisotropic_separation():
    # distance 4 along y with sep_y=5 merges; same along x with sep_x=3 not
    f = find_clusters(_df([[10, 10], [14, 10]]), separation=(5, 3))
    assert f["cluster"].nunique() == 1
    f = find_clusters(_df([[10, 10], [10, 14]]), separation=(5, 3))
    assert f["cluster"].nunique() == 2


@pytest.mark.parametrize("n_points", [5, 40, 300])
def test_device_matches_host(n_points, rng):
    coords = rng.uniform(0, 60, (n_points, 2))
    f = _df(coords)
    out_h = find_clusters(f, separation=4, backend="host")
    out_d = find_clusters(f, separation=4, backend="device")
    # same grouping ⇒ identical canonical ids
    np.testing.assert_array_equal(
        out_h["cluster"].to_numpy(), out_d["cluster"].to_numpy()
    )
    np.testing.assert_array_equal(
        out_h["cluster_size"].to_numpy(), out_d["cluster_size"].to_numpy()
    )


def test_device_long_chain(rng):
    """Worst-case chain topology (SURVEY.md §7 hard-parts #4)."""
    n = 100
    coords = np.stack([np.zeros(n), np.arange(n) * 3.0], axis=-1)
    f = _df(coords)
    out = find_clusters(f, separation=3.5, backend="device")
    assert out["cluster"].nunique() == 1
    assert (out["cluster_size"] == n).all()


def test_cluster_sizes_op(rng):
    import jax.numpy as jnp

    coords = rng.uniform(0, 30, (64, 2)).astype(np.float32)
    valid = np.ones(64, dtype=bool)
    valid[50:] = False
    labels = connected_components(
        jnp.asarray(coords), jnp.asarray(valid), 4.0, row_chunk=64
    )
    sizes = np.asarray(cluster_sizes(labels, jnp.asarray(valid)))
    ref = host_connected_components(coords[:50], 4.0)
    _, ref_counts = np.unique(ref, return_counts=True)
    ref_sizes = ref_counts[np.unique(ref, return_inverse=True)[1]]
    np.testing.assert_array_equal(sizes[:50], ref_sizes)
    assert (sizes[50:] == 0).all()


def test_3d():
    f = pd.DataFrame(
        [[5, 10, 10], [7, 10, 10], [20, 10, 10]],
        columns=["z", "y", "x"],
    )
    f["frame"] = 0
    out = find_clusters(f, separation=3)
    assert out["cluster"].nunique() == 2


def test_clusters_container():
    """Reference-parity Clusters union-find container (find.py::Clusters)."""
    from clustertracking_tpu import Clusters

    c = Clusters(range(5))
    assert len(c) == 5
    c.add_pair(0, 3)
    c.add_pair(3, 4)  # transitive: {0, 3, 4}
    c.add_pair(1, 2)
    assert len(c) == 2
    ids = c.cluster_id
    assert ids[0] == ids[3] == ids[4]
    assert ids[1] == ids[2]
    assert ids[0] != ids[1]
    sizes = c.cluster_size
    assert sizes[0] == 3 and sizes[1] == 2
    # ids are consecutive, first-appearance ordered
    assert sorted(set(ids.values())) == [0, 1]
