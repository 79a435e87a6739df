"""find_clusters — DataFrame API for cluster discovery.

Rebuild of clustertracking/find.py::find_clusters (SURVEY.md §3.2): groups
candidate feature coordinates into clusters by transitive <=separation
overlap, per frame, adding ``cluster`` (int id, consecutive within the
DataFrame) and ``cluster_size`` columns.

Backends: ``'host'`` (cKDTree + union-find, exact reference semantics) or
``'device'`` (the TPU label-propagation kernel in ops/find.py).  Both
produce identical groupings; ids are canonicalized to first-appearance
order so the outputs match exactly.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from .ops.find import connected_components, host_connected_components
from .utils import guess_pos_columns, validate_tuple

__all__ = ["Clusters", "find_clusters"]

# 'auto' backend routing: frames with at least this many candidates take
# the device label-propagation path when a TPU is attached.  Measured on
# v5e through the axon tunnel (benchmarks/find_exp.py, r5, after the
# precision fixes): host cKDTree+union-find vs device dispatch+fetch is
# 21.8/31.2 ms at 8k, 38.0/50.9 at 16k, 74.0/99.6 at 32k, 163/275 at 65k
# — the host WINS at every realistic scale here because every device
# call pays the ~27 ms tunnel round-trip twice (dispatch + label fetch)
# and the O(N²) propagation re-walk is HBM-bound.  On a locally-attached
# TPU (no RTT) the device compute alone undercuts the host from ~8k up,
# so the threshold is kept finite but above this tunnel's crossover;
# parity is exact at all sizes (hi/lo split, see ops/find.py).
_DEVICE_MIN_FEATURES = 100_000


class Clusters:
    """Union-find bookkeeping over feature indices.

    API parity with clustertracking/find.py::Clusters (SURVEY.md §3.2):
    start with every index in its own cluster, merge overlapping pairs,
    read back per-index cluster ids (canonicalized to first appearance)
    and sizes.
    """

    def __init__(self, indices):
        self.indices = list(indices)
        self._parent = {int(i): int(i) for i in self.indices}

    def _find(self, a: int) -> int:
        p = self._parent
        while p[a] != a:
            p[a] = p[p[a]]
            a = p[a]
        return a

    def add_pair(self, a: int, b: int) -> None:
        """Merge the clusters containing features a and b."""
        ra, rb = self._find(int(a)), self._find(int(b))
        if ra != rb:
            # deterministic: smaller root wins (first-appearance order)
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self._parent[hi] = lo

    def add_pairs(self, pairs) -> None:
        for a, b in pairs:
            self.add_pair(a, b)

    @property
    def cluster_id(self) -> dict:
        """index → consecutive cluster id, in first-appearance order."""
        out = {}
        mapping = {}
        for i in self.indices:
            r = self._find(int(i))
            if r not in mapping:
                mapping[r] = len(mapping)
            out[int(i)] = mapping[r]
        return out

    @property
    def cluster_size(self) -> dict:
        """index → size of its cluster."""
        ids = self.cluster_id
        counts: dict = {}
        for cid in ids.values():
            counts[cid] = counts.get(cid, 0) + 1
        return {i: counts[cid] for i, cid in ids.items()}

    def __len__(self) -> int:
        return len({self._find(int(i)) for i in self.indices})


def _canonicalize(labels: np.ndarray) -> np.ndarray:
    """Root labels → consecutive ids in order of first appearance."""
    out = np.empty(len(labels), dtype=np.int64)
    mapping = {}
    for i, lab in enumerate(labels):
        if lab not in mapping:
            mapping[lab] = len(mapping)
        out[i] = mapping[lab]
    return out


def _labels_device(coords: np.ndarray, separation) -> np.ndarray:
    import jax.numpy as jnp

    N = len(coords)
    chunk = 256
    Npad = max(chunk, ((N + chunk - 1) // chunk) * chunk)
    coords = np.asarray(coords, dtype=np.float64)
    hi = np.zeros((Npad, coords.shape[1]), dtype=np.float32)
    lo = np.zeros_like(hi)
    hi[:N] = coords.astype(np.float32)
    lo[:N] = (coords - hi[:N].astype(np.float64)).astype(np.float32)
    valid = np.zeros(Npad, dtype=bool)
    valid[:N] = True
    labels = connected_components(
        jnp.asarray(hi), jnp.asarray(valid), np.asarray(separation,
                                                        dtype=np.float32),
        row_chunk=chunk, coords_lo=jnp.asarray(lo),
    )
    return np.asarray(labels)[:N]


def find_clusters(
    f: pd.DataFrame,
    separation,
    pos_columns: Optional[list] = None,
    t_column: str = "frame",
    backend: str = "host",
) -> pd.DataFrame:
    """Assign ``cluster`` / ``cluster_size`` columns (per frame).

    Matches the reference contract: clusters are connected components of
    the "pairwise distance <= separation" graph (transitive chains merge).
    ``separation`` may be scalar or per-axis (anisotropic).

    ``backend='auto'`` routes each frame to the device label-propagation
    kernel when a TPU is attached and the frame has at least
    ``_DEVICE_MIN_FEATURES`` candidates (VERDICT r4 item 7: dense frames
    were paying the host cKDTree in the hot path); both backends produce
    identical groupings (pinned in tests/test_find.py).
    """
    if pos_columns is None:
        pos_columns = guess_pos_columns(f)
    ndim = len(pos_columns)
    separation = validate_tuple(separation, ndim)

    f = f.copy()
    f["cluster"] = -1
    if t_column in f.columns:
        groups = f.groupby(t_column, sort=False).indices.items()
    else:
        groups = [(0, np.arange(len(f)))]

    if backend == "auto":
        try:
            import jax

            on_tpu = jax.default_backend() == "tpu"
        except Exception:  # pragma: no cover - jax always importable here
            on_tpu = False

    next_id = 0
    cluster_col = np.full(len(f), -1, dtype=np.int64)
    for _, idx in groups:
        coords = f.iloc[idx][pos_columns].to_numpy(dtype=float)
        b = backend
        if b == "auto":
            b = ("device"
                 if on_tpu and len(coords) >= _DEVICE_MIN_FEATURES
                 else "host")
        if b == "host":
            labels = host_connected_components(coords, separation)
        elif b == "device":
            labels = _labels_device(coords, separation)
        else:
            raise ValueError(f"Unknown backend {backend!r}")
        ids = _canonicalize(labels) + next_id
        cluster_col[idx] = ids
        next_id = ids.max() + 1 if len(ids) else next_id

    f["cluster"] = cluster_col
    sizes = f.groupby("cluster")["cluster"].transform("size")
    f["cluster_size"] = sizes.astype(np.int64)
    return f
