"""On-device cluster discovery: connected components over candidate coords.

Rebuild of clustertracking/find.py::find_clusters / Clusters (SURVEY.md §2,
§3.2).  The reference builds a cKDTree, queries pairs within ``separation``
and merges them with a Python union-find.  On TPU we avoid data-dependent
structures entirely (SURVEY.md §7 M3):

- pairwise squared distances are computed in row-chunks via per-axis
  direct differences, never materializing the full N×N×D tensor.  The
  matmul expansion |a|²+|b|²-2a·b would feed the MXU but loses ~3 decimal
  digits to cancellation at config-5 coordinate magnitudes (|x|²≈6e4 in
  f32 → absolute d2 error ~6e-3), flipping borderline pairs vs the f64
  host cKDTree (measured: parity failures at N≥4096 dense frames).
  Direct subtraction of nearby floats is exactly rounded, so the d2
  error is ~1e-7 and parity holds; the VPU cost (~3D ops/pair) is
  sub-millisecond at N=16k;
- connected components come from iterated *min-label propagation* (each
  point takes the minimum label among its neighbors) accelerated with
  pointer jumping (``labels = labels[labels]``), which converges in
  O(log(diameter)) passes — bounded by ``max_iter`` with a host fallback
  for pathological chains (SURVEY.md §7 hard-parts #4).

The behavioral contract is the reference's: clustering is *transitive*
(chains A–B–C where only consecutive pairs are within ``separation`` form
one cluster), and the pair predicate is ``distance <= separation``
(cKDTree.query_pairs semantics), anisotropic separations supported by
per-axis scaling.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["connected_components", "cluster_sizes", "host_connected_components"]

_INF = jnp.iinfo(jnp.int32).max


@partial(jax.jit, static_argnames=("row_chunk", "max_iter", "max_degree"))
def connected_components(
    coords,
    valid,
    separation,
    row_chunk: int = 256,
    max_iter: int = 64,
    coords_lo=None,
    max_degree: int = 64,
):
    """Label connected components of the <=separation overlap graph.

    Args:
      coords: [N, D] positions (padding rows arbitrary).
      valid: [N] bool, False for padding.
      separation: scalar or [D] per-axis separation.
      row_chunk: rows per distance tile (N must be a multiple; pad first).
      max_iter: cap on propagate+jump rounds (each round at least halves
        the remaining label-tree height).
      coords_lo: optional [N, D] f32 residual of the f64 positions after
        f32 rounding (``f64 - f32(f64)``).  f32 alone quantizes a 1024²
        frame's coordinates to ~1e-5 px, which flips razor-edge pairs vs
        the host's f64 cKDTree (measured at N≥16k dense frames); with the
        hi/lo split the per-axis difference is exact to ~1e-7 relative
        because nearby-float subtraction is exactly rounded.
      max_degree: unused (kept for call compatibility).  A neighbor-list
        variant (one O(N²) pass + O(N·K) sweeps) was measured SLOWER than
        re-walking the matrix: lax.top_k over the N-column adjacency rows
        cost 5.7 s at N=65k vs 275 ms total for full-matrix propagation.

    Returns:
      labels: [N] int32 — root index per point (same value = same cluster);
        padding rows keep their own index.
    """
    N, D = coords.shape
    if N % row_chunk:
        raise ValueError(f"N={N} must be a multiple of row_chunk={row_chunk}")
    sep = jnp.broadcast_to(
        jnp.asarray(separation, dtype=coords.dtype), (D,)
    )
    x = coords
    xlo = coords_lo
    idx = jnp.arange(N, dtype=jnp.int32)
    starts = jnp.arange(0, N, row_chunk, dtype=jnp.int32)

    def adj_block(i0):
        """[row_chunk, N] adjacency (self-excluded) for rows i0:i0+chunk."""
        xb = jax.lax.dynamic_slice(x, (i0, 0), (row_chunk, D))
        vb = jax.lax.dynamic_slice(valid, (i0,), (row_chunk,))
        # per-axis direct differences: exactly-rounded subtraction keeps
        # d2 accurate to ~1e-7 near the threshold (see module docstring);
        # accumulated per axis so only [chunk, N] lives.  Scaling by
        # 1/sep happens AFTER the subtraction so the division rounds an
        # O(1)-magnitude value, not the coords.
        d2 = jnp.zeros((row_chunk, N), dtype=x.dtype)
        for d in range(D):
            diff = xb[:, d, None] - x[None, :, d]
            if xlo is not None:
                xlb = jax.lax.dynamic_slice(xlo, (i0, 0), (row_chunk, D))
                diff = diff + (xlb[:, d, None] - xlo[None, :, d])
            diff = diff / sep[d]
            d2 = d2 + diff * diff
        return (d2 <= 1.0) & valid[None, :] & vb[:, None]

    def neighbor_min(labels):
        """For each point: min label over {self} ∪ neighbors."""

        def block(carry, i0):
            cand = jnp.where(adj_block(i0), labels[None, :], _INF)
            return carry, jnp.min(cand, axis=1)

        _, mins = jax.lax.scan(block, None, starts)
        mins = mins.reshape(N)
        return jnp.minimum(labels, jnp.where(valid, mins, labels))

    def cond(state):
        it, labels, changed = state
        return (it < max_iter) & changed

    def body(state):
        it, labels, _ = state
        new = neighbor_min(labels)
        new = new[new]        # pointer jumping (path halving)
        new = new[new]
        return it + 1, new, jnp.any(new != labels)

    _, labels, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), idx, jnp.asarray(True))
    )
    return labels


@jax.jit
def cluster_sizes(labels, valid):
    """Per-point size of its cluster (padding rows → 0)."""
    N = labels.shape[0]
    counts = jnp.zeros((N,), jnp.int32).at[labels].add(
        valid.astype(jnp.int32)
    )
    return jnp.where(valid, counts[labels], 0)


def host_connected_components(coords: np.ndarray, separation) -> np.ndarray:
    """Exact host path: cKDTree pairs + union-find (reference semantics).

    Used for parity tests and as the spill path; returns root labels like
    the device version."""
    from scipy.spatial import cKDTree

    coords = np.asarray(coords, dtype=float)
    N, D = coords.shape
    sep = np.broadcast_to(np.asarray(separation, dtype=float), (D,))
    parent = np.arange(N)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    if N:
        tree = cKDTree(coords / sep)
        for i, j in tree.query_pairs(1.0):
            ri, rj = find(i), find(j)
            if ri != rj:
                if ri < rj:
                    parent[rj] = ri
                else:
                    parent[ri] = rj
    return np.array([find(i) for i in range(N)])
