"""Rigid-geometry constraints for constrained cluster fits.

Rebuild of clustertracking/constraints.py (SURVEY.md §2): the reference
expresses fixed-geometry constraints as ``{'type': 'eq', 'fun': ...}``
dicts for ``scipy.optimize.minimize(method='SLSQP')``.  SLSQP has no TPU
analog, so per SURVEY.md §7 ("constraints by reparameterization, not
SLSQP") the built-in rigid constraints are handled *exactly* by fitting a
rigid-body pose instead of free positions:

- ``dimer(dist, ndim)``   — two features at fixed center distance ``dist``:
  pose = center + orientation (2D: one angle; 3D: polar+azimuth angles).
- ``trimer(dist, ndim)``  — equilateral triangle with edge ``dist``:
  pose = center + angle (2D) or center + rotation vector (3D).
- ``tetramer(dist)``      — regular tetrahedron with edge ``dist`` (3D):
  pose = center + rotation vector.
- ``dimer_global()``      — like dimer but the bond length itself is a
  fitted parameter; with ``mode='global'`` (default) one shared length is
  learned across all clusters in the fit (the reference's global slot),
  with ``mode='cluster'`` each cluster fits its own length.

The fitted geometry therefore satisfies the constraint *exactly* (the
reference's SLSQP satisfies it to ~1e-5 relative — SURVEY.md §4).

User-supplied reference-style dicts ``{'type': 'eq', 'fun': f,
'cluster_size': n}`` are still accepted: they become weighted penalty
residual rows with weight ``sqrt(residual_factor)`` (the reference's
``residual_factor`` cost scaling, default 1e5, yields the same ~1e-5
constraint satisfaction).

Rotation-vector handling uses Rodrigues' formula with a small-angle-safe
branch; initial poses come from orthogonal Procrustes against the base
geometry (host-side, initialization only).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Constraint",
    "dimer",
    "trimer",
    "tetramer",
    "dimer_global",
    "base_vertices",
    "pose_dim",
    "pose_to_positions",
    "positions_to_pose",
    "wrap_constraint_dicts",
]


@dataclasses.dataclass(frozen=True)
class Constraint:
    """A rigid-geometry constraint on clusters of a given size.

    kind: 'rigid' (reparameterized pose) or 'generic' (penalty rows).
    dist: fixed characteristic distance (edge / bond length); None when
      the distance itself is fitted (dimer_global).
    dist_mode: 'cluster' or 'global' — how a fitted distance is shared.
    fun: for kind='generic': callable(positions[n, D]) -> residuals [...],
      zero when satisfied (reference dict 'fun' adapted to positions).
    """

    kind: str
    cluster_size: int
    ndim: int
    dist: Optional[float] = None
    dist_mode: str = "cluster"
    fun: Optional[Callable] = None
    name: str = ""

    @property
    def fit_dist(self) -> bool:
        return self.kind == "rigid" and self.dist is None


def dimer(dist: float, ndim: int = 2) -> Constraint:
    """Two features at fixed center-to-center distance ``dist``."""
    return Constraint("rigid", 2, ndim, float(dist), name="dimer")


def trimer(dist: float, ndim: int = 2) -> Constraint:
    """Equilateral triangle with edge length ``dist``."""
    return Constraint("rigid", 3, ndim, float(dist), name="trimer")


def tetramer(dist: float, ndim: int = 3) -> Constraint:
    """Regular tetrahedron with edge length ``dist`` (3D only)."""
    if ndim != 3:
        raise ValueError("tetramer requires ndim=3")
    return Constraint("rigid", 4, ndim, float(dist), name="tetramer")


def dimer_global(ndim: int = 2, mode: str = "global") -> Constraint:
    """Dimer whose bond length is itself fitted.

    mode='global' shares one length across all clusters (the reference's
    'global' slot semantics); mode='cluster' fits one per cluster."""
    if mode not in ("global", "cluster"):
        raise ValueError("mode must be 'global' or 'cluster'")
    return Constraint(
        "rigid", 2, ndim, None, dist_mode=mode, name="dimer_global"
    )


# ---------------------------------------------------------------------------
# Pose parameterization
# ---------------------------------------------------------------------------
def circumradius_factor(n: int, ndim: int) -> float:
    """Circumradius per unit edge length for the rigid base shape."""
    if n == 2:
        return 0.5
    if n == 4 and ndim == 3:
        return float(np.sqrt(3.0 / 8.0))  # regular tetrahedron
    return float(1.0 / (2.0 * np.sin(np.pi / n)))  # regular n-gon


def base_vertices(n: int, ndim: int) -> np.ndarray:
    """Unit-circumradius base geometry [n, ndim] (before pose)."""
    if ndim == 2:
        a = 2 * np.pi * np.arange(n) / n
        return np.stack([np.sin(a), np.cos(a)], axis=-1)  # (y, x)
    if n == 2:
        return np.array([[1.0, 0, 0], [-1.0, 0, 0]])  # along z
    if n == 4:
        return (
            np.array(
                [[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]],
                dtype=float,
            )
            / np.sqrt(3.0)
        )
    a = 2 * np.pi * np.arange(n) / n
    return np.stack(
        [np.zeros(n), np.sin(a), np.cos(a)], axis=-1
    )  # planar n-gon in (y, x) plane


def pose_dim(con: Constraint) -> int:
    """Number of pose parameters per cluster (excluding a fitted dist)."""
    if con.ndim == 2:
        q = 3  # center (2) + angle
    elif con.cluster_size == 2:
        q = 5  # center (3) + polar + azimuth
    else:
        q = 6  # center (3) + rotation vector
    return q


def _rodrigues(rotvec):
    """Rotation matrices from rotation vectors [B, 3] (small-angle safe)."""
    theta = jnp.linalg.norm(rotvec, axis=-1, keepdims=True)
    safe = jnp.maximum(theta, 1e-12)
    axis = rotvec / safe
    kx, ky, kz = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(kx)
    K = jnp.stack(
        [
            jnp.stack([zero, -kz, ky], -1),
            jnp.stack([kz, zero, -kx], -1),
            jnp.stack([-ky, kx, zero], -1),
        ],
        -2,
    )  # [B, 3, 3]
    t = theta[..., None]
    eye = jnp.eye(3, dtype=rotvec.dtype)
    R = eye + jnp.sin(t) * K + (1.0 - jnp.cos(t)) * (K @ K)
    # near zero angle: R ≈ I + K*theta (already handled by sin/cos limits)
    return R


def pose_to_positions(pose, con: Constraint, dist=None):
    """pose [B, Q(+1 if fit_dist)] → positions [B, n, D] (jax).

    ``dist`` overrides the constraint's fixed distance (used when the
    distance is a separate fitted slot: pass pose[..., -1])."""
    n, D = con.cluster_size, con.ndim
    if dist is None:
        if con.fit_dist:
            dist = pose[:, -1]
        else:
            dist = jnp.full(pose.shape[:1], con.dist, dtype=pose.dtype)
    R_c = circumradius_factor(n, D) * dist  # [B]
    center = pose[:, :D]
    if D == 2:
        theta = pose[:, 2]
        ang = theta[:, None] + (
            2 * jnp.pi * jnp.arange(n, dtype=pose.dtype) / n
        )[None]
        offs = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    elif n == 2:
        th, ph = pose[:, 3], pose[:, 4]
        u = jnp.stack(
            [jnp.cos(th), jnp.sin(th) * jnp.sin(ph),
             jnp.sin(th) * jnp.cos(ph)],
            axis=-1,
        )  # (z, y, x)
        offs = jnp.stack([u, -u], axis=1)
    else:
        rot = _rodrigues(pose[:, 3:6])
        base = jnp.asarray(base_vertices(n, D), dtype=pose.dtype)
        offs = jnp.einsum("bij,nj->bni", rot, base)
    return center[:, None, :] + R_c[:, None, None] * offs


def positions_to_pose(positions: np.ndarray, con: Constraint) -> np.ndarray:
    """Initial pose from (approximate) positions [B, n, D] — host numpy.

    Uses the centroid + best-fit orientation (Procrustes for 3D rotations).
    Returns [B, Q] (+ fitted dist column when applicable)."""
    positions = np.asarray(positions, dtype=float)
    B, n, D = positions.shape
    center = positions.mean(axis=1)
    rel = positions - center[:, None, :]
    # current characteristic edge length (mean over base-geometry edges)
    base = base_vertices(n, D)
    factor = circumradius_factor(n, D)
    cur_R = np.linalg.norm(rel, axis=-1).mean(axis=1)  # mean circumradius
    dist = cur_R / factor

    if D == 2:
        v0 = rel[:, 0, :]
        theta = np.arctan2(v0[:, 0], v0[:, 1])  # (y, x) convention
        pose = np.concatenate([center, theta[:, None]], axis=1)
    elif n == 2:
        u = rel[:, 0, :]
        u = u / np.maximum(np.linalg.norm(u, axis=-1, keepdims=True), 1e-12)
        th = np.arccos(np.clip(u[:, 0], -1, 1))
        ph = np.arctan2(u[:, 1], u[:, 2])
        pose = np.concatenate(
            [center, th[:, None], ph[:, None]], axis=1
        )
    else:
        from scipy.spatial.transform import Rotation

        rotvecs = np.zeros((B, 3))
        for b in range(B):
            rot, _ = Rotation.align_vectors(rel[b], base * cur_R[b])
            rotvecs[b] = rot.as_rotvec()
        pose = np.concatenate([center, rotvecs], axis=1)

    if con.fit_dist:
        pose = np.concatenate([pose, dist[:, None]], axis=1)
    return pose


def wrap_constraint_dicts(constraints, ndim: int):
    """Adapt reference-style constraint dicts / Constraint objects into a
    {cluster_size: Constraint} map.  Reference dicts ``{'type': 'eq',
    'fun': f, 'args': a, 'cluster_size': n}`` become generic (penalty)
    constraints whose ``fun`` receives positions [n, D]."""
    if constraints is None:
        return {}
    if isinstance(constraints, (Constraint, dict)):
        constraints = [constraints]
    out = {}
    for con in constraints:
        if isinstance(con, dict):
            n = int(con["cluster_size"])
            fun = con["fun"]
            args = tuple(con.get("args", ()))
            wrapped = Constraint(
                "generic",
                n,
                ndim,
                fun=(lambda pos, _f=fun, _a=args: jnp.atleast_1d(
                    _f(pos, *_a)
                )),
                name=con.get("name", "eq"),
            )
            out[n] = wrapped
        elif isinstance(con, Constraint):
            if con.ndim != ndim:
                raise ValueError(
                    f"Constraint {con.name} built for ndim={con.ndim}, "
                    f"fit is {ndim}D"
                )
            out[con.cluster_size] = con
        else:
            raise TypeError(f"Cannot interpret constraint {con!r}")
    return out
