"""Frame-sharded linking with boundary stitching (SURVEY.md §5).

Linking is the only stage of the pipeline with a sequential dependency
along the time axis (frame t links against t-1..t-memory-1).  The survey's
long-context design: shard the video into contiguous frame ranges, link
each range independently on its own device (pure scan, no comms), then
stitch trajectories across the S-1 range boundaries with a tiny host-side
greedy match — the only cross-shard data is each range's head/tail track
summaries.

Semantics: within a shard, identical to ops/link.py::link_on_device; at a
boundary, a tail track (last seen within ``memory+1`` frames of the cut)
continues into a head track (first seen within ``memory+1`` frames after
it) when they are mutually nearest within ``search_range`` — the same
greedy-by-distance contract as the host linker, applied to the boundary
pairs only.  With short shards (``Ts <= memory``) the reach extends over
``ceil((memory+1)/Ts)`` trailing shards so a track whose memory-window
absence swallows a whole shard still bridges (VERDICT r4 item 8).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.link import link_on_device, link_on_device_binned

__all__ = ["link_sharded"]


def _heads_tails(parts_s, pos_s, valid_s, window):
    """Per-track first/last appearance inside one shard.

    Returns dicts id -> (local_frame, position) for heads (first seen in
    the first ``window`` frames) and tails (last seen in the final
    ``window`` frames)."""
    Ts, K = parts_s.shape
    first = {}
    last = {}
    for t in range(Ts):
        for k in range(K):
            if not valid_s[t, k]:
                continue
            pid = int(parts_s[t, k])
            if pid < 0:
                continue
            if pid not in first:
                first[pid] = (t, pos_s[t, k])
            last[pid] = (t, pos_s[t, k])
    heads = {p: v for p, v in first.items() if v[0] < window}
    tails = {p: v for p, v in last.items() if v[0] >= Ts - window}
    return heads, tails


def link_sharded(
    positions,
    valid,
    search_range: float,
    memory: int = 0,
    n_shards: Optional[int] = None,
    mesh=None,
    axis: str = "data",
    backend: str = "auto",
):
    """Link [T, K, D] padded per-frame positions across an S-way split.

    With ``mesh`` given, the shard axis is placed over the mesh so each
    device runs its own scan (data-parallel in frame ranges); otherwise
    the S scans run batched on one device.  Returns particle ids [T, K]
    (int64, -1 on padding), globally stitched.

    ``backend``: 'device' runs the dense [K, K·(memory+2)] auction in
    every shard; 'device-binned' the spatially binned variant (required
    past ~2k features/frame — the dense matrix is the thing the binned
    linker exists to avoid); 'auto' routes on K with the same threshold
    as the single-device path (link.py).
    """
    positions = np.asarray(positions, np.float32)
    valid = np.asarray(valid, bool)
    T, K, D = positions.shape
    if backend == "auto":
        backend = "device" if K <= 2048 else "device-binned"
    if n_shards is None:
        n_shards = len(mesh.devices.reshape(-1)) if mesh is not None else 1
    S = int(n_shards)
    Ts = -(-T // S)
    Tpad = S * Ts
    if Tpad > T:
        positions = np.concatenate(
            [positions, np.full((Tpad - T, K, D), 1e8, np.float32)]
        )
        valid = np.concatenate([valid, np.zeros((Tpad - T, K), bool)])
    pos_s = positions.reshape(S, Ts, K, D)
    val_s = valid.reshape(S, Ts, K)

    if backend == "device-binned":
        # global cell-grid bounds from the REAL rows (pads sit at 1e8),
        # quantized to 64 px so same-sized videos share one jit; every
        # shard uses the same static bounds, which vmap requires anyway
        if valid.any():
            real = positions.reshape(-1, D)[valid.reshape(-1)]
        else:
            real = np.zeros((1, D), np.float32)
        bounds = tuple(
            (
                float(np.floor(real[:, d].min() / 64.0) * 64.0),
                float(np.ceil((real[:, d].max() + 1) / 64.0) * 64.0),
            )
            for d in range(D)
        )

        def one(p, v):
            return link_on_device_binned(
                p, v, float(search_range), int(memory), bounds=bounds
            )
    elif backend == "device":
        def one(p, v):
            return link_on_device(p, v, float(search_range), int(memory))
    else:
        raise ValueError(f"Unknown sharded link backend {backend!r}")

    fn = jax.jit(jax.vmap(one))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P(axis))
        pos_j = jax.device_put(jnp.asarray(pos_s), sh)
        val_j = jax.device_put(jnp.asarray(val_s), sh)
        parts = np.asarray(fn(pos_j, val_j))
    else:
        parts = np.asarray(fn(jnp.asarray(pos_s), jnp.asarray(val_s)))

    # globalize ids: shard-local ids are < Ts*K
    offset = Ts * K
    parts = parts.astype(np.int64)
    parts = np.where(
        parts >= 0, parts + np.arange(S)[:, None, None] * offset, -1
    )

    # stitch boundaries left -> right
    window = memory + 1
    # With short shards (Ts <= memory) a track may vanish across MORE
    # than one cut — its absence swallows whole shards — so each
    # boundary gathers candidate tails from the last J shards, not just
    # the adjacent one (VERDICT r4 item 8: the adjacent-only stitch
    # silently fragmented such tracks where the single-scan linker
    # bridges them).  J = ceil(window / Ts) bounds the reach: a tail
    # further back is > window frames from any head by construction.
    reach = max(1, -(-window // Ts))
    remap: dict = {}
    # root id -> global frame at which that track's tail was last
    # CONSUMED by a stitch; a stale (same-or-older) appearance of the
    # same track must not be matched again at a later boundary, while a
    # NEWER appearance (the continuation itself) stays eligible.
    consumed: dict = {}

    def resolve(pid):
        while pid in remap:
            pid = remap[pid]
        return pid

    for s in range(1, S):
        heads, _ = _heads_tails(parts[s], pos_s[s], val_s[s], window)
        # latest appearance per physical track (resolved id) across the
        # reachable trailing shards, in GLOBAL frames
        tails_all: dict = {}  # root -> (global_frame, position)
        for j in range(1, min(reach, s) + 1):
            _, tails_j = _heads_tails(parts[s - j], pos_s[s - j],
                                      val_s[s - j], window)
            for tid, (tf_t, p_t) in tails_j.items():
                root = resolve(tid)
                gf_t = (s - j) * Ts + tf_t
                if root in consumed and gf_t <= consumed[root]:
                    continue
                if root not in tails_all or gf_t > tails_all[root][0]:
                    tails_all[root] = (gf_t, p_t)
        # Subnet-optimal stitching (VERDICT r2 item 8): candidate
        # (head, tail) pairs form a bipartite graph; each connected
        # component resolves with the SAME Hungarian objective as the
        # in-shard linker (min sum d², an unmatched head costs
        # search_range²) — greedy sorted-by-distance matching could
        # resolve a contended crossing at the cut differently than the
        # single-scan result.
        cand: dict = {}  # hid -> list of (tid, d2)
        for hid, (tf_h, p_h) in heads.items():
            gf_h = s * Ts + tf_h
            for tid, (gf_t, p_t) in tails_all.items():
                gap = gf_h - gf_t  # frames between appearances
                if gap > window:
                    continue
                d2 = float(np.sum((p_h - p_t) ** 2))
                if d2 <= search_range**2:
                    cand.setdefault(hid, []).append((tid, d2))
        if not cand:
            continue
        parent: dict = {}

        def find(a):
            while parent.setdefault(a, a) != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for hid, tds in cand.items():
            for tid, _ in tds:
                parent[find(("h", hid))] = find(("t", tid))
        subnets: dict = {}
        for hid, tds in cand.items():
            root = find(("h", hid))
            hs, ts = subnets.setdefault(root, ([], set()))
            hs.append(hid)
            ts.update(tid for tid, _ in tds)

        from scipy.optimize import linear_sum_assignment

        sr2 = float(search_range) ** 2
        for hs, ts in subnets.values():
            ts = sorted(ts)
            F, Tn = len(hs), len(ts)
            cost = np.full((F, Tn + F), 4.0 * sr2)
            for r, hid in enumerate(hs):
                cost[r, Tn + r] = sr2  # unmatched head = new track
                for tid, d2 in cand[hid]:
                    cost[r, ts.index(tid)] = d2
            rows, cols = linear_sum_assignment(cost)
            for r, c in zip(rows, cols):
                if c < Tn and cost[r, c] <= sr2:
                    root = resolve(ts[c])
                    remap[hs[r]] = root
                    consumed[root] = tails_all[ts[c]][0]

    if remap:
        flat = parts.reshape(-1)
        uniq = np.unique(flat[flat >= 0])
        lut = {int(u): resolve(int(u)) for u in uniq}
        flat = np.array(
            [lut[int(p)] if p >= 0 else -1 for p in flat], np.int64
        )
        parts = flat.reshape(parts.shape)

    out = parts.reshape(Tpad, K)[:T]
    # canonicalize to consecutive ids in order of first appearance
    flat = out.reshape(-1)
    mapping: dict = {}
    for p in flat:
        if p >= 0 and int(p) not in mapping:
            mapping[int(p)] = len(mapping)
    out = np.array(
        [mapping[int(p)] if p >= 0 else -1 for p in flat], np.int64
    ).reshape(out.shape)
    return out
