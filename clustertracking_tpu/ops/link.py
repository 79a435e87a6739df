"""On-device frame-to-frame linking as a lax.scan (SURVEY.md §7 M7).

The host linker (clustertracking_tpu/link.py) is the behavioral reference
(greedy-by-distance, trackpy semantics); this device version keeps the
whole dense pipeline on-chip (BASELINE config 5).  Design:

- features per frame are padded to a static K; tracks live in a static
  ring buffer of M = K·(memory+2) slots (new tracks overwrite the oldest
  slots — sized so an active track is never evicted early);
- matching per frame runs R rounds of *mutual nearest neighbor*: a
  (feature, track) pair links iff each is the other's nearest and their
  distance ≤ search_range.  Unresolved contended features after R rounds
  start new tracks.  On unambiguous frames this equals the host/trackpy
  assignment; contended subnets may differ (documented tie-breaking,
  SURVEY.md §7 hard-parts #5) — the host linker remains the exact path;
- ``memory`` semantics match trackpy: a track unseen for ≤ memory frames
  can still claim a feature.

Output: particle id per (frame, feature slot), int32, -1 on padding.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["link_on_device"]

_BIG = jnp.float32(1e30)


@partial(
    jax.jit,
    static_argnames=("search_range", "memory", "nn_rounds"),
)
def link_on_device(
    positions,
    valid,
    search_range: float,
    memory: int = 0,
    nn_rounds: int = 4,
):
    """positions [T, K, D] f32, valid [T, K] bool → particle [T, K] i32."""
    T, K, D = positions.shape
    M = K * (memory + 2)
    r2max = jnp.float32(search_range) ** 2

    def step(state, inputs):
        tpos, tage, tid, ptr, next_id = state
        pos, ok = inputs  # [K, D], [K]

        alive = tage <= memory  # [M]
        # pairwise squared distances [K, M]
        d2 = jnp.sum(
            (pos[:, None, :] - tpos[None, :, :]) ** 2, axis=-1
        )
        d2 = jnp.where(ok[:, None] & alive[None, :], d2, _BIG)
        d2 = jnp.where(d2 <= r2max, d2, _BIG)

        feat_track = jnp.full((K,), -1, jnp.int32)  # matched track per feat

        def round_body(_, carry):
            d2, feat_track = carry
            fb = jnp.argmin(d2, axis=1)               # [K] best track
            fmin = jnp.take_along_axis(
                d2, fb[:, None], axis=1
            )[:, 0]
            tb = jnp.argmin(d2, axis=0)               # [M] best feature
            mutual = (
                (tb[fb] == jnp.arange(K))
                & (fmin < _BIG)
                & (feat_track < 0)
            )
            feat_track = jnp.where(mutual, fb.astype(jnp.int32),
                                   feat_track)
            # knock matched rows/cols out of the distance matrix
            row_dead = mutual
            col_dead = jnp.zeros((M,), bool).at[fb].max(mutual)
            d2 = jnp.where(
                row_dead[:, None] | col_dead[None, :], _BIG, d2
            )
            return d2, feat_track

        d2, feat_track = jax.lax.fori_loop(
            0, nn_rounds, round_body, (d2, feat_track)
        )

        matched = feat_track >= 0
        safe_track = jnp.where(matched, feat_track, 0)

        # update matched tracks (scatter with drop-safe indices)
        upd_idx = jnp.where(matched, feat_track, M)  # M = out of range
        tpos = tpos.at[upd_idx].set(pos, mode="drop")
        tage = tage.at[upd_idx].set(-1, mode="drop")  # ages +1 below

        # new tracks for unmatched valid features → ring-buffer slots
        new = ok & ~matched
        rank = jnp.cumsum(new.astype(jnp.int32)) - 1      # [K]
        slot = (ptr + rank) % M
        slot = jnp.where(new, slot, M)
        ids_new = next_id + rank
        tpos = tpos.at[slot].set(pos, mode="drop")
        tage = tage.at[slot].set(-1, mode="drop")
        tid = tid.at[slot].set(
            jnp.where(new, ids_new, 0), mode="drop"
        )
        n_new = jnp.sum(new.astype(jnp.int32))

        particle = jnp.where(
            matched, tid[safe_track],
            jnp.where(new, ids_new, -1),
        ).astype(jnp.int32)

        tage = tage + 1  # matched/new were set to -1 → become 0
        return (
            (tpos, tage, tid, (ptr + n_new) % M, next_id + n_new),
            particle,
        )

    init = (
        jnp.full((M, D), 1e9, jnp.float32),          # far away
        jnp.full((M,), memory + 2, jnp.int32),       # dead
        jnp.zeros((M,), jnp.int32),
        jnp.int32(0),
        jnp.int32(0),
    )
    _, particles = jax.lax.scan(
        step, init, (positions.astype(jnp.float32), valid)
    )
    return particles
