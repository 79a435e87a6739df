"""End-to-end video tracking: locate → find → refine → link.

The reference has no single pipeline entry point — users compose
trackpy.locate/grey_dilation → find_clusters → refine_leastsq →
trackpy.link_df (SURVEY.md §3.4).  This module provides that composition
as one call, with the candidate locator and linker replaced by the
on-device implementations (ops/locate.py, ops/link.py) so a dense video
(BASELINE config 5: ~10k overlapping features/frame) flows without host
round-trips in the hot stages.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from . import diagnostics
from .find import find_clusters
from .link import link as _link
from .ops.locate import grey_dilation
from .refine import refine_leastsq
from .utils import default_pos_columns, validate_tuple

__all__ = ["locate", "track"]


def locate(
    image,
    diameter,
    separation=None,
    threshold=None,
    percentile: float = 64.0,
    max_features: int = 4096,
    pos_columns: Optional[list] = None,
) -> pd.DataFrame:
    """Candidate features of one frame (integer-pixel local maxima).

    The trackpy.locate stand-in that seeds find_clusters; sub-pixel
    refinement is refine_leastsq's job."""
    image = np.asarray(image)
    ndim = image.ndim
    diameter = validate_tuple(diameter, ndim)
    if separation is None:
        separation = diameter
    separation = validate_tuple(separation, ndim)
    if pos_columns is None:
        pos_columns = default_pos_columns(ndim)
    if threshold is None:
        # Noise-robust default: the raw percentile rule (trackpy's
        # grey_dilation default) sits at the background level on sparse
        # noisy frames and accepts thousands of noise maxima; floor it at
        # median + 6 robust sigma (MAD).  Noiseless images (MAD = 0) keep
        # the exact percentile behavior.
        med = float(np.median(image))
        mad = float(np.median(np.abs(image - med)))
        threshold = max(
            float(np.percentile(image, percentile)),
            med + 6.0 * 1.4826 * mad,
        )
    coords, vals, valid = grey_dilation(
        image.astype(np.float32), separation,
        percentile=percentile, max_features=max_features,
        threshold=threshold,
    )
    ok = np.asarray(valid)
    f = pd.DataFrame(
        np.asarray(coords)[ok].astype(float), columns=pos_columns
    )
    f["signal"] = np.asarray(vals)[ok]
    return f


def track(
    reader,
    diameter,
    separation=None,
    search_range: Optional[float] = None,
    memory: int = 0,
    n_frames: Optional[int] = None,
    locate_separation=None,
    threshold=None,
    percentile: float = 64.0,
    max_features: int = 4096,
    link_backend: Optional[str] = None,
    find_backend: str = "host",
    t_column: str = "frame",
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 16,
    recover_passes: int = 0,
    mesh=None,
    **refine_kwargs,
) -> pd.DataFrame:
    """Full pipeline over a video reader: returns refined, linked features.

    ``recover_passes`` (new capability): in dense scenes, overlapping
    features whose intensity peaks MERGE are invisible to any local-
    maxima locator (the config-5 ledger attributes a 19% feature loss to
    exactly this).  Each recovery pass renders the fitted model on
    device (ops/synth.py), subtracts it from the frames, re-locates
    candidates in the residual — where the missed partner of a blended
    pair stands alone — and refits ALL features together (previous fits
    provide warm starts).  Passes stop early when a residual sweep finds
    nothing new.

    ``reader[t]`` must yield frames (CoordinateReader, ndarray stack via a
    list, or any pims-like reader).

    Checkpoint/resume (new capability — the reference has none, SURVEY.md
    §5): pass ``checkpoint_dir`` to process the video in
    ``checkpoint_every``-frame chunks, persisting accumulated results and
    the incremental linker state after each chunk.  Re-running the same
    call resumes from the last completed chunk; results are identical to a
    single-shot run with ``link_backend='host'`` (the incremental host
    linker is deterministic and its state is serialized exactly — the
    device scan linker has no serializable incremental form, so
    ``link_backend='device'`` is rejected with a checkpoint_dir).

    ``link_backend`` defaults to 'auto' (device linker for moderate
    per-frame counts, host for dense frames) for single-shot runs and 'host'
    for checkpointed runs."""
    if n_frames is None:
        n_frames = len(reader)
    if checkpoint_dir is not None:
        if link_backend not in (None, "host"):
            raise ValueError(
                "checkpointed track() links with the serializable host "
                "Linker; link_backend='device' is not resumable — omit "
                "link_backend or pass 'host'"
            )
        return _track_checkpointed(
            reader, diameter, separation, search_range, memory, n_frames,
            locate_separation, threshold, percentile, max_features,
            find_backend, t_column, checkpoint_dir, checkpoint_every,
            recover_passes, mesh, refine_kwargs,
        )
    reader = _DeviceFrameCache(reader)
    ndim0 = reader[0].ndim
    if locate_separation is None:
        # cluster members sit CLOSER than `separation` by definition, so
        # peak suppression must use a tighter window or overlapping
        # features merge into one candidate
        sep0 = separation if separation is not None else diameter
        locate_separation = tuple(
            max(2, int(round(s / 2))) for s in validate_tuple(sep0, ndim0)
        )
    f = _locate_frames(
        reader, range(n_frames), diameter, locate_separation, threshold,
        percentile, max_features, t_column,
    )

    ndim = len(default_pos_columns(ndim0))
    pos_columns = default_pos_columns(ndim0)
    sep = separation if separation is not None else diameter
    f = find_clusters(f, sep, t_column=t_column, backend=find_backend)
    f, n_spill = _refine_with_recovery(
        f, reader, diameter, sep, range(n_frames), locate_separation,
        threshold, percentile, max_features, find_backend, t_column,
        recover_passes, pos_columns, mesh, refine_kwargs,
    )
    ok = f["cost"].notna()
    # loss ledger: every feature between locate and the linked output is
    # accounted for (spilled features are still fit — on the host scipy
    # path — so they are a *slow* bucket, not a loss)
    diagnostics.record_ledger(
        frames=n_frames,
        candidates_located=len(f),
        clusters=int(f["cluster"].nunique()),
        features_spilled_to_scipy=n_spill,
        fit_accepted=int(ok.sum()),
        fit_rejected=int((~ok).sum()),
    )
    f = f[ok].reset_index(drop=True)
    if search_range is None:
        search_range = float(np.mean(validate_tuple(diameter, ndim)))
    out = _link(
        f, search_range, memory=memory, t_column=t_column,
        backend=link_backend if link_backend is not None else "auto",
        mesh=mesh,
    )
    diagnostics.record_ledger(linked=len(out))
    return out


def _refine_with_recovery(
    f, reader, diameter, sep, frame_numbers, locate_separation,
    threshold, percentile, max_features, find_backend, t_column,
    recover_passes, pos_columns, mesh, refine_kwargs,
):
    """refine_leastsq + residual-relocate recovery passes (shared by the
    single-shot and checkpointed track paths).

    Each pass renders the fitted model on device (ops/synth.py),
    subtracts it from the frames, re-locates candidates in the residual
    — where the missed partner of a blended pair stands alone — and
    refits ALL features together.  Returns (refined DataFrame, spill
    count for the ledger)."""
    max_cluster = int(refine_kwargs.get("max_cluster_size", 8))
    n_spill = int((f["cluster_size"] > max_cluster).sum())
    f = refine_leastsq(
        f, reader, diameter, sep, t_column=t_column, mesh=mesh,
        **refine_kwargs,
    )
    for _ in range(recover_passes):
        from scipy.spatial import cKDTree

        dup_r = 0.5 * float(min(locate_separation))
        acc = f[f["cost"].notna()]
        new = _locate_frames(
            _ResidualReader(
                reader, acc, refine_kwargs.get("fit_function", "gauss"),
                t_column, pos_columns,
            ),
            frame_numbers, diameter, locate_separation, threshold,
            percentile, max_features, t_column,
        )
        if len(new):
            # drop residual candidates sitting ON TOP of an already
            # fitted feature (imperfect fits leave small residual peaks);
            # the radius must stay well below the blend distance or the
            # hidden partner of a merged pair — the whole point of the
            # pass, ~1-2 px from the blob-center fit — would be dropped
            kept = []
            for t, g in new.groupby(t_column):
                at = acc[acc[t_column] == t]
                if len(at):
                    tree = cKDTree(at[pos_columns].to_numpy())
                    d, _ = tree.query(g[pos_columns].to_numpy(), k=1)
                    kept.append(g[d >= dup_r])
                else:
                    kept.append(g)
            new = pd.concat(kept, ignore_index=True) if kept else new
        if not len(new):
            break
        # carry EVERY fitted parameter column of the accepted features
        # into the refit (they are both the warm start and — via the
        # rejection-keeps-originals contract — the fallback when a
        # joint refit fails); recovered candidates fill missing params
        # with the accepted-population medians
        carry = [
            c for c in acc.columns
            if c not in ("cluster", "cluster_size", "cost",
                         "fit_converged", "fit_n_iter", "particle")
            and not c.endswith("_std")
        ]
        new_f = new.copy()
        for c in carry:
            if c not in new_f.columns:
                new_f[c] = float(acc[c].median())
        combined = pd.concat(
            [acc[carry], new_f[carry]], ignore_index=True
        )
        combined["_recovered"] = np.concatenate(
            [np.zeros(len(acc), bool), np.ones(len(new), bool)]
        )
        # previous fit cost per ORIGINAL feature: the reference value
        # for the likelihood-ratio accept below (a recovered candidate
        # must BUY its place by dropping its cluster's cost)
        combined["_old_cost"] = np.concatenate(
            [acc["cost"].to_numpy(dtype=float),
             np.full(len(new), np.nan)]
        )
        combined = find_clusters(
            combined, sep, t_column=t_column, backend=find_backend
        )
        # a recovered candidate that pushes its cluster past the bucket
        # cap would send the whole (degenerate, blended) group to the
        # slow serial scipy spill — keep the original features there
        over = combined["cluster_size"] > max_cluster
        drop = over & combined["_recovered"]
        if drop.any():
            combined = combined.drop(
                columns=["cluster", "cluster_size"]
            )[~drop]
            combined = find_clusters(
                combined, sep, t_column=t_column, backend=find_backend
            )
        n_recovered = int(len(new) - drop.sum())
        if n_recovered == 0:
            break
        diagnostics.record_ledger(recovered_candidates=n_recovered)
        n_spill += int(
            (combined["cluster_size"] > max_cluster).sum()
        )
        sig_floor = 0.05 * float(acc["signal"].median())
        f = refine_leastsq(
            combined, reader, diameter, sep, t_column=t_column,
            mesh=mesh, **refine_kwargs,
        )
        recovered_col = f["_recovered"].to_numpy()
        old_cost_col = f["_old_cost"].to_numpy()
        f = f.drop(columns=["_recovered", "_old_cost"])
        # Likelihood-ratio accept (VERDICT r2 item 3): a recovered
        # candidate joins only if its cluster's JOINT refit cost beats
        # the previous fit of the original members it joins by a real
        # margin.  A missing partner of a blended pair leaves a huge
        # residual, so the joint cost drops by a large factor; a
        # fit-imperfection lobe buys only a marginal improvement
        # (adding any free feature always helps a little).  Clusters
        # made ONLY of recovered candidates (a feature the locator
        # missed entirely, standing alone in the residual) have no old
        # reference and are kept on the fit-acceptance criteria alone.
        ghost = np.zeros(len(f), dtype=bool)
        cl = f["cluster"].to_numpy()
        costs = f["cost"].to_numpy().copy()
        n_restored = 0
        for cid in np.unique(cl[recovered_col]):
            rows_c = np.nonzero(cl == cid)[0]
            new_cost = costs[rows_c[0]]
            if not np.isfinite(new_cost):
                # the joint refit DIVERGED (degenerate near-coincident
                # candidates do this): the rejection contract already
                # left the original members' previously fitted values
                # in place — restore their old cost so they survive,
                # and drop the recovered candidates that broke the fit
                ghost[rows_c[recovered_col[rows_c]]] = True
                orig = rows_c[~recovered_col[rows_c]]
                good = orig[np.isfinite(old_cost_col[orig])]
                costs[good] = old_cost_col[good]
                n_restored += len(good)
                continue
            old = old_cost_col[rows_c]
            old = old[np.isfinite(old)]
            if not len(old):
                continue  # all-new cluster: no reference to beat
            if new_cost > 0.8 * float(np.mean(old)):
                ghost[rows_c[recovered_col[rows_c]]] = True
        if n_restored:
            f["cost"] = costs
            diagnostics.record_ledger(
                refit_failures_restored=n_restored
            )
        # a superfluous candidate (e.g. both residual lobes of a blended
        # pair plus the original) converges to ~zero signal in the joint
        # refit — prune it rather than emit a ghost feature
        ghost = pd.Series(ghost, index=f.index) | (
            f["cost"].notna() & (f["signal"] < sig_floor)
        )
        # ...or the refit splits one true feature's signal across two
        # near-coincident candidates: drop the dimmer of any accepted
        # pair closer than dup_r (true features sit >= separation apart)
        gvals = ghost.to_numpy().copy()
        sig_np = f["signal"].to_numpy()
        okv = f["cost"].notna().to_numpy()
        for t, idx in f.groupby(t_column).indices.items():
            live = idx[okv[idx] & ~gvals[idx]]
            if len(live) < 2:
                continue
            tree = cKDTree(f.iloc[live][pos_columns].to_numpy())
            for a, b in tree.query_pairs(dup_r):
                dimmer = live[a] if sig_np[live[a]] <= sig_np[live[b]] \
                    else live[b]
                gvals[dimmer] = True
        ghost = pd.Series(gvals, index=f.index)
        if ghost.any():
            diagnostics.record_ledger(ghosts_pruned=int(ghost.sum()))
            f = f[~ghost]
    return f, n_spill


class _DeviceFrameCache:
    """LRU device-resident frame cache wrapped around any reader.

    The pipeline reads every frame twice (locate, then refine); on the
    axon tunnel (~45 MB/s host→device) each extra pass over a 100-frame
    512² f32 video costs ~3 s of pure transfer.  The cache pushes each
    frame to the device once and hands the SAME device array to both
    stages (refine stacks device arrays device-side).  Capacity is
    byte-bounded so long videos cannot exhaust HBM; both stages sweep
    frames in order, so an LRU the size of two dispatch chunks suffices.
    """

    def __init__(self, reader, max_bytes: int = 2 << 30,
                 min_frames: int = 8):
        from collections import OrderedDict

        self._reader = reader
        self._cache = OrderedDict()
        self._max_bytes = max_bytes
        self._min_frames = min_frames
        self._cap = None

    def __len__(self):
        return len(self._reader)

    def __getitem__(self, t):
        import jax.numpy as jnp

        t = int(t)
        if t in self._cache:
            self._cache.move_to_end(t)
            return self._cache[t]
        fr = jnp.asarray(np.asarray(self._reader[t]), jnp.float32)
        if self._cap is None:
            self._cap = max(
                self._min_frames, int(self._max_bytes // max(fr.nbytes, 1))
            )
        self._cache[t] = fr
        while len(self._cache) > self._cap:
            self._cache.popitem(last=False)
        return fr


class _ResidualReader:
    """``reader[t] → frame − rendered fit`` (device-side): the residual
    stream the recovery pass re-locates on.

    The fitted model is rasterized with ops/synth.render_frames from the
    accepted features' fitted parameters; subtracting it leaves missed
    features (blended peaks) standing alone.  A fitted per-cluster
    background is NOT subtracted (it is typically 'const' 0; a nonzero
    one raises the residual floor uniformly, which the MAD-floored
    locate threshold absorbs)."""

    def __init__(self, reader, f_acc, fit_function, t_column,
                 pos_columns):
        from .models.registry import get_model
        from .utils import default_size_columns

        self._reader = reader
        self._model = get_model(fit_function)
        ndim = len(pos_columns)
        aniso_cols = default_size_columns(ndim, False)
        size_cols = (
            aniso_cols
            if all(c in f_acc.columns for c in aniso_cols)
            else default_size_columns(ndim, True)
        )
        self._by_frame = {}
        for t, g in f_acc.groupby(t_column):
            pos = g[pos_columns].to_numpy(dtype=np.float32)
            sig = g["signal"].to_numpy(dtype=np.float32)
            sizes = g[size_cols].to_numpy(dtype=np.float32)
            if sizes.shape[1] == 1:
                sizes = np.repeat(sizes, ndim, axis=1)
            extras = tuple(
                g[e].to_numpy(dtype=np.float32)
                for e in self._model.extra_params
            )
            self._by_frame[int(t)] = (pos, sig, sizes, extras)

    def __len__(self):
        return len(self._reader)

    def __getitem__(self, t):
        import jax.numpy as jnp

        from .ops.synth import render_frames

        frame = self._reader[int(t)]
        entry = self._by_frame.get(int(t))
        if entry is None:
            return jnp.asarray(frame, jnp.float32)
        pos, sig, sizes, extras = entry
        shape = tuple(frame.shape)
        smax = float(sizes.max()) if sizes.size else 1.0
        window = tuple(
            min(int(np.ceil(10 * smax)) + 1, int(d)) for d in shape
        )
        fidx = np.zeros(len(pos), np.int32)
        rendered = render_frames(
            pos, sig, sizes, fidx, 1, shape,
            fit_function=self._model, window=window, extras=extras,
        )[0]
        return jnp.asarray(frame, jnp.float32) - rendered


def _locate_frames(
    reader, frame_numbers, diameter, locate_separation, threshold,
    percentile, max_features, t_column, stack_chunk: int = 64,
):
    """Candidate features for many frames with ONE device dispatch per
    ``stack_chunk`` frames (vmapped local_maxima over the frame stack).

    Per-frame locate dispatches pay the full host↔device round-trip each
    (~27 ms on the axon tunnel — RTT-dominated at 100 frames); batching
    cuts that by ~stack_chunk×.  Frames of differing shapes fall back to
    the per-frame path.  Device-resident frames (from _DeviceFrameCache)
    stay on device: the stack and the threshold statistics are computed
    there.
    """
    import jax
    import jax.numpy as jnp

    from .ops.locate import local_maxima

    frame_numbers = list(frame_numbers)
    out = []
    i = 0
    while i < len(frame_numbers):
        chunk = frame_numbers[i:i + stack_chunk]
        images = [reader[t] for t in chunk]
        if len({tuple(im.shape) for im in images}) != 1:
            for t, im in zip(chunk, images):
                f_t = locate(
                    np.asarray(im), diameter, locate_separation,
                    threshold=threshold,
                    percentile=percentile, max_features=max_features,
                )
                f_t[t_column] = t
                out.append(f_t)
            i += stack_chunk
            continue
        T = len(chunk)
        if any(isinstance(im, jax.Array) for im in images):
            stack = jnp.stack(
                [jnp.asarray(im, jnp.float32) for im in images]
            )
            if threshold is None:
                flat = stack.reshape(T, -1)
                med = jnp.median(flat, axis=1)
                mad = jnp.median(
                    jnp.abs(flat - med[:, None]), axis=1
                )
                pct = jnp.percentile(flat, percentile, axis=1)
                thr = jnp.maximum(pct, med + 6.0 * 1.4826 * mad)
            else:
                thr = jnp.full((T,), threshold, jnp.float32)
        else:
            stack_np = np.stack(images).astype(np.float32)
            flat = stack_np.reshape(T, -1)
            if threshold is None:
                med = np.median(flat, axis=1)
                mad = np.median(np.abs(flat - med[:, None]), axis=1)
                pct = np.percentile(flat, percentile, axis=1)
                thr = np.maximum(
                    pct, med + 6.0 * 1.4826 * mad
                ).astype(np.float32)
            else:
                thr = np.full(T, threshold, np.float32)
            stack = stack_np
        sep = tuple(int(round(s)) for s in locate_separation)

        coords, vals, valid, n_cand = jax.jit(
            jax.vmap(
                lambda im, th: local_maxima(im, sep, max_features, th)
            )
        )(jnp.asarray(stack), jnp.asarray(thr))
        coords = np.asarray(coords)
        vals = np.asarray(vals)
        valid = np.asarray(valid)
        n_cand = np.asarray(n_cand)
        # Saturated frames (more candidates than max_features) got a
        # raster-order truncation from the cumsum compaction; re-run just
        # those through the exact brightest-first top-k path.
        for j in np.nonzero(n_cand > max_features)[0]:
            from .ops.locate import local_maxima_topk

            c_j, v_j, ok_j, _ = local_maxima_topk(
                jnp.asarray(stack[j]), sep, max_features, float(thr[j])
            )
            coords[j] = np.asarray(c_j)
            vals[j] = np.asarray(v_j)
            valid[j] = np.asarray(ok_j)
        ndim = stack.ndim - 1
        pos_columns = default_pos_columns(ndim)
        for j, t in enumerate(chunk):
            ok = valid[j]
            f_t = pd.DataFrame(
                coords[j][ok].astype(float), columns=pos_columns
            )
            f_t["signal"] = vals[j][ok]
            f_t[t_column] = t
            out.append(f_t)
        i += stack_chunk
    return pd.concat(out, ignore_index=True)


def _track_checkpointed(
    reader, diameter, separation, search_range, memory, n_frames,
    locate_separation, threshold, percentile, max_features,
    find_backend, t_column, checkpoint_dir, checkpoint_every,
    recover_passes, mesh, refine_kwargs,
):
    """Chunked track with persisted state (resume-safe).

    Layout of ``checkpoint_dir``: ``state.json`` (next frame, linker
    state, running cluster-id offset) + ``results.pkl`` (accumulated
    linked DataFrame).  Writes are atomic (tmp + rename), so a crash
    mid-chunk resumes from the previous complete chunk.
    """
    import json
    import os
    from pathlib import Path

    from .link import Linker

    ckpt = Path(checkpoint_dir)
    ckpt.mkdir(parents=True, exist_ok=True)
    state_file = ckpt / "state.json"
    results_file = ckpt / "results.pkl"

    reader = _DeviceFrameCache(reader)
    ndim0 = reader[0].ndim
    sep0 = separation if separation is not None else diameter
    if locate_separation is None:
        locate_separation = tuple(
            max(2, int(round(s / 2))) for s in validate_tuple(sep0, ndim0)
        )
    if search_range is None:
        search_range = float(np.mean(validate_tuple(diameter, ndim0)))

    if state_file.exists():
        state = json.loads(state_file.read_text())
        start = int(state["next_frame"])
        linker = Linker.from_state(state["linker"])
        cluster_offset = int(state["cluster_offset"])
        results = pd.read_pickle(results_file) if results_file.exists() \
            else pd.DataFrame()
    else:
        start = 0
        linker = Linker(search_range, memory)
        cluster_offset = 0
        results = pd.DataFrame()

    pos_columns = default_pos_columns(ndim0)
    for chunk_start in range(start, n_frames, checkpoint_every):
        chunk = range(
            chunk_start, min(chunk_start + checkpoint_every, n_frames)
        )
        f = _locate_frames(
            reader, chunk, diameter, locate_separation, threshold,
            percentile, max_features, t_column,
        )
        if len(f):
            f = find_clusters(
                f, sep0, t_column=t_column, backend=find_backend
            )
            # recovery passes (if any) run within the chunk — the
            # residual relocate only needs this chunk's frames, so the
            # composition with resume is exact (VERDICT r2 item 9)
            f, _ = _refine_with_recovery(
                f, reader, diameter, sep0, chunk, locate_separation,
                threshold, percentile, max_features, find_backend,
                t_column, recover_passes, pos_columns, mesh,
                refine_kwargs,
            )
            # recovery re-runs find_clusters (ids restart at 0), so
            # cross-chunk uniqueness is restored by renumbering here
            _, inv = np.unique(
                f["cluster"].to_numpy(), return_inverse=True
            )
            f["cluster"] = cluster_offset + inv
            cluster_offset = int(f["cluster"].max()) + 1
            f = f[f["cost"].notna()].reset_index(drop=True)
            particle = np.full(len(f), -1, dtype=np.int64)
            for t, idx in f.groupby(t_column, sort=True).indices.items():
                particle[idx] = linker.advance(
                    int(t), f.iloc[idx][pos_columns].to_numpy(dtype=float)
                )
            f["particle"] = particle
            results = pd.concat([results, f], ignore_index=True)

        # atomic persist: results first, then the state pointing at them
        tmp = ckpt / "results.pkl.tmp"
        results.to_pickle(tmp)
        os.replace(tmp, results_file)
        tmp = ckpt / "state.json.tmp"
        tmp.write_text(json.dumps({
            "next_frame": int(chunk.stop),
            "linker": linker.state(),
            "cluster_offset": cluster_offset,
        }))
        os.replace(tmp, state_file)

    return results
