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

import time
import warnings
from typing import Optional

import numpy as np
import pandas as pd

from . import diagnostics
from .find import find_clusters
from .link import link as _link
from .refine import refine_leastsq
from .utils import default_pos_columns, validate_tuple

# experiment toggles for the recovery pass (see _refine_with_recovery);
# module-level so A/B measurements can flip them
_BLEND_SPLIT = True
# px; None disables the refit-displacement ghost gate.  3.5 (was 2.0):
# measured at full config-5 scale the 2.0 gate had the worst precision
# of any gate — 65% of its prunes were REAL recoveries (far-flank split
# starts legitimately travel >2 px to their feature); 3.5 keeps the
# runaway-fit kills (+0.4% coverage for +12 ghosts at 37k outputs).
# Override per call: track(recover_disp_gate=...).
_DISP_GATE = 3.5
# Residual candidates CLOSER to an accepted fit than this fraction of
# locate_separation are discarded as fit-imperfection lobes.  Measured
# (mini config-5, 2k features): lowering to 0.25 admits ~200 more
# near-on-top candidates, and coverage DROPS 71.1 → 70.0% with ghosts
# 78 → 93 — that band is junk that corrupts warm starts; 0.5 is right.
_ON_TOP_FRAC = 0.5
# likelihood accept: the joint refit rms must beat the previous model's
# same-footprint residual rms by this factor...
# Likelihood-ratio accept: a cluster's joint refit must beat its
# footprint's previous residual rms by this factor.  0.9 (was 0.8):
# swept at full config-5 scale — +1.1% coverage for +0.1% ghost
# fraction; override per call via track(recover_accept_ratio=...).
_ACCEPT_RATIO = 0.9
# shoulder-lobe gate: recovered candidates whose joint-refit signal is
# below this fraction of the accepted population's median signal are
# pruned (see the measured rationale at the gate site).  The threshold
# is additionally capped at 0.8× the accepted population's 2nd
# percentile so a genuinely dim-but-real sub-population (accepted
# features well below a quarter of the median) keeps its recoveries —
# the fixed fraction alone was tuned on a uniform-brightness scene
# (ADVICE r4).  User-overridable per call via
# ``track(recover_min_signal_frac=...)``.
_MIN_SIGNAL_FRAC = 0.25
# ...and that old rms must exceed the residual noise floor by this
# factor (evidence an unmodeled feature actually lives there)
_NOISE_EVIDENCE = 6.0
# when set to a list, the likelihood accept appends
# (joint_refit_rms, old_footprint_rms, n_candidates) per touched cluster
_DEBUG_ACCEPT = None
# When set to a dict, each recovery pass appends diagnostics here:
# 'located' — the post-on-top-drop residual candidates per pass;
# 'gated' — every RECOVERED candidate that reached the accept stage,
# with a 'gate' column naming its fate ('accepted' or the first gate
# that pruned it).  Used by benchmarks/miss_exp.py to attribute every
# missed truth feature to a specific stage (VERDICT r4 item 1).
_DEBUG_STASH = None
# when True, surviving outputs carry a ``recovered_pass`` column (0 =
# main fit, k = accepted by recovery pass k) for experiment attribution
_TAG_RECOVERED = False
# recovery-pass joint-refit iteration budget (None = uncapped, i.e. the
# user's lm_max_iter/max_iter); see the rk_refit construction for the
# measured rationale
_REFIT_LM_MAX_ITER = 16
_REFIT_MAX_ITER = 2
# matched-filter residual locate (smooth with the fitted PSF before
# peak detection) — the recovery pass's detection-depth upgrade
_MATCH_FILTER = True
# Residual-locate noise gate (multiples of the robust σ above the
# median) for RECOVERY passes.  The main locate keeps the conservative
# 6σ floor; the recovery pass can afford to admit dimmer residual
# evidence because every candidate must still buy its place through the
# likelihood-ratio accept + shoulder-signal + displacement + duplicate
# gates below.  Measured at full config-5 scale (benchmarks/
# recovery_exp.py, r5): 6σ → 90.04% coverage / 365 ghosts; see
# RESULTS.md for the swept values.
_RECOVERY_NOISE_K = 6.0
# Quadrupole split-probes (see the block in _refine_with_recovery):
# originals carrying more than this multiple of the accepted-population
# median signal are split-tested along their residual-quadrupole axis.
# None/0 disables.  1.2 (swept at full config-5 scale: 1.35 → 91.4%
# coverage, 1.2 → 92.3% with FEWER ghosts, 1.1 → 92.8% but +90 ghosts
# and a 40 s refit wall) sits between the single-feature signal scatter
# (~±15% at config-5 noise) and an absorbed pair's ~1.5-2.2×.
# Override per call: track(recover_split_excess=...).
_SPLIT_SIG_EXCESS = 1.2
_SPLIT_WINDOW = 9
# Duplicate-prune radius as a fraction of min(locate_separation): an
# accepted RECOVERED candidate closer than this to another accepted
# feature is treated as a signal-split of one true feature.  Measured at
# full config-5 scale (miss_exp.py at the 94.1% operating point): at
# 0.5 (1.5 px) this gate was the LARGEST single killer of real features
# (693 of 2362 misses — crowded truths legitimately sit closer than
# 1.5 px); 0.35 recovered +0.8% coverage with ghosts flat.
_DUP_R_FRAC = 0.35
# shared byte cap for the device-resident frame caches
# (_DeviceFrameCache and _ResidualReader) — together they bound the
# pipeline's cache HBM at 2× this (ADVICE r3: the residual cache is
# additionally dropped before each joint refit)
_FRAME_CACHE_BYTES = 2 << 30

__all__ = ["locate", "track"]


def locate(
    image,
    diameter,
    separation=None,
    threshold=None,
    percentile: float = 64.0,
    max_features: int = 4096,
    pos_columns: Optional[list] = None,
    preprocess: Optional[str] = None,
    noise_size=1.0,
    threshold_tile: Optional[int] = None,
) -> pd.DataFrame:
    """Candidate features of one frame (integer-pixel local maxima).

    The trackpy.locate stand-in that seeds find_clusters; sub-pixel
    refinement is refine_leastsq's job.

    ``threshold=None`` uses a noise-robust default: the percentile rule
    (trackpy's grey_dilation default) floored at median + 6 robust sigma
    (MAD) of the frame, so sparse noisy frames don't admit thousands of
    noise maxima.  Noiseless frames (MAD = 0) keep the exact percentile
    behavior.

    ``preprocess='bandpass'`` (VERDICT r4 item 5; trackpy.locate's
    default pipeline): Gaussian-smooth at ``noise_size`` px, subtract a
    diameter-scale boxcar background, clip at 0 — required for frames
    with sloped/vignetted illumination, where thresholding RAW pixels
    against a frame-global floor floods dim regions with false
    candidates and starves bright ones.  ``threshold_tile`` (px)
    additionally makes the default noise floor locally adaptive
    (per-tile median+MAD map)."""
    image = np.asarray(image)
    ndim = image.ndim
    if pos_columns is None:
        pos_columns = default_pos_columns(ndim)
    if separation is None:
        separation = diameter
    separation = validate_tuple(separation, ndim)

    class _One:
        def __getitem__(self, t):
            return image

        def __len__(self):
            return 1

    f = _locate_frames(
        _One(), [0], validate_tuple(diameter, ndim), separation,
        threshold, percentile, max_features, "frame",
        preprocess=preprocess, noise_size=noise_size,
        threshold_tile=threshold_tile,
    ).drop(columns=["frame"])
    default_cols = default_pos_columns(ndim)
    if list(pos_columns) != default_cols:
        f = f.rename(columns=dict(zip(default_cols, pos_columns)))
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
    preprocess: Optional[str] = None,
    noise_size=1.0,
    threshold_tile: Optional[int] = None,
    link_backend: Optional[str] = None,
    find_backend: str = "auto",
    t_column: str = "frame",
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 16,
    recover_passes: int = 0,
    recover_min_signal_frac: Optional[float] = None,
    recover_accept_ratio: Optional[float] = None,
    recover_disp_gate=-1.0,
    recover_split_excess=-1.0,
    transfer_dtype=None,
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

    Recovery accept gates (defaults are the full-scale-measured optimum;
    see benchmarks/RESULTS.md): ``recover_accept_ratio`` — a cluster's
    joint refit must beat its footprint's previous residual rms by this
    factor (default 0.8; 0.9 measured +1.1% dense coverage for +0.3%
    ghosts); ``recover_disp_gate`` — px a recovered candidate may move
    during refit (None disables); ``recover_split_excess`` — signal
    multiple of the population median above which an original is
    split-tested along its residual-quadrupole axis (None disables);
    ``recover_min_signal_frac`` — shoulder-lobe signal floor.

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
    if preprocess == "bandpass":
        # a user asking for bandpass is telling us the background is
        # non-uniform — the reference default (background 'const' 0,
        # matching clustertracking) then rejects every fit sitting on an
        # illumination plateau, because refine runs on the RAW frames.
        # Default the background to a fitted per-cluster parameter
        # unless the caller chose a mode themselves.
        pm = dict(refine_kwargs.get("param_mode") or {})
        pm.setdefault("background", "cluster")
        refine_kwargs["param_mode"] = pm
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
            recover_passes, recover_min_signal_frac, mesh, refine_kwargs,
            preprocess=preprocess, noise_size=noise_size,
            threshold_tile=threshold_tile,
            accept_ratio=recover_accept_ratio,
            disp_gate=recover_disp_gate,
            split_excess=recover_split_excess,
            transfer_dtype=transfer_dtype,
        )
    reader = _DeviceFrameCache(reader, transfer_dtype=transfer_dtype)
    ndim0 = reader[0].ndim
    if locate_separation is None:
        # cluster members sit CLOSER than `separation` by definition, so
        # peak suppression must use a tighter window or overlapping
        # features merge into one candidate
        sep0 = separation if separation is not None else diameter
        locate_separation = tuple(
            max(2, int(round(s / 2))) for s in validate_tuple(sep0, ndim0)
        )
    t0 = time.perf_counter()
    f = _locate_frames(
        reader, range(n_frames), diameter, locate_separation, threshold,
        percentile, max_features, t_column, preprocess=preprocess,
        noise_size=noise_size, threshold_tile=threshold_tile,
    )
    t1 = time.perf_counter()

    ndim = len(default_pos_columns(ndim0))
    pos_columns = default_pos_columns(ndim0)
    sep = separation if separation is not None else diameter
    f = find_clusters(f, sep, t_column=t_column, backend=find_backend)
    t2 = time.perf_counter()
    f, n_spill = _refine_with_recovery(
        f, reader, diameter, sep, range(n_frames), locate_separation,
        threshold, percentile, max_features, find_backend, t_column,
        recover_passes, pos_columns, mesh, refine_kwargs,
        min_signal_frac=recover_min_signal_frac, preprocess=preprocess,
        noise_size=noise_size, threshold_tile=threshold_tile,
        accept_ratio=recover_accept_ratio, disp_gate=recover_disp_gate,
        split_excess=recover_split_excess,
    )
    t3 = time.perf_counter()
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
    t4 = time.perf_counter()
    out = _link(
        f, search_range, memory=memory, t_column=t_column,
        backend=link_backend if link_backend is not None else "auto",
        mesh=mesh,
    )
    # stage wall clocks (seconds) ride in the ledger so a slow pipeline
    # self-attributes: fit_s includes recovery passes (their refits and
    # residual locates), link_s the chosen backend end-to-end
    diagnostics.record_ledger(
        linked=len(out),
        locate_s=round(t1 - t0, 4),
        find_s=round(t2 - t1, 4),
        fit_s=round(t3 - t2, 4),
        link_s=round(time.perf_counter() - t4, 4),
        link_backend=out.attrs.get("link_backend", "?"),
    )
    return out


def _refine_with_recovery(
    f, reader, diameter, sep, frame_numbers, locate_separation,
    threshold, percentile, max_features, find_backend, t_column,
    recover_passes, pos_columns, mesh, refine_kwargs,
    min_signal_frac=None, preprocess=None, noise_size=1.0,
    threshold_tile=None, accept_ratio=None, disp_gate=-1.0,
    split_excess=-1.0,
):
    """refine_leastsq + residual-relocate recovery passes (shared by the
    single-shot and checkpointed track paths).

    Each pass renders the fitted model on device (ops/synth.py),
    subtracts it from the frames, re-locates candidates in the residual
    — where the missed partner of a blended pair stands alone — and
    refits ALL features together.  Returns (refined DataFrame, spill
    count for the ledger)."""
    accept_ratio = (_ACCEPT_RATIO if accept_ratio is None
                    else float(accept_ratio))
    if isinstance(disp_gate, float) and disp_gate == -1.0:
        disp_gate = _DISP_GATE
    if isinstance(split_excess, float) and split_excess == -1.0:
        split_excess = _SPLIT_SIG_EXCESS
    max_cluster = int(refine_kwargs.get("max_cluster_size", 8))
    n_spill = int((f["cluster_size"] > max_cluster).sum())
    f = refine_leastsq(
        f, reader, diameter, sep, t_column=t_column, mesh=mesh,
        **refine_kwargs,
    )
    for pass_idx in range(recover_passes):
        from scipy.spatial import cKDTree

        t_pass = time.perf_counter()
        dup_r = _DUP_R_FRAC * float(min(locate_separation))
        on_top_r = _ON_TOP_FRAC * float(min(locate_separation))
        acc = f[f["cost"].notna()]
        rreader = _ResidualReader(
            reader, acc, refine_kwargs.get("fit_function", "gauss"),
            t_column, pos_columns,
        )
        # matched-filter residual locate: smooth with the fitted PSF
        # width so residual lobes ~3× below the raw noise gate are
        # detectable (the measured detection loss at config-5 scale —
        # fit-stage ceiling 99.8% vs 89.8% achieved, oracle_exp.py)
        msig = None
        if _MATCH_FILTER:
            size_cols = [c for c in ("size_z", "size_y", "size_x")
                         if c in acc.columns]
            if size_cols:
                msig = tuple(
                    float(acc[c].median()) for c in size_cols
                )
            elif "size" in acc.columns:
                msig = float(acc["size"].median())
        new = _locate_frames(
            rreader,
            frame_numbers, diameter, locate_separation, threshold,
            percentile, max_features, t_column, match_sigma=msig,
            preprocess=preprocess, noise_size=noise_size,
            threshold_tile=threshold_tile, noise_k=_RECOVERY_NOISE_K,
        )
        # per-stage walls ride in the ledger (summed over passes) so the
        # recovery cost self-attributes: residual render + locate, host
        # candidate prep, footprint reference, joint refit, accept gates
        diagnostics.record_ledger(
            residual_candidates=len(new),
            recovery_locate_s=round(time.perf_counter() - t_pass, 4),
        )
        t_mark = time.perf_counter()
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
                    kept.append(g[d >= on_top_r])
                else:
                    kept.append(g)
            n0 = len(new)
            new = pd.concat(kept, ignore_index=True) if kept else new
            diagnostics.record_ledger(
                recovery_dropped_on_top_of_fit=n0 - len(new)
            )
        if not len(new):
            break
        if _DEBUG_STASH is not None:
            _DEBUG_STASH.setdefault("located", []).append(new.copy())
            _DEBUG_STASH.setdefault("rreader", []).append(rreader)
            _DEBUG_STASH.setdefault("match_sigma", []).append(msig)
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
        combined["_acc_row"] = np.concatenate(
            [np.arange(len(acc)), np.full(len(new), -1)]
        )
        # previous fit cost per ORIGINAL feature: the reference value
        # for the likelihood-ratio accept below (a recovered candidate
        # must BUY its place by dropping its cluster's cost)
        combined["_old_cost"] = np.concatenate(
            [acc["cost"].to_numpy(dtype=float),
             np.full(len(new), np.nan)]
        )
        # Blend-split warm start: a residual candidate near an accepted
        # feature usually means that feature's fit sat at the MIDPOINT
        # of a blended pair (single intensity maximum) with ~doubled
        # signal.  Mirror the original to the far side (o' = 2o − c) and
        # split its fitted signal between the two, so the joint refit
        # starts near the pair's true geometry instead of a degenerate
        # near-coincident stack — measured at dense scale, the stacked
        # start made most recovery refits diverge.  A candidate that was
        # actually a noise lobe leaves o' ~2 px off a true feature; the
        # refit walks it back and the candidate converges to ~zero
        # signal (pruned below), gated by the likelihood-ratio accept.
        # A SECOND residual lobe near the mirror position is redundant
        # with o' (clean blends give two lobes) and is dropped.
        # 0.45·sep: covers real blends (lobe-to-midpoint ≈ half the pair
        # separation, and pairs only blend below ~2.2σ < sep) while
        # guaranteeing the mirrored pair (2d apart) still clusters.
        blend_r = (
            0.45 * float(min(np.atleast_1d(sep))) if _BLEND_SPLIT
            else -1.0
        )
        # pre-split snapshot: if a cluster's joint refit fails below, its
        # original members roll back to THESE values (their previous
        # accepted fits) — restoring only the cost would leave the
        # mirrored position / halved signal in the output (measured: the
        # restored features sat ~2 px off and coverage DROPPED)
        for c in (*pos_columns, "signal"):
            combined[f"_pre_{c}"] = combined[c].to_numpy(dtype=float)
        pos_np = combined[pos_columns].to_numpy()
        sig_np0 = combined["signal"].to_numpy().copy()
        rec_np = combined["_recovered"].to_numpy()
        oc_np = combined["_old_cost"].to_numpy()
        tcol_np = combined[t_column].to_numpy()
        # a blended-midpoint fit carries an ELEVATED residual cost (the
        # model cannot reproduce a pair with one feature); an original
        # fit at the noise floor is NOT a blend, and mirroring it
        # corrupts a perfectly good fit off a spurious candidate
        # (measured: noiseless dimers at cost 1e-7 were dragged 2 px by
        # numerical-noise residual plateaus)
        med_cost = float(np.nanmedian(oc_np[~rec_np]))
        cost_gate = max(1.2 * med_cost, 1e-12)
        drop_dup = np.zeros(len(combined), bool)
        used_orig: set = set()
        claiming: set = set()
        for t in np.unique(tcol_np[rec_np]):
            in_t = np.nonzero(tcol_np == t)[0]
            orig_t = in_t[~rec_np[in_t]]
            new_t = in_t[rec_np[in_t]]
            if not len(orig_t) or not len(new_t):
                continue
            tree = cKDTree(pos_np[orig_t])
            # batched KD queries: the tree holds the ORIGINAL positions
            # and each original fires at most one mirror, queried before
            # it moves — so every per-candidate nearest-original lookup
            # and every original's second-neighbor distance can be
            # precomputed in two vectorized queries (the former per-j
            # queries were ~1/3 of the measured dense prep wall)
            dq, kq = tree.query(pos_np[new_t])
            dq_of = dict(zip(new_t, dq))
            kq_of = dict(zip(new_t, kq))
            if len(orig_t) > 1:
                d2o_all = tree.query(pos_np[orig_t], k=2)[0][:, 1]
                d2o_of = dict(zip(orig_t, d2o_all))
            # candidate positions never move, so redundant-lobe lookups
            # around each mirrored original are ball queries on one tree
            ctree = cKDTree(pos_np[new_t])
            # brightest candidates claim their blended partner first
            for j in new_t[np.argsort(-sig_np0[new_t])]:
                if drop_dup[j]:
                    continue
                d, k = dq_of[j], kq_of[j]
                o = orig_t[k]
                if d > blend_r or o in used_orig:
                    continue
                if not (oc_np[o] > cost_gate):
                    continue  # o's fit is already clean — not a blend
                # stacked-pair gate: when a SECOND original sits nearly
                # on top of o (the main fit placed two features at one
                # blended blob), the joint refit already has the spare
                # degree of freedom it needs — mirroring each of the
                # stack tears the cluster apart (measured: the clean
                # merged-pair suite went 0.00 → 1.74 px)
                if len(orig_t) > 1 and d2o_of[o] < max(dup_r, 1.0):
                    continue
                used_orig.add(o)
                claiming.add(j)
                pos_np[o] = 2.0 * pos_np[o] - pos_np[j]
                half = 0.5 * sig_np0[o]
                sig_np0[o] = half
                sig_np0[j] = half
                for j2_idx in ctree.query_ball_point(
                    pos_np[o], max(dup_r, 1.0)
                ):
                    j2 = new_t[j2_idx]
                    # strict < (query_ball_point is a CLOSED ball; the
                    # loop this vectorized used `dd < r` — ADVICE r3):
                    # a candidate exactly AT the radius is kept
                    if (np.sum((pos_np[j2] - pos_np[o]) ** 2)
                            >= max(dup_r, 1.0) ** 2):
                        continue
                    # never drop a candidate that fired a mirror: its
                    # original is already moved and needs it in the refit
                    if j2 != j and j2 not in claiming:
                        drop_dup[j2] = True
        combined[pos_columns] = pos_np
        combined["signal"] = sig_np0
        diagnostics.record_ledger(
            recovery_blend_mirrors=len(claiming),
            recovery_dropped_redundant_lobe=int(drop_dup.sum()),
            recovery_prep_mirror_s=round(
                time.perf_counter() - t_mark, 4
            ),
        )
        t_sub = time.perf_counter()
        if drop_dup.any():
            combined = combined[~drop_dup].reset_index(drop=True)
        # -------- quadrupole split-probes (absorbed blends) ----------
        # A pair whose peaks merged below the locate window is often fit
        # by ONE wider Gaussian carrying ~2× the population signal — and
        # leaves no residual PEAK for the lobe machinery above (measured
        # at full config-5 scale: 2.1k of 4.0k misses had no residual
        # candidate within 2.5 px, yet their nearest accepted output ran
        # 1.5-2× the median signal).  The residual still carries the
        # blend's QUADRUPOLE mode (positive flanks along the pair axis,
        # negative core), which integrates over the window instead of
        # needing a single pixel above the noise gate.  For signal-excess
        # originals, estimate the pair axis from the residual quadrupole
        # tensor, split the original into a pair at ±δ along it (δ from
        # the fitted-width excess), and let the joint refit + likelihood
        # accept + signal/displacement/duplicate gates arbitrate exactly
        # as for lobe-triggered candidates.
        res_host: dict = {}
        n_split = 0
        if split_excess:
            med_sig_acc = float(acc["signal"].median())
            Dn = len(pos_columns)
            aniso_cols = [c for c in ("size_z", "size_y", "size_x")
                          if c in combined.columns][:Dn]
            size_cols = (aniso_cols if len(aniso_cols) == Dn
                         else (["size"] if "size" in combined.columns
                               else []))
            pos_c = combined[pos_columns].to_numpy(dtype=float)
            sig_c = combined["signal"].to_numpy(dtype=float)
            rec_c = combined["_recovered"].to_numpy()
            tcol_c = combined[t_column].to_numpy()
            # mirrored originals already halved their signal, so they
            # fall below the excess threshold automatically
            sus = np.nonzero(
                ~rec_c & (sig_c > split_excess * med_sig_acc)
            )[0]
            if len(sus) and size_cols:
                med_sz = float(np.mean(
                    [float(acc[c].median()) for c in size_cols]
                ))
                szs = combined[size_cols].to_numpy(dtype=float)[sus]
                sz_sc = np.exp(
                    np.log(np.maximum(szs, 1e-6)).mean(axis=1)
                )
                delta = np.sqrt(np.maximum(sz_sc**2 - med_sz**2, 0.0))
                # lower clamp keeps the split pair outside dup_r; upper
                # keeps it inside one cluster (< separation)
                delta = np.clip(
                    delta, 0.85, 0.45 * float(min(np.atleast_1d(sep)))
                )
                w_half = _SPLIT_WINDOW // 2
                axes = np.zeros((len(sus), Dn))
                for t in np.unique(tcol_c[sus]):
                    res = res_host.get(int(t))
                    if res is None:
                        # fetch as f16: halves the ~90 ms/frame tunnel
                        # transfer; the quadrupole axis and footprint
                        # noise floors read these values through >=10%
                        # decision margins, far above f16's ~0.1%
                        import jax.numpy as _jnp

                        res = np.asarray(
                            _jnp.asarray(rreader[int(t)], _jnp.float16)
                        ).astype(np.float32)
                        res_host[int(t)] = res
                    sel = np.nonzero(tcol_c[sus] == t)[0]
                    B = len(sel)
                    shape = np.asarray(res.shape)
                    P = np.round(pos_c[sus[sel]]).astype(int)
                    o = np.clip(P - w_half, 0,
                                shape - (2 * w_half + 1))
                    ix = []
                    for d in range(Dn):
                        ar = o[:, d].reshape(
                            (B,) + (1,) * Dn
                        ) + np.arange(2 * w_half + 1).reshape(
                            (1,) * (1 + d) + (-1,) + (1,) * (Dn - 1 - d)
                        )
                        ix.append(ar)
                    win = res[tuple(np.broadcast_arrays(*ix))]
                    red = tuple(range(1, 1 + Dn))
                    r0 = win - win.mean(axis=red, keepdims=True)
                    M = np.zeros((B, Dn, Dn))
                    rel = [
                        ix[d] - pos_c[sus[sel], d].reshape(
                            (B,) + (1,) * Dn
                        )
                        for d in range(Dn)
                    ]
                    for a in range(Dn):
                        for b in range(a, Dn):
                            Mab = (r0 * rel[a] * rel[b]).sum(axis=red)
                            M[:, a, b] = Mab
                            M[:, b, a] = Mab
                    _, evecs = np.linalg.eigh(M)
                    axes[sel] = evecs[:, :, -1]
                # split: original moves to +δv̂ (rollback snapshot already
                # holds its pre-split values), candidate appears at −δv̂
                probes = combined.iloc[sus].copy()
                half = 0.5 * sig_c[sus]
                plus = pos_c[sus] + delta[:, None] * axes
                minus = pos_c[sus] - delta[:, None] * axes
                combined.loc[combined.index[sus], pos_columns] = plus
                combined.loc[combined.index[sus], "signal"] = half
                probes[pos_columns] = minus
                probes["signal"] = half
                probes["_recovered"] = True
                probes["_acc_row"] = -1
                probes["_old_cost"] = np.nan
                for c in (*pos_columns, "signal"):
                    probes[f"_pre_{c}"] = probes[c].to_numpy(dtype=float)
                n_split = len(probes)
                combined = pd.concat(
                    [combined, probes], ignore_index=True
                )
                diagnostics.record_ledger(recovery_split_probes=n_split)
        diagnostics.record_ledger(
            recovery_prep_split_s=round(time.perf_counter() - t_sub, 4)
        )
        t_sub = time.perf_counter()
        combined = find_clusters(
            combined, sep, t_column=t_column, backend=find_backend
        )
        # a recovered candidate that pushes its cluster past the bucket
        # cap would send the whole (degenerate, blended) group to the
        # slow serial scipy spill — keep the original features there
        over = combined["cluster_size"] > max_cluster
        drop = over & combined["_recovered"]
        diagnostics.record_ledger(
            recovery_dropped_over_cap=int(drop.sum())
        )
        if drop.any():
            if _DEBUG_STASH is not None:
                oc = combined[drop].copy()
                oc["gate"] = "over_cap"
                _DEBUG_STASH.setdefault("gated", []).append(oc)
            combined = combined.drop(
                columns=["cluster", "cluster_size"]
            )[~drop]
            combined = find_clusters(
                combined, sep, t_column=t_column, backend=find_backend
            )
        n_recovered = int(
            len(new) + n_split - drop_dup.sum() - drop.sum()
        )
        if n_recovered == 0:
            break
        diagnostics.record_ledger(recovered_candidates=n_recovered)
        n_spill += int(
            (combined["cluster_size"] > max_cluster).sum()
        )
        sig_floor = 0.05 * float(acc["signal"].median())
        # Same-mask likelihood reference: for every cluster that gained a
        # candidate, evaluate the PREVIOUS model's residual rms on that
        # cluster's own footprint (union of member spheres), in the same
        # units as refine's cost (rms of residual/norm over the mask).
        # The residual frames ARE data − previous model (rreader), so
        # this is one masked reduction per cluster — no extra fit.
        # Comparing against the old per-member costs instead (measured)
        # rejects real recoveries wholesale: those costs were computed on
        # DIFFERENT, smaller masks that excluded exactly the pixels the
        # missed feature occupies.
        # only clusters that actually GAINED a candidate refit; untouched
        # clusters pass through with their accepted fits unchanged
        # (mirrored originals always share their claiming candidate's
        # cluster — |o'−c| = 2|o−c| ≤ 0.9·sep — so no moved feature can
        # land here).  At dense scale this cuts the refit to ~40% of the
        # features and removes re-fit churn on untouched clusters.
        in_refit = combined["cluster"].isin(
            combined.loc[combined["_recovered"], "cluster"]
        ).to_numpy()
        rest = combined[~in_refit].copy()
        combined = combined[in_refit].reset_index(drop=True)
        diagnostics.record_ledger(
            recovery_prep_find_s=round(time.perf_counter() - t_sub, 4),
            recovery_prep_s=round(time.perf_counter() - t_mark, 4),
        )
        t_mark = time.perf_counter()
        old_ref, old_noise = _old_rms_on_footprint(
            combined, rreader, diameter, pos_columns, t_column,
            host_frames=res_host,
        )
        # the residual cache (≤2 GiB of device frames) is never read
        # again this pass — release it before the device-heavy joint
        # refit so its HBM does not stack on _DeviceFrameCache's during
        # the refit's peak (ADVICE r3)
        rreader.drop_cache()
        diagnostics.record_ledger(
            recovery_footprint_s=round(time.perf_counter() - t_mark, 4)
        )
        t_mark = time.perf_counter()
        # the refit must not pre-reject large blended clusters on the
        # global max_rms_dev while our per-cluster accept below has the
        # statistically right reference — gate ourselves instead
        max_rms_dev = float(refine_kwargs.get("max_rms_dev", 1.0))
        rk_refit = dict(refine_kwargs, max_rms_dev=np.inf)
        # Bounded refit budget (VERDICT r3 item 3): the joint refit was
        # 4.06 s of the 6.1 s pass at dense scale because blended lanes
        # converge slowly and the lockstep bucket runs until its SLOWEST
        # lane converges.  The warm start is near-correct (originals at
        # their accepted fits; candidates at mirrored lobe positions),
        # so a capped budget reaches the same accept decisions — the
        # likelihood gate compares rms on the same footprint either way
        # (validated at dense scale; see benchmarks/RESULTS.md round-4
        # recovery table).
        if _REFIT_LM_MAX_ITER is not None:
            rk_refit["lm_max_iter"] = min(
                int(refine_kwargs.get("lm_max_iter", 60)),
                _REFIT_LM_MAX_ITER,
            )
        if _REFIT_MAX_ITER is not None:
            rk_refit["max_iter"] = min(
                int(refine_kwargs.get("max_iter", 10)), _REFIT_MAX_ITER
            )
        f = refine_leastsq(
            combined, reader, diameter, sep, t_column=t_column,
            mesh=mesh, **rk_refit,
        )
        diagnostics.record_ledger(
            recovery_refit_s=round(time.perf_counter() - t_mark, 4)
        )
        t_mark = time.perf_counter()
        if len(rest):
            # untouched rows keep every fitted output column from acc
            # (cost, flags, _std ...) — the pass never churns them
            ar = rest["_acc_row"].to_numpy()
            for c in acc.columns:
                if c not in rest.columns and c != "particle":
                    rest[c] = acc[c].to_numpy()[ar]
            rest["cost"] = rest["_old_cost"]
            f = pd.concat([f, rest], ignore_index=True)
        recovered_col = f["_recovered"].to_numpy()
        old_cost_col = f["_old_cost"].to_numpy()
        pre_cols = [f"_pre_{c}" for c in (*pos_columns, "signal")]
        pre_vals = f[pre_cols].to_numpy()
        f = f.drop(columns=["_recovered", "_old_cost", "_acc_row",
                            *pre_cols])
        if _TAG_RECOVERED:
            prev = (f["recovered_pass"].to_numpy()
                    if "recovered_pass" in f.columns
                    else np.zeros(len(f), np.int32))
            f["recovered_pass"] = np.where(
                recovered_col, pass_idx + 1, prev
            )
        # Likelihood-ratio accept (VERDICT r2 item 3), SAME-mask form:
        # a recovered candidate joins only if its cluster's joint refit
        # rms beats the PREVIOUS model's residual rms evaluated on the
        # same footprint (old_ref) by a real margin.  A missing partner
        # of a blended pair leaves an entire unmodeled feature in the
        # old residual, so old_ref is several× the joint rms; a noise
        # lobe leaves old_ref at the noise floor, which the joint fit
        # cannot beat by 20%.  This applies uniformly to all-new
        # clusters (a feature the locator missed entirely) — their
        # footprint's old residual is the unmodeled feature itself.
        ghost = np.zeros(len(f), dtype=bool)
        restore = np.zeros(len(f), dtype=bool)
        cl = f["cluster"].to_numpy()
        costs = f["cost"].to_numpy().copy()
        has_cand = np.zeros(len(f), dtype=bool)
        for cid in np.unique(cl[recovered_col]):
            rows_c = np.nonzero(cl == cid)[0]
            has_cand[rows_c] = True
            new_cost = costs[rows_c[0]]
            ref = old_ref.get(int(cid), np.nan)
            if _DEBUG_ACCEPT is not None:
                _DEBUG_ACCEPT.append({
                    "cid": int(cid), "new_cost": float(new_cost),
                    "ref": float(ref),
                    "noise": float(old_noise.get(int(cid), 0.0)),
                    "n_cand": int(recovered_col[rows_c].sum()),
                    "all_new": bool(recovered_col[rows_c].all()),
                })
            all_new = bool(recovered_col[rows_c].all())
            evidence_ok = (
                ref > _NOISE_EVIDENCE * old_noise.get(int(cid), 0.0)
                # evidence gate for clusters made ONLY of recovered
                # candidates: their old footprint rms must stand well
                # above the residual noise floor, or the "improvement"
                # is a Gaussian soaking a noise/imperfection blob (the
                # pass-2 ghost leak: +101 ghosts for +0.35% coverage).
                # On the FIRST pass, clusters with original members skip
                # it — their blend evidence is the ratio test itself,
                # and gating them rejects real recoveries (measured
                # 90.5 → 87.3%).  On passes ≥2 the gate applies to ALL
                # clusters: the real blends were recovered in pass 1, so
                # a with-original cluster whose footprint rms already
                # sits at the noise floor has nothing left to model —
                # candidates there are fit-imperfection lobes (the
                # measured pass-2 leak).  A genuinely still-missing
                # partner keeps footprint rms ≫ noise and passes.
                if (all_new or pass_idx > 0) else True
            )
            if (
                np.isfinite(new_cost)
                and np.isfinite(ref)
                and new_cost <= accept_ratio * ref
                and evidence_ok
            ):
                continue  # accepted: the candidates bought their place
            # the joint refit DIVERGED (degenerate near-coincident
            # candidates do this) or failed the likelihood-ratio test:
            # drop the recovered candidates AND roll every original
            # member back to its pre-split fitted values + old cost —
            # the blend-split warm start moved/halved them, and the
            # failed refit's values are no better than the previous fit
            ghost[rows_c[recovered_col[rows_c]]] = True
            orig = rows_c[~recovered_col[rows_c]]
            good = orig[np.isfinite(old_cost_col[orig])]
            restore[good] = True
            costs[good] = old_cost_col[good]
        # candidate-less clusters ran under the uncapped refit too:
        # re-impose the user's max_rms_dev AND roll back any cluster
        # whose refit REGRESSED vs its previous accepted cost (a mirror
        # whose claiming candidate landed in another cluster can corrupt
        # the warm start; warm-started at the old solution a refit never
        # regresses >20%, so this net only catches corruption)
        old_mean = (
            pd.Series(old_cost_col).groupby(cl).transform("mean")
            .to_numpy()
        )
        bad = ~has_cand & (
            ~np.isfinite(costs)
            | (costs > max_rms_dev)
            | (np.isfinite(old_mean) & (costs > 1.2 * old_mean + 1e-12))
        )
        good = bad & np.isfinite(old_cost_col)
        restore[good] = True
        costs[good] = old_cost_col[good]
        costs[bad & ~good] = np.nan
        f["cost"] = costs
        if restore.any():
            vals = f[[*pos_columns, "signal"]].to_numpy()
            vals[restore] = pre_vals[restore]
            f[[*pos_columns, "signal"]] = vals
            diagnostics.record_ledger(
                refit_failures_restored=int(restore.sum())
            )
        # a superfluous candidate (e.g. both residual lobes of a blended
        # pair plus the original) converges to ~zero signal in the joint
        # refit — prune it rather than emit a ghost feature
        n_lr = int(ghost.sum())
        lr_mask = ghost.copy()
        zero_mask = (
            f["cost"].notna() & (f["signal"] < sig_floor)
        ).to_numpy()
        ghost = pd.Series(ghost, index=f.index) | zero_mask
        n_sig = int(ghost.sum()) - n_lr
        # shoulder-lobe signal gate (RECOVERED rows only): a candidate
        # the joint refit keeps but fits at a small fraction of the
        # accepted population's signal is a fit-imperfection lobe on a
        # real feature's shoulder, not a particle.  Measured (mini
        # config-5, matched-filter pass 1): ghost recoveries fit to
        # signal 10-51 vs a clean-recovery 5th percentile of 42 and a
        # population median of 150; the cluster-level likelihood ratio
        # cannot see them because a sibling REAL recovery in the same
        # cluster buys the rms improvement.  0.25x median kills 16/20
        # ghosts at a cost of ~2 dim-but-real recoveries.
        n_lowsig = 0
        sig_frac = (min_signal_frac if min_signal_frac is not None
                    else _MIN_SIGNAL_FRAC)
        if sig_frac:
            # Adaptive threshold (ADVICE r4): frac×median, CAPPED at
            # 0.8× the accepted population's 2nd percentile — on a
            # uniform-brightness scene p2 ≈ median so the measured
            # 0.25×median behavior is unchanged, while a dataset with a
            # genuine dim sub-population (accepted signals well below
            # median/4) keeps its dim recoveries instead of losing them
            # wholesale to a fraction tuned on uniform synthetics.
            sig_acc = acc["signal"].to_numpy(dtype=float)
            sig_thr = min(
                sig_frac * float(np.median(sig_acc)),
                0.8 * float(np.percentile(sig_acc, 2.0)),
            )
            low = (
                pd.Series(recovered_col, index=f.index)
                & f["cost"].notna()
                & (f["signal"] < sig_thr)
            )
            before = int(ghost.sum())
            ghost |= low
            n_lowsig = int(ghost.sum()) - before
        # ...and a candidate the joint refit DRAGGED far from where the
        # residual locator saw it did not converge to the feature it was
        # evidence for — the fit repurposed it to soak up unrelated
        # residual (a ghost >1 px from any truth, measured at dense
        # scale).  Real recoveries stay within ~1 px of their lobe.
        n_disp = 0
        if disp_gate is not None:
            disp = np.linalg.norm(
                f[list(pos_columns)].to_numpy()
                - pre_vals[:, : len(pos_columns)],
                axis=1,
            )
            before = int(ghost.sum())
            ghost |= pd.Series(
                recovered_col & (disp > disp_gate), index=f.index
            )
            n_disp = int(ghost.sum()) - before
        # ...or the refit splits one true feature's signal across two
        # near-coincident candidates: drop the RECOVERED one of any
        # accepted pair closer than dup_r (the dimmer if both are
        # recovered).  Originals are never dup-pruned — at dense scale
        # true features can legitimately sit closer than dup_r, and a
        # recovery pass must not delete features the main fit accepted
        gvals = ghost.to_numpy().copy()
        sig_np = f["signal"].to_numpy()
        okv = f["cost"].notna().to_numpy()
        for t, idx in f.groupby(t_column).indices.items():
            live = idx[okv[idx] & ~gvals[idx]]
            if len(live) < 2:
                continue
            tree = cKDTree(f.iloc[live][pos_columns].to_numpy())
            for a, b in tree.query_pairs(dup_r):
                ra, rb = recovered_col[live[a]], recovered_col[live[b]]
                if ra and rb:
                    drop_j = live[a] if sig_np[live[a]] <= sig_np[live[b]] \
                        else live[b]
                elif ra:
                    drop_j = live[a]
                elif rb:
                    drop_j = live[b]
                else:
                    continue
                gvals[drop_j] = True
        ghost = pd.Series(gvals, index=f.index)
        diagnostics.record_ledger(
            recovery_accept_s=round(time.perf_counter() - t_mark, 4)
        )
        if _DEBUG_STASH is not None:
            # first-gate-wins label per RECOVERED row (miss attribution)
            lab = np.full(len(f), "accepted", object)
            dup_mask = gvals & ~np.asarray(
                lr_mask | zero_mask
                | (low.to_numpy() if sig_frac else False)
                | ((recovered_col & (disp > disp_gate))
                   if disp_gate is not None else False)
            )
            for name, m in (
                ("duplicate", dup_mask),
                ("displacement",
                 (recovered_col & (disp > disp_gate))
                 if disp_gate is not None else None),
                ("low_signal", low.to_numpy() if sig_frac else None),
                ("zero_signal", zero_mask),
                ("likelihood", lr_mask),
            ):
                if m is not None:
                    lab[np.asarray(m, bool)] = name
            g = f[recovered_col].copy()
            g["gate"] = lab[recovered_col]
            _DEBUG_STASH.setdefault("gated", []).append(g)
        if ghost.any():
            # per-gate attribution so a dense-scale ledger explains
            # every pruned candidate (VERDICT r2 item 3's escape clause)
            diagnostics.record_ledger(
                ghosts_pruned=int(ghost.sum()),
                recovery_rejected_likelihood=n_lr,
                recovery_pruned_zero_signal=n_sig,
                recovery_pruned_low_signal=n_lowsig,
                recovery_pruned_displacement=n_disp,
                recovery_pruned_duplicate=(
                    int(ghost.sum()) - n_lr - n_sig - n_lowsig - n_disp
                ),
            )
            f = f[~ghost]
    return f, n_spill


def _old_rms_on_footprint(g, rreader, diameter, pos_columns, t_column,
                          host_frames=None):
    """Previous-model residual rms per cluster, on the cluster's own
    union-of-spheres footprint — refine's cost units (rms of
    residual/norm over the mask, norm = max member |signal|).

    ``g``: rows of the clusters to evaluate (must carry cluster/signal);
    ``rreader[t]``: data − previous model (the recovery pass's residual
    stream).  Returns ({cluster_id: rms}, {cluster_id: noise_rms}):
    ``noise_rms`` is the residual frame's robust noise floor in the SAME
    normalized units (1.4826·MAD/norm) — a cluster whose old rms does
    not stand above it carries no evidence of an unmodeled feature (the
    all-new-cluster ghost leak: fitting a Gaussian to a pure-noise blob
    always "improves" its own footprint).  One masked reduction per
    cluster; the footprint uses the pre-refit member positions, which is
    within ~1 px of the refit's final mask — far inside the decision
    margin (a real missed feature raises the old rms several×)."""
    ndim = len(pos_columns)
    radius = np.asarray(validate_tuple(diameter, ndim), float) / 2.0
    out = {}
    out_noise = {}
    for t, gt in g.groupby(t_column):
        # host_frames: residual frames already fetched this pass (the
        # split-probe stage) — each device→host fetch is ~90 ms of
        # tunnel time per 1024² frame, so fetch once per pass
        res = (host_frames or {}).get(int(t))
        if res is None:
            res = np.asarray(rreader[int(t)], dtype=np.float32)
        # frame-global noise floor from a strided subsample: the median/
        # MAD of ~65k pixels estimates σ to ~0.4% (1/√n), and the full
        # 1M-pixel pair of medians was ~10% of the footprint stage wall
        sub = res[(slice(None, None, 4),) * res.ndim]
        med_t = float(np.median(sub))
        noise_t = 1.4826 * float(np.median(np.abs(sub - med_t)))
        shape = np.asarray(res.shape)
        # Batched per cluster-SIZE group: the former per-cluster Python
        # loop (meshgrid + mask per cluster) measured 4.4 s of a 13.3 s
        # dense 4-frame run — the recovery pass's largest single cost.
        # Every union-of-spheres mask pixel lies inside the cluster's
        # bbox ± radius, so a fixed window of the group's max extent,
        # clamped inside the frame, captures the IDENTICAL mask pixel
        # set; the gather and mask then vectorize over the whole group.
        cid_arr = gt["cluster"].to_numpy()
        order = np.argsort(cid_arr, kind="stable")
        cid_s = cid_arr[order]
        pos_s = gt[pos_columns].to_numpy(dtype=float)[order]
        sig_s = np.abs(gt["signal"].to_numpy(dtype=float))[order]
        bounds = np.nonzero(np.diff(cid_s))[0] + 1
        starts = np.concatenate([[0], bounds, [len(cid_s)]])
        sizes = np.diff(starts)
        for n in np.unique(sizes):
            sel_n = np.nonzero(sizes == n)[0]
            idx_n = starts[sel_n][:, None] + np.arange(n)[None, :]
            pos_n = pos_s[idx_n]                      # [Bn, n, D]
            lo_n = np.floor(pos_n.min(axis=1) - radius).astype(int)
            hi_n = np.ceil(pos_n.max(axis=1) + radius).astype(int) + 1
            # sub-bucket by quantized window extent (ADVICE r3): one
            # spatially spread cluster (members ~n·sep apart) must not
            # inflate the [B, *W] gather of every compact cluster in the
            # group — a host-memory spike at dense scale.  Quantizing to
            # 8-px steps keeps the bucket count tiny on homogeneous
            # scenes while isolating outliers in their own bucket.
            q_n = np.minimum(-(-(hi_n - lo_n) // 8) * 8, shape)
            for qrow in np.unique(q_n, axis=0):
                sub = np.nonzero((q_n == qrow).all(axis=1))[0]
                sel = sel_n[sub]
                B = len(sel)
                idx = idx_n[sub]
                pos = pos_n[sub]                      # [B, n, D]
                cids = cid_s[starts[sel]]
                norm = np.maximum(
                    sig_s[idx].max(axis=1), 1e-6
                )                                     # [B]
                lo = lo_n[sub]
                W = tuple(int(min(e, s)) for e, s in zip(qrow, shape))
                o = np.clip(lo, 0, shape - np.asarray(W))  # [B, D]
                # windows[b] = res[o[b,0]:o[b,0]+W[0], ...] via advanced
                # indexing: one broadcasted index array per dim
                ix = []
                for d in range(ndim):
                    ar = o[:, d].reshape((B,) + (1,) * ndim) + np.arange(
                        W[d]
                    ).reshape(
                        (1,) * (1 + d) + (-1,) + (1,) * (ndim - 1 - d)
                    )
                    ix.append(ar)
                window = res[tuple(np.broadcast_arrays(*ix))]  # [B, *W]
                # d² of each window pixel to its nearest member, in
                # radius-normalized units; grid = o + offsets
                d2 = None
                for j in range(n):
                    d2_j = 0.0
                    for d in range(ndim):
                        gd = ix[d] + 0.0              # [B, ...broadcast]
                        dd = (
                            gd - pos[:, j, d].reshape((B,) + (1,) * ndim)
                        ) / radius[d]
                        d2_j = d2_j + dd * dd
                    d2 = d2_j if d2 is None else np.minimum(d2, d2_j)
                mask = d2 <= 1.0                      # [B, *W]
                red = tuple(range(1, 1 + ndim))
                npx = mask.sum(axis=red)
                ss = np.sum(
                    (window.astype(np.float64)) ** 2 * mask, axis=red
                ) / np.maximum(norm, 1e-300) ** 2
                rms = np.where(
                    npx > 0, np.sqrt(ss / np.maximum(npx, 1)), np.inf
                )
                # Per-window noise floor (VERDICT r3 item 4): the MAD of
                # the window's OUT-of-footprint pixels — the local
                # residual background this cluster's evidence must stand
                # above.  In crowded regions neighbors' fit imperfection
                # raises it, tightening the evidence gate exactly where
                # pass-2 ghost lobes live; the frame-global MAD stays as
                # a lower bound (a window can't be quieter than the
                # sensor).
                inv = ~mask
                n_inv = inv.sum(axis=red)
                # Median/MAD over each window's out-of-footprint pixels
                # via vectorized row sorts of +inf-masked values (the
                # k-th order statistics land at per-row indices derived
                # from n_inv).  The former masked-nanmedian pair was the
                # footprint stage's hottest op (np.ma sort machinery —
                # profiled at ~40% of the stage wall at dense scale);
                # two C-level row sorts compute the same statistics.
                B_rows = np.arange(B)
                kk = np.maximum(n_inv, 1)
                lo_i, hi_i = (kk - 1) // 2, kk // 2
                P = int(np.prod(W))
                ws = np.sort(
                    np.where(inv, window, np.inf).reshape(B, P), axis=1
                )
                med_w = 0.5 * (ws[B_rows, lo_i] + ws[B_rows, hi_i])
                med_w = np.where(n_inv > 0, med_w, 0.0)
                adev = np.where(
                    inv,
                    np.abs(window - np.expand_dims(med_w, red)),
                    np.inf,
                ).reshape(B, P)
                asort = np.sort(adev, axis=1)
                mad_w = 0.5 * (asort[B_rows, lo_i] + asort[B_rows, hi_i])
                mad_w = np.where(n_inv > 0, mad_w, 0.0)
                noise_w = np.where(
                    n_inv >= 16, 1.4826 * mad_w, noise_t
                )
                noise_w = np.maximum(noise_w, noise_t)
                for k in range(B):
                    out[int(cids[k])] = float(rms[k])
                    out_noise[int(cids[k])] = (
                        float(noise_w[k]) / float(norm[k])
                    )
    return out, out_noise


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

    def __init__(self, reader, max_bytes: int = _FRAME_CACHE_BYTES,
                 min_frames: int = 8, transfer_dtype=None):
        from collections import OrderedDict

        self._reader = reader
        self._cache = OrderedDict()
        self._max_bytes = max_bytes
        self._min_frames = min_frames
        self._cap = None
        # Optional reduced-precision host→device TRANSFER (frames are
        # cast back to f32 on device): the tunnel moves ~45 MB/s, so a
        # 100-frame 512² f32 video costs ~2.2 s of pure transfer — the
        # single largest config-2 stage.  float16 halves it; quantizes
        # pixel values to ~0.1% relative, below a 10-bit camera's
        # quantization and ~20x below the benchmark scenes' noise.
        self._transfer_dtype = transfer_dtype

    def __len__(self):
        return len(self._reader)

    def __getitem__(self, t):
        import jax.numpy as jnp

        t = int(t)
        if t in self._cache:
            self._cache.move_to_end(t)
            return self._cache[t]
        fr_host = np.asarray(self._reader[t])
        if self._transfer_dtype is not None:
            fr_host = fr_host.astype(self._transfer_dtype)
        fr = jnp.asarray(fr_host).astype(jnp.float32)
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
        # one residual per frame per pass: the accepted fits are fixed at
        # construction, so the render is deterministic — and each pass
        # reads every frame TWICE (residual locate, then the same-footprint
        # rms reference).  Without the cache that second read re-rendered
        # the full fitted model per frame (measured: the render is the
        # recovery pass's single largest cost at dense scale).  Byte-capped:
        # past the cap new frames are served uncached (both sweeps run in
        # frame order, so partial LRU eviction would never hit anyway).
        self._cache = {}
        self._cache_bytes = 0
        self._max_cache_bytes = _FRAME_CACHE_BYTES
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

        t = int(t)
        if t in self._cache:
            return self._cache[t]
        frame = self._reader[t]
        entry = self._by_frame.get(t)
        if entry is None:
            res = jnp.asarray(frame, jnp.float32)
            self._store(t, res)
            return res
        pos, sig, sizes, extras = entry
        shape = tuple(frame.shape)
        # Window from a ROBUST size scale, not the max: one degenerate
        # blended fit can carry sigma ~5x the population (free size
        # params on a blob), and a max-derived window recompiles the
        # render kernel per distinct extent — measured up to 84 px,
        # which OOMs the v5e scoped vmem at compile.  Features wider
        # than the robust scale render with tails truncated at the
        # window edge; beyond 5 sigma of the robust scale that's <1e-5
        # of the signal for everything but the rare rogue lane.
        if sizes.size:
            s_ref = float(
                min(sizes.max(), 4.0 * max(np.median(sizes), 0.5))
            )
        else:
            s_ref = 1.0
        # quantize to 8-px steps so run-to-run size jitter reuses one
        # compiled render kernel instead of paying a fresh axon compile
        window = tuple(
            min(-(-(int(np.ceil(10 * s_ref)) + 1) // 8) * 8, int(d))
            for d in shape
        )
        fidx = np.zeros(len(pos), np.int32)
        rendered = render_frames(
            pos, sig, sizes, fidx, 1, shape,
            fit_function=self._model, window=window, extras=extras,
        )[0]
        res = jnp.asarray(frame, jnp.float32) - rendered
        self._store(t, res)
        return res

    def _store(self, t, res):
        if self._cache_bytes + res.nbytes <= self._max_cache_bytes:
            self._cache[t] = res
            self._cache_bytes += res.nbytes

    def drop_cache(self):
        """Release the cached residual frames (device HBM)."""
        self._cache = {}
        self._cache_bytes = 0


def _shrink_sizes(sizes, valid):
    """Clip per-candidate size estimates to a robust per-frame band:
    ``median ± max(0.15·median, 3·1.4826·MAD)`` of the frame's own
    estimates.

    On a MONODISPERSE frame the moment estimates scatter at noise level
    (MAD ≪ 0.05·median measured), so the band reduces to the
    ±15%-of-median clip that stops BLENDED blobs from seeding their fit
    with a pair-extent width (see the call site in _locate_frames).  On
    a POLYDISPERSE sample the size spread itself raises the MAD, so the
    band widens to admit it — a legitimate σ=1.5 / σ=3 mixed population
    keeps both modes instead of being crushed to ±15% of the median
    (VERDICT r4 item 6); only candidates that are outliers against the
    frame's own size distribution are shrunk.  Pinned by
    tests/test_locate.py::test_locate_polydisperse_sizes."""
    out = sizes.copy()
    for j in range(sizes.shape[0]):
        ok = valid[j]
        if not ok.any():
            continue
        s = sizes[j][ok]
        m = float(np.median(s))
        half = max(0.15 * m, 3.0 * 1.4826 * float(np.median(np.abs(s - m))))
        out[j][ok] = np.clip(s, m - half, m + half)
    return out


def _locate_frames(
    reader, frame_numbers, diameter, locate_separation, threshold,
    percentile, max_features, t_column, stack_chunk: int = 64,
    match_sigma=None, preprocess=None, noise_size=1.0,
    threshold_tile=None, noise_k: float = 6.0,
):
    """Candidate features for many frames with ONE device dispatch per
    ``stack_chunk`` frames (vmapped local_maxima over the frame stack).

    Per-frame locate dispatches pay the full host↔device round-trip each
    (~27 ms on the axon tunnel — RTT-dominated at 100 frames); batching
    cuts that by ~stack_chunk×.  Frames of differing shapes fall back to
    the per-frame path.  Device-resident frames (from _DeviceFrameCache)
    stay on device: the stack and the threshold statistics are computed
    there.

    ``match_sigma`` (per-axis tuple or scalar, px) enables MATCHED-FILTER
    detection: peaks are found on a Gaussian-smoothed copy of each frame
    and thresholded against the SMOOTHED frame's own MAD noise — for
    white noise the smoothed floor drops by ~||k||₂ while a matched
    feature's peak only halves (2D), so features ~2.8× below the raw
    noise gate become detectable.  Used by the recovery pass, where the
    missed partner of a blended pair survives only as a faint residual
    lobe.  Peak values are rescaled back to amplitude units assuming
    feature σ ≈ match_sigma; size moments still run on the RAW frames.

    ``preprocess='bandpass'`` (VERDICT r4 item 5) runs the trackpy-style
    bandpass (Gaussian smooth at ``noise_size`` px minus a
    diameter-scale boxcar background, clipped at 0) before everything —
    thresholds, peaks, AND size moments run on the flattened stack, so
    sloped/vignetted illumination neither floods dim corners with false
    candidates nor starves bright ones.  ``threshold_tile`` (px) further
    switches the default noise floor to a per-tile median+MAD map for
    backgrounds the bandpass cannot fully flatten (ignored when an
    explicit ``threshold`` is given).
    """
    import jax
    import jax.numpy as jnp

    from .ops.locate import (bandpass, gaussian_blur, local_maxima,
                             tile_threshold_map)

    if preprocess not in (None, "raw", "bandpass"):
        raise ValueError(
            f"Unknown preprocess={preprocess!r}; use None or 'bandpass'"
        )
    frame_numbers = list(frame_numbers)
    out = []
    i = 0
    import os as _os
    _dbg = _os.environ.get("CT_DEBUG_LOCATE")
    while i < len(frame_numbers):
        _t0 = time.perf_counter()
        chunk = frame_numbers[i:i + stack_chunk]
        images = [reader[t] for t in chunk]
        if _dbg:
            import jax as _jax
            for im in images:
                if isinstance(im, _jax.Array):
                    im.block_until_ready()
            _t1 = time.perf_counter()
            print(f"[locate] read+push {_t1 - _t0:.3f}", flush=True)
        if len({tuple(im.shape) for im in images}) != 1:
            for t, im in zip(chunk, images):
                f_t = locate(
                    np.asarray(im), diameter, locate_separation,
                    threshold=threshold,
                    percentile=percentile, max_features=max_features,
                    preprocess=preprocess, noise_size=noise_size,
                    threshold_tile=threshold_tile,
                )
                f_t[t_column] = t
                out.append(f_t)
            i += stack_chunk
            continue
        T = len(chunk)
        ndim_s = int(np.ndim(images[0]))
        nsz = tuple(
            float(s) for s in validate_tuple(noise_size, ndim_s)
        )
        if any(isinstance(im, jax.Array) for im in images) or \
                preprocess == "bandpass":
            stack = jnp.stack(
                [jnp.asarray(im, jnp.float32) for im in images]
            )
            if preprocess == "bandpass":
                bsz = tuple(
                    int(round(d)) | 1
                    for d in validate_tuple(diameter, ndim_s)
                )
                # noise statistics come from the UNCLIPPED difference —
                # after the zero clip most background pixels are exactly
                # 0, so median/MAD of the clipped frame collapse and the
                # noise floor with them (see ops/locate.bandpass)
                bp = bandpass(stack, nsz, bsz, clip=False)
                stack = jnp.maximum(bp, 0.0)
                stat_src = bp
            else:
                stat_src = stack
            # threshold statistics from a 4x-strided subsample: the
            # exact median/percentile SORT every pixel (262k/frame on
            # 512² — measured ~1.8 s of the config-2 locate wall);
            # ~16k samples estimate the floors to ~1% of sigma
            sub_ix = (slice(None),) + (slice(None, None, 4),) * (
                stat_src.ndim - 1
            )
            flat = stat_src[sub_ix].reshape(T, -1)
            med = jnp.median(flat, axis=1)
            mad = jnp.median(jnp.abs(flat - med[:, None]), axis=1)
            # Quantized (integer-dtype) frames collapse the MAD to
            # exactly 0 when >50% of pixels share the median value —
            # e.g. uint8 background noise clipped at 0 — which erased
            # the noise floor and flooded locate with noise maxima
            # (measured: 194 candidates on a 2-feature saturated uint8
            # frame).  Fall back to a quantile scale (q90−med = 1.2816σ
            # for a Gaussian), which survives quantization yet stays 0
            # on truly noiseless synthetics (background exactly flat).
            q90 = jnp.percentile(flat, 90.0, axis=1)
            noise = jnp.where(
                mad > 0, 1.4826 * mad,
                jnp.maximum((q90 - med) / 1.2816, 0.0),
            )
            if threshold is None:
                if threshold_tile:
                    # locally adaptive floor: [T, *S] med+6·MAD map
                    thr = tile_threshold_map(
                        stat_src, int(threshold_tile)
                    )
                else:
                    pct = jnp.percentile(flat, percentile, axis=1)
                    thr = jnp.maximum(pct, med + noise_k * noise)
            else:
                thr = jnp.full((T,), threshold, jnp.float32)
        else:
            stack_np = np.stack(images).astype(np.float32)
            sub_ix = (slice(None),) + (slice(None, None, 4),) * (
                stack_np.ndim - 1
            )
            flat = stack_np[sub_ix].reshape(T, -1)
            med = np.median(flat, axis=1).astype(np.float32)
            mad = np.median(np.abs(flat - med[:, None]), axis=1)
            # quantization-robust fallback when MAD collapses to 0 —
            # see the device branch above
            q90 = np.percentile(flat, 90.0, axis=1)
            noise = np.where(
                mad > 0, 1.4826 * mad,
                np.maximum((q90 - med) / 1.2816, 0.0),
            ).astype(np.float32)
            if threshold is None:
                if threshold_tile:
                    thr = np.asarray(tile_threshold_map(
                        jnp.asarray(stack_np), int(threshold_tile)
                    ))
                else:
                    pct = np.percentile(flat, percentile, axis=1)
                    thr = np.maximum(
                        pct, med + noise_k * noise
                    ).astype(np.float32)
            else:
                thr = np.full(T, threshold, np.float32)
            stack = stack_np
        sep = tuple(int(round(s)) for s in locate_separation)

        loc_stack = stack
        amp_corr = 1.0
        if match_sigma is not None:
            ndim_s = int(np.ndim(images[0]))
            sig = tuple(
                float(s) for s in validate_tuple(match_sigma, ndim_s)
            )
            loc_stack = gaussian_blur(jnp.asarray(stack, jnp.float32),
                                      sig)
            sub_ix = (slice(None),) + (slice(None, None, 4),) * (
                loc_stack.ndim - 1
            )
            sflat = loc_stack[sub_ix].reshape(T, -1)
            smed = jnp.median(sflat, axis=1)
            smad = jnp.median(jnp.abs(sflat - smed[:, None]), axis=1)
            snoise = 1.4826 * smad
            # peak attenuation of a matched Gaussian feature: per-axis
            # σ/√(σ² + σ_k²), and σ ≈ σ_k by construction → 2^{-D/2}
            att = 2.0 ** (-0.5 * len(sig))
            amp_corr = 1.0 / att
            if threshold is None:
                if threshold_tile:
                    thr = tile_threshold_map(
                        jnp.asarray(loc_stack), int(threshold_tile)
                    )
                else:
                    pct = jnp.percentile(sflat, percentile, axis=1)
                    thr = jnp.maximum(pct, smed + noise_k * snoise)
            else:
                # explicit thresholds are in raw-amplitude units
                thr = jnp.full((T,), threshold * att, jnp.float32)

        ndim = stack.ndim - 1
        pos_columns = default_pos_columns(ndim)
        from .ops.locate import feature_sizes
        from .utils import validate_tuple as _vt

        diam = _vt(diameter, ndim)
        wshape = tuple(int(round(d)) | 1 for d in diam)
        coords_d, vals_d, valid_d, n_cand_d = jax.jit(
            jax.vmap(
                lambda im, th: local_maxima(im, sep, max_features, th)
            )
        )(jnp.asarray(loc_stack), jnp.asarray(thr))
        # per-candidate size estimate (trackpy.locate 'size' parity):
        # radius of gyration about the peak — chained DEVICE-side off
        # local_maxima's outputs, so all five results come back in ONE
        # device_get round trip (five sequential np.asarray fetches paid
        # the tunnel latency each — ~0.2 s per 64-frame chunk)
        sizes_d = feature_sizes(
            jnp.asarray(stack), coords_d.astype(jnp.int32), valid_d,
            wshape,
            tuple(d / 2.0 for d in diam), jnp.asarray(med, jnp.float32),
            noise=jnp.asarray(noise, jnp.float32), per_axis=True,
        )                                                # [T, K, D]
        if _dbg:
            _t2 = time.perf_counter()
        coords, vals, valid, n_cand, sizes_ax = jax.device_get(
            (coords_d, vals_d, valid_d, n_cand_d, sizes_d)
        )
        if _dbg:
            print(f"[locate] enqueue {_t2 - _t1:.3f} "
                  f"devget {time.perf_counter() - _t2:.3f}", flush=True)
        # device_get buffers are read-only; the overflow fix-up and the
        # size shrink below mutate in place
        coords = np.array(coords)
        # rescale smoothed peak values back to amplitude units (the
        # warm-start signal column); -inf padding survives the scale
        vals = np.asarray(vals) * amp_corr
        valid = np.array(valid)
        sizes_ax = np.array(sizes_ax)
        # Saturated frames (more candidates than max_features) got a
        # raster-order truncation from the cumsum compaction; re-run just
        # those through the exact brightest-first top-k path.
        for j in np.nonzero(np.asarray(n_cand) > max_features)[0]:
            from .ops.locate import local_maxima_topk

            c_j, v_j, ok_j, _ = local_maxima_topk(
                jnp.asarray(loc_stack[j]), sep, max_features,
                jnp.asarray(thr)[j]
            )
            coords[j] = np.asarray(c_j)
            vals[j] = np.asarray(v_j) * amp_corr
            valid[j] = np.asarray(ok_j)
            sizes_ax[j] = np.asarray(feature_sizes(
                jnp.asarray(stack[j])[None],
                jnp.asarray(coords[j], jnp.int32)[None],
                jnp.asarray(valid[j])[None], wshape,
                tuple(d / 2.0 for d in diam),
                jnp.asarray(med[j :j + 1], jnp.float32),
                noise=jnp.asarray(noise[j:j + 1], jnp.float32),
                per_axis=True,
            ))[0]
        if preprocess == "bandpass":
            # the noise_size Gaussian convolves the PSF: the moment
            # estimate reads sqrt(σ² + noise_size²) — deconvolve so the
            # fit warm start carries the true width
            nsz_ax = np.asarray(nsz, np.float32)
            sizes_ax = np.sqrt(
                np.maximum(sizes_ax**2 - nsz_ax[None, None, :] ** 2,
                           0.25)
            )
        # Shrink outliers toward the per-frame median (per axis): a
        # BLENDED blob's moment reads the pair extent, not the PSF —
        # seeding its fit with that inflated width soaks the hidden
        # partner into one wide profile and erases the residual lobe
        # the recovery pass needs (measured: clipping blended estimates
        # to ~typical took dense-scale recovery coverage 88.8 → ~94%).
        # Within a frame the PSF width is near-constant; genuine ±15%
        # variation survives the clip.
        for ax in range(sizes_ax.shape[-1]):
            sizes_ax[..., ax] = _shrink_sizes(sizes_ax[..., ax], valid)
        # isotropic scalar = geometric mean of the axes
        with np.errstate(divide="ignore"):
            sizes = np.exp(
                np.mean(np.log(np.maximum(sizes_ax, 1e-9)), axis=-1)
            ) * (valid > 0)
        from .utils import default_size_columns

        aniso_cols = default_size_columns(ndim, False)
        if _dbg:
            _t3 = time.perf_counter()
        for j, t in enumerate(chunk):
            ok = valid[j]
            f_t = pd.DataFrame(
                coords[j][ok].astype(float), columns=pos_columns
            )
            f_t["signal"] = vals[j][ok]
            f_t["size"] = sizes[j][ok]
            if ndim == 3:
                # z-stack PSFs are elongated along z: per-axis size
                # columns let refine fit the anisotropic model (the
                # presence of size_z/size_y/size_x selects it)
                for ax, c in enumerate(aniso_cols):
                    f_t[c] = sizes_ax[j, ok, ax]
            f_t[t_column] = t
            out.append(f_t)
        if _dbg:
            print(f"[locate] host-tail {time.perf_counter() - _t3:.3f}",
                  flush=True)
        i += stack_chunk
    return pd.concat(out, ignore_index=True)


def _track_checkpointed(
    reader, diameter, separation, search_range, memory, n_frames,
    locate_separation, threshold, percentile, max_features,
    find_backend, t_column, checkpoint_dir, checkpoint_every,
    recover_passes, recover_min_signal_frac, mesh, refine_kwargs,
    preprocess=None, noise_size=1.0, threshold_tile=None,
    accept_ratio=None, disp_gate=-1.0, split_excess=-1.0,
    transfer_dtype=None,
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

    reader = _DeviceFrameCache(reader, transfer_dtype=transfer_dtype)
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
            percentile, max_features, t_column, preprocess=preprocess,
            noise_size=noise_size, threshold_tile=threshold_tile,
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
                min_signal_frac=recover_min_signal_frac,
                accept_ratio=accept_ratio, disp_gate=disp_gate,
                split_excess=split_excess,
                preprocess=preprocess, noise_size=noise_size,
                threshold_tile=threshold_tile,
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
