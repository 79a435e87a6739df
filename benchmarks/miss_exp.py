#!/usr/bin/env python
"""Attribute every MISSED truth feature at full config-5 scale to the
stage that lost it (VERDICT r4 item 1: the per-gate ledger must name the
largest bucket before coverage work is spent).

Categories per missed truth feature (nearest-match within 1 px):
  gate:<name>   — a recovery candidate reached the accept stage and was
                  pruned by that gate ('likelihood', 'low_signal', ...)
  over_cap      — its recovery candidate pushed a cluster past the
                  bucket cap and was dropped pre-refit
  located_lost  — a residual candidate existed within 1 px but none of
                  the above explains the loss (prep drops, refit moved
                  it away, ...)
  not_located   — the residual locate never produced a candidate within
                  1 px: a detection-floor loss (lower noise_k or a
                  second matched-filter scale is the lever)

Usage: python benchmarks/miss_exp.py [n_frames] [spec]
  spec: gate_sweep-style tokens, e.g. k=6,rp=2,cap=32,ratio=0.9
"""
import json
import sys

import numpy as np
from scipy.spatial import cKDTree

sys.path.insert(0, ".")

from benchmarks.recovery_exp import score  # noqa: E402
from benchmarks.suite import _video, enable_compile_cache  # noqa: E402


def main():
    enable_compile_cache()
    import clustertracking_tpu as ct
    from clustertracking_tpu import pipeline

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    # optional spec string like gate_sweep.py: k=6,rp=2,cap=32,ratio=0.9
    p = dict(k=6.0, rp=1, cap=24, ratio=None, disp=-1.0, split=-1.0)
    if len(sys.argv) > 2:
        for tok in sys.argv[2].split(","):
            kk, v = tok.split("=")
            p[kk] = float(v)
    pipeline._RECOVERY_NOISE_K = p["k"]
    reader, truth = _video(n_frames, 10000, (1024, 1024), 5.0, seed=5)
    kw = dict(diameter=9, separation=6, search_range=3.0, memory=2,
              link_backend="auto", max_features=16384,
              max_cluster_size=int(p["cap"]),
              recover_accept_ratio=p["ratio"],
              recover_disp_gate=p["disp"],
              recover_split_excess=p["split"])
    stash: dict = {}
    pipeline._DEBUG_STASH = stash
    out = ct.track(reader, recover_passes=int(p["rp"]), **kw)
    pipeline._DEBUG_STASH = None
    rec = score(out, truth, n_frames)

    import pandas as pd
    located = (pd.concat(stash.get("located", []), ignore_index=True)
               if stash.get("located") else pd.DataFrame())
    gated = (pd.concat(stash.get("gated", []), ignore_index=True)
             if stash.get("gated") else pd.DataFrame())

    cats: dict = {}
    sig_of_notloc = []
    for t in range(n_frames):
        tr = truth[truth["frame"] == t][["y", "x"]].to_numpy()
        ot = out[(out["frame"] == t) & out["cost"].notna()][
            ["y", "x"]].to_numpy()
        d = (cKDTree(ot).query(tr, k=1)[0] if len(ot)
             else np.full(len(tr), np.inf))
        misses = tr[d >= 1.0]
        gt = gated[gated["frame"] == t] if len(gated) else gated
        lt = located[located["frame"] == t] if len(located) else located
        gpos = gt[["y", "x"]].to_numpy() if len(gt) else None
        lpos = lt[["y", "x"]].to_numpy() if len(lt) else None
        gtree = cKDTree(gpos) if gpos is not None and len(gpos) else None
        ltree = cKDTree(lpos) if lpos is not None and len(lpos) else None
        tr_sig = truth[truth["frame"] == t]["signal"].to_numpy() \
            if "signal" in truth.columns else None
        for mi, m in enumerate(misses):
            cat = "not_located"
            if gtree is not None:
                dg, kg = gtree.query(m, k=1)
                if dg < 1.0:
                    g = gt.iloc[kg]
                    cat = ("over_cap" if g["gate"] == "over_cap"
                           else f"gate:{g['gate']}")
                    # accepted-but->1px means the refit moved it away
                    if g["gate"] == "accepted":
                        cat = "located_lost"
                elif dg < 2.5:
                    # flank-lobe candidate: residual evidence peaked
                    # OUTSIDE the truth (quadrupole flank of an absorbed
                    # blend) — the candidate existed, displaced
                    cat = f"flank:{gt.iloc[kg]['gate']}"
            if cat == "not_located" and ltree is not None:
                dl, _ = ltree.query(m, k=1)
                if dl < 1.0:
                    cat = "located_lost"
                elif dl < 2.5:
                    cat = "flank:prep_lost"
            cats[cat] = cats.get(cat, 0) + 1
    rec["miss_categories"] = dict(
        sorted(cats.items(), key=lambda kv: -kv[1])
    )
    if len(gated):
        rec["gate_counts_all_candidates"] = (
            gated["gate"].value_counts().to_dict()
        )
    print(json.dumps(rec), flush=True)

    # --- residual evidence at the not_located misses -------------------
    # For each miss with no residual candidate within 1 px: the max
    # matched-filter residual within 2 px of the truth position vs the
    # frame's 6σ smoothed-noise gate, the distance to the nearest
    # accepted output, and that output's fitted signal/size (is it an
    # absorbed blend carrying ~2× signal / inflated width?).
    rr = stash.get("rreader", [None])[0]
    msig = stash.get("match_sigma", [None])[0]
    if rr is not None:
        import jax.numpy as jnp

        from clustertracking_tpu.ops.locate import gaussian_blur

        ev, dnn, snn, sznn = [], [], [], []
        for t in range(n_frames):
            tr = truth[truth["frame"] == t][["y", "x"]].to_numpy()
            sel = (out["frame"] == t) & out["cost"].notna()
            ot = out[sel][["y", "x"]].to_numpy()
            osig = out[sel]["signal"].to_numpy()
            osz = out[sel]["size"].to_numpy()
            d = (cKDTree(ot).query(tr, k=1)[0] if len(ot)
                 else np.full(len(tr), np.inf))
            misses = tr[d >= 1.0]
            lt = located[located["frame"] == t] if len(located) else None
            res = np.asarray(rr[t])
            sm = np.asarray(gaussian_blur(
                jnp.asarray(res)[None], (float(msig),) * 2
                if np.isscalar(msig) else tuple(msig))[0])
            smed = float(np.median(sm))
            snoise = 1.4826 * float(np.median(np.abs(sm - smed)))
            thr = smed + 6.0 * snoise
            otree = cKDTree(ot) if len(ot) else None
            ltree = (cKDTree(lt[["y", "x"]].to_numpy())
                     if lt is not None and len(lt) else None)
            for m in misses:
                if ltree is not None and ltree.query(m, k=1)[0] < 1.0:
                    continue  # located (pruned elsewhere) — skip here
                iy, ix = int(round(m[0])), int(round(m[1]))
                w = sm[max(0, iy - 2):iy + 3, max(0, ix - 2):ix + 3]
                ev.append(float(w.max() - thr) / max(snoise, 1e-9))
                dd, kk = otree.query(m, k=1)
                dnn.append(float(dd))
                snn.append(float(osig[kk]))
                sznn.append(float(osz[kk]))
        ev, dnn, snn, sznn = map(np.asarray, (ev, dnn, snn, sznn))
        med_sig = float(out[out["cost"].notna()]["signal"].median())
        med_sz = float(out[out["cost"].notna()]["size"].median())
        print(json.dumps({
            "not_located_n": len(ev),
            "evidence_minus_gate_sigma": {
                "q10": round(float(np.percentile(ev, 10)), 2),
                "q50": round(float(np.percentile(ev, 50)), 2),
                "q90": round(float(np.percentile(ev, 90)), 2),
                "frac_above_gate": round(float((ev > 0).mean()), 3),
            },
            "dist_to_nearest_output": {
                "q10": round(float(np.percentile(dnn, 10)), 2),
                "q50": round(float(np.percentile(dnn, 50)), 2),
                "q90": round(float(np.percentile(dnn, 90)), 2),
            },
            "nearest_output_signal_over_median": {
                "q10": round(float(np.percentile(snn / med_sig, 10)), 2),
                "q50": round(float(np.percentile(snn / med_sig, 50)), 2),
                "q90": round(float(np.percentile(snn / med_sig, 90)), 2),
            },
            "nearest_output_size_over_median": {
                "q10": round(float(np.percentile(sznn / med_sz, 10)), 2),
                "q50": round(float(np.percentile(sznn / med_sz, 50)), 2),
                "q90": round(float(np.percentile(sznn / med_sz, 90)), 2),
            },
        }), flush=True)


if __name__ == "__main__":
    main()


