#!/usr/bin/env python
"""Sweep the recovery-pass admission gates at FULL config-5 scale
(VERDICT r4 item 1: close dense coverage toward the 99.81% oracle
ceiling).  Sweeps the residual-locate noise gate
(pipeline._RECOVERY_NOISE_K) and the pass count; prints one JSON line
per point with coverage/ghosts/frames-per-sec and the per-gate ledger.

    python benchmarks/gate_sweep.py 6:1 4:1 3:1 4:2
                                    # noise_k : recover_passes
"""
import json
import sys
import time

sys.path.insert(0, ".")

from benchmarks.recovery_exp import score  # noqa: E402
from benchmarks.suite import _video, enable_compile_cache  # noqa: E402


def main():
    enable_compile_cache()
    import clustertracking_tpu as ct
    from clustertracking_tpu import pipeline

    n_frames = 4
    # point spec: comma-separated key=value tokens, e.g.
    #   k=6,rp=1,lm=60,mi=6,disp=3.5,cap=32
    # k: _RECOVERY_NOISE_K; rp: recover_passes; lm/mi: refit budget
    # (_REFIT_LM_MAX_ITER/_REFIT_MAX_ITER); disp: _DISP_GATE (0 → None);
    # cap: max_cluster_size
    specs = sys.argv[1:] or ["k=6,rp=1"]
    reader, truth = _video(n_frames, 10000, (1024, 1024), 5.0, seed=5)
    base_kw = dict(diameter=9, separation=6, search_range=3.0, memory=2,
                   link_backend="auto", max_features=16384)
    defaults = dict(
        k=pipeline._RECOVERY_NOISE_K, rp=1,
        lm=pipeline._REFIT_LM_MAX_ITER, mi=pipeline._REFIT_MAX_ITER,
        disp=pipeline._DISP_GATE, cap=24,
        split=pipeline._SPLIT_SIG_EXCESS,
        ratio=pipeline._ACCEPT_RATIO, ev=pipeline._NOISE_EVIDENCE,
        dup=pipeline._DUP_R_FRAC,
    )
    warm = set()
    for spec in specs:
        p = dict(defaults)
        for tok in spec.split(","):
            key, v = tok.split("=")
            p[key] = float(v)
        rp = int(p["rp"])
        pipeline._RECOVERY_NOISE_K = p["k"]
        pipeline._REFIT_LM_MAX_ITER = int(p["lm"])
        pipeline._REFIT_MAX_ITER = int(p["mi"])
        pipeline._DISP_GATE = (float(p["disp"]) if p["disp"] else None)
        pipeline._SPLIT_SIG_EXCESS = (float(p["split"]) if p["split"]
                                      else None)
        pipeline._ACCEPT_RATIO = float(p["ratio"])
        pipeline._NOISE_EVIDENCE = float(p["ev"])
        pipeline._DUP_R_FRAC = float(p["dup"])
        kw = dict(base_kw, max_cluster_size=int(p["cap"]))
        wkey = (rp, int(p["cap"]))
        if wkey not in warm:
            ct.track(reader, recover_passes=rp, **kw)
            warm.add(wkey)
        with ct.diagnostics.collect() as stats:
            t0 = time.perf_counter()
            out = ct.track(reader, recover_passes=rp, **kw)
            dt = time.perf_counter() - t0
        rec = {"spec": spec,
               "frames_per_sec": round(n_frames / dt, 3)}
        rec.update(score(out, truth, n_frames))
        rec["ledger"] = {kk: (round(v, 3) if isinstance(v, float) else v)
                         for kk, v in stats.ledger.items()}
        print(json.dumps(rec), flush=True)
        for attr, key in (("_RECOVERY_NOISE_K", "k"),
                          ("_REFIT_LM_MAX_ITER", "lm"),
                          ("_REFIT_MAX_ITER", "mi"),
                          ("_DISP_GATE", "disp"),
                          ("_SPLIT_SIG_EXCESS", "split"),
                          ("_ACCEPT_RATIO", "ratio"),
                          ("_NOISE_EVIDENCE", "ev"),
                          ("_DUP_R_FRAC", "dup")):
            setattr(pipeline, attr, defaults[key])


if __name__ == "__main__":
    main()
