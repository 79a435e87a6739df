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
    points = [tuple(float(x) for x in a.split(":"))
              for a in sys.argv[1:]] or [(6.0, 1), (4.0, 1), (3.0, 1)]
    reader, truth = _video(n_frames, 10000, (1024, 1024), 5.0, seed=5)
    kw = dict(diameter=9, separation=6, search_range=3.0, memory=2,
              link_backend="auto", max_features=16384,
              max_cluster_size=24)
    warm = False
    for k, rp in points:
        rp = int(rp)
        pipeline._RECOVERY_NOISE_K = k
        if not warm:
            ct.track(reader, recover_passes=rp, **kw)
            warm = True
        with ct.diagnostics.collect() as stats:
            t0 = time.perf_counter()
            out = ct.track(reader, recover_passes=rp, **kw)
            dt = time.perf_counter() - t0
        rec = {"noise_k": k, "recover_passes": rp,
               "frames_per_sec": round(n_frames / dt, 3)}
        rec.update(score(out, truth, n_frames))
        rec["ledger"] = {kk: (round(v, 3) if isinstance(v, float) else v)
                         for kk, v in stats.ledger.items()}
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
