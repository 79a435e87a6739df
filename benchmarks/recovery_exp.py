#!/usr/bin/env python
"""Dense-scale recovery-pass experiment (VERDICT r2 item 3).

Runs BASELINE config 5 (10k overlapping features/frame) with and without
``recover_passes=1`` and scores coverage against truth: a truth feature
counts as TRACKED if an output feature of the same frame lies within
1 px; an output feature counts as GHOST if no truth feature lies within
1.5 px.  Prints one JSON line per variant.
"""
import json
import sys
import time

import numpy as np
from scipy.spatial import cKDTree

sys.path.insert(0, ".")

import jax  # noqa: E402

from benchmarks.suite import _video  # noqa: E402


def score(out, truth, n_frames):
    tracked = 0
    total = 0
    ghosts = 0
    err = []
    for t in range(n_frames):
        tr = truth[truth["frame"] == t][["y", "x"]].to_numpy()
        ot = out[(out["frame"] == t) & out["cost"].notna()][
            ["y", "x"]].to_numpy()
        total += len(tr)
        if not len(ot):
            continue
        tree = cKDTree(ot)
        d, _ = tree.query(tr, k=1)
        tracked += int((d < 1.0).sum())
        err.extend(d[d < 1.0].tolist())
        ttree = cKDTree(tr)
        d2, _ = ttree.query(ot, k=1)
        ghosts += int((d2 > 1.5).sum())
    return {
        "truth_total": total,
        "tracked": tracked,
        "coverage_pct": round(100.0 * tracked / total, 2),
        "ghosts": ghosts,
        "median_err_px": round(float(np.median(err)), 4) if err else None,
    }


def main():
    from benchmarks.suite import enable_compile_cache
    enable_compile_cache()
    import clustertracking_tpu as ct

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    passes = [int(a) for a in sys.argv[2:]] or [0, 1]
    reader, truth = _video(n_frames, 10000, (1024, 1024), 5.0, seed=5)
    kw = dict(diameter=9, separation=6, search_range=3.0, memory=2,
              link_backend="auto", max_features=16384,
              max_cluster_size=40)
    for rp in passes:
        ct.track(reader, recover_passes=rp, **kw)  # warm (jit compiles)
        with ct.diagnostics.collect() as stats:
            t0 = time.perf_counter()
            out = ct.track(reader, recover_passes=rp, **kw)
            dt = time.perf_counter() - t0
        rec = {"recover_passes": rp,
               "frames_per_sec": round(n_frames / dt, 3)}
        rec.update(score(out, truth, n_frames))
        rec["ledger"] = {k: (round(v, 3) if isinstance(v, float) else v)
                         for k, v in stats.ledger.items()}
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
