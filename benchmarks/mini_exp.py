#!/usr/bin/env python
"""Mini-scale recovery ghost-attribution experiment (CPU, fast loop).

Replicates tests/test_track.py::test_dense_recovery_coverage's scene
(1 frame, 500 features at config-5 density, 224², seed 11) and scores
coverage + ghosts per recovery pass WITH provenance: each ghost is
attributed to the pass that created it (pipeline._TAG_RECOVERED) and to
the accept route (cluster had original members vs all-new), so a gate
can be tuned against the category that actually leaks.

Usage: python benchmarks/mini_exp.py [passes ...]   (default: 0 1 2)
"""
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
from scipy.spatial import cKDTree

sys.path.insert(0, ".")

from benchmarks.suite import _video  # noqa: E402
import clustertracking_tpu as ct  # noqa: E402
from clustertracking_tpu import pipeline  # noqa: E402


def main():
    pipeline._TAG_RECOVERED = True
    passes = [int(a) for a in sys.argv[1:]] or [0, 1, 2]
    reader, truth = _video(1, 500, (224, 224), 5.0, seed=11)
    kw = dict(diameter=9, separation=6, search_range=3.0,
              link_backend="host", max_features=2048,
              max_cluster_size=24)
    tr = truth[truth["frame"] == 0][["y", "x"]].to_numpy()
    for rp in passes:
        with ct.diagnostics.collect() as s:
            out = ct.track(reader, recover_passes=rp, **kw)
        ok = out[out["cost"].notna()]
        ot = ok[["y", "x"]].to_numpy()
        d, _ = cKDTree(ot).query(tr, k=1)
        d2, _ = cKDTree(tr).query(ot, k=1)
        ghosts = d2 > 1.5
        prov = (ok["recovered_pass"].to_numpy()
                if "recovered_pass" in ok.columns
                else np.zeros(len(ok), np.int32))
        by_pass = {
            int(p): int((ghosts & (prov == p)).sum())
            for p in np.unique(prov)
        }
        rec = {
            "passes": rp,
            "coverage_pct": round(100.0 * (d < 1.0).mean(), 2),
            "ghosts": int(ghosts.sum()),
            "ghosts_by_pass": by_pass,
            "median_err_px": round(float(np.median(d[d < 1.0])), 4),
            "n_out": len(ok),
            "ledger": {k: v for k, v in s.ledger.items()
                       if "recover" in k or "ghost" in k},
        }
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
