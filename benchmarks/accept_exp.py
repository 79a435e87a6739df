#!/usr/bin/env python
"""Accept-gate attribution: for every cluster the recovery pass touched,
print (ratio, evidence, all_new, n_cand) alongside whether its accepted
candidates turned out to be ghosts — the data a gate threshold must
separate.  Mini config-5 scene (CPU), pass 1.
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
    pipeline._DEBUG_ACCEPT = dbg = []
    reader, truth = _video(1, 500, (224, 224), 5.0, seed=11)
    kw = dict(diameter=9, separation=6, search_range=3.0,
              link_backend="host", max_features=2048,
              max_cluster_size=24)
    out = ct.track(reader, recover_passes=1, **kw)
    tr = truth[truth["frame"] == 0][["y", "x"]].to_numpy()
    ok = out[out["cost"].notna()]
    d2, _ = cKDTree(tr).query(ok[["y", "x"]].to_numpy(), k=1)
    ghosts = d2 > 1.5
    rec = ok["recovered_pass"].to_numpy() == 1
    cl = ok["cluster"].to_numpy()
    ghost_by_cid = {}
    surv_by_cid = {}
    for i in np.nonzero(rec)[0]:
        ghost_by_cid[cl[i]] = ghost_by_cid.get(cl[i], 0) + int(ghosts[i])
        surv_by_cid[cl[i]] = surv_by_cid.get(cl[i], 0) + 1
    def _finite(v, nd):
        # json.dumps emits bare NaN/Infinity tokens, which strict JSON
        # parsers (jq, JSON.parse) reject — map non-finite to null.
        v = float(v)
        return round(v, nd) if np.isfinite(v) else None

    for r in dbg:
        ratio = r["new_cost"] / r["ref"] if r["ref"] else np.nan
        ev = r["ref"] / r["noise"] if r["noise"] else np.inf
        r2 = dict(r, ratio=_finite(ratio, 3), evidence=_finite(ev, 2),
                  survivors=surv_by_cid.get(r["cid"], 0),
                  ghosts=ghost_by_cid.get(r["cid"], 0))
        print(json.dumps(r2), flush=True)
    # main-fit rows that drifted into ghosts during the pass
    n_main_ghost = int((ghosts & ~rec).sum())
    print(json.dumps({"main_fit_ghosts": n_main_ghost,
                      "pass1_ghosts": int((ghosts & rec).sum()),
                      "accepted": int(rec.sum())}), flush=True)


if __name__ == "__main__":
    main()
