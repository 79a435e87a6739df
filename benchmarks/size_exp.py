#!/usr/bin/env python
"""Size-sensitivity of dense-coverage (round-4 frontier experiment).

The truth-seeded oracle (oracle_exp.py) reaches 99.8% with the EXACT
const size (1.6 px); the pipeline fixes each fit's size at the locate
estimate (moment inversion, shrink-clipped to ±15% of the frame
median).  This experiment measures how much coverage a systematically
wrong const size costs at config-5 density, and whether FITTING the
size (param_mode size='cluster' / 'var') from a wrong start recovers
it — deciding whether the round-4 coverage push should target size
estimation or size fitting.

Usage: python benchmarks/size_exp.py [n_frames]
"""
import json
import sys

import numpy as np

sys.path.insert(0, ".")

from benchmarks.recovery_exp import score  # noqa: E402
from benchmarks.suite import _video, enable_compile_cache  # noqa: E402


def main():
    enable_compile_cache()
    import clustertracking_tpu as ct

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    reader, truth = _video(n_frames, 10000, (1024, 1024), 5.0, seed=5)

    variants = [
        ("size_exact_const", 1.60, None),
        ("size_p8_const", 1.73, None),
        ("size_p15_const", 1.84, None),
        ("size_p15_fit_cluster", 1.84, {"size": "cluster"}),
        ("size_p15_fit_var", 1.84, {"size": "var"}),
    ]
    for name, size0, pmode in variants:
        f = truth.copy()
        f["size"] = size0
        f = ct.find_clusters(f, separation=6)
        kw = dict(diameter=9, separation=6, max_cluster_size=24)
        if pmode is not None:
            kw["param_mode"] = pmode
        out = ct.refine_leastsq(f, reader, **kw)
        rec = {"variant": name, "n_frames": n_frames}
        rec.update(score(out, truth, n_frames))
        rec["rejected"] = int(out["cost"].isna().sum())
        if pmode is not None:
            rec["fitted_size_med"] = round(float(out["size"].median()), 3)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
