#!/usr/bin/env python
"""Dense-coverage CEILING measurement (VERDICT r3 item 2).

Config 5 with candidate location replaced by TRUTH seeding: refine
warm-starts at the generator's exact positions/sizes/signals, at the
same noise and density.  The resulting coverage is the FIT-STAGE
ceiling — every truth feature the fit stage can hold at this noise
given perfect detection.  The gap between the pipeline's achieved
coverage (89.77% in round 3) and this number is detection loss; the gap
between this number and 100% is fit loss (rejections, divergences,
pair-merge drift).

Variants:
  truth        — exact truth warm start
  truth_jit    — truth ± uniform(0.5 px) warm start (realistic locate
                 quality, still perfect detection)

Usage: python benchmarks/oracle_exp.py [n_frames]
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

    rng = np.random.default_rng(99)
    for variant, jitter in (("truth", 0.0), ("truth_jit", 0.5)):
        f = truth.copy()
        if jitter:
            f[["y", "x"]] = f[["y", "x"]].to_numpy() + rng.uniform(
                -jitter, jitter, (len(f), 2)
            )
        f["size"] = 1.6
        f = ct.find_clusters(f, separation=6)
        out = ct.refine_leastsq(
            f, reader, diameter=9, separation=6,
            max_cluster_size=24,
        )
        rec = {"variant": variant, "n_frames": n_frames}
        rec.update(score(out, truth, n_frames))
        rec["rejected"] = int(out["cost"].isna().sum())
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
