#!/usr/bin/env python
"""End-to-end walkthrough: track diffusing dimers and measure D_trans/D_rot.

Mirrors the reference workflow (SURVEY.md §3.4):

    locate candidates → find_clusters → refine_leastsq (constrained)
    → link → motion.diffusion_constants

but runs the whole video through ``ct.track`` with the on-device locate /
fit / link path.  Ground truth comes from the synthetic CoordinateReader
(the same oracle the test suite uses), so the script checks itself.

Run:  python examples/track_dimers.py  [n_frames]
"""
import sys

import numpy as np
import pandas as pd

import clustertracking_tpu as ct


def make_video(n_frames=60, n_dimers=20, shape=(256, 256),
               D_trans=0.05, D_rot=0.02, separation=5.0, seed=0):
    """Rigid Brownian dimers rendered on demand (no real microscope)."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(30, shape[0] - 30, (n_dimers, 2))
    angles = rng.uniform(0, np.pi, n_dimers)
    rows = []
    for t in range(n_frames):
        u = np.stack([np.sin(angles), np.cos(angles)], axis=-1)
        for k in range(n_dimers):
            for s in (+1, -1):
                p = centers[k] + s * (separation / 2) * u[k]
                rows.append({"frame": t, "y": p[0], "x": p[1],
                             "signal": 150.0})
        centers += rng.normal(0, np.sqrt(2 * D_trans), centers.shape)
        centers = np.clip(centers, 20, shape[0] - 20)
        angles += rng.normal(0, np.sqrt(2 * D_rot), n_dimers)
    truth = pd.DataFrame(rows)
    reader = ct.artificial.CoordinateReader(
        truth, shape, size=1.6, noise_level=2.0
    )
    return reader, truth


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    reader, truth = make_video(n_frames)

    # one call: locate → find → constrained refine → link, with per-batch
    # fit statistics collected
    with ct.diagnostics.collect() as stats:
        linked = ct.track(
            reader,
            diameter=7,
            separation=5.5,
            search_range=3.0,
            constraints=ct.dimer(5.0, ndim=2),  # rigid bond length
            link_backend="device",
        )
    s = stats.summary()
    print(f"tracked {len(linked)} features over {n_frames} frames "
          f"({linked['particle'].nunique()} trajectories); "
          f"fit rate {s['clusters_per_sec']:.0f} clusters/s, "
          f"{s['n_rejected']} rejected")

    # bond length is conserved EXACTLY by the rigid-pose fit
    dimers = linked[linked["cluster_size"] == 2]
    bonds = []
    for (_, _), g in dimers.groupby(["frame", "cluster"]):
        if len(g) == 2:
            bonds.append(np.hypot(
                g["y"].iloc[0] - g["y"].iloc[1],
                g["x"].iloc[0] - g["x"].iloc[1],
            ))
    print(f"bond length: {np.mean(bonds):.6f} ± {np.std(bonds):.2e} "
          "(constraint = 5.0)")

    # cluster kinematics: translational + rotational diffusion
    est = ct.motion.diffusion_constants(linked, max_lagtime=4)
    print(f"D_trans = {est['D_trans']:.4f} ± {est['D_trans_std']:.4f}"
          "  (truth 0.05)")
    print(f"D_rot   = {est['D_rot']:.4f} ± {est['D_rot_std']:.4f}"
          "  (truth 0.02)")


if __name__ == "__main__":
    main()
