#!/usr/bin/env python
"""Headline benchmark: batched cluster LM solve rate vs serial scipy.

Config 1 of BASELINE.md scaled up: 2-Gaussian dimer clusters, unconstrained
2D fits.  The TPU path runs the full bucketed solver (window gather → mask →
pack → lockstep LM → refit-on-shift) on a large lane batch; the baseline is
the reference-equivalent serial scipy.optimize.leastsq loop (hostref.py)
measured on this machine (the reference publishes no numbers — BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from clustertracking_tpu.models.registry import get_model
    from clustertracking_tpu.refine import _bucket_solver

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    window = (13, 13)
    solver, layout = _bucket_solver(
        get_model("gauss"), 2, True, 2, (), window, (4.5, 4.5), (),
        None, 1e5, 10, 1.0, 60, 1.49e-8, 1.49e-8, False,
    )
    frames, fidx, params0, pose0, valid = _example_batch(
        B=B, frame_size=256, grid_pitch=16
    )
    args = tuple(
        jnp.asarray(a) for a in (frames, fidx, params0, pose0, valid)
    )

    # warmup / compile
    out = solver(*args)
    jax.block_until_ready(out)
    # sanity: the benchmark must be solving real problems
    rms = np.asarray(out[1])
    assert np.isfinite(rms).all() and rms.mean() < 0.1, (
        f"benchmark fits are bad: mean rms {rms.mean()}"
    )

    # Honest timing on the axon tunnel:
    # - repeated dispatch of IDENTICAL inputs can be short-circuited by
    #   the runtime, so every rep gets its own perturbed initial-guess
    #   batch (pre-staged on device);
    # - block_until_ready can return BEFORE execution here (measured), so
    #   the timed region ends with a device->host fetch of the LAST rep's
    #   output — the device stream is FIFO, so that fences every rep;
    # - one fetch (not per-rep) so the ~27 ms tunnel round-trip (measured
    #   dispatch+fetch floor for a trivial op) amortizes over the reps.
    reps = 24
    rng = np.random.default_rng(1)
    p_reps = [
        args[2] + jnp.asarray(
            rng.uniform(-0.05, 0.05, params0.shape).astype(np.float32)
        )
        for _ in range(reps)
    ]
    jax.block_until_ready(p_reps)
    out = solver(args[0], args[1], p_reps[0], args[3], args[4])
    np.asarray(out[1])  # extra warmup on the varied-input path
    t0 = time.perf_counter()
    outs = [
        solver(args[0], args[1], p, args[3], args[4]) for p in p_reps
    ]
    last = np.asarray(outs[-1][1])
    dt = time.perf_counter() - t0
    tpu_rate = B * reps / dt
    for o in outs:
        r = np.asarray(o[1])
        assert np.isfinite(r).all() and r.mean() < 0.1

    # serial scipy baseline (reference-equivalent path) on a sample
    from clustertracking_tpu.hostref import fit_cluster_scipy

    n_base = 40
    t0 = time.perf_counter()
    for b in range(n_base):
        fit_cluster_scipy(
            frames[fidx[b]], params0[b].astype(float),
            layout.slot_idx, window, (4.5, 4.5), True, norm=150.0,
        )
    dt_base = time.perf_counter() - t0
    scipy_rate = n_base / dt_base

    print(
        json.dumps(
            {
                "metric": "cluster_lm_solves_per_sec_per_chip",
                "value": round(tpu_rate, 1),
                "unit": "clusters/s",
                "vs_baseline": round(tpu_rate / scipy_rate, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
