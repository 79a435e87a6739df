#!/usr/bin/env python
"""Headline benchmark: batched cluster LM solve rate vs serial scipy.

Config 1 of BASELINE.md scaled up: 2-Gaussian dimer clusters, unconstrained
2D fits.  The TPU path runs the full bucketed solver (window gather → mask →
pack → lockstep LM → refit-on-shift) on a large lane batch; the baseline is
the reference-equivalent serial scipy.optimize.leastsq loop (hostref.py)
measured on this machine (the reference publishes no numbers — BASELINE.md).

Drift-robust measurement (VERDICT r3 item 5): BENCH_r03 moved −17% vs r02
on the same command because the value was ONE timed region at B=16384,
sensitive to transient tunnel/host state.  The printed value is now the
MEDIAN over ``BLOCKS`` independently timed blocks (each fenced by a
device→host fetch of its own last output), after a full untimed warmup
block; the block-rate dispersion rides along in the JSON so a drifting
environment is visible in the number itself instead of silently moving it.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "blocks": [...], "dispersion": max/min - 1, "B": ..., "reps": ...}
"""
import json
import sys
import time

import numpy as np

BLOCKS = 5
# Solves per timed block.  Each block ends with one device->host fetch
# (~27 ms tunnel RTT, the fencing cost); REPS must be large enough that
# the fetch is noise, not signal: at ~2.7M solves/s a 64-rep block is
# ~390 ms of compute, so the fetch is <7% and the block rate sits within
# a few % of the asymptotic rate (REPS=8 measured 1.59M — 40% fetch
# overhead — vs 24-rep single-region 2.7M).
REPS = 64


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
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
    #   every timed block ends with a device->host fetch of ITS last
    #   rep's output — the device stream is FIFO, so that fences the
    #   block's reps;
    # - one fetch per block (not per rep) so the ~27 ms tunnel round-trip
    #   amortizes over REPS solves.
    # The perturbed batches are generated ON DEVICE (block_until_ready
    # does not reliably fence host->device staging on axon — measured:
    # a 196 MB host-staged p_reps list overlapped the first ~4.4 s of
    # timed blocks, ramping block rates 0.48M -> 2.5M); the trailing
    # fetch below is the real staging fence.
    perturb = jax.jit(
        lambda k: args[2] + jax.random.uniform(
            k, params0.shape, jnp.float32, -0.05, 0.05
        )
    )
    keys = jax.random.split(jax.random.PRNGKey(1), (BLOCKS + 1) * REPS)
    p_reps = [perturb(k) for k in keys]
    np.asarray(p_reps[-1])  # fence: all staging/perturb work done

    def run_block(b):
        t0 = time.perf_counter()
        outs = [
            solver(args[0], args[1], p, args[3], args[4])
            for p in p_reps[b * REPS:(b + 1) * REPS]
        ]
        last = np.asarray(outs[-1][1])
        dt = time.perf_counter() - t0
        return B * REPS / dt, outs

    run_block(0)  # untimed warmup block on the varied-input path
    rates = []
    all_outs = []
    for b in range(1, BLOCKS + 1):
        r, outs = run_block(b)
        rates.append(r)
        all_outs = outs  # keep last block for the sanity sweep
    for o in all_outs:
        r = np.asarray(o[1])
        assert np.isfinite(r).all() and r.mean() < 0.1
    tpu_rate = float(np.median(rates))
    dispersion = float(max(rates) / min(rates) - 1.0)

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
                "blocks": [round(r, 1) for r in rates],
                "dispersion": round(dispersion, 4),
                "B": B,
                "reps": REPS,
            }
        )
    )


if __name__ == "__main__":
    main()
