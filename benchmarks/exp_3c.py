#!/usr/bin/env python
"""3c iteration-count experiment: noise level vs LM iterations vs rate."""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402


from benchmarks.suite import _perturbed, _timed_reps  # noqa: E402


def run(noise=0.0, B=2048, reps=6, ftol=1.49e-8):
    import jax.numpy as jnp

    import clustertracking_tpu as ct
    from clustertracking_tpu.artificial import draw_cluster
    from clustertracking_tpu.constraints import positions_to_pose
    from clustertracking_tpu.models.registry import get_model
    from clustertracking_tpu.refine import _bucket_solver

    rng = np.random.default_rng(11)
    con = ct.tetramer(3.2)
    window = (16, 16, 16)
    solver, layout = _bucket_solver(
        get_model("gauss"), 3, True, 4, (), window, (3.5, 3.5, 3.5), (),
        con, 1e5, 10, 1.0, 60, ftol, 1.49e-8, False,
    )
    P = layout.n_params
    pitch = (16, 24, 24)
    shape = (64, 192, 192)
    per = tuple(s // p for s, p in zip(shape, pitch))
    per_frame = int(np.prod(per))
    T = -(-B // per_frame)
    frames = np.zeros((T,) + shape, np.float32)
    params0 = np.zeros((B, 4, P), np.float32)
    fidx = np.zeros(B, np.int32)
    for b in range(B):
        t = b // per_frame
        cell = b % per_frame
        iz = cell // (per[1] * per[2])
        iy = (cell // per[2]) % per[1]
        ix = cell % per[2]
        c = (np.array([iz * pitch[0] + 8, iy * pitch[1] + 12,
                       ix * pitch[2] + 12], float)
             + rng.uniform(-1, 1, 3))
        true = draw_cluster(
            frames[t], c, size=1.5, separation=3.2, n=4, signal=150.0,
            angle=rng.uniform(0, np.pi),
        )
        params0[b, :, 1] = 150.0
        params0[b, :, 2:5] = true + rng.uniform(-0.2, 0.2, true.shape)
        params0[b, :, 5] = 1.5
        fidx[b] = t
    if noise > 0:
        frames = frames + rng.normal(0, noise, frames.shape).astype(
            np.float32
        )
    pose0 = positions_to_pose(params0[:, :, 2:5], con).astype(np.float32)
    valid = np.ones(B, bool)
    base = (jnp.asarray(frames), jnp.asarray(fidx), None,
            jnp.asarray(pose0), jnp.asarray(valid))
    args_list = [
        (base[0], base[1], p, base[3], base[4])
        for p in _perturbed(params0, reps)
    ]
    dt, outs = _timed_reps(solver, args_list)
    rms = np.asarray(outs[-1][1])
    iters = np.asarray(outs[-1][3])
    print(json.dumps({
        "noise": noise, "ftol": ftol,
        "rate": round(B * reps / dt, 1),
        "mean_rms": round(float(rms.mean()), 5),
        "iters_mean": round(float(iters.mean()), 1),
        "iters_p50": int(np.percentile(iters, 50)),
        "iters_p90": int(np.percentile(iters, 90)),
        "iters_max": int(iters.max()),
    }), flush=True)


if __name__ == "__main__":
    from benchmarks.suite import enable_compile_cache
    enable_compile_cache()
    for noise in [float(a) for a in (sys.argv[1:] or ["0", "2"])]:
        run(noise=noise)
