#!/usr/bin/env python
"""The five BASELINE.md benchmark configurations as a runnable suite.

Each config prints one JSON line.  Run all (slow — every config pays an
axon/XLA compile of minutes) or pick one::

    python benchmarks/suite.py            # all five
    python benchmarks/suite.py 3          # config 3 only
    python benchmarks/suite.py 1 4

Configs (BASELINE.md / BASELINE.json):
  1. single 2-Gaussian dimer, unconstrained 2D — TPU batch vs serial scipy
  2. 2D video, 100 frames × ~100 features: locate+find+fit+link pipeline
  3. constrained dimer/trimer fixed-distance rigid-body LM
  4. 3D anisotropic z-stack clusters, size-bucketed batched fits
  5. dense video, 10k overlapping features/frame, full on-device pipeline

Timing rule (axon tunnel): never time repeated dispatch of identical
inputs — every rep gets its own perturbed input batch, reps are queued
back-to-back, and the clock stops after all outputs materialize.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402


def enable_compile_cache():
    """Persistent XLA compile cache: every distinct jitted config costs
    a 60-530 s axon compile; the cache makes re-runs and cross-script
    reuse (suite <-> experiments) pay it once per machine.

    Called from each benchmark's main(), NEVER at import: tests import
    helpers from this module (e.g. _video) on the CPU backend, and a
    shared cache dir mutated by a concurrent TPU benchmark process
    segfaulted a CPU test mid-read (measured: jax compilation_cache
    get_executable_and_time SIGSEGV while a TPU run was writing)."""
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)



def _emit(rec):
    print(json.dumps(rec), flush=True)


def _timed_reps(solver, args_list):
    """Queue all reps (distinct inputs), then FETCH the last rep's output
    inside the timed region.  block_until_ready alone is not trustworthy
    on the axon tunnel (measured returning before execution — a 32M
    solves/s mirage); the device stream is FIFO, so one device->host read
    of the final result fences every rep while amortizing the ~27 ms
    tunnel round-trip (the measured dispatch+fetch floor of a trivial
    op) across the reps."""
    import jax

    out = solver(*args_list[0])
    np.asarray(jax.tree_util.tree_leaves(out)[1])
    t0 = time.perf_counter()
    outs = [solver(*a) for a in args_list]
    np.asarray(jax.tree_util.tree_leaves(outs[-1])[1])
    return time.perf_counter() - t0, outs


def _perturbed(params0, reps, scale=0.05, seed=1):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    return [
        jnp.asarray(
            params0
            + rng.uniform(-scale, scale, params0.shape).astype(np.float32)
        )
        for _ in range(reps)
    ]


def config1(B=8192, reps=6):
    """Unconstrained 2D dimers: TPU batched rate vs serial scipy."""
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from clustertracking_tpu.hostref import fit_cluster_scipy
    from clustertracking_tpu.models.registry import get_model
    from clustertracking_tpu.refine import _bucket_solver

    window = (13, 13)
    solver, layout = _bucket_solver(
        get_model("gauss"), 2, True, 2, (), window, (4.5, 4.5), (),
        None, 1e5, 10, 1.0, 60, 1.49e-8, 1.49e-8, False,
    )
    frames, fidx, params0, pose0, valid = _example_batch(
        B=B, frame_size=256, grid_pitch=16
    )
    base = (jnp.asarray(frames), jnp.asarray(fidx), None,
            jnp.asarray(pose0), jnp.asarray(valid))
    args_list = [
        (base[0], base[1], p, base[3], base[4])
        for p in _perturbed(params0, reps)
    ]
    dt, outs = _timed_reps(solver, args_list)
    rms = np.asarray(outs[-1][1])
    assert np.isfinite(rms).all() and rms.mean() < 0.1

    n_base = 40
    t0 = time.perf_counter()
    for b in range(n_base):
        fit_cluster_scipy(
            frames[fidx[b]], params0[b].astype(float),
            layout.slot_idx, window, (4.5, 4.5), True, norm=150.0,
        )
    scipy_rate = n_base / (time.perf_counter() - t0)
    rate = B * reps / dt
    from benchmarks.roofline import bench_annotation
    _emit({
        "config": 1, "metric": "dimer_lm_solves_per_sec_per_chip",
        "value": round(rate, 1), "unit": "clusters/s",
        "scipy_baseline": round(scipy_rate, 1),
        "vs_baseline": round(rate / scipy_rate, 1),
        "roofline": bench_annotation(
            rate, n=2, D=2, V=6, window=window,
            iters=np.asarray(outs[-1][3]),
        ),
    })


def _video(n_frames, features_per_frame, shape, separation_px, seed=0):
    """Brownian cluster video: returns (reader, truth DataFrame)."""
    import pandas as pd

    from clustertracking_tpu.artificial import (
        CoordinateReader,
        gen_random_locations,
    )

    rng = np.random.default_rng(seed)
    n_clusters = features_per_frame // 2  # dimers
    centers = gen_random_locations(
        tuple(s - 24 for s in shape), n_clusters, margin=0, rng=rng
    ) + 12.0
    angles = rng.uniform(0, np.pi, n_clusters)
    rows = []
    for t in range(n_frames):
        centers = centers + rng.normal(0, 0.5, centers.shape)
        centers = np.clip(centers, 10, np.asarray(shape) - 10.0)
        angles = angles + rng.normal(0, 0.1, n_clusters)
        # separation 5 px at sigma 1.6: dimer peaks stay resolvable
        # (d/sigma ~ 3; at d/sigma <= 2 the two maxima merge into one blob
        # and candidate location can only seed one feature per dimer)
        offs = (separation_px / 2.0) * np.stack(
            [np.sin(angles), np.cos(angles)], axis=-1
        )
        for k in range(n_clusters):
            for sgn in (+1, -1):
                p = centers[k] + sgn * offs[k]
                rows.append({"frame": t, "y": p[0], "x": p[1],
                             "signal": 150.0})
    f = pd.DataFrame(rows)
    reader = CoordinateReader(f, shape, size=1.6, noise_level=2.0)

    # pre-render: CoordinateReader rasterizes on every access, which
    # would bill synthetic-data drawing to the pipeline (each frame is
    # read twice per track() run — locate + refine)
    class StackReader:
        def __init__(self, stack):
            self.stack = stack

        def __getitem__(self, t):
            return self.stack[t]

        def __len__(self):
            return len(self.stack)

    stack = np.stack([reader[t] for t in range(n_frames)])
    return StackReader(stack.astype(np.float32)), f


def config2(n_frames=100, reps=1):
    """2D video 100 frames x ~100 features: full pipeline rate."""
    import clustertracking_tpu as ct

    reader, truth = _video(n_frames, 100, (512, 512), 5.0)
    # memory=6: a dimer whose two peaks merge into one candidate (aligned
    # blobs) flickers out of locate for several frames — the ledger
    # attributes ~2% of feature-frames to this; memory bridges the gaps
    # (trackpy-standard practice for flickering features)
    # separation STRICTLY ABOVE the 5.0 px dimer bond (reference
    # practice): at separation == bond, boundary jitter splits half the
    # dimers across clusters and each split member's fit is biased
    # ~0.5 px by its partner's core just outside the mask (measured —
    # the round-2 config had exactly this flaw)
    kw = dict(diameter=9, separation=6, search_range=3.0, memory=6,
              link_backend="device")
    ct.track(reader, **kw)  # warm run: pays all jit compiles
    with ct.diagnostics.collect() as stats:
        t0 = time.perf_counter()
        out = ct.track(reader, **kw)
        dt = time.perf_counter() - t0
    n_traj = out["particle"].nunique()
    lengths = out.groupby("particle").size()
    # recovery variant: blended peaks that flicker out of locate for
    # > memory frames fragment trajectories; a recovery pass re-finds
    # them (the round-2 ledger attributed the excess trajectory count
    # to exactly this)
    t0 = time.perf_counter()
    out_r = ct.track(reader, recover_passes=1, **kw)
    dt_r = time.perf_counter() - t0
    # reduced-precision transfer variant: the ~2.2 s host→device frame
    # push is the dominant config-2 stage on this tunnel; float16
    # halves it with pixel quantization ~20x below the scene noise
    out_h = ct.track(reader, transfer_dtype="float16", **kw)
    t0 = time.perf_counter()
    out_h = ct.track(reader, transfer_dtype="float16", **kw)
    dt_h = time.perf_counter() - t0
    _emit({
        "config": 2, "metric": "pipeline_frames_per_sec_100feat",
        "value": round(n_frames / dt, 2), "unit": "frames/s",
        "frames_per_sec_f16_transfer": round(n_frames / dt_h, 2),
        "n_trajectories_f16_transfer": int(out_h["particle"].nunique()),
        "features_per_frame": int(len(out) / n_frames),
        "n_trajectories": int(n_traj),
        "n_trajectories_min10frames": int((lengths >= 10).sum()),
        "n_trajectories_recover1": int(out_r["particle"].nunique()),
        "frames_per_sec_recover1": round(n_frames / dt_r, 2),
        "fit_clusters_per_sec": round(
            stats.summary().get("clusters_per_sec", 0), 1
        ),
        "loss_ledger": stats.ledger,
    })


def config3(B=4096, reps=6):
    """Rigid fixed-distance dimers + trimers (constrained LM)."""
    import jax.numpy as jnp

    import clustertracking_tpu as ct
    from clustertracking_tpu.constraints import positions_to_pose
    from clustertracking_tpu.models.registry import get_model
    from clustertracking_tpu.refine import _bucket_solver
    from clustertracking_tpu.artificial import draw_cluster

    rng = np.random.default_rng(3)
    results = {}
    for n, name in ((2, "dimer"), (3, "trimer")):
        con = ct.dimer(5.0, 2) if n == 2 else ct.trimer(5.0, 2)
        window = (15, 15) if n == 2 else (17, 17)
        solver, layout = _bucket_solver(
            get_model("gauss"), 2, True, n, (), window, (4.5, 4.5), (),
            con, 1e5, 10, 1.0, 60, 1.49e-8, 1.49e-8, False,
        )
        P = layout.n_params
        pitch = 24
        per_axis = 256 // pitch
        per_frame = per_axis ** 2
        T = -(-B // per_frame)
        frames = np.zeros((T, 256, 256), np.float32)
        params0 = np.zeros((B, n, P), np.float32)
        fidx = np.zeros(B, np.int32)
        for b in range(B):
            t = b // per_frame
            cell = b % per_frame
            cy = (cell // per_axis) * pitch + pitch / 2
            cx = (cell % per_axis) * pitch + pitch / 2
            c = np.array([cy, cx]) + rng.uniform(-1, 1, 2)
            true = draw_cluster(
                frames[t], c, size=2.0, separation=5.0, n=n,
                signal=150.0, angle=rng.uniform(0, np.pi),
            )
            params0[b, :, 1] = 150.0
            params0[b, :, 2:4] = true + rng.uniform(-0.3, 0.3, true.shape)
            params0[b, :, 4] = 2.0
            fidx[b] = t
        pose0 = positions_to_pose(params0[:, :, 2:4], con).astype(
            np.float32
        )
        valid = np.ones(B, bool)
        base = (jnp.asarray(frames), jnp.asarray(fidx), None,
                jnp.asarray(pose0), jnp.asarray(valid))
        args_list = [
            (base[0], base[1], p, base[3], base[4])
            for p in _perturbed(params0, reps)
        ]
        dt, outs = _timed_reps(solver, args_list)
        rms = np.asarray(outs[-1][1])
        assert np.isfinite(rms).all() and rms.mean() < 0.1, rms.mean()
        results[name] = round(B * reps / dt, 1)
        from benchmarks.roofline import bench_annotation
        results[name + "_roofline"] = bench_annotation(
            B * reps / dt, n=n, D=2, V=layout.n_slots - 2 * n + 3,
            window=window, iters=np.asarray(outs[-1][3]),
            rigid=True, pose_slots=1,
        )
    _emit({
        "config": 3, "metric": "constrained_lm_solves_per_sec_per_chip",
        "value": results["dimer"], "unit": "clusters/s",
        "dimer": results["dimer"], "trimer": results["trimer"],
        "dimer_roofline": results["dimer_roofline"],
        "trimer_roofline": results["trimer_roofline"],
    })


def config3c(B=2048, reps=6):
    """3D rigid tetramers (rotation-vector pose in-kernel)."""
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
        con, 1e5, 10, 1.0, 60, 1.49e-8, 1.49e-8, False,
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
    assert np.isfinite(rms).all() and rms.mean() < 0.1, rms.mean()
    from benchmarks.roofline import bench_annotation
    centroid = params0[:, :, 2:5].mean(axis=1, keepdims=True)
    rel = params0[:, :, 2:5] - (
        centroid - (np.asarray(window, np.float32) - 1) / 2.0
    )
    _emit({
        "config": "3c",
        "metric": "tetramer3d_lm_solves_per_sec_per_chip",
        "value": round(B * reps / dt, 1), "unit": "clusters/s",
        "mean_lm_iters": round(float(iters.mean()), 1),
        "voxels_per_window": int(np.prod(window)),
        "roofline": bench_annotation(
            B * reps / dt, n=4, D=3, V=10, window=window, iters=iters,
            rigid=True, pose_slots=3, positions=rel,
            radius=(3.5, 3.5, 3.5),
        ),
    })


def config4(B=2048, reps=6):
    """3D anisotropic z-stack dimers, size-bucketed."""
    import jax.numpy as jnp

    from clustertracking_tpu.artificial import draw_cluster
    from clustertracking_tpu.models.registry import get_model
    from clustertracking_tpu.refine import _bucket_solver

    rng = np.random.default_rng(4)
    n = 2
    window = (9, 13, 13)
    # anisotropic: size_z, size_y, size_x fitted per feature
    solver, layout = _bucket_solver(
        get_model("gauss"), 3, False, n,
        (("size_x", "var"), ("size_y", "var"), ("size_z", "var")),
        window, (3.0, 4.5, 4.5), (),
        None, 1e5, 10, 1.0, 60, 1.49e-8, 1.49e-8, False,
    )
    P = layout.n_params
    pitch = (16, 24, 24)
    shape = (64, 192, 192)
    per = tuple(s // p for s, p in zip(shape, pitch))
    per_frame = int(np.prod(per))
    T = -(-B // per_frame)
    frames = np.zeros((T,) + shape, np.float32)
    params0 = np.zeros((B, n, P), np.float32)
    fidx = np.zeros(B, np.int32)
    sizes = (1.5, 2.2, 2.2)
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
            frames[t], c, size=sizes, separation=4.5, n=n, signal=150.0,
            angle=rng.uniform(0, np.pi),
        )
        params0[b, :, 1] = 150.0
        params0[b, :, 2:5] = true + rng.uniform(-0.25, 0.25, true.shape)
        params0[b, :, 5:8] = sizes
        fidx[b] = t
    pose0 = np.zeros((B, 0), np.float32)
    valid = np.ones(B, bool)
    base = (jnp.asarray(frames), jnp.asarray(fidx), None,
            jnp.asarray(pose0), jnp.asarray(valid))
    args_list = [
        (base[0], base[1], p, base[3], base[4])
        for p in _perturbed(params0, reps, scale=0.03)
    ]
    dt, outs = _timed_reps(solver, args_list)
    rms = np.asarray(outs[-1][1])
    assert np.isfinite(rms).all() and rms.mean() < 0.2, rms.mean()
    from benchmarks.roofline import bench_annotation
    centroid = params0[:, :, 2:5].mean(axis=1, keepdims=True)
    rel = params0[:, :, 2:5] - (
        centroid - (np.asarray(window, np.float32) - 1) / 2.0
    )
    _emit({
        "config": 4, "metric": "aniso3d_lm_solves_per_sec_per_chip",
        "value": round(B * reps / dt, 1), "unit": "clusters/s",
        "voxels_per_window": int(np.prod(window)),
        "roofline": bench_annotation(
            B * reps / dt, n=2, D=3, V=14, window=window,
            iters=np.asarray(outs[-1][3]), fit_size_slots=3,
            positions=rel, radius=(3.0, 4.5, 4.5),
        ),
    })


def config5(n_frames=4, features_per_frame=10000):
    """Dense colloid: 10k overlapping features/frame, full pipeline."""
    import clustertracking_tpu as ct

    reader, truth = _video(
        n_frames, features_per_frame, (1024, 1024), 5.0, seed=5
    )
    # link_backend 'auto' resolves to the DEVICE-BINNED linker at this
    # density (K≈8000/frame > 2048, link.py routing): the dense device
    # auction's [K, K·(memory+2)] cost matrix loses past K≈2000
    # (measured 5.6 s vs 0.6 s host for 4 frames) but the binned
    # candidate graph does not; the resolved backend and its wall ride
    # in the ledger (link_backend, link_s)
    # separation > bond length (see config2 note); chains grow at this
    # density, so the bucket cap rises to keep clusters off the serial
    # scipy spill path.  24 covers every chain this video produces
    # (measured max 20): the size ladder buckets 17-24 as one padded
    # device bucket, where a size-20 chain fits in ~0.004 s vs ~5-180 s
    # on the scipy spill path
    kw = dict(diameter=9, separation=6, search_range=3.0, memory=2,
              link_backend="auto", max_features=16384,
              max_cluster_size=40)
    ct.track(reader, **kw)  # warm run: pays all jit compiles
    with ct.diagnostics.collect() as stats:
        t0 = time.perf_counter()
        out = ct.track(reader, **kw)
        dt = time.perf_counter() - t0
    s = stats.summary()
    _emit({
        "config": 5, "metric": "dense_pipeline_frames_per_sec_10kfeat",
        "value": round(n_frames / dt, 3), "unit": "frames/s",
        "features_tracked_per_frame": int(len(out) / n_frames),
        "fit_clusters_per_sec": round(s.get("clusters_per_sec", 0), 1),
        "n_trajectories": int(out["particle"].nunique()),
        "loss_ledger": stats.ledger,
        "by_backend": {
            k: {kk: round(vv, 1) for kk, vv in v.items()}
            for k, v in stats.summary_by_backend().items()
        },
    })


CONFIGS = {
    "1": config1, "2": config2, "3": config3, "3c": config3c,
    "4": config4, "5": config5,
}


def main():
    enable_compile_cache()
    picks = sys.argv[1:] or sorted(CONFIGS)
    for k in picks:
        CONFIGS[str(k)]()


if __name__ == "__main__":
    main()
