#!/usr/bin/env python
"""Hardware compile probe for large-slot kernel buckets.

The dense recovery pass produces n=16 unconstrained chains with
bbox-shrunk windows around 3.2k pixels (Vk=48 slots).  Mosaic's
scoped-vmem demand for that shape exceeds the estimate model in
ops/pallas_lm.py badly (est 11.4M -> measured 18.84M/16M OOM), so this
probe measures which variant actually compiles and at what rate:

    python benchmarks/probe_vmem.py resident        # expect OOM
    python benchmarks/probe_vmem.py stream          # HBM-streaming
    python benchmarks/probe_vmem.py chunk96         # resident, CL=96
    python benchmarks/probe_vmem.py chunk64

Prints one JSON line per variant.
"""
import json
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from clustertracking_tpu.models.packing import build_layout  # noqa: E402
from clustertracking_tpu.models.registry import get_model  # noqa: E402
from clustertracking_tpu.ops.pallas_lm import make_pallas_lm  # noqa: E402

WINDOW = (40, 80)
N = 16
B = 256


def build(variant):
    global N, WINDOW
    if "@" in variant:
        variant, n_s = variant.split("@")
        N = int(n_s)
        WINDOW = (40, 8 + 5 * N)  # same per-feature pixel budget
    model = get_model("gauss")
    layout = build_layout(model, 2, True, N, {})
    V = layout.n_slots
    lo = np.full(V, -np.inf, np.float32)
    hi = np.full(V, np.inf, np.float32)
    kw = {}
    if variant == "stream":
        kw["streaming"] = True
    elif variant.startswith("chunk"):
        kw["chunk_len"] = int(variant[5:])
        kw["streaming"] = False
    if variant == "xla":
        # the ops/lm.py lockstep solver on the identical problem — its
        # J^T J is an MXU matmul, which can beat the kernel's VPU
        # row-reduction once Vk^2 is large (Vk=48 -> 1176 H pairs)
        from clustertracking_tpu.ops.lm import lm_solve
        from clustertracking_tpu.ops.residual import make_model_fns

        fns = make_model_fns(model, layout, WINDOW)

        @jax.jit
        def solve(vect0, params0, pixels, pos0, origin, norm, valid):
            from clustertracking_tpu.ops.gather import radius_mask
            mask = radius_mask(pos0, origin, WINDOW, (4.5, 4.5))
            args = (params0, pixels, mask, origin, norm)
            return lm_solve(
                fns.residual, fns.residual_jac, vect0, args,
                max_iter=20, lower=jnp.asarray(lo),
                upper=jnp.asarray(hi), valid=valid,
            )
    else:
        solve = make_pallas_lm(
            model, layout, WINDOW, lo, hi, (4.5, 4.5), max_iter=20,
            interpret=False, fused_gather=False, **kw,
        )
    rng = np.random.default_rng(0)
    Npix = int(np.prod(WINDOW))
    # chain of N gaussians along the long axis inside the window
    ys = 20.0 + rng.uniform(-2, 2, (B, N))
    xs = 8.0 + 4.2 * np.arange(N)[None, :] + rng.uniform(-1, 1, (B, N))
    yy, xx = np.mgrid[: WINDOW[0], : WINDOW[1]].astype(np.float32)
    img = np.zeros((B,) + WINDOW, np.float32)
    for i in range(N):
        r2 = ((yy[None] - ys[:, i, None, None]) ** 2
              + (xx[None] - xs[:, i, None, None]) ** 2) / 1.8**2
        img += 100.0 * np.exp(-r2)
    pixels = img.reshape(B, Npix)
    P = layout.n_params
    params0 = np.zeros((B, N, P), np.float32)
    params0[..., 1] = 100.0
    params0[..., 2] = ys + rng.uniform(-0.2, 0.2, ys.shape)
    params0[..., 3] = xs + rng.uniform(-0.2, 0.2, xs.shape)
    params0[..., 4] = 1.8
    pos0 = params0[..., 2:4]
    origin = np.zeros((B, 2), np.int32)
    norm = np.full(B, 100.0, np.float32)
    valid = np.ones(B, bool)
    vect0 = layout.vect_from_params(jnp.asarray(params0))
    args = (vect0, jnp.asarray(params0), jnp.asarray(pixels),
            jnp.asarray(pos0), jnp.asarray(origin), jnp.asarray(norm),
            jnp.asarray(valid))
    return solve, args


def main():
    from benchmarks.suite import enable_compile_cache
    enable_compile_cache()
    variants = sys.argv[1:] or ["stream"]
    for v in variants:
        solve, args = build(v)
        t0 = time.perf_counter()
        try:
            res = jax.block_until_ready(solve(*args))
            compile_s = time.perf_counter() - t0
            # timed reps: perturb vect0 per rep, fence with a fetch
            reps = 5
            outs = []
            t0 = time.perf_counter()
            for r in range(reps):
                vr = args[0] + 1e-4 * (r + 1)
                outs.append(solve(vr, *args[1:]))
            _ = np.asarray(outs[-1].x)
            dt = time.perf_counter() - t0
            cost = float(np.asarray(res.cost).mean())
            print(json.dumps({
                "variant": v, "ok": True,
                "compile_s": round(compile_s, 1),
                "solves_per_sec": round(reps * B / dt, 1),
                "mean_cost": round(cost, 3),
                "mean_iters": round(
                    float(np.asarray(res.n_iter).mean()), 1),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            key = msg[msg.find("Scoped allocation"):][:90] if \
                "Scoped allocation" in msg else msg[:160]
            print(json.dumps({
                "variant": v, "ok": False, "err": key}), flush=True)
            traceback.print_exc(file=sys.stderr)


if __name__ == "__main__":
    main()
