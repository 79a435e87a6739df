#!/usr/bin/env python
"""Roofline attribution for the benchmark table (VERDICT r3 item 7).

Two halves:

1. **Empirical peaks** (``python benchmarks/roofline.py``) — measured on
   THIS chip through the same axon tunnel the benchmarks use, not
   datasheet numbers, so the ratios below are achieved-vs-achievable on
   the machine that produced them:

   - ``vpu_f32_tops``: sustained elementwise fused multiply-add
     throughput on a VMEM-resident working set (the Pallas LM kernel is
     pure VPU elementwise code over [CL, TB] registers).
   - ``mxu_f32_highest_tflops``: sustained matmul at
     ``Precision.HIGHEST`` — what the XLA ladder solver's JᵀJ einsums
     request (ops/lm.py) and therefore the roof the ladder path is
     judged against; ``mxu_f32_default_tflops`` / ``mxu_bf16_tflops``
     record the chip's bf16-pass headline for context.
   - ``hbm_gbps``: sustained HBM-bound elementwise bandwidth (the
     streaming kernel path and the locate stage are HBM-bound).

   Results are cached to ``/tmp/roofline_peaks.json`` so suite runs can
   annotate their rows without re-measuring.

2. **Work model** — analytic op counts per LM solve for each kernel
   class, built from the kernel's own structure (ops/pallas_lm.py):
   one fused accumulate sweep per LM iteration plus the initial sweep;
   per pixel per sweep the kernel evaluates the model, the V Jacobian
   rows, and the (1 + V + V(V+1)/2)-row packed accumulator at 2 flops
   per row per pixel (multiply + reduce-add, _chunk_rows).  Masked-out
   pixels inside a live chunk still execute every op (wc = 0 zeroes the
   contribution, not the work), so the model counts EXECUTED ops — the
   ratio to the VPU peak measures kernel efficiency against silicon.
   Dead chunks (3D: whole z-slabs outside the union-of-spheres mask)
   are skipped by the kernel and are therefore costed at 0, using the
   chunk-live fraction the caller measures from its own gather masks.

   Transcendentals are costed in VPU op-equivalents (an exp/sin/cos
   lowers to a polynomial/range-reduction sequence on the VPU;
   reciprocal/rsqrt to a seed + Newton steps): EXP_OPS/TRIG_OPS/DIV_OPS
   below.  These are ±~30% estimates — the model's job is attribution
   (which silicon bounds each config, and is the gap 1.2× or 20×), not
   3-digit utilization numbers.

Reference: the upstream analog (clustertracking/refine.py's serial
scipy loop) has no roofline story at all; this module exists for
SURVEY.md §5's "clusters/sec/chip ... must be first-class" requirement.
"""
import json
import os
import sys
import time

import numpy as np

# Committed into the repo (VERDICT r4 item 2) so suite rows can be
# annotated — and audited — without re-measuring on hardware.  A stale
# /tmp cache from earlier rounds is honored as a fallback only.
PEAKS_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "roofline_peaks.json")
_PEAKS_CACHE_TMP = "/tmp/roofline_peaks.json"

# VPU op-equivalents for non-arithmetic primitives (see module
# docstring).  exp: range reduction + degree-~6 polynomial + scale
# ≈ 10 fused ops; sin/cos similar; divide: reciprocal seed + 2 Newton
# steps + multiply ≈ 4; sqrt via rsqrt the same.
EXP_OPS = 10.0
TRIG_OPS = 10.0
DIV_OPS = 4.0
SQRT_OPS = 4.0


# ---------------------------------------------------------------------------
# Work model
# ---------------------------------------------------------------------------

def kernel_pixel_ops(n, D, V, iso, rigid, pose_slots, fit_dist,
                     fit_size_slots=0, n_extra=0):
    """VPU op-equivalents PER EXECUTED PIXEL of one with-Jacobian
    accumulate sweep of the Pallas LM kernel (ops/pallas_lm.py
    chunk_eval + _chunk_rows).

    n: features per cluster; D: spatial dims; V: kernel slots; iso:
    isotropic sizes; rigid: pose-parameterized constraint; pose_slots:
    non-center pose slots (2D n-gon: 1, 3D dimer: 2, 3D rot-vec: 3);
    fit_dist: the pose carries a fitted distance slot; fit_size_slots:
    fitted size slots per feature (0, 1 iso, D aniso); n_extra: model
    extra params (ring thickness etc.).
    """
    per_feat = 0.0
    per_feat += D * (1 + DIV_OPS)        # dx = (off - rel) / s_d
    per_feat += 2 * D - 1                # r2 accumulation
    per_feat += EXP_OPS                  # f = exp(...)  (gauss)
    per_feat += 2                        # img += sig * f
    per_feat += 2                        # sig_df = sig * dfun_f(f)
    per_feat += 3                        # signal Jacobian row
    if rigid:
        per_feat += D * (3 + DIV_OPS)    # g_d = sig_df*(-2)*dx/s*wc
        per_feat += D                    # center rows: add g_d
        per_feat += pose_slots * (2 * D + 1)  # pose chain-rule dots
        if fit_dist:
            per_feat += 2 * D + 1
    else:
        per_feat += D * (4 + DIV_OPS)    # position rows
    if fit_size_slots:
        per_feat += fit_size_slots * (4 + DIV_OPS)
    per_feat += n_extra * 4
    shared = 1.0 + 2.0                   # bg row; r = (img - pix) * wc
    nacc = 1 + V + V * (V + 1) // 2
    acc = 2.0 * nacc                     # multiply + reduce-add per row
    return n * per_feat + shared + acc


def kernel_lane_ops(V, D, n, rigid, sweeps):
    """Per-lane (not per-pixel) op-equivalents per solve: sweep_consts
    (pose trig / Rodrigues algebra) per sweep + the unrolled Cholesky
    damped_solve per LM iteration (ops/pallas_lm.py damped_solve:
    V³/3 MACs for the factorization + 2·V² substitutions + V sqrt/div).
    """
    chol = (V ** 3) / 3.0 * 2 + 2 * V * V * 2 + V * (SQRT_OPS + DIV_OPS)
    if not rigid:
        consts = n * D * 2.0
    elif D == 2:
        consts = n * (2 * TRIG_OPS + 6)
    elif n == 2:
        consts = 4 * TRIG_OPS + 20
    else:
        consts = 2 * TRIG_OPS + SQRT_OPS + 700.0  # Rodrigues + J_r block
    return sweeps * consts + max(sweeps - 1, 0) * chol


def kernel_pixel_ops_residual(n, D, n_extra=0):
    """Per-pixel op-equivalents of the RESIDUAL-ONLY initial sweep
    (``_chunk_rows`` with ``with_jac=False``): model evaluation plus the
    2-row (cost, weight) accumulator — no Jacobian rows, no Hessian
    triangle.  Charging this sweep at the full with-Jacobian cost
    overstates modeled work by ~(Jacobian share)/sweeps, which matters
    for fast-converging configs (ADVICE r4)."""
    per_feat = D * (1 + DIV_OPS)         # dx = (off - rel) / s_d
    per_feat += 2 * D - 1                # r2 accumulation
    per_feat += EXP_OPS                  # f = exp(...)  (gauss)
    per_feat += 2                        # img += sig * f
    per_feat += n_extra * 2
    shared = 1.0 + 2.0                   # bg row; r = (img - pix) * wc
    acc = 2.0 * 2                        # 2 accumulator rows
    return n * per_feat + shared + acc


def kernel_flops_per_solve(n, D, V, npix, sweeps, iso=True, rigid=False,
                           pose_slots=0, fit_dist=False,
                           fit_size_slots=0, n_extra=0,
                           chunk_live_frac=1.0):
    """Total executed VPU op-equivalents for one cluster LM solve.

    ``sweeps`` counts per-tile executed sweeps INCLUDING the initial
    residual-only sweep; the remaining ``sweeps - 1`` carry the full
    Jacobian + Hessian-triangle accumulator."""
    px = kernel_pixel_ops(n, D, V, iso, rigid, pose_slots, fit_dist,
                          fit_size_slots, n_extra)
    px_res = kernel_pixel_ops_residual(n, D, n_extra)
    wj_sweeps = max(sweeps - 1.0, 0.0)
    lane = kernel_lane_ops(V, D, n, rigid, sweeps)
    per_pix = wj_sweeps * px + min(sweeps, 1.0) * px_res
    return npix * chunk_live_frac * per_pix + lane


def xla_ladder_flops_per_solve(n, D, V, npix, sweeps):
    """MXU-path model for the XLA ladder solver (ops/lm.py above the
    unroll ceiling): per sweep, J build (~15 VPU ops/pixel/feature,
    counted as flops here), JᵀJ = [V, Npix]·[Npix, V] (2·Npix·V² MXU
    flops) and Jᵀr (2·Npix·V), plus a batched Cholesky (V³/3)."""
    jac_build = 15.0 * n * npix
    jtj = 2.0 * npix * V * V
    jtr = 2.0 * npix * V
    chol = (V ** 3) / 3.0 * 2
    return sweeps * (jac_build + jtj + jtr + chol)


def chunk_live_fraction(masks, chunk):
    """Fraction of pixel chunks the kernel executes: a chunk runs if ANY
    lane of the tile has a live pixel in it.  ``masks``: [B, Npix] bool
    (the bench's own gather masks, padded exactly like the kernel's);
    tiles are 128-lane groups (the kernel's TB), chunks ``chunk`` pixels.
    """
    masks = np.asarray(masks, bool)
    B, npix = masks.shape
    n_chunks = -(-npix // chunk)
    pad = n_chunks * chunk - npix
    if pad:
        masks = np.pad(masks, ((0, 0), (0, pad)))
    tiles = -(-B // 128)
    live = 0
    total = 0
    for t in range(tiles):
        m = masks[t * 128:(t + 1) * 128]
        per_chunk = m.reshape(m.shape[0], n_chunks, chunk).any(
            axis=(0, 2)
        )
        live += int(per_chunk.sum())
        total += n_chunks
    return live / total if total else 1.0


def annotate(rate, flops_per_solve, peaks, bound="vpu",
             bytes_per_solve=None):
    """Roofline row: achieved op rate and % of the measured peak.

    For ``bound='hbm'`` the peak is in bytes/s, so the caller MUST pass
    ``bytes_per_solve`` (bytes moved per solve) — dividing a flops
    quantity by a bandwidth peak would be dimensionless nonsense
    (ADVICE r4)."""
    key = {"vpu": "vpu_f32_tops", "mxu": "mxu_f32_highest_tflops",
           "hbm": "hbm_gbps"}[bound]
    peak = peaks.get(key)
    out = {
        "model_flops_per_solve": round(flops_per_solve),
        "achieved_tops": round(rate * flops_per_solve / 1e12, 3),
        "bound": bound,
    }
    if bound == "hbm":
        if bytes_per_solve is None:
            raise ValueError(
                "bound='hbm' requires bytes_per_solve (bytes moved per "
                "solve); flops cannot be scored against a bytes/s peak")
        achieved = rate * bytes_per_solve
        out["model_bytes_per_solve"] = round(bytes_per_solve)
        out["achieved_gbps"] = round(achieved / 1e9, 1)
        if peak:
            out["pct_of_peak"] = round(100.0 * achieved / (peak * 1e9), 1)
        return out
    achieved = rate * flops_per_solve
    if peak:
        out["pct_of_peak"] = round(100.0 * achieved / (peak * 1e12), 1)
    return out


def union_masks_center_out(positions, window, radius):
    """[B, Npix] union-of-ellipsoids masks in the kernel's center-out
    voxel order (3D) or row-major order (2D), matching ops/pallas_lm's
    ``_perm``.  ``positions``: [B, n, D] feature positions relative to
    the window origin (window centered on the cluster centroid, the
    gather's un-clamped case); ``radius``: per-dim mask radii.
    """
    positions = np.asarray(positions, np.float32)
    B, n, D = positions.shape
    grids = np.meshgrid(*[np.arange(w) for w in window], indexing="ij")
    pix = np.stack([g.ravel() for g in grids], -1).astype(np.float32)
    if D == 3:
        ctr = np.array([(w - 1) / 2.0 for w in window], np.float32)
        d2c = ((pix - ctr) ** 2).sum(-1)
        perm = np.argsort(d2c, kind="stable")
        pix = pix[perm]
    r = np.asarray(radius, np.float32)
    masks = np.zeros((B, pix.shape[0]), bool)
    for i in range(n):
        d2 = (((pix[None] - positions[:, i][:, None]) / r) ** 2).sum(-1)
        masks |= d2 <= 1.0
    return masks


def bench_annotation(rate, n, D, V, window, iters, *, rigid=False,
                     pose_slots=0, fit_dist=False, fit_size_slots=0,
                     n_extra=0, positions=None, radius=None):
    """One suite row's roofline subdict (VERDICT r3 item 7).

    ``iters``: per-lane LM iteration counts from the solver output.  The
    kernel is lockstep per 128-lane tile — frozen lanes still execute
    every op until their tile's last lane converges — so EXECUTED sweeps
    per solve is the per-tile max (+1 for the initial residual sweep),
    averaged over tiles.  ``positions`` (relative to the window origin)
    + ``radius`` enable the 3D dead-chunk discount via the kernel's own
    chunk size; omit for 2D (single live chunk).
    """
    from clustertracking_tpu.ops.pallas_lm import (_pick_chunk,
                                                   _pick_chunk_stream)

    iters = np.asarray(iters, np.float32)
    pad = (-len(iters)) % 128
    if pad:
        iters = np.concatenate([iters, np.zeros(pad, np.float32)])
    sweeps = float(iters.reshape(-1, 128).max(axis=1).mean()) + 1.0
    npix = int(np.prod(window))
    live = 1.0
    if positions is not None and D == 3:
        # _pick_chunk returns 0 for streaming-size windows (resident
        # gate ~6k voxels); the streaming kernel skips dead chunks the
        # same way, so fall back to its chunk size.  If BOTH gates
        # return 0 the bucket runs on the XLA path, which executes
        # every pixel — live stays 1.0 (ADVICE r4 medium).
        chunk = _pick_chunk(V, npix) or _pick_chunk_stream(V, npix)
        if chunk > 0:
            masks = union_masks_center_out(positions, window, radius)
            live = chunk_live_fraction(masks, chunk)
    flops = kernel_flops_per_solve(
        n, D, V, npix, sweeps, rigid=rigid, pose_slots=pose_slots,
        fit_dist=fit_dist, fit_size_slots=fit_size_slots,
        n_extra=n_extra, chunk_live_frac=live,
    )
    out = annotate(rate, flops, load_peaks(), bound="vpu")
    out["exec_sweeps_per_solve"] = round(sweeps, 1)
    if live < 1.0:
        out["chunk_live_frac"] = round(live, 3)
    return out


def load_peaks():
    for path in (PEAKS_CACHE, _PEAKS_CACHE_TMP):
        try:
            with open(path) as fh:
                return json.load(fh)
        except OSError:
            continue
    return {}


# ---------------------------------------------------------------------------
# Empirical peaks
# ---------------------------------------------------------------------------

def _timed_chain(fn, seed, work_per_call, min_seconds=2.0, max_reps=64):
    """Sustained rate of ``fn`` (array -> same-shape array): dispatch a
    chain of calls feeding each output into the next (all queue on the
    device asynchronously), fence ONCE on the final value, and keep the
    chain long enough that total device time >> the ~27 ms tunnel RTT.
    Calibrates the chain length from a 3-call probe, then times fresh.
    """
    import jax

    def fence(r):
        # block_until_ready does NOT fence through the axon tunnel
        # (see bench.py); a scalar FETCH does.
        return float(jax.device_get(r.ravel()[0]))

    fence(fn(seed))  # compile + warm
    t0 = time.perf_counter()
    r = seed
    for _ in range(3):
        r = fn(r)
    fence(r)
    per_call = max((time.perf_counter() - t0) / 3, 1e-4)
    reps = max(4, min(max_reps, int(min_seconds / per_call) + 1))
    t0 = time.perf_counter()
    r = seed
    for _ in range(reps):
        r = fn(r)
    fence(r)
    dt = time.perf_counter() - t0
    return reps * work_per_call / dt


def measure_peaks():
    """Measure sustained VPU/MXU/HBM rates on the attached device.

    Per the suite's tunnel rule (suite.py::_timed_reps): the timed
    region is a device-side chain fenced once at the end and seconds
    long, so the ~27 ms axon RTT is noise.  The VPU test chains UNROLL
    dependent FMAs per element inside one fused loop body so the work
    is compute-bound even if the loop state round-trips HBM (UNROLL=64
    -> 16 executed flops per loop-state byte, an order of magnitude
    past the HBM ridge point); element-level parallelism across the
    block keeps the VPU pipeline full despite the per-element chain.
    """
    import jax
    import jax.numpy as jnp

    peaks = {}

    # VPU f32: UNROLL chained FMAs per element per loop iteration on a
    # VMEM-scale block.
    N = 128 * 1024  # 512 KB
    K = 4096
    UNROLL = 64

    @jax.jit
    def vpu(x):
        a = jnp.float32(0.9999999)
        b = jnp.float32(1e-7)

        def body(_, x):
            for _u in range(UNROLL):
                x = x * a + b
            return x
        return jax.lax.fori_loop(0, K, body, x)

    seed = jnp.ones((N,), jnp.float32)
    rate = _timed_chain(vpu, seed, 2.0 * N * K * UNROLL)
    peaks["vpu_f32_tops"] = round(rate / 1e12, 3)

    # MXU f32: chained square matmuls (renormalized to stay finite).
    # Measured at BOTH precisions: DEFAULT lowers f32 matmuls to bf16
    # passes (the ~bf16-peak number); HIGHEST is what the XLA ladder
    # solver's einsums request (ops/lm.py) and is the roof the ladder
    # path should be judged against.
    M = 2048
    KI = 256

    def make_mxu(precision):
        @jax.jit
        def mxu(x):
            w = jnp.full((M, M), 1.0 / M, jnp.float32)

            def body(_, x):
                return jnp.matmul(x, w, precision=precision)
            return jax.lax.fori_loop(0, KI, body, x)
        return mxu

    seed2 = jnp.ones((M, M), jnp.float32)
    rate = _timed_chain(make_mxu("default"), seed2, 2.0 * M ** 3 * KI)
    peaks["mxu_f32_default_tflops"] = round(rate / 1e12, 1)
    rate = _timed_chain(make_mxu("highest"), seed2, 2.0 * M ** 3 * KI)
    peaks["mxu_f32_highest_tflops"] = round(rate / 1e12, 1)

    # MXU bf16 (informational: the ladder solver runs f32, but bf16 is
    # the chip's headline ratio).
    @jax.jit
    def mxu_bf16(x):
        w = jnp.full((M, M), 1.0 / M, jnp.bfloat16)

        def body(_, x):
            return (x @ w).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, KI, body, x)

    seed3 = jnp.ones((M, M), jnp.bfloat16)
    rate = _timed_chain(mxu_bf16, seed3, 2.0 * M ** 3 * KI)
    peaks["mxu_bf16_tflops"] = round(rate / 1e12, 1)

    # HBM: elementwise scale of an HBM-resident 1 GB array (read +
    # write per loop iteration; far beyond VMEM so it streams).
    NB = 256 * 1024 * 1024
    KH = 64

    @jax.jit
    def hbm(x):
        def body(_, x):
            return x * jnp.float32(0.9999999)
        return jax.lax.fori_loop(0, KH, body, x)

    seedb = jnp.ones((NB,), jnp.float32)
    rate = _timed_chain(hbm, seedb, 2.0 * NB * 4 * KH, max_reps=16)
    peaks["hbm_gbps"] = round(rate / 1e9, 1)

    peaks["measured_at"] = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(PEAKS_CACHE, "w") as fh:
        json.dump(peaks, fh)
    return peaks


def main():
    sys.path.insert(0, ".")
    from benchmarks.suite import enable_compile_cache

    enable_compile_cache()
    peaks = measure_peaks()
    print(json.dumps(peaks), flush=True)


if __name__ == "__main__":
    main()
