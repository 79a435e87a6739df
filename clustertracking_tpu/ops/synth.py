"""On-device synthetic frame rendering (benchmark data generation).

Device counterpart of artificial.py's host-numpy synthesis (the reference's
clustertracking/artificial.py — SURVEY.md §2 "Synthetic data / fake
reader").  The host module is the *oracle* and stays numpy; this module
exists so benchmarks and large-scale synthetic pipelines can generate
frames directly in HBM instead of rasterizing on the host and pushing
``T·H·W`` floats through the host↔device link (measured ~45 MB/s on the
axon tunnel — a 64-frame 1024² f32 stack alone costs ~6 s of transfer).

Design: features are vmapped — each evaluates its profile on a static
``window``-shaped grid anchored at its floor position — and the windows
scatter-add into the flat frame stack in one ``.at[].add``.  Static shapes
throughout; out-of-frame window pixels are masked to zero and dumped on a
guard cell so clamping never corrupts edge pixels.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.registry import get_model
from ..utils import validate_tuple

__all__ = ["render_frames", "frames_from_df"]


@partial(
    jax.jit,
    static_argnames=("n_frames", "shape", "fit_function", "window",
                     "noise_level"),
)
def render_frames(
    positions,
    signals,
    sizes,
    frame_idx,
    n_frames: int,
    shape: Tuple[int, ...],
    fit_function: str = "gauss",
    window: Optional[Tuple[int, ...]] = None,
    extras=(),
    noise_level: float = 0.0,
    seed: int = 0,
):
    """Render a frame stack [n_frames, *shape] from a feature table.

    Args:
      positions: [N, D] float — feature centers (pixel coordinates).
      signals: [N] float — peak amplitudes.
      sizes: [N, D] (or [N] isotropic) float — per-axis sigmas.
      frame_idx: [N] int — which frame each feature lands in.
      n_frames, shape: static output geometry.
      fit_function: registry profile name ('gauss', 'ring', 'hat', 'disc').
      window: static per-axis window extent evaluated around each feature;
        defaults to ±5σ of the LARGEST size (pass explicitly when sizes
        vary a lot to keep the scatter cheap).
      extras: extra profile parameters, scalars or [N] arrays, in the
        model's ``extra_params`` order (e.g. ``(thickness,)`` for 'ring').
      noise_level: std of Gaussian noise added per pixel (0 = none).
      seed: PRNG seed for the noise.

    Matches artificial.draw_spots within the window-truncation tail
    (~exp(-12.5)·signal for the default 5σ Gaussian window).
    """
    model = get_model(fit_function)
    positions = jnp.asarray(positions, jnp.float32)
    signals = jnp.asarray(signals, jnp.float32)
    sizes = jnp.asarray(sizes, jnp.float32)
    frame_idx = jnp.asarray(frame_idx, jnp.int32)
    N, D = positions.shape
    if sizes.ndim == 1:
        sizes = sizes[:, None] * jnp.ones((1, D), jnp.float32)
    if window is None:
        raise ValueError(
            "window must be static under jit; use frames_from_df or pass "
            "window=ceil(10*max_size)+1 per axis"
        )
    window = tuple(int(w) for w in window)
    extras = tuple(jnp.broadcast_to(jnp.asarray(e, jnp.float32), (N,))
                   for e in extras)

    strides = []
    s = int(np.prod(shape))
    total = n_frames * s
    for d in range(D):
        s //= shape[d]
        strides.append(s)

    offs = [
        jax.lax.broadcasted_iota(jnp.int32, window, d)
        for d in range(D)
    ]

    def one(pos, sig, size, fi, *ex):
        corner = jnp.floor(pos).astype(jnp.int32) - jnp.asarray(
            [w // 2 for w in window], jnp.int32
        )
        r2 = None
        flat = fi * int(np.prod(shape))
        ok = None
        for d in range(D):
            coord = offs[d] + corner[d]
            dx = (coord.astype(jnp.float32) - pos[d]) / size[d]
            r2 = dx * dx if r2 is None else r2 + dx * dx
            inb = (coord >= 0) & (coord < shape[d])
            ok = inb if ok is None else ok & inb
            flat = flat + jnp.clip(coord, 0, shape[d] - 1) * strides[d]
        vals = sig * model.fun(r2, *ex)
        # out-of-frame pixels: zero value AND a guard index past the stack
        # (clamped coords of two OOB pixels can collide with a real pixel;
        # zeros are additively harmless but the guard keeps it exact)
        flat = jnp.where(ok, flat, total)
        return flat.reshape(-1), jnp.where(ok, vals, 0.0).reshape(-1)

    flat_idx, vals = jax.vmap(one)(
        positions, signals, sizes, frame_idx, *extras
    )
    out = jnp.zeros((total + 1,), jnp.float32)
    out = out.at[flat_idx.reshape(-1)].add(vals.reshape(-1))
    out = out[:total].reshape((n_frames,) + shape)
    if noise_level > 0.0:
        key = jax.random.PRNGKey(seed)
        out = out + noise_level * jax.random.normal(key, out.shape)
    return out


def frames_from_df(
    f,
    shape: Sequence[int],
    size,
    n_frames: Optional[int] = None,
    fit_function: str = "gauss",
    signal_col: str = "signal",
    t_column: str = "frame",
    pos_columns: Optional[list] = None,
    noise_level: float = 0.0,
    seed: int = 0,
    cutoff_sigmas: float = 5.0,
):
    """Device-rendered frame stack from a coordinate DataFrame.

    The on-device analogue of artificial.CoordinateReader for whole-stack
    use: one dispatch renders every frame.  Returns a jax array
    [n_frames, *shape].
    """
    from ..utils import default_pos_columns

    ndim = len(shape)
    if pos_columns is None:
        pos_columns = default_pos_columns(ndim)
    if n_frames is None:
        n_frames = int(f[t_column].max()) + 1 if len(f) else 0
    size_t = np.asarray(validate_tuple(size, ndim), dtype=np.float32)
    window = tuple(
        min(int(np.ceil(2 * cutoff_sigmas * s)) + 1, int(dim))
        for s, dim in zip(size_t, shape)
    )
    positions = f[pos_columns].to_numpy(dtype=np.float32)
    N = len(f)
    signals = (
        f[signal_col].to_numpy(dtype=np.float32)
        if signal_col in f.columns else np.ones(N, np.float32)
    )
    sizes = np.broadcast_to(size_t, (N, ndim))
    fidx = f[t_column].to_numpy(dtype=np.int32)
    return render_frames(
        positions, signals, sizes, fidx, int(n_frames), tuple(shape),
        fit_function=fit_function, window=window,
        noise_level=float(noise_level), seed=seed,
    )
