"""Model-function registry: radial profiles for cluster fitting.

TPU-native rebuild of clustertracking/fitfunc.py's model registry (see
SURVEY.md §2 "Model functions + packing").  The reference builds numpy
residual/Jacobian closures per model; here a model is a *pure scalar JAX
function* of the size-normalized squared radius ``r2`` plus optional extra
parameters.  Derivatives w.r.t. ``r2`` and extras come from ``jax.grad``, so
every model — including user-supplied custom ones — gets exact analytic
Jacobians through the chain rule in :mod:`clustertracking_tpu.ops.residual`.

Image model (the API contract, matching the reference's structure)::

    I(x) = background + sum_i  signal_i * fun(r2_i, *extras)
    r2_i = sum_d ((x_d - pos_{i,d}) / size_{i,d})**2

Conventions (documented because the reference mount was empty — SURVEY.md §0):

- ``size`` is the Gaussian sigma (per-axis sigmas when anisotropic).
- ``signal`` is the peak amplitude: ``fun(0) == 1`` for every built-in model
  except ``ring`` (which peaks at ``r2 == 1``, i.e. at radius ``size``).

Built-in models (names match the reference registry):

- ``'gauss'``: ``exp(-r2 / 2)``
- ``'ring'``:  Gaussian annulus peaked at radius ``size`` with relative
  thickness ``t``: ``exp(-(sqrt(r2) - 1)**2 / (2 t**2))``
- ``'hat'``:   flat disc of relative radius ``disc_size`` with a Gaussian
  rim of sigma ``(1 - disc_size)``
- ``'disc'``:  smooth-edged disc (sigmoid edge at r = size)
- ``'inv_series_<n>'``: ``1 / (1 + a_1 r2 + a_2 r2**2 + ... + a_n r2**n)``
  with the ``a_k`` as trainable (usually 'global'-mode) coefficients —
  the reference's trainable experimental-PSF model.

Custom models are dicts ``{'params': [...], 'fun': f, 'dfun': None,
'default': {...}, 'continuous': bool}`` exactly as in the reference
(fitfunc.py custom-dict escape hatch); ``fun`` must be jax-traceable.
"""
from __future__ import annotations

import dataclasses
import re
from typing import Callable, Mapping

import jax
import jax.numpy as jnp

__all__ = ["ModelSpec", "get_model", "register_model", "MODELS"]


@dataclasses.dataclass(frozen=True, eq=False)
class ModelSpec:
    # eq=False keeps identity hashing: instances carry dict/callable fields
    # and are interned in MODELS, so identity is the right cache key for
    # the lru_cached bucket solvers in refine.py.
    """A radial model profile.

    Attributes:
      name: registry key.
      extra_params: names of extra scalar parameters beyond the standard
        (background, signal, pos..., size...) set, in call order.
      fun: scalar function ``fun(r2, *extras) -> intensity`` (jax-traceable).
      default: default values for extra params and standard-param overrides
        (e.g. ``{'thickness': 0.2}``).
      continuous: whether the profile is continuous in its positions —
        the reference uses this flag to decide if analytic derivatives are
        trustworthy; kept for API parity.
      default_mode: per-extra-param default fitting mode ('const'/'var'/
        'cluster'/'global'), used by the packing layer.
    """

    name: str
    extra_params: tuple
    fun: Callable
    default: Mapping
    continuous: bool = True
    default_mode: Mapping = dataclasses.field(default_factory=dict)
    # Optional analytic d fun / d r2 (elementwise, broadcastable).  When
    # absent, jax.grad of the scalar profile is used (exact but builds a
    # vmapped-grad graph; the analytic form lets XLA CSE shared
    # subexpressions with the forward profile — hot-path models set it).
    dfun: Callable = None
    # Optional ``dfun_f(f, r2, *extras)`` — d fun / d r2 expressed through
    # the already-computed forward value ``f = fun(r2, *extras)``.  The
    # solver hot loops evaluate fun and dfun at the same r2 every sweep;
    # reusing f drops the second transcendental per feature per pixel
    # (gauss: one exp instead of two — the VPU-bound 3D rigid kernels are
    # ~550 elementwise ops/voxel, so this is a measurable slice).
    dfun_f: Callable = None

    # --- derivative accessors (lazily built, cached on the class) ---------
    def dfun_dr2(self) -> Callable:
        """d fun / d r2 as a scalar jax function."""
        if self.dfun is not None:
            return self.dfun
        return jax.grad(lambda r2, *e: self.fun(r2, *e), argnums=0)

    def dfun_dextra(self, k: int) -> Callable:
        """d fun / d extras[k] as a scalar jax function."""
        return jax.grad(lambda r2, *e: self.fun(r2, *e), argnums=1 + k)


def _gauss(r2):
    return jnp.exp(-0.5 * r2)


def _ring(r2, thickness):
    r = jnp.sqrt(r2 + 1e-12)
    return jnp.exp(-0.5 * ((r - 1.0) / thickness) ** 2)


def _hat(r2, disc_size):
    r = jnp.sqrt(r2 + 1e-12)
    edge = jnp.maximum(r - disc_size, 0.0)
    sigma = jnp.maximum(1.0 - disc_size, 1e-3)
    return jnp.exp(-0.5 * (edge / sigma) ** 2)


def _disc(r2):
    # Smooth-edged disc: ~1 inside r=1, sigmoid falloff with 10% edge width.
    r = jnp.sqrt(r2 + 1e-12)
    return jax.nn.sigmoid((1.0 - r) / 0.1)


def _make_inv_series(n: int) -> ModelSpec:
    names = tuple(f"coeff_{k}" for k in range(1, n + 1))

    def fun(r2, *coeffs):
        acc = jnp.asarray(1.0, dtype=jnp.result_type(r2))
        p = r2
        for c in coeffs:
            acc = acc + c * p
            p = p * r2
        return 1.0 / acc

    def dfun(r2, *coeffs):
        # d/dr2 (1/A) = -A'/A²,  A' = Σ_k c_k · k · r2^(k-1)
        acc = jnp.asarray(1.0, dtype=jnp.result_type(r2))
        dacc = jnp.zeros_like(r2)
        p = r2
        dp = jnp.ones_like(r2)
        for k, c in enumerate(coeffs, start=1):
            acc = acc + c * p
            dacc = dacc + c * k * dp
            dp = p
            p = p * r2
        return -dacc / (acc * acc)

    def dfun_f(f, r2, *coeffs):
        # -A'/A² = -A'·f² with f = 1/A already computed — saves the
        # series re-accumulation of A and the division
        dacc = jnp.zeros_like(r2)
        dp = jnp.ones_like(r2)
        p = r2
        for k, c in enumerate(coeffs, start=1):
            dacc = dacc + c * k * dp
            dp = p
            p = p * r2
        return -dacc * f * f

    # Default coefficients: match the Taylor series of exp(r2/2) so the
    # untrained model approximates a Gaussian (1/exp(-r2/2) = exp(r2/2)).
    fact = 1.0
    defaults = {}
    for k in range(1, n + 1):
        fact *= k
        defaults[f"coeff_{k}"] = 0.5 ** k / fact
    return ModelSpec(
        name=f"inv_series_{n}",
        extra_params=names,
        fun=fun,
        default=defaults,
        continuous=True,
        default_mode={name: "global" for name in names},
        dfun=dfun,
        dfun_f=dfun_f,
    )


def _dgauss(r2):
    return -0.5 * jnp.exp(-0.5 * r2)


# f-reusing derivative forms (see ModelSpec.dfun_f).  gauss is exact
# bit-parity with _dgauss (same exp value, one multiply); the others
# trade one exp/sigmoid for a few multiplies.
def _dgauss_f(f, r2):
    return -0.5 * f


def _dring_f(f, r2, thickness):
    r = jnp.sqrt(r2 + 1e-12)
    return f * (1.0 - r) / (thickness * thickness) * 0.5 / r


def _dhat_f(f, r2, disc_size):
    r = jnp.sqrt(r2 + 1e-12)
    edge = jnp.maximum(r - disc_size, 0.0)
    sigma = jnp.maximum(1.0 - disc_size, 1e-3)
    return f * (-edge) / (sigma * sigma) * 0.5 / r


def _ddisc_f(f, r2):
    r = jnp.sqrt(r2 + 1e-12)
    return f * (1.0 - f) * (-10.0) * 0.5 / r


def _dring(r2, thickness):
    # d/dr2 exp(-(r-1)²/(2t²)) = f · (1-r)/t² · dr/dr2,  dr/dr2 = 1/(2r)
    r = jnp.sqrt(r2 + 1e-12)
    f = jnp.exp(-0.5 * ((r - 1.0) / thickness) ** 2)
    return f * (1.0 - r) / (thickness * thickness) * 0.5 / r


def _dhat(r2, disc_size):
    r = jnp.sqrt(r2 + 1e-12)
    edge = jnp.maximum(r - disc_size, 0.0)
    sigma = jnp.maximum(1.0 - disc_size, 1e-3)
    f = jnp.exp(-0.5 * (edge / sigma) ** 2)
    return f * (-edge) / (sigma * sigma) * 0.5 / r


def _ddisc(r2):
    r = jnp.sqrt(r2 + 1e-12)
    s = jax.nn.sigmoid((1.0 - r) / 0.1)
    return s * (1.0 - s) * (-10.0) * 0.5 / r


MODELS: dict = {
    "gauss": ModelSpec("gauss", (), _gauss, {}, dfun=_dgauss,
                       dfun_f=_dgauss_f),
    "ring": ModelSpec(
        "ring", ("thickness",), _ring, {"thickness": 0.2},
        default_mode={"thickness": "cluster"}, dfun=_dring,
        dfun_f=_dring_f,
    ),
    "hat": ModelSpec(
        "hat", ("disc_size",), _hat, {"disc_size": 0.5},
        default_mode={"disc_size": "cluster"}, dfun=_dhat,
        dfun_f=_dhat_f,
    ),
    "disc": ModelSpec("disc", (), _disc, {}, continuous=False, dfun=_ddisc,
                      dfun_f=_ddisc_f),
}

_INV_SERIES_RE = re.compile(r"^inv_series_(\d+)$")


def register_model(spec: ModelSpec) -> None:
    MODELS[spec.name] = spec


def get_model(fit_function) -> ModelSpec:
    """Resolve a model name / dict / ModelSpec into a ModelSpec.

    Accepts the reference's three forms: a registry name (``'gauss'``,
    ``'ring'``, ``'hat'``, ``'disc'``, ``'inv_series_<n>'``), a custom dict
    (fitfunc.py custom escape hatch), or an already-built ModelSpec.
    """
    if isinstance(fit_function, ModelSpec):
        return fit_function
    if isinstance(fit_function, str):
        if fit_function in MODELS:
            return MODELS[fit_function]
        m = _INV_SERIES_RE.match(fit_function)
        if m:
            spec = _make_inv_series(int(m.group(1)))
            MODELS[spec.name] = spec
            return spec
        raise ValueError(
            f"Unknown fit_function {fit_function!r}; known: "
            f"{sorted(MODELS)} + 'inv_series_<n>'"
        )
    if isinstance(fit_function, Mapping):
        params = tuple(fit_function.get("params", ()))
        return ModelSpec(
            name=fit_function.get("name", "custom"),
            extra_params=params,
            fun=fit_function["fun"],
            default=dict(fit_function.get("default", {})),
            continuous=bool(fit_function.get("continuous", True)),
            default_mode=dict(fit_function.get("default_mode", {})),
            dfun=fit_function.get("dfun"),
        )
    raise TypeError(f"Cannot interpret fit_function={fit_function!r}")
