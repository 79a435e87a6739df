"""Model registry + analytic Jacobians vs finite differences / numpy oracle
(SURVEY.md §4: golden tests vs hand-rolled numpy, fitfunc.py parity)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from clustertracking_tpu import artificial  # noqa: E402
from clustertracking_tpu.models import build_layout, get_model  # noqa: E402
from clustertracking_tpu.ops.residual import make_model_fns  # noqa: E402


def _setup(model_name, ndim=2, iso=True, n=2, window=(16, 16),
           param_mode=None, rng=None):
    model = get_model(model_name)
    from clustertracking_tpu.utils import default_size_columns

    mode = {c: "var" for c in default_size_columns(ndim, iso)}
    mode.update(param_mode or {})
    layout = build_layout(model, ndim, iso, n, mode)
    P = layout.n_params
    B = 3
    rng = np.random.default_rng(0 if rng is None else rng)
    params = np.zeros((B, n, P), dtype=np.float32)
    params[:, :, 0] = 0.5  # background
    params[:, :, 1] = rng.uniform(50, 150, (B, n))  # signal
    center = np.asarray(window, dtype=float)[:ndim] / 2
    params[:, :, 2:2 + ndim] = center + rng.uniform(-3, 3, (B, n, ndim))
    n_size = 1 if iso else ndim
    params[:, :, 2 + ndim:2 + ndim + n_size] = rng.uniform(
        1.5, 2.5, (B, n, n_size)
    )
    for k, name in enumerate(model.extra_params):
        params[:, :, 2 + ndim + n_size + k] = model.default[name]
    # shared modes: make entries consistent
    for p, m in enumerate(layout.modes):
        if m in ("cluster", "global"):
            params[:, :, p] = params[:, :1, p]
    origin = np.zeros((B, ndim), dtype=np.int32)
    pixels = rng.uniform(0, 1, (B, int(np.prod(window)))).astype(np.float32)
    mask = np.ones_like(pixels)
    norm = np.full(B, 100.0, dtype=np.float32)
    fns = make_model_fns(model, layout, tuple(window))
    vect = layout.vect_from_params(jnp.asarray(params))
    return fns, layout, params, vect, pixels, mask, origin, norm


MODELS_2D = ["gauss", "ring", "hat", "inv_series_3"]


@pytest.mark.parametrize("model_name", MODELS_2D)
def test_jacobian_matches_autodiff(model_name):
    """Hand-assembled analytic J == jacfwd of the residual."""
    mode = {}
    if model_name != "gauss":
        # fit the extra param too so its column is exercised
        extra = get_model(model_name).extra_params[0]
        mode = {extra: "cluster"}
    fns, layout, params, vect, pixels, mask, origin, norm = _setup(
        model_name, param_mode=mode
    )
    args = (jnp.asarray(params), jnp.asarray(pixels), jnp.asarray(mask),
            jnp.asarray(origin), jnp.asarray(norm))
    r, J = fns.residual_jac(vect, *args)
    J_auto = jax.jacfwd(lambda v: fns.residual(v, *args))(vect)
    J_auto = jnp.einsum("bnbv->bvn", J_auto)
    np.testing.assert_allclose(
        np.asarray(J), np.asarray(J_auto), rtol=2e-3, atol=2e-4
    )


@pytest.mark.parametrize("ndim,iso", [(2, True), (2, False), (3, True),
                                      (3, False)])
def test_jacobian_dims(ndim, iso):
    window = (12,) * ndim
    fns, layout, params, vect, pixels, mask, origin, norm = _setup(
        "gauss", ndim=ndim, iso=iso, n=2, window=window
    )
    args = (jnp.asarray(params), jnp.asarray(pixels), jnp.asarray(mask),
            jnp.asarray(origin), jnp.asarray(norm))
    r, J = fns.residual_jac(vect, *args)
    assert J.shape == (3, layout.n_slots, int(np.prod(window)))
    J_auto = jax.jacfwd(lambda v: fns.residual(v, *args))(vect)
    J_auto = jnp.einsum("bnbv->bvn", J_auto)
    np.testing.assert_allclose(
        np.asarray(J), np.asarray(J_auto), rtol=2e-3, atol=2e-4
    )


def test_model_image_matches_artificial_oracle():
    """Device model image == host numpy rendering (same conventions)."""
    fns, layout, params, vect, pixels, mask, origin, norm = _setup("gauss")
    img = np.asarray(fns.image_from_params(
        jnp.asarray(params), jnp.asarray(origin)
    ))
    for b in range(params.shape[0]):
        ref = np.full((16, 16), params[b, 0, 0])
        for i in range(params.shape[1]):
            artificial.draw_feature(
                ref, params[b, i, 2:4], params[b, i, 4],
                signal=params[b, i, 1], cutoff_sigmas=100,
            )
        np.testing.assert_allclose(
            img[b].reshape(16, 16), ref, rtol=1e-4, atol=1e-3
        )


def test_custom_model_dict():
    """Reference custom-dict escape hatch: exponential profile."""
    custom = {
        "params": ["decay"],
        "fun": lambda r2, decay: jnp.exp(-decay * jnp.sqrt(r2 + 1e-9)),
        "default": {"decay": 1.0},
        "default_mode": {"decay": "cluster"},
    }
    fns, layout, params, vect, pixels, mask, origin, norm = _setup(
        custom, param_mode={"decay": "cluster"}
    )
    args = (jnp.asarray(params), jnp.asarray(pixels), jnp.asarray(mask),
            jnp.asarray(origin), jnp.asarray(norm))
    r, J = fns.residual_jac(vect, *args)
    J_auto = jax.jacfwd(lambda v: fns.residual(v, *args))(vect)
    J_auto = jnp.einsum("bnbv->bvn", J_auto)
    np.testing.assert_allclose(
        np.asarray(J), np.asarray(J_auto), rtol=2e-3, atol=2e-4
    )


def test_inv_series_defaults_approximate_gauss():
    model = get_model("inv_series_4")
    r2 = jnp.linspace(0, 1.5, 10)
    coeffs = [model.default[p] for p in model.extra_params]
    vals = model.fun(r2, *coeffs)
    np.testing.assert_allclose(
        np.asarray(vals), np.exp(-0.5 * np.asarray(r2)), atol=5e-3
    )


def test_unknown_model_raises():
    with pytest.raises(ValueError):
        get_model("nope")
