"""Parameter-mode packing roundtrips (SURVEY.md §4 numerical-plumbing)."""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from clustertracking_tpu.models import build_layout, get_model


@pytest.mark.parametrize(
    "mode_overrides",
    [
        {},
        {"size": "var"},
        {"size": "cluster"},
        {"size": "global"},
        {"background": "cluster"},
        {"signal": "cluster", "size": "var", "background": "cluster"},
    ],
)
@pytest.mark.parametrize("n", [1, 2, 4])
def test_roundtrip(mode_overrides, n, rng):
    model = get_model("gauss")
    layout = build_layout(model, 2, True, n, mode_overrides)
    P = layout.n_params
    params = rng.normal(size=(3, n, P)).astype(np.float32)

    # make shared-mode entries consistent so the roundtrip is exact
    for p, mode in enumerate(layout.modes):
        if mode in ("cluster", "global"):
            params[:, :, p] = params[:, :1, p]

    vect = layout.vect_from_params(jnp.asarray(params))
    assert vect.shape == (3, layout.n_slots)
    back = layout.vect_to_params(vect, jnp.asarray(params))
    np.testing.assert_allclose(np.asarray(back), params, rtol=1e-6)


def test_mean_reduction_on_shared_slots():
    """Packing averages inconsistent shared values (reference operation)."""
    model = get_model("gauss")
    layout = build_layout(model, 2, True, 2, {"size": "cluster"})
    p_size = layout.param_names.index("size")
    params = np.zeros((1, 2, layout.n_params), dtype=np.float32)
    params[0, 0, p_size] = 2.0
    params[0, 1, p_size] = 4.0
    vect = np.asarray(layout.vect_from_params(jnp.asarray(params)))
    s = layout.slot_idx[0, p_size]
    assert vect[0, s] == pytest.approx(3.0)


def test_const_slots_have_no_vector_entry():
    model = get_model("gauss")
    layout = build_layout(model, 2, True, 2)  # defaults: size+bg const
    # slots: signal (2 var) + y (2) + x (2) = 6
    assert layout.n_slots == 6
    assert all(layout.slot_idx[:, layout.param_names.index("size")] == -1)


def test_global_flags():
    model = get_model("inv_series_2")
    layout = build_layout(model, 2, True, 1)
    assert layout.global_slots.sum() == 2  # two trainable coefficients


def test_background_var_rejected():
    model = get_model("gauss")
    with pytest.raises(ValueError):
        build_layout(model, 2, True, 2, {"background": "var"})


def test_anisotropic_layout():
    model = get_model("gauss")
    layout = build_layout(model, 3, False, 2, {"size_z": "var"})
    assert "size_z" in layout.param_names
    assert layout.param_names.index("size_z") in layout.size_param_idx
