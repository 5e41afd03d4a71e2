import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_thermal_tpu.ops.activations import trunc_exp
from nerfstudio_thermal_tpu.ops.spatial_distortions import SceneContraction


def test_trunc_exp_forward_is_exp():
    x = jnp.asarray([-30.0, -1.0, 0.0, 1.0, 10.0])
    np.testing.assert_allclose(np.asarray(trunc_exp(x)), np.exp(np.asarray(x)), rtol=1e-6)


def test_trunc_exp_gradient_is_clamped():
    g = jax.grad(lambda x: trunc_exp(x))(100.0)
    np.testing.assert_allclose(g, np.exp(15.0), rtol=1e-5)
    g = jax.grad(lambda x: trunc_exp(x))(-100.0)
    np.testing.assert_allclose(g, np.exp(-15.0), rtol=1e-5)
    g = jax.grad(lambda x: trunc_exp(x))(2.0)
    np.testing.assert_allclose(g, np.exp(2.0), rtol=1e-5)


def test_scene_contraction_linf():
    c = SceneContraction(order=jnp.inf)
    inside = jnp.asarray([[0.5, -0.2, 0.1]])
    np.testing.assert_allclose(np.asarray(c(inside)), np.asarray(inside), rtol=1e-6)
    far = jnp.asarray([[1000.0, 0.0, 0.0]])
    out = np.asarray(c(far))
    assert np.all(np.abs(out) <= 2.0)
    np.testing.assert_allclose(out[0, 0], 2.0, atol=1e-2)


def test_scene_contraction_gradient_finite():
    c = SceneContraction(order=jnp.inf)
    g = jax.grad(lambda x: jnp.sum(c(x)))(jnp.asarray([[3.0, 0.5, -2.0]]))
    assert np.isfinite(np.asarray(g)).all()
