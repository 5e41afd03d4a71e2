"""Chunked full-image render == single-pass forward (reference
base_model.py:178-206 semantics: chunking is an implementation detail and
must not change the rendered values, including on the padded last chunk)."""

import jax
import numpy as np

from nerfstudio_thermal_tpu.models.thermal_nerfacto import ThermalNerfactoModel

from tests.models.test_thermal_nerfacto import AABB, make_bundle, tiny_config


def test_chunked_render_matches_unchunked():
    cfg = tiny_config(eval_num_rays_per_chunk=16)
    model = ThermalNerfactoModel(
        cfg, AABB, num_train_data=4, metadata={"is_thermal": [0, 1, 0, 1]}
    )
    params = model.init_params(jax.random.PRNGKey(0))
    # 40 rays = 2 full chunks + a padded 8-ray tail
    bundle = make_bundle(R=40)
    chunked = model.render_ray_bundle_chunked(params, bundle)
    direct = model.forward(params, bundle, train=False, rng=None)
    assert set(chunked) == set(direct)
    for k in direct:
        np.testing.assert_allclose(
            np.asarray(chunked[k]), np.asarray(direct[k]),
            atol=1e-4, rtol=1e-4, err_msg=k,
        )


def test_chunked_render_exact_multiple():
    cfg = tiny_config(eval_num_rays_per_chunk=8)
    model = ThermalNerfactoModel(
        cfg, AABB, num_train_data=4, metadata={"is_thermal": [0, 1, 0, 1]}
    )
    params = model.init_params(jax.random.PRNGKey(0))
    bundle = make_bundle(R=16)  # no padding path
    chunked = model.render_ray_bundle_chunked(params, bundle)
    direct = model.forward(params, bundle, train=False, rng=None)
    for k in direct:
        np.testing.assert_allclose(
            np.asarray(chunked[k]), np.asarray(direct[k]),
            atol=1e-4, rtol=1e-4, err_msg=k,
        )
