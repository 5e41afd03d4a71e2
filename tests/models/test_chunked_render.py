"""Chunked full-image render == single-pass forward (reference
base_model.py:178-206 semantics: chunking is an implementation detail and
must not change the rendered values, including on the padded last chunk).
The chunked image path returns the per-ray (image-like) outputs only;
per-sample tensors are loss-path payload (1.2 GB/frame at 1080p through a
17.5 MB/s tunnel) that the reference leaves as never-fetched GPU residents."""

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
    direct = {
        k: v
        for k, v in model.forward(params, bundle, train=False, rng=None).items()
        if v.ndim == 2
    }
    assert set(chunked) == set(direct)
    assert "rgb" in chunked and "removal" in chunked  # image outputs survive
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
    direct = {
        k: v
        for k, v in model.forward(params, bundle, train=False, rng=None).items()
        if v.ndim == 2
    }
    for k in direct:
        np.testing.assert_allclose(
            np.asarray(chunked[k]), np.asarray(direct[k]),
            atol=1e-4, rtol=1e-4, err_msg=k,
        )

def test_camera_device_render_matches_eager_raygen():
    """render_camera_device (in-jit ray generation + scanned chunks) must
    equal generating the rays eagerly and rendering the bundle, crop
    included (the viewer/eval fast path vs the bundle-based slow path)."""
    import jax.numpy as jnp

    from nerfstudio_thermal_tpu.cameras.cameras import Cameras, CameraType
    from nerfstudio_thermal_tpu.models.base_model import crop_near_far

    cfg = tiny_config(eval_num_rays_per_chunk=32)
    model = ThermalNerfactoModel(
        cfg, AABB, num_train_data=4, metadata={"is_thermal": [0, 1, 0, 1]}
    )
    params = model.init_params(jax.random.PRNGKey(0))
    c2w = np.eye(4, dtype=np.float32)[None, :3, :]
    cams = Cameras(
        camera_to_worlds=jnp.asarray(c2w),
        fx=jnp.full((1,), 15.0), fy=jnp.full((1,), 15.0),
        cx=jnp.full((1,), 4.5), cy=jnp.full((1,), 5.5),
        width=jnp.full((1,), 9, jnp.int32), height=jnp.full((1,), 11, jnp.int32),
        camera_type=jnp.full((1,), CameraType.PERSPECTIVE.value, jnp.int32),
    )
    h, w = 11, 9  # 99 rays: 3 full 32-chunks + a padded 3-ray tail
    crop = np.array([[-0.8, -0.8, -0.8], [0.8, 0.8, 0.8]], np.float32)

    for crop_aabb in (None, crop):
        dev = model.render_camera_device(params, cams, 0, crop_aabb=crop_aabb)
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        coords = jnp.asarray(
            np.stack([ys, xs], -1).reshape(-1, 2).astype(np.float32) + 0.5
        )
        bundle = cams.generate_rays(jnp.zeros((h * w,), jnp.int32), coords)
        if crop_aabb is not None:
            nears, fars = crop_near_far(
                bundle.origins, bundle.directions, jnp.asarray(crop_aabb)
            )
            bundle = bundle.replace(nears=nears, fars=fars)
        ref = model.render_ray_bundle_chunked(params, bundle)
        assert set(dev) == set(ref)
        for k in ref:
            np.testing.assert_allclose(
                np.asarray(dev[k]), np.asarray(ref[k]),
                atol=1e-4, rtol=1e-4, err_msg=f"{k} crop={crop_aabb is not None}",
            )
