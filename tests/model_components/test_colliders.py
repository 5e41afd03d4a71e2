import numpy as np
import jax.numpy as jnp

from nerfstudio_thermal_tpu.cameras.rays import RayBundle
from nerfstudio_thermal_tpu.model_components.scene_colliders import (
    AABBBoxCollider, NearFarCollider, SphereCollider,
)


def bundle(origins, directions):
    o = jnp.asarray(origins, jnp.float32)
    d = jnp.asarray(directions, jnp.float32)
    return RayBundle(
        origins=o, directions=d, pixel_area=jnp.ones((o.shape[0], 1)),
        camera_indices=jnp.zeros((o.shape[0], 1), jnp.int32),
    )


def test_near_far_collider_reset_at_eval():
    rb = bundle([[0, 0, 0]], [[0, 0, -1]])
    c = NearFarCollider(0.5, 10.0)
    out = c(rb, train=True)
    assert float(out.nears[0, 0]) == 0.5
    out = c(rb, train=False)
    assert float(out.nears[0, 0]) == 0.0


def test_aabb_collider_intersections():
    aabb = jnp.asarray([[-1, -1, -1], [1, 1, 1]], jnp.float32)
    rb = bundle([[0, 0, 3]], [[0, 0, -1]])
    out = AABBBoxCollider(aabb)(rb)
    np.testing.assert_allclose(float(out.nears[0, 0]), 2.0, atol=1e-5)
    np.testing.assert_allclose(float(out.fars[0, 0]), 4.0, atol=1e-5)


def test_sphere_collider_hit_and_miss():
    c = SphereCollider([0.0, 0.0, 0.0], 1.0)
    rb = bundle([[0, 0, 3], [0, 5, 3]], [[0, 0, -1], [0, 0, -1]])
    out = c(rb)
    np.testing.assert_allclose(float(out.nears[0, 0]), 2.0, atol=1e-5)
    np.testing.assert_allclose(float(out.fars[0, 0]), 4.0, atol=1e-5)
    # miss: degenerate interval
    assert float(out.fars[1, 0]) - float(out.nears[1, 0]) < 1e-3
