"""Scene colliders: set per-ray near/far bounds.

Behavioral spec: reference `nerfstudio/model_components/scene_colliders.py`
(`NearFarCollider:169-191`, `AABBBoxCollider:57-123`).
"""

import jax.numpy as jnp

from nerfstudio_thermal_tpu.cameras.rays import RayBundle


def _combine_bounds(ray_bundle: RayBundle, nears, fars):
    """Intersect collider bounds with any bounds already on the bundle
    (e.g. a viewer crop box set by get_outputs_for_camera(crop_aabb=...)).
    Empty intersections collapse to near == far -> zero-weight samples."""
    if ray_bundle.nears is not None:
        nears = jnp.maximum(nears, ray_bundle.nears)
    if ray_bundle.fars is not None:
        fars = jnp.minimum(fars, ray_bundle.fars)
    fars = jnp.maximum(fars, nears)
    return ray_bundle.replace(nears=nears, fars=fars)


class NearFarCollider:
    """Fixed near/far planes; near resets to 0 at eval unless disabled."""

    def __init__(self, near_plane: float, far_plane: float, reset_near_plane: bool = True):
        self.near_plane = near_plane
        self.far_plane = far_plane
        self.reset_near_plane = reset_near_plane

    def __call__(self, ray_bundle: RayBundle, train: bool = True) -> RayBundle:
        ones = jnp.ones_like(ray_bundle.origins[..., 0:1])
        near = self.near_plane if (train or not self.reset_near_plane) else 0.0
        return _combine_bounds(ray_bundle, ones * near, ones * self.far_plane)


class AABBBoxCollider:
    """Ray-AABB intersection near/far (reference scene_colliders.py:57-123)."""

    def __init__(self, aabb, near_plane: float = 0.0):
        self.aabb = aabb
        self.near_plane = near_plane

    def __call__(self, ray_bundle: RayBundle, train: bool = True) -> RayBundle:
        aabb = self.aabb
        dirs = ray_bundle.directions
        origins = ray_bundle.origins
        inv = 1.0 / jnp.where(jnp.abs(dirs) < 1e-10, 1e-10, dirs)
        t1 = (aabb[0] - origins) * inv
        t2 = (aabb[1] - origins) * inv
        nears = jnp.max(jnp.minimum(t1, t2), axis=-1, keepdims=True)
        fars = jnp.min(jnp.maximum(t1, t2), axis=-1, keepdims=True)
        near_plane = self.near_plane if train else 0.0
        nears = jnp.clip(nears, near_plane, None)
        fars = jnp.maximum(fars, nears + 1e-6)
        return _combine_bounds(ray_bundle, nears, fars)


class SphereCollider:
    """Ray-sphere intersection near/far (reference scene_colliders.py:126-166).
    Rays missing the sphere get near=far (zero-weight samples)."""

    def __init__(self, center, radius: float, near_plane: float = 0.0):
        self.center = jnp.asarray(center)
        self.radius = radius
        self.near_plane = near_plane

    def __call__(self, ray_bundle: RayBundle, train: bool = True) -> RayBundle:
        o = ray_bundle.origins - self.center
        d = ray_bundle.directions
        a = jnp.sum(d * d, axis=-1, keepdims=True)
        b = 2.0 * jnp.sum(o * d, axis=-1, keepdims=True)
        c = jnp.sum(o * o, axis=-1, keepdims=True) - self.radius**2
        disc = b * b - 4 * a * c
        hit = disc > 0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        nears = (-b - sq) / (2 * a)
        fars = (-b + sq) / (2 * a)
        near_plane = self.near_plane if train else 0.0
        nears = jnp.clip(nears, near_plane, None)
        nears = jnp.where(hit, nears, near_plane)
        fars = jnp.where(hit, jnp.maximum(fars, nears + 1e-6), near_plane + 1e-6)
        return _combine_bounds(ray_bundle, nears, fars)
