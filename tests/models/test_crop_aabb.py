"""Viewer crop ray/AABB slab intersection, incl. the sign-preserving clamp
for near-axis-parallel rays (round-3 review fix: +eps on a tiny NEGATIVE
component flipped that axis's interval)."""

import jax.numpy as jnp
import numpy as np

from nerfstudio_thermal_tpu.models.base_model import crop_near_far

AABB = jnp.asarray(np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]], np.float32))


def test_basic_hit_and_miss():
    o = jnp.asarray([[0.0, 0.0, -3.0], [0.0, 5.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    nears, fars = crop_near_far(o, d, AABB)
    np.testing.assert_allclose(nears[0, 0], 2.0, atol=1e-5)
    np.testing.assert_allclose(fars[0, 0], 4.0, atol=1e-5)
    # ray 2 misses (y=5): empty segment
    assert float(fars[1, 0]) == float(nears[1, 0])


def test_grazing_negative_component_not_flipped():
    """Origin outside the +x face, direction x-component -5e-11 (grazing):
    the ray never reaches x <= 1, so the segment must be empty."""
    o = jnp.asarray([[3.0, 0.0, -3.0]])
    d = jnp.asarray([[-5e-11, 0.0, 1.0]])
    nears, fars = crop_near_far(o, d, AABB)
    assert float(fars[0, 0]) == float(nears[0, 0]), "grazing ray must miss"
    # mirrored case: tiny positive component from the -x side also misses
    o2 = jnp.asarray([[-3.0, 0.0, -3.0]])
    d2 = jnp.asarray([[5e-11, 0.0, 1.0]])
    n2, f2 = crop_near_far(o2, d2, AABB)
    assert float(f2[0, 0]) == float(n2[0, 0])


def test_inside_box_near_clamped_to_zero():
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    nears, fars = crop_near_far(o, d, AABB)
    np.testing.assert_allclose(nears[0, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(fars[0, 0], 1.0, atol=1e-5)
