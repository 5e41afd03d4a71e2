"""Edge cases for the gather-free sorted lookup (the perf-critical helper)."""

import numpy as np
import jax.numpy as jnp

from nerfstudio_thermal_tpu.model_components.ray_samplers import (
    searchsorted_batched,
    take_below_above,
)


def reference(a, v, values, side):
    inds = np.stack([np.searchsorted(ai, vi, side=side) for ai, vi in zip(a, v)])
    below_idx = np.clip(inds - 1, 0, values.shape[-1] - 1)
    above_idx = np.clip(inds, 0, values.shape[-1] - 1)
    return (
        np.take_along_axis(values, below_idx, -1),
        np.take_along_axis(values, above_idx, -1),
    )


def test_matches_numpy_searchsorted_gather():
    rng = np.random.default_rng(0)
    a = np.sort(rng.uniform(0, 1, (5, 17)), axis=-1)
    v = np.sort(rng.uniform(-0.1, 1.1, (5, 9)), axis=-1)
    values = np.cumsum(rng.uniform(0, 1, (5, 17)), axis=-1)  # monotone
    for side in ("left", "right"):
        got_b, got_a = take_below_above(
            jnp.asarray(a), jnp.asarray(v), jnp.asarray(values), side
        )
        want_b, want_a = reference(a, v, values, side)
        np.testing.assert_allclose(np.asarray(got_b), want_b, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(got_a), want_a, rtol=1e-6)
        idx = searchsorted_batched(jnp.asarray(a), jnp.asarray(v), side)
        want_idx = np.stack([np.searchsorted(ai, vi, side=side) for ai, vi in zip(a, v)])
        np.testing.assert_array_equal(np.asarray(idx), want_idx)


def test_ties_and_out_of_range():
    a = np.array([[0.0, 0.5, 0.5, 0.5, 1.0]])
    values = np.array([[10.0, 20.0, 30.0, 40.0, 50.0]])
    v = np.array([[-1.0, 0.0, 0.5, 1.0, 2.0]])
    for side in ("left", "right"):
        got_b, got_a = take_below_above(
            jnp.asarray(a), jnp.asarray(v), jnp.asarray(values), side
        )
        want_b, want_a = reference(a, v, values, side)
        np.testing.assert_allclose(np.asarray(got_b), want_b)
        np.testing.assert_allclose(np.asarray(got_a), want_a)
