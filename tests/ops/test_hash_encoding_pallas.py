"""Pallas hash-grid kernel vs the XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfstudio_thermal_tpu.ops.encodings import hash_encode, hash_grid_scalings
from nerfstudio_thermal_tpu.ops.pallas.hash_encoding import (
    PALLAS_MAX_TABLE_SIZE,
    hash_encode_pallas,
)


def _setup(num_levels=4, log2_table=10, n=100, features=2, seed=0):
    table_size = 2**log2_table
    rng = np.random.default_rng(seed)
    table = jnp.asarray(
        rng.normal(size=(num_levels * table_size, features)).astype(np.float32) * 1e-2
    )
    positions = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    scalings = jnp.asarray(hash_grid_scalings(num_levels, 4, 64))
    return table, positions, scalings, table_size


def test_forward_matches_xla():
    table, positions, scalings, table_size = _setup()
    ref = hash_encode(table, positions, scalings, table_size, jnp.float32)
    out = hash_encode_pallas(table, positions, scalings, table_size, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6, rtol=1e-5)


def test_forward_batched_shape_and_bf16():
    table, positions, scalings, table_size = _setup(n=60)
    positions = positions.reshape(5, 12, 3)
    out = hash_encode_pallas(table, positions, scalings, table_size, jnp.bfloat16)
    ref = hash_encode(table, positions, scalings, table_size, jnp.bfloat16)
    assert out.shape == ref.shape == (5, 12, scalings.shape[0] * 2)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=1e-2
    )


def test_gradients_match_xla():
    table, positions, scalings, table_size = _setup(n=64)

    def loss_pallas(tb, p):
        out = hash_encode_pallas(tb, p, scalings, table_size, jnp.float32)
        return jnp.sum(jnp.sin(out * 50.0))

    def loss_xla(tb, p):
        out = hash_encode(tb, p, scalings, table_size, jnp.float32)
        return jnp.sum(jnp.sin(out * 50.0))

    gt_p, gp_p = jax.grad(loss_pallas, argnums=(0, 1))(table, positions)
    gt_x, gp_x = jax.grad(loss_xla, argnums=(0, 1))(table, positions)
    np.testing.assert_allclose(np.asarray(gt_p), np.asarray(gt_x), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gp_p), np.asarray(gp_x), atol=1e-3, rtol=1e-3)


def test_large_table_falls_back_to_xla():
    table, positions, scalings, table_size = _setup(
        num_levels=2, log2_table=int(np.log2(PALLAS_MAX_TABLE_SIZE)) + 1, n=16
    )
    out = hash_encode_pallas(table, positions, scalings, table_size, jnp.float32)
    ref = hash_encode(table, positions, scalings, table_size, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    g = jax.grad(
        lambda tb: jnp.sum(
            hash_encode_pallas(tb, positions, scalings, table_size, jnp.float32) ** 2
        )
    )(table)
    assert np.isfinite(np.asarray(g)).all()


def test_unpadded_tail():
    # n not a multiple of the point tile exercises the padding path.
    table, positions, scalings, table_size = _setup(n=301)
    ref = hash_encode(table, positions, scalings, table_size, jnp.float32)
    out = hash_encode_pallas(table, positions, scalings, table_size, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6, rtol=1e-5)


def test_module_use_pallas_flag():
    from nerfstudio_thermal_tpu.ops.encodings import HashEncoding

    enc = HashEncoding(
        num_levels=3, min_res=4, max_res=32, log2_hashmap_size=10, use_pallas=True
    )
    positions = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (40, 3)).astype(np.float32)
    )
    params = enc.init(jax.random.PRNGKey(0), positions)
    out = enc.apply(params, positions)
    ref_enc = HashEncoding(
        num_levels=3, min_res=4, max_res=32, log2_hashmap_size=10, use_pallas=False
    )
    ref = ref_enc.apply(params, positions)
    assert out.shape == (40, 6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
