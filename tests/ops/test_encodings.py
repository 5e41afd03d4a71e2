"""Unit tests for encodings against an independent int64 numpy spec of the
reference semantics (reference encodings.py:401-461, utils/math.py:29-106)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfstudio_thermal_tpu.ops.encodings import (
    HashEncoding,
    NeRFEncoding,
    hash_encode,
    hash_grid_scalings,
    sh_encoding,
    spatial_hash,
)


def spec_hash(coords_int64: np.ndarray, table_size: int) -> np.ndarray:
    """Ground-truth hash in int64 (how torch evaluates it, since the prime
    constant tensor defaults to int64)."""
    primes = np.array([1, 2654435761, 805459861], dtype=np.int64)
    v = coords_int64.astype(np.int64) * primes
    h = v[..., 0] ^ v[..., 1] ^ v[..., 2]
    return h % table_size


def spec_hash_encode(table, positions, scalings, table_size):
    """Independent numpy implementation of the reference trilinear hash
    lookup (encodings.py:420-461)."""
    pos = positions[..., None, :] * scalings[:, None]  # [..., L, 3]
    c = np.ceil(pos).astype(np.int64)
    f = np.floor(pos).astype(np.int64)
    o = pos - f
    L = scalings.shape[0]
    offsets = (np.arange(L) * table_size)[:, None]

    def feat(coords):
        idx = spec_hash(coords, table_size) + np.arange(L) * table_size
        return table[idx]

    f0 = feat(np.stack([c[..., 0], c[..., 1], c[..., 2]], -1))
    f1 = feat(np.stack([c[..., 0], f[..., 1], c[..., 2]], -1))
    f2 = feat(np.stack([f[..., 0], f[..., 1], c[..., 2]], -1))
    f3 = feat(np.stack([f[..., 0], c[..., 1], c[..., 2]], -1))
    f4 = feat(np.stack([c[..., 0], c[..., 1], f[..., 2]], -1))
    f5 = feat(np.stack([c[..., 0], f[..., 1], f[..., 2]], -1))
    f6 = feat(np.stack([f[..., 0], f[..., 1], f[..., 2]], -1))
    f7 = feat(np.stack([f[..., 0], c[..., 1], f[..., 2]], -1))

    ox, oy, oz = o[..., 0:1], o[..., 1:2], o[..., 2:3]
    f03 = f0 * ox + f3 * (1 - ox)
    f12 = f1 * ox + f2 * (1 - ox)
    f56 = f5 * ox + f6 * (1 - ox)
    f47 = f4 * ox + f7 * (1 - ox)
    f0312 = f03 * oy + f12 * (1 - oy)
    f4756 = f47 * oy + f56 * (1 - oy)
    out = f0312 * oz + f4756 * (1 - oz)
    return out.reshape(*positions.shape[:-1], -1)


def test_spatial_hash_matches_int64_spec():
    rng = np.random.default_rng(0)
    table_size = 2**15
    coords = rng.integers(0, 4096, size=(1000, 3)).astype(np.int32)
    got = np.asarray(spatial_hash(jnp.asarray(coords), table_size))
    want = spec_hash(coords, table_size)
    np.testing.assert_array_equal(got, want)


def test_hash_encode_matches_spec():
    rng = np.random.default_rng(1)
    table_size = 2**12
    L, F = 4, 2
    table = rng.normal(size=(L * table_size, F)).astype(np.float32)
    scalings = hash_grid_scalings(L, 16, 128)
    positions = rng.uniform(0, 1, size=(64, 3)).astype(np.float32)

    got = np.asarray(hash_encode(jnp.asarray(table), jnp.asarray(positions), jnp.asarray(scalings), table_size))
    want = spec_hash_encode(table, positions, scalings, table_size)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_hash_encode_gradients_flow_to_table():
    table_size = 2**10
    L, F = 2, 2
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (L * table_size, F))
    scalings = jnp.asarray(hash_grid_scalings(L, 4, 16))
    positions = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))

    def loss(t):
        return jnp.sum(hash_encode(t, positions, scalings, table_size) ** 2)

    g = jax.grad(loss)(table)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_hash_encoding_module_shapes():
    enc = HashEncoding(num_levels=4, min_res=4, max_res=32, log2_hashmap_size=10)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)))
    out = enc.apply(params, jax.random.uniform(jax.random.PRNGKey(1), (8, 3)))
    assert out.shape == (8, 8)
    t = params["params"]["hash_table"]
    assert t.shape == (4 * 1024, 2)
    assert np.abs(np.asarray(t)).max() <= 1e-3


def test_sh_encoding_matches_analytic():
    d = np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]], dtype=np.float32)
    out = np.asarray(sh_encoding(jnp.asarray(d), levels=4))
    assert out.shape == (2, 16)
    np.testing.assert_allclose(out[:, 0], 0.28209479177387814, rtol=1e-6)
    # l1: 0.4886 * (y, z, x)
    np.testing.assert_allclose(out[0, 1:4], [0.0, 0.4886025119029199, 0.0], atol=1e-7)
    np.testing.assert_allclose(out[1, 1:4], [0.0, 0.0, 0.4886025119029199], atol=1e-7)


def test_sh_levels_5_has_25_components():
    d = jnp.asarray(np.random.default_rng(2).normal(size=(5, 3)).astype(np.float32))
    assert sh_encoding(d, levels=5).shape == (5, 25)


def test_nerf_encoding():
    enc = NeRFEncoding(in_dim=3, num_frequencies=2, min_freq_exp=0.0, max_freq_exp=1.0)
    x = jnp.asarray(np.random.default_rng(3).uniform(size=(7, 3)).astype(np.float32))
    out = enc.apply({}, x) if False else enc(x)
    assert out.shape == (7, enc.out_dim)
    assert enc.out_dim == 12
    # First block is sin(2 pi x * f), second is cos.
    x0 = np.asarray(x)[0, 0]
    np.testing.assert_allclose(np.asarray(out)[0, 0], np.sin(2 * np.pi * x0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out)[0, 6], np.cos(2 * np.pi * x0), rtol=1e-5, atol=1e-6)
