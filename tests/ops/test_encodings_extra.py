"""FF / RFF / polyhedron Fourier-feature encodings
(reference encodings.py:193-308, utils/math.py:366-520)."""

import jax.numpy as jnp
import numpy as np

from nerfstudio_thermal_tpu.ops.encodings import (
    make_polyhedron_ff_encoding,
    make_rff_encoding,
)
from nerfstudio_thermal_tpu.utils.math import generate_polyhedron_basis


def test_polyhedron_basis_shapes_and_unit_norm():
    b1 = generate_polyhedron_basis("octahedron", 1)
    b2 = generate_polyhedron_basis("icosahedron", 1)
    assert b1.shape[1] == 3 and b2.shape[1] == 3
    np.testing.assert_allclose(np.linalg.norm(b1, axis=1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(b2, axis=1), 1.0, rtol=1e-5)
    # tesselation adds basis vectors
    assert generate_polyhedron_basis("octahedron", 2).shape[0] > b1.shape[0]
    # symmetry removal: no vector is the negation of another
    d = b2 @ -b2.T
    assert not np.any(np.isclose(d, 1.0, atol=1e-4))


def test_ff_encoding_out_dim_and_ipe_shrinks():
    enc = make_polyhedron_ff_encoding(3, 0.0, 2.0, include_input=True)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (7, 3)).astype(np.float32))
    y = enc(x)
    assert y.shape == (7, enc.out_dim)
    covs = jnp.broadcast_to(0.05 * jnp.eye(3), (7, 3, 3))
    y_ipe = enc(x, covs)
    # integrated encoding shrinks magnitudes of the sinusoid part
    n_sin = enc.out_dim - 3
    assert np.all(
        np.abs(np.asarray(y_ipe[:, :n_sin]))
        <= np.abs(np.asarray(y[:, :n_sin])) + 1e-6
    )


def test_rff_encoding():
    enc = make_rff_encoding(3, 16, scale=2.0)
    x = jnp.zeros((4, 3))
    y = enc(x)
    assert y.shape == (4, 32)
    # sin(0)=0 and sin(pi/2)=1 halves
    np.testing.assert_allclose(np.asarray(y[:, :16]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y[:, 16:]), 1.0, atol=1e-6)
