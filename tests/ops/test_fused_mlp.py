"""Fused-MLP Pallas kernel vs plain XLA reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfstudio_thermal_tpu.ops.pallas.fused_mlp import fused_mlp


def make_params(key, dims):
    ws, bs = [], []
    for i in range(len(dims) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        ws.append(jax.random.normal(k1, (dims[i], dims[i + 1])) * 0.3)
        bs.append(jax.random.normal(k2, (dims[i + 1],)) * 0.1)
    return tuple(ws), tuple(bs)


def ref_mlp(x, ws, bs, out_activation=None):
    h = x
    for i, (w, b) in enumerate(zip(ws, bs)):
        h = h @ w + b
        if i < len(ws) - 1:
            h = jnp.maximum(h, 0.0)
    if out_activation == "sigmoid":
        h = jax.nn.sigmoid(h)
    return h


@pytest.mark.parametrize("out_act", [None, "sigmoid"])
def test_fused_mlp_forward_matches(out_act):
    dims = (16, 32, 32, 8)
    ws, bs = make_params(jax.random.PRNGKey(0), dims)
    x = jax.random.normal(jax.random.PRNGKey(1), (100, 16))  # non-multiple of block
    got = fused_mlp(x, ws, bs, "relu", out_act, 32, True)
    want = ref_mlp(x, ws, bs, out_act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_mlp_gradients_match():
    dims = (8, 16, 16, 4)
    ws, bs = make_params(jax.random.PRNGKey(2), dims)
    x = jax.random.normal(jax.random.PRNGKey(3), (64, 8))
    tgt = jax.random.normal(jax.random.PRNGKey(4), (64, 4))

    def loss_fused(x, ws, bs):
        return jnp.mean((fused_mlp(x, ws, bs, "relu", None, 32, True) - tgt) ** 2)

    def loss_ref(x, ws, bs):
        return jnp.mean((ref_mlp(x, ws, bs) - tgt) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, ws, bs)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, ws, bs)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_fused_mlp_sigmoid_gradients():
    dims = (8, 16, 3)
    ws, bs = make_params(jax.random.PRNGKey(5), dims)
    x = jax.random.normal(jax.random.PRNGKey(6), (32, 8))

    def loss_fused(ws):
        return jnp.sum(fused_mlp(x, ws, bs, "relu", "sigmoid", 32, True) ** 2)

    def loss_ref(ws):
        return jnp.sum(ref_mlp(x, ws, bs, "sigmoid") ** 2)

    g1 = jax.grad(loss_fused)(ws)
    g2 = jax.grad(loss_ref)(ws)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_fused_mlp_skip_connections():
    dims = (8, 16, 16, 16, 4)
    ws, bs = [], []
    key = jax.random.PRNGKey(7)
    for i in range(4):
        din = dims[i] + (dims[0] if i == 2 else 0)  # skip at layer 2
        key, k1, k2 = jax.random.split(key, 3)
        ws.append(jax.random.normal(k1, (din, dims[i + 1])) * 0.3)
        bs.append(jax.random.normal(k2, (dims[i + 1],)) * 0.1)
    ws, bs = tuple(ws), tuple(bs)
    x = jax.random.normal(jax.random.PRNGKey(8), (48, 8))

    def ref(x, ws, bs):
        h = x
        for i, (w, b) in enumerate(zip(ws, bs)):
            if i == 2:
                h = jnp.concatenate([x, h], axis=-1)
            h = h @ w + b
            if i < 3:
                h = jnp.maximum(h, 0.0)
        return h

    got = fused_mlp(x, ws, bs, "relu", None, 16, True, (2,))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref(x, ws, bs)), rtol=2e-5, atol=2e-5)

    def loss_f(x, ws, bs):
        return jnp.sum(fused_mlp(x, ws, bs, "relu", None, 16, True, (2,)) ** 2)

    def loss_r(x, ws, bs):
        return jnp.sum(ref(x, ws, bs) ** 2)

    g1 = jax.grad(loss_f, argnums=(0, 1, 2))(x, ws, bs)
    g2 = jax.grad(loss_r, argnums=(0, 1, 2))(x, ws, bs)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
