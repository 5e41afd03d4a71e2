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


@pytest.mark.parametrize("split_skip", [False, True])
@pytest.mark.parametrize("out_act", [None, "sigmoid"])
def test_fused_mlp_save_acts_matches_recompute(monkeypatch, out_act, split_skip):
    """NS_FMLP_SAVE_ACTS=1 streams the forward's hidden activations to the
    backward instead of recomputing them; NS_FMLP_SPLIT_SKIP=1 computes
    skip layers as two matmuls instead of a misaligned concat. Every
    combination must match the baseline path (grads + outputs), including
    skip connections and a batch that is not a multiple of the block
    size."""
    from nerfstudio_thermal_tpu.ops.pallas import fused_mlp as fm

    dims = (8, 16, 16, 16, 4)
    ws, bs = [], []
    key = jax.random.PRNGKey(11)
    for i in range(4):
        din = dims[i] + (dims[0] if i == 2 else 0)  # skip at layer 2
        key, k1, k2 = jax.random.split(key, 3)
        ws.append(jax.random.normal(k1, (din, dims[i + 1])) * 0.3)
        bs.append(jax.random.normal(k2, (dims[i + 1],)) * 0.1)
    ws, bs = tuple(ws), tuple(bs)
    x = jax.random.normal(jax.random.PRNGKey(12), (50, 8))

    def loss(x, ws, bs):
        return jnp.sum(
            fused_mlp(x, ws, bs, "relu", out_act, 16, True, (2,)) ** 2
        )

    monkeypatch.setattr(fm, "_SAVE_ACTS", lambda: False)
    monkeypatch.setattr(fm, "_SPLIT_SKIP", lambda: False)
    base = jax.grad(loss, argnums=(0, 1, 2))(x, ws, bs)
    out_base = fused_mlp(x, ws, bs, "relu", out_act, 16, True, (2,))
    monkeypatch.setattr(fm, "_SAVE_ACTS", lambda: True)
    monkeypatch.setattr(fm, "_SPLIT_SKIP", lambda: split_skip)
    saved = jax.grad(loss, argnums=(0, 1, 2))(x, ws, bs)
    out_saved = fused_mlp(x, ws, bs, "relu", out_act, 16, True, (2,))
    np.testing.assert_allclose(
        np.asarray(out_saved), np.asarray(out_base), rtol=1e-5, atol=1e-6
    )
    for a, b in zip(jax.tree.leaves(saved), jax.tree.leaves(base)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_fused_mlp_split_skip_recompute_path(monkeypatch):
    """Split-skip with the default recompute backward (no save-acts)."""
    from nerfstudio_thermal_tpu.ops.pallas import fused_mlp as fm

    dims = (8, 16, 16, 16, 4)
    ws, bs = [], []
    key = jax.random.PRNGKey(21)
    for i in range(4):
        din = dims[i] + (dims[0] if i == 2 else 0)
        key, k1, k2 = jax.random.split(key, 3)
        ws.append(jax.random.normal(k1, (din, dims[i + 1])) * 0.3)
        bs.append(jax.random.normal(k2, (dims[i + 1],)) * 0.1)
    ws, bs = tuple(ws), tuple(bs)
    x = jax.random.normal(jax.random.PRNGKey(22), (50, 8))

    def loss(x, ws, bs):
        return jnp.sum(fused_mlp(x, ws, bs, "relu", None, 16, True, (2,)) ** 2)

    monkeypatch.setattr(fm, "_SPLIT_SKIP", lambda: False)
    base = jax.grad(loss, argnums=(0, 1, 2))(x, ws, bs)
    monkeypatch.setattr(fm, "_SPLIT_SKIP", lambda: True)
    got = jax.grad(loss, argnums=(0, 1, 2))(x, ws, bs)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(base)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_fused_mlp_save_acts_with_freq_encoding(monkeypatch):
    """Save-acts path with the in-kernel NeRF frequency encoding: dx must
    flow through the recomputed encoding exactly as in recompute mode."""
    from nerfstudio_thermal_tpu.ops.pallas import fused_mlp as fm

    enc = (4, 0.0, 3.0, True)  # num_freqs, min_exp, max_exp, include_input
    in_dim, enc_dim = 3, 3 * 2 * 4 + 3
    dims = (enc_dim, 32, 32, 8)
    ws, bs = [], []
    key = jax.random.PRNGKey(13)
    for i in range(3):
        din = dims[i] + (enc_dim if i == 2 else 0)  # skip at layer 2
        key, k1, k2 = jax.random.split(key, 3)
        ws.append(jax.random.normal(k1, (din, dims[i + 1])) * 0.3)
        bs.append(jax.random.normal(k2, (dims[i + 1],)) * 0.1)
    ws, bs = tuple(ws), tuple(bs)
    x = jax.random.normal(jax.random.PRNGKey(14), (40, in_dim))

    def loss(x, ws, bs):
        return jnp.sum(
            fused_mlp(x, ws, bs, "relu", None, 16, True, (2,), enc) ** 2
        )

    monkeypatch.setattr(fm, "_SAVE_ACTS", lambda: False)
    base = jax.grad(loss, argnums=(0, 1, 2))(x, ws, bs)
    monkeypatch.setattr(fm, "_SAVE_ACTS", lambda: True)
    saved = jax.grad(loss, argnums=(0, 1, 2))(x, ws, bs)
    for a, b in zip(jax.tree.leaves(saved), jax.tree.leaves(base)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


# ---------------------------------------------------------------------------
# fused_ray_mlp: positions + contraction + encoding + MLP in one kernel
# ---------------------------------------------------------------------------

from nerfstudio_thermal_tpu.ops.pallas.fused_mlp import fused_ray_mlp  # noqa: E402


def _ray_reference(origins, dirs, ts, ws, bs, num_samples, num_freqs, skips=()):
    """XLA composition the kernel must match: posgen -> inf-norm contraction
    -> (x+2)/4 -> selector zeroing -> NeRF freq encoding -> MLP. Mirrors
    fields/nerfacto_field._normalize_positions + ops/encodings.NeRFEncoding."""
    r = origins.shape[0]
    t = ts.reshape(r, num_samples, 1)
    pos = origins[:, None, :] + t * dirs[:, None, :]
    pos = pos.reshape(-1, 3)
    mag = jnp.max(jnp.abs(pos), axis=-1, keepdims=True)
    safe = jnp.maximum(mag, 1e-12)
    contracted = (2.0 - 1.0 / safe) * (pos / safe)
    cpos = jnp.where(mag < 1.0, pos, contracted)
    p01 = (cpos + 2.0) * 0.25
    sel = jnp.all((p01 > 0.0) & (p01 < 1.0), axis=-1, keepdims=True)
    x = p01 * sel
    # NeRF encoding (ops/encodings.NeRFEncoding semantics, include_input)
    exps = jnp.linspace(0.0, num_freqs - 1.0, num_freqs)
    freqs = 2.0 * jnp.pi * 2.0**exps
    pre = (x[..., None] * freqs).reshape(x.shape[0], 3 * num_freqs)
    enc = jnp.concatenate([jnp.sin(pre), jnp.cos(pre), x], axis=-1)
    h = enc
    for i, (w, b) in enumerate(zip(ws, bs)):
        if i in skips and i != 0:
            h = jnp.concatenate([enc, h], axis=-1)
        h = h @ w + b
        if i < len(ws) - 1:
            h = jnp.maximum(h, 0.0)
    return h, sel.astype(h.dtype)


def _make_rays(key, num_rays, num_samples):
    k1, k2, k3 = jax.random.split(key, 3)
    origins = jax.random.normal(k1, (num_rays, 3)) * 0.3
    dirs = jax.random.normal(k2, (num_rays, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    # spread samples from inside the unit ball to well past it (exercises
    # both contraction branches and the selector boundary)
    ts = jnp.abs(jax.random.uniform(k3, (num_rays * num_samples, 1))) * 6.0
    return origins, dirs, ts


def test_fused_ray_mlp_forward_matches():
    num_freqs, S = 4, 6
    enc_dim = 3 * num_freqs * 2 + 3
    dims = (enc_dim, 32, 32, 8)
    ws, bs = make_params(jax.random.PRNGKey(0), dims)
    origins, dirs, ts = _make_rays(jax.random.PRNGKey(1), 10, S)  # pads blk_r
    got = fused_ray_mlp(
        origins, dirs, ts, ws, bs, S, "relu", None, 4 * S, True, (),
        (num_freqs, 0.0, num_freqs - 1.0, True),
    )
    want_h, want_sel = _ray_reference(origins, dirs, ts, ws, bs, S, num_freqs)
    np.testing.assert_allclose(np.asarray(got[:, :-1]), np.asarray(want_h), rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(got[:, -1:]), np.asarray(want_sel), rtol=0, atol=0)


def test_fused_ray_mlp_gradients_match():
    num_freqs, S = 3, 4
    enc_dim = 3 * num_freqs * 2 + 3
    dims = (enc_dim, 16, 16, 4)
    skips = (1,)
    ws, bs = [], []
    key = jax.random.PRNGKey(2)
    for i in range(3):
        din = dims[i] + (enc_dim if i in skips and i != 0 else 0)
        key, k1, k2 = jax.random.split(key, 3)
        ws.append(jax.random.normal(k1, (din, dims[i + 1])) * 0.3)
        bs.append(jax.random.normal(k2, (dims[i + 1],)) * 0.1)
    ws, bs = tuple(ws), tuple(bs)
    origins, dirs, ts = _make_rays(jax.random.PRNGKey(3), 8, S)
    tgt = jax.random.normal(jax.random.PRNGKey(4), (8 * S, 4))

    def loss_fused(origins, dirs, ts, ws, bs):
        out = fused_ray_mlp(
            origins, dirs, ts, ws, bs, S, "relu", None, 4 * S, True, skips,
            (num_freqs, 0.0, num_freqs - 1.0, True),
        )
        return jnp.mean((out[:, :-1] - tgt) ** 2) + jnp.sum(out[:, -1]) * 0.1

    def loss_ref(origins, dirs, ts, ws, bs):
        h, sel = _ray_reference(origins, dirs, ts, ws, bs, S, num_freqs, skips)
        return jnp.mean((h - tgt) ** 2) + jnp.sum(sel) * 0.1

    v1 = loss_fused(origins, dirs, ts, ws, bs)
    v2 = loss_ref(origins, dirs, ts, ws, bs)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(origins, dirs, ts, ws, bs)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(origins, dirs, ts, ws, bs)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_fused_ray_mlp_no_input_grads():
    """need_input_grads=False: weight grads identical, input grads zero."""
    num_freqs, S = 3, 4
    enc_dim = 3 * num_freqs * 2 + 3
    dims = (enc_dim, 16, 1)
    ws, bs = make_params(jax.random.PRNGKey(5), dims)
    origins, dirs, ts = _make_rays(jax.random.PRNGKey(6), 8, S)
    fe = (num_freqs, 0.0, num_freqs - 1.0, True)

    def loss(o, d, t, ws, bs, nig):
        out = fused_ray_mlp(
            o, d, t, ws, bs, S, "relu", None, 4 * S, True, (), fe, None, nig
        )
        return jnp.sum(out[:, :-1] ** 2)

    g_full = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(origins, dirs, ts, ws, bs, True)
    g_skip = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(origins, dirs, ts, ws, bs, False)
    for a in jax.tree.leaves(g_skip[:3]):
        assert float(jnp.sum(jnp.abs(a))) == 0.0
    for a, b in zip(jax.tree.leaves(g_full[3:]), jax.tree.leaves(g_skip[3:])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


# ---------------------------------------------------------------------------
# fused_field_mlp: base MLP + SH + appearance + color head in one kernel
# ---------------------------------------------------------------------------

from nerfstudio_thermal_tpu.ops.pallas.fused_mlp import fused_field_mlp  # noqa: E402
from nerfstudio_thermal_tpu.ops.encodings import sh_encoding  # noqa: E402


def _field_reference(origins, dirs, ts, emb, bws, bbs, hws, hbs, S, nf, skips):
    """XLA composition: ray reference (base MLP, no out act) + SH + head."""
    h, sel = _ray_reference(origins, dirs, ts, bws, bbs, S, nf, skips)
    raw, geo = h[:, :1], h[:, 1:]
    sh = sh_encoding(dirs, levels=4)  # [R, 16]
    sh_rep = jnp.repeat(sh, S, axis=0)
    emb_rep = jnp.repeat(emb, S, axis=0)
    x = jnp.concatenate([sh_rep, geo, emb_rep], axis=-1)
    for i, (w, b) in enumerate(zip(hws, hbs)):
        x = x @ w + b
        if i < len(hws) - 1:
            x = jnp.maximum(x, 0.0)
    rgb = jax.nn.sigmoid(x)
    return rgb, raw, sel


def _field_setup(key, R, S, nf, geo, width, layers, emb_dim, C, skips):
    enc = 3 * nf * 2 + 3
    origins, dirs, ts = _make_rays(key, R, S)
    emb = jax.random.normal(jax.random.fold_in(key, 9), (R, emb_dim)) * 0.3
    bdims = [width] * (layers - 1) + [1 + geo]
    bws, bbs = [], []
    prev = enc
    for i, w in enumerate(bdims):
        din = prev + (enc if i in skips and i != 0 else 0)
        k = jax.random.fold_in(key, 100 + i)
        bws.append(jax.random.normal(k, (din, w)) * 0.25)
        bbs.append(jax.random.normal(jax.random.fold_in(k, 1), (w,)) * 0.05)
        prev = w
    hdims = [width, C]
    hws, hbs = [], []
    prev = 16 + geo + emb_dim
    for i, w in enumerate(hdims):
        k = jax.random.fold_in(key, 200 + i)
        hws.append(jax.random.normal(k, (prev, w)) * 0.25)
        hbs.append(jax.random.normal(jax.random.fold_in(k, 1), (w,)) * 0.05)
        prev = w
    return origins, dirs, ts, emb, tuple(bws), tuple(bbs), tuple(hws), tuple(hbs)


def test_fused_field_mlp_matches_composition():
    nf, S, C = 3, 4, 3
    skips = (1,)
    args = _field_setup(jax.random.PRNGKey(11), 9, S, nf, 7, 16, 3, 5, C, skips)
    origins, dirs, ts, emb, bws, bbs, hws, hbs = args
    fe = (nf, 0.0, nf - 1.0, True)

    out = fused_field_mlp(
        origins, dirs, ts, emb, bws, bbs, hws, hbs, S, 4 * S, True, skips, fe
    )
    rgb, raw, sel = _field_reference(
        origins, dirs, ts, emb, bws, bbs, hws, hbs, S, nf, skips
    )
    np.testing.assert_allclose(np.asarray(out[:, :C]), np.asarray(rgb), rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(out[:, C : C + 1]), np.asarray(raw), rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(out[:, C + 1 :]), np.asarray(sel), rtol=0, atol=0)

    tgt = jax.random.normal(jax.random.PRNGKey(12), (9 * S, C))

    def loss_fused(origins, dirs, ts, emb, bws, bbs, hws, hbs):
        o = fused_field_mlp(
            origins, dirs, ts, emb, bws, bbs, hws, hbs, S, 4 * S, True, skips, fe
        )
        return (
            jnp.mean((o[:, :C] - tgt) ** 2)
            + jnp.sum(jnp.tanh(o[:, C : C + 1])) * 0.01
        )

    def loss_ref(origins, dirs, ts, emb, bws, bbs, hws, hbs):
        rgb, raw, _ = _field_reference(
            origins, dirs, ts, emb, bws, bbs, hws, hbs, S, nf, skips
        )
        return jnp.mean((rgb - tgt) ** 2) + jnp.sum(jnp.tanh(raw)) * 0.01

    v1 = loss_fused(*args)
    v2 = loss_ref(*args)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
    an = tuple(range(8))
    g1 = jax.grad(loss_fused, argnums=an)(*args)
    g2 = jax.grad(loss_ref, argnums=an)(*args)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4, atol=2e-5)
