"""Tile-binned rasterizer vs the scan rasterizer (the numerical oracle).

The scan path (models/splatfacto.py:rasterize) evaluates every gaussian at
every pixel; the tile path must reproduce it exactly (up to summation
order) whenever no tile overflows capacity and the candidate window covers
every gaussian's support — the fixture is sized so both hold."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfstudio_thermal_tpu.models.splatfacto import rasterize
from nerfstudio_thermal_tpu.ops.splat_tiles import bin_gaussians, rasterize_tiles

H, W = 40, 56  # non-multiples of the 16-px tile: exercises edge cropping


def _scene(n=160, seed=0, radius_px=5.0):
    r = np.random.default_rng(seed)
    xys = jnp.asarray(
        r.uniform([-4, -4], [W + 4, H + 4], (n, 2)).astype(np.float32)
    )
    depths = jnp.asarray(r.uniform(0.5, 5.0, n).astype(np.float32))
    # isotropic-ish conics with sigma ~ radius/3
    sig = r.uniform(0.8, radius_px / 3.0, n).astype(np.float32)
    conic = np.zeros((n, 3), np.float32)
    conic[:, 0] = 1.0 / sig**2
    conic[:, 2] = 1.0 / sig**2
    conic[:, 1] = r.uniform(-0.2, 0.2, n) / sig**2
    radii = jnp.asarray(np.ceil(3.0 * sig))
    opac = jnp.asarray(r.uniform(0.05, 1.0, n).astype(np.float32))
    colors = jnp.asarray(r.uniform(0, 1, (n, 3)).astype(np.float32))
    alive = jnp.asarray(r.uniform(0, 1, n) > 0.1)
    bg = jnp.asarray(np.array([0.2, 0.4, 0.6], np.float32))
    return xys, depths, jnp.asarray(conic), radii, opac, colors, alive, bg


TILE_KW = dict(tile_h=16, tile_w=16, capacity=192, window=4, tiles_per_step=4)


def test_forward_matches_scan():
    args = _scene()
    rgb_s, acc_s, dep_s = rasterize(*args[:7], H, W, args[7], chunk=64)
    rgb_t, acc_t, dep_t = rasterize_tiles(*args[:7], H, W, args[7], **TILE_KW)
    np.testing.assert_allclose(rgb_t, rgb_s, atol=2e-5)
    np.testing.assert_allclose(acc_t, acc_s, atol=2e-5)
    # depth is accum-normalized; ignore empty pixels where it is 0/eps
    m = np.asarray(acc_s[..., 0]) > 1e-3
    np.testing.assert_allclose(
        np.asarray(dep_t[..., 0])[m], np.asarray(dep_s[..., 0])[m], atol=1e-3
    )


def test_gradients_match_scan():
    args = _scene(n=80, seed=3)
    xys, depths, conics, radii, opac, colors, alive, bg = args
    wimg = jnp.asarray(
        np.random.default_rng(9).uniform(0, 1, (H, W, 3)).astype(np.float32)
    )

    def loss(fn, xys, opac, colors):
        rgb, acc, dep = fn(
            xys, depths, conics, radii, opac, colors, alive, H, W, bg
        )
        return jnp.sum(rgb * wimg) + 0.1 * jnp.sum(acc) + 0.01 * jnp.sum(
            jnp.where(acc > 1e-3, dep, 0.0)
        )

    scan_fn = lambda *a, **k: rasterize(*a, chunk=64, **k)
    tile_fn = lambda *a, **k: rasterize_tiles(*a, **TILE_KW, **k)
    g_s = jax.grad(lambda *p: loss(scan_fn, *p), argnums=(0, 1, 2))(
        xys, opac, colors
    )
    g_t = jax.grad(lambda *p: loss(tile_fn, *p), argnums=(0, 1, 2))(
        xys, opac, colors
    )
    for a, b, name in zip(g_s, g_t, ["xys", "opac", "colors"]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, err_msg=name
        )


def test_capacity_truncation_drops_farthest_only():
    """Over-full tiles keep the nearest K gaussians; with everything stacked
    on one tile, capacity=N reproduces the oracle and capacity<N equals the
    oracle run on the K nearest."""
    n = 24
    r = np.random.default_rng(5)
    xys = jnp.asarray(np.tile([[8.0, 8.0]], (n, 1)).astype(np.float32))
    depths = jnp.asarray(np.arange(1, n + 1, dtype=np.float32))
    conic = jnp.asarray(np.tile([[0.25, 0.0, 0.25]], (n, 1)).astype(np.float32))
    radii = jnp.full((n,), 6.0)
    opac = jnp.asarray(r.uniform(0.1, 0.5, n).astype(np.float32))
    colors = jnp.asarray(r.uniform(0, 1, (n, 3)).astype(np.float32))
    alive = jnp.ones((n,), bool)
    bg = jnp.zeros((3,))
    k = 10
    rgb_t, _, _ = rasterize_tiles(
        xys, depths, conic, radii, opac, colors, alive, 16, 16, bg,
        tile_h=16, tile_w=16, capacity=k, window=2, tiles_per_step=1,
    )
    rgb_ref, _, _ = rasterize(
        xys[:k], depths[:k], conic[:k], radii[:k], opac[:k], colors[:k],
        alive[:k], 16, 16, bg, chunk=8,
    )
    np.testing.assert_allclose(rgb_t, rgb_ref, atol=2e-5)


def test_binning_segments_are_depth_sorted():
    args = _scene(n=120, seed=7)
    xys, depths, _, radii, _, _, alive, _ = args
    valid = alive & (radii > 0)
    gauss_idx, slot_mask, order = bin_gaussians(
        xys, depths, radii, valid, H, W, 16, 16, capacity=64, window=4
    )
    deps_sorted = np.asarray(depths)[np.asarray(order)]
    gi = np.asarray(gauss_idx)
    sm = np.asarray(slot_mask)
    for t in range(gi.shape[0]):
        seg = deps_sorted[gi[t][sm[t]]]
        assert np.all(np.diff(seg) >= 0)
