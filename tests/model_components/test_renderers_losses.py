import numpy as np
import jax
import jax.numpy as jnp

from nerfstudio_thermal_tpu.cameras.rays import RayBundle, RaySamples
from nerfstudio_thermal_tpu.model_components import renderers
from nerfstudio_thermal_tpu.model_components.losses import (
    cross_channel_loss,
    distortion_loss,
    interlevel_loss,
    tv_density_loss,
    tv_pixel_loss,
)
from nerfstudio_thermal_tpu.model_components.ray_samplers import spaced_sample
from nerfstudio_thermal_tpu.utils.rgbt_utils import rgb_to_rgbt_image


def make_samples(R=3, S=6):
    rb = RayBundle(
        origins=jnp.zeros((R, 3)),
        directions=jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (R, 1)),
        pixel_area=jnp.ones((R, 1)),
        camera_indices=jnp.zeros((R, 1), jnp.int32),
        nears=jnp.full((R, 1), 1.0),
        fars=jnp.full((R, 1), 7.0),
    )
    return spaced_sample(rb, S, train=False)


def test_render_rgb_background_modes():
    rgb = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 4, 3)).astype(np.float32))
    w = jnp.full((2, 4, 1), 0.1)
    out_rand = renderers.render_rgb(rgb, w, "random")
    np.testing.assert_allclose(
        np.asarray(out_rand), np.asarray(jnp.sum(w * rgb, -2)), rtol=1e-6
    )
    out_last = np.asarray(renderers.render_rgb(rgb, w, "last_sample"))
    acc = 0.4
    expected = np.asarray(jnp.sum(w * rgb, -2)) + np.asarray(rgb)[:, -1] * (1 - acc)
    np.testing.assert_allclose(out_last, expected, rtol=1e-5)
    out_white = np.asarray(renderers.render_rgb(rgb, w, "white"))
    expected_w = np.asarray(jnp.sum(w * rgb, -2)) + 1.0 * (1 - acc)
    np.testing.assert_allclose(out_white, expected_w, rtol=1e-5)


def test_median_and_expected_depth():
    rs = make_samples(R=1, S=6)
    w = np.zeros((1, 6, 1), np.float32)
    w[0, 3] = 1.0  # all mass at sample 3
    med = float(renderers.render_depth_median(jnp.asarray(w), rs)[0, 0])
    exp = float(renderers.render_depth_expected(jnp.asarray(w), rs)[0, 0])
    steps = np.asarray((rs.starts + rs.ends) / 2)[0, :, 0]
    np.testing.assert_allclose(med, steps[3], rtol=1e-5)
    np.testing.assert_allclose(exp, steps[3], rtol=1e-4)


def test_rgbt_packing_and_blending():
    img = jnp.asarray([[0.2, 0.4, 0.6], [0.9, 0.1, 0.3]])
    is_thermal = jnp.asarray([0.0, 1.0])
    rgbt = np.asarray(rgb_to_rgbt_image(img, is_thermal))
    np.testing.assert_allclose(rgbt[0], [0.2, 0.4, 0.6, 0.0], atol=1e-7)
    np.testing.assert_allclose(rgbt[1], [0.0, 0.0, 0.0, 0.9], atol=1e-7)

    pred = jnp.asarray(np.random.default_rng(1).uniform(size=(2, 4)).astype(np.float32))
    acc = jnp.ones((2, 1))
    p, g = renderers.blend_background_for_loss_rgbt(
        pred, acc, img, is_thermal, background_color="last_sample"
    )
    np.testing.assert_allclose(np.asarray(p), np.asarray(pred))
    np.testing.assert_allclose(np.asarray(g), rgbt, atol=1e-7)


def test_interlevel_loss_zero_when_envelope_covers():
    rs = make_samples(R=2, S=8)
    w_fine = jnp.asarray(np.random.default_rng(2).uniform(0, 0.1, (2, 8, 1)).astype(np.float32))
    # proposal with full mass everywhere (same bins) upper-bounds everything
    w_prop = jnp.ones((2, 8, 1), jnp.float32)
    loss = float(interlevel_loss([w_prop, w_fine], [rs, rs]))
    assert loss < 1e-6

    # proposal with zero mass violates the bound
    w_prop0 = jnp.zeros((2, 8, 1), jnp.float32)
    loss0 = float(interlevel_loss([w_prop0, w_fine], [rs, rs]))
    assert loss0 > 1e-4


def test_distortion_loss_smaller_for_concentrated_weights():
    rs = make_samples(R=1, S=8)
    w_spread = jnp.full((1, 8, 1), 0.125)
    w_conc = np.zeros((1, 8, 1), np.float32)
    w_conc[0, 4] = 1.0
    l_spread = float(distortion_loss([w_spread], [rs]))
    l_conc = float(distortion_loss([jnp.asarray(w_conc)], [rs]))
    assert l_conc < l_spread


def test_tv_density_loss():
    base = np.array([[1.0], [2.0]], np.float32)
    neighbors = np.concatenate([base + 0.5] * 6, axis=0)
    dens = jnp.asarray(np.concatenate([base, neighbors], axis=0))
    loss = float(tv_density_loss(dens, num_samples=2))
    np.testing.assert_allclose(loss, 0.5, atol=1e-6)


def test_tv_pixel_loss_masks_thermal_patches():
    # 2 patches: first RGB (constant -> tv 0), second thermal (ignored)
    pred = jnp.asarray([[0.5], [0.5], [0.5], [0.5], [0.1], [0.9], [0.1], [0.9]])
    is_thermal = jnp.asarray([0.0] * 4 + [1.0] * 4)
    loss = float(tv_pixel_loss(pred, is_thermal))
    np.testing.assert_allclose(loss, 0.0, atol=1e-7)

    # flip: rgb patch has variation now
    pred2 = jnp.asarray([[0.0], [1.0], [0.0], [1.0], [0.1], [0.9], [0.1], [0.9]])
    loss2 = float(tv_pixel_loss(pred2, is_thermal))
    # patch diffs: |0-1|+|0-0|+|1-1|+|0-1| = 2 ; mean over 1 patch /4
    np.testing.assert_allclose(loss2, 2.0 / 4.0, atol=1e-6)


def test_cross_channel_loss_zero_when_gradients_match():
    # thermal prediction == grayscale gt on the RGB patch -> zero loss
    vals = np.array([0.1, 0.4, 0.7, 0.9], np.float32)
    pred = jnp.asarray(vals[:, None])
    gt_rgb = jnp.asarray(np.stack([vals] * 3, -1))
    is_thermal = jnp.zeros(4)
    loss = float(cross_channel_loss(pred, gt_rgb, is_thermal))
    np.testing.assert_allclose(loss, 0.0, atol=1e-6)

    # mismatched gradients -> positive
    pred2 = jnp.asarray((vals[::-1]).copy()[:, None])
    loss2 = float(cross_channel_loss(pred2, gt_rgb, is_thermal))
    assert loss2 > 1e-3
