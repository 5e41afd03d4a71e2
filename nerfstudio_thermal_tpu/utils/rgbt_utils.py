"""RGBT packing utilities.

Behavioral spec: reference `nerfstudio/utils/rgbt_utils.py:6-51` — pack a
per-ray 3-channel GT batch into 4-channel RGBT using is_thermal: RGB channels
zeroed on thermal pixels, channel 3 takes channel 0 of thermal pixels.
"""

import jax
import jax.numpy as jnp


def rgb_to_rgbt_image(image: jax.Array, is_thermal: jax.Array) -> jax.Array:
    """[..., 3] + is_thermal [...] -> [..., 4]."""
    is_rgb = (1.0 - is_thermal)[..., None]
    rgb = image[..., :3] * is_rgb
    t = (image[..., 0] * is_thermal)[..., None]
    return jnp.concatenate([rgb, t], axis=-1)


def align_gt_with_pred_rgbt(
    gt_rgbt: jax.Array, pred_rgbt: jax.Array, is_thermal: jax.Array
) -> jax.Array:
    """Replace the 'missing' modality of GT with predictions so its loss term
    is zero (reference rgbt_utils.py:35-51; unused by the model but part of
    the public surface)."""
    is_rgb = (1.0 - is_thermal)[..., None]
    is_t = is_thermal[..., None]
    rgb = gt_rgbt[..., :3] * is_rgb + pred_rgbt[..., :3] * is_t
    t = gt_rgbt[..., 3:] * is_t + pred_rgbt[..., 3:] * is_rgb
    return jnp.concatenate([rgb, t], axis=-1)
