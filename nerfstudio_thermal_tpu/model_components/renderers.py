"""Volume-rendering compositors as pure functions.

Behavioral spec: reference `nerfstudio/model_components/renderers.py`
(`RGBRenderer:74-246`, `RGBTRenderer:248-425` — the fork's 4-channel
compositor with is_thermal-aware background blending, `AccumulationRenderer:482`,
`DepthRenderer:513-579` median+expected, `NormalsRenderer:622`).

Everything is a weighted sum over the sample axis -> XLA fuses these into the
field-eval program; no packed-ray path is needed because batches are dense
rectangles on TPU.
"""

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from nerfstudio_thermal_tpu.cameras.rays import RaySamples
from nerfstudio_thermal_tpu.model_components.ray_samplers import searchsorted_batched
from nerfstudio_thermal_tpu.utils.rgbt_utils import rgb_to_rgbt_image

BACKGROUND_COLORS = {
    "white": (1.0, 1.0, 1.0),
    "black": (0.0, 0.0, 0.0),
    "red": (1.0, 0.0, 0.0),
    "green": (0.0, 1.0, 0.0),
    "blue": (0.0, 0.0, 1.0),
}


def _bg_color_array(background_color: Union[str, jax.Array], num_channels: int):
    if isinstance(background_color, str):
        rgb = BACKGROUND_COLORS[background_color]
        # RGBT backgrounds have thermal channel 0 (reference utils/colors.py:36-47).
        vals = rgb + (0.0,) * (num_channels - 3) if num_channels >= 3 else rgb[:num_channels]
        return jnp.asarray(vals)
    return background_color


def combine_rgb(
    rgb: jax.Array,  # [..., S, C]
    weights: jax.Array,  # [..., S, 1]
    background_color: Union[str, jax.Array] = "random",
) -> jax.Array:
    """Composite samples; 'random' means no blending here (as-if black)
    (reference renderers.py:87-135, identical math for RGBT :259-306)."""
    comp = jnp.sum(weights * rgb, axis=-2)
    acc = jnp.sum(weights, axis=-2)
    if isinstance(background_color, str) and background_color == "random":
        return comp
    if isinstance(background_color, str) and background_color == "last_sample":
        bg = rgb[..., -1, :]
    else:
        bg = _bg_color_array(background_color, rgb.shape[-1])
    return comp + bg * (1.0 - acc)


def render_rgb(
    rgb: jax.Array,
    weights: jax.Array,
    background_color: Union[str, jax.Array] = "random",
    train: bool = True,
) -> jax.Array:
    """RGB (or any-channel) renderer forward (reference renderers.py:219-246)."""
    if not train:
        rgb = jnp.nan_to_num(rgb)
    out = combine_rgb(rgb, weights, background_color)
    if not train:
        out = jnp.clip(out, 0.0, 1.0)
    return out


def render_accumulation(weights: jax.Array) -> jax.Array:
    return jnp.sum(weights, axis=-2)


def render_depth_median(weights: jax.Array, ray_samples: RaySamples) -> jax.Array:
    """Median depth: distance where cumulative weight crosses 0.5
    (reference renderers.py:544-553). steps are sorted along the ray, so the
    index lookup is a gather-free masked min (take_below_above)."""
    from nerfstudio_thermal_tpu.model_components.ray_samplers import take_below_above
    from nerfstudio_thermal_tpu.utils.math import cumsum_mxu

    steps = (ray_samples.starts + ray_samples.ends) / 2.0  # [..., S, 1]
    cumulative = cumsum_mxu(weights[..., 0], axis=-1)  # [..., S]
    split = jnp.full((*weights.shape[:-2], 1), 0.5)
    _, median_depth = take_below_above(cumulative, split, steps[..., 0], side="left")
    return median_depth


def render_depth_expected(weights: jax.Array, ray_samples: RaySamples) -> jax.Array:
    """Expected depth (reference renderers.py:554-576)."""
    eps = 1e-10
    steps = (ray_samples.starts + ray_samples.ends) / 2.0
    depth = jnp.sum(weights * steps, axis=-2) / (jnp.sum(weights, axis=-2) + eps)
    return jnp.clip(depth, jnp.min(steps), jnp.max(steps))


def render_normals(normals: jax.Array, weights: jax.Array, normalize: bool = True) -> jax.Array:
    """Weighted normals (reference renderers.py:622-641). Normalization must
    be NaN-safe in the BACKWARD at zero vectors (all-background rays have
    zero weight sums; norm's 0/0 VJP would poison the whole gradient)."""
    from nerfstudio_thermal_tpu.utils.math import safe_normalize

    n = jnp.sum(weights * normals, axis=-2)
    if normalize:
        n = safe_normalize(n)
    return n


def render_uncertainty(betas: jax.Array, weights: jax.Array) -> jax.Array:
    return jnp.sum(weights * betas, axis=-2)


# ---------------------------------------------------------------------------
# Background blending for GT images / loss computation
# ---------------------------------------------------------------------------


def blend_background_rgb(
    image: jax.Array,
    background_color: Union[str, jax.Array] = "black",
) -> jax.Array:
    """Blend background into an RGBA GT image; pass through if RGB
    (reference renderers.py:162-189)."""
    if image.shape[-1] < 4:
        return image
    rgb, opacity = image[..., :3], image[..., 3:]
    if isinstance(background_color, str) and background_color in ("last_sample", "random"):
        background_color = "black"
    bg = _bg_color_array(background_color, 3)
    return rgb * opacity + bg * (1.0 - opacity)


def blend_background_for_loss_rgb(
    pred_image: jax.Array,
    pred_accumulation: jax.Array,
    gt_image: jax.Array,
    background_color: Union[str, jax.Array] = "last_sample",
    rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """(pred, gt) adjusted for the background mode
    (reference renderers.py:191-217)."""
    if isinstance(background_color, str) and background_color == "last_sample":
        background_color = "black"
    elif isinstance(background_color, str) and background_color == "random":
        assert rng is not None
        background_color = jax.random.uniform(rng, pred_image.shape)
        pred_image = pred_image + background_color * (1.0 - pred_accumulation)
    gt_image = blend_background_rgb(gt_image, background_color)
    return pred_image, gt_image


def blend_background_rgbt(
    image: jax.Array,
    is_thermal: jax.Array,
    background_color: Union[str, jax.Array] = "black",
) -> jax.Array:
    """Convert a 3-channel GT batch into RGBT using is_thermal, blending the
    background when the image is RGBA (reference renderers.py:336-365)."""
    if image.shape[-1] < 4:
        return rgb_to_rgbt_image(image, is_thermal)
    opacity = image[..., 3:]
    rgbt = rgb_to_rgbt_image(image, is_thermal)
    if isinstance(background_color, str) and background_color in ("last_sample", "random"):
        background_color = "black"
    bg = _bg_color_array(background_color, 4)
    return rgbt * opacity + bg * (1.0 - opacity)


def blend_background_for_loss_rgbt(
    pred_image: jax.Array,  # [..., 4]
    pred_accumulation: jax.Array,  # [..., 1]
    gt_image: jax.Array,  # [..., 3] or [..., 4(RGBA)]
    is_thermal: jax.Array,  # [...]
    background_color: Union[str, jax.Array] = "last_sample",
    rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """(pred RGBT, gt RGBT) for loss computation (reference renderers.py:367-392)."""
    if isinstance(background_color, str) and background_color == "last_sample":
        background_color = "black"
    elif isinstance(background_color, str) and background_color == "random":
        assert rng is not None
        background_color = jax.random.uniform(rng, pred_image.shape)
        pred_image = pred_image + background_color * (1.0 - pred_accumulation)
    gt_image = blend_background_rgbt(gt_image, is_thermal, background_color)
    return pred_image, gt_image
