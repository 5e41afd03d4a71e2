"""Math utilities (PSNR/SSIM and friends).

PSNR/SSIM replace the reference's torchmetrics dependency
(reference nerfacto.py:247-253); SSIM follows the standard Wang et al. 2004
formulation with an 11x11 Gaussian window, matching
torchmetrics.functional.structural_similarity_index_measure defaults.
"""

from typing import Optional

import jax
import jax.numpy as jnp


def psnr(pred: jax.Array, target: jax.Array, mask: Optional[jax.Array] = None):
    """Peak signal-to-noise ratio, data range 1.0. mask broadcasts over
    elements (masked PSNR = PSNR of the masked subset)."""
    se = (pred - target) ** 2
    if mask is None:
        mse = jnp.mean(se)
    else:
        mask = jnp.broadcast_to(mask, se.shape)
        mse = jnp.sum(se * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return g


def ssim(
    pred: jax.Array,  # [H, W, C] in [0, 1]
    target: jax.Array,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
):
    """Structural similarity over a full image (mean over pixels/channels)."""
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    kernel = _gaussian_kernel(kernel_size, sigma)

    def blur(img):
        # separable gaussian along H then W, per channel; 'valid' padding
        out = jnp.apply_along_axis(
            lambda a: jnp.convolve(a, kernel, mode="valid"), 0, img
        )
        out = jnp.apply_along_axis(
            lambda a: jnp.convolve(a, kernel, mode="valid"), 1, out
        )
        return out

    mu_x = blur(pred)
    mu_y = blur(target)
    mu_xx = blur(pred * pred)
    mu_yy = blur(target * target)
    mu_xy = blur(pred * target)

    sigma_x = mu_xx - mu_x**2
    sigma_y = mu_yy - mu_y**2
    sigma_xy = mu_xy - mu_x * mu_y

    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.mean(num / den)


def safe_normalize(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def safe_norm(x: jax.Array, axis=-1) -> jax.Array:
    """L2 norm with a zero (not NaN) gradient at x == 0, matching torch's
    subgradient convention (double-where pattern)."""
    s = jnp.sum(x * x, axis=axis)
    nonzero = s > 0
    return jnp.where(nonzero, jnp.sqrt(jnp.where(nonzero, s, 1.0)), 0.0)
