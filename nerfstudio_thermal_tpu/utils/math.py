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
    """Unit-normalize with a finite gradient at v == 0 (double-where: the
    norm's 0/0 gradient would otherwise poison autodiff even under a
    maximum() clamp — 0 * NaN = NaN in the VJP)."""
    s = jnp.sum(v * v, axis=-1, keepdims=True)
    safe = s > eps * eps
    nrm = jnp.sqrt(jnp.where(safe, s, 1.0))
    return jnp.where(safe, v / nrm, v)


def safe_norm(x: jax.Array, axis=-1) -> jax.Array:
    """L2 norm with a zero (not NaN) gradient at x == 0, matching torch's
    subgradient convention (double-where pattern)."""
    s = jnp.sum(x * x, axis=axis)
    nonzero = s > 0
    return jnp.where(nonzero, jnp.sqrt(jnp.where(nonzero, s, 1.0)), 0.0)


# ---------------------------------------------------------------------------
# Conical-frustum gaussians (MipNeRF IPE; reference utils/math.py:108-200)
# ---------------------------------------------------------------------------


def conical_frustum_to_gaussian_diag(origins, directions, starts, ends, radius):
    """Gaussian approximation of a conical frustum; returns (means [..., 3],
    cov_diag [..., 3]) — the diagonal is all the integrated positional
    encoding needs (reference math.py:161-187 + NeRFEncoding covs usage)."""
    mu = (starts + ends) / 2.0
    hw = (ends - starts) / 2.0
    means = origins + directions * (
        mu + (2.0 * mu * hw**2.0) / (3.0 * mu**2.0 + hw**2.0)
    )
    dir_variance = (hw**2) / 3 - (4 / 15) * (
        (hw**4 * (12 * mu**2 - hw**2)) / (3 * mu**2 + hw**2) ** 2
    )
    radius_variance = radius**2 * (
        (mu**2) / 4 + (5 / 12) * hw**2 - 4 / 15 * (hw**4) / (3 * mu**2 + hw**2)
    )
    # diag(cov) = dir_var * d_i^2 + radius_var * (1 - d_i^2 / |d|^2)
    d_sq = directions**2
    d_mag_sq = jnp.maximum(jnp.sum(d_sq, axis=-1, keepdims=True), 1e-10)
    cov_diag = dir_variance * d_sq + radius_variance * (1.0 - d_sq / d_mag_sq)
    return means, cov_diag


def expected_sin(x_means, x_vars):
    """E[sin(y)], y ~ N(x_means, x_vars) (reference math.py:190-200)."""
    return jnp.exp(-0.5 * x_vars) * jnp.sin(x_means)
