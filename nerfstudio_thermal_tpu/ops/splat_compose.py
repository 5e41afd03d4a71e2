"""Memory-bounded alpha compositing for the scan splat rasterizer.

The naive `lax.scan` compositor (models/splatfacto.py rasterize) carries
(rgb, dep, trans) per pixel and computes a [P, C] alpha matrix per chunk;
autodiff of that scan stores the per-chunk [P, C] intermediates for EVERY
chunk — f32[n_chunks, H*W, chunk], 123 GB at 100k gaussians x 480x640 —
so real-resolution splatfacto training OOMs in the backward.

This module implements the role of gsplat's hand-written CUDA backward
(reference models/splatfacto.py:713-730 via gsplat `rasterize_gaussians`,
whose backward walks gaussians back-to-front reconstructing transmittance)
as a `jax.custom_vjp` with O(P) residual memory, TPU-style:

- **forward**: identical math to the naive scan (cumprod transmittance,
  MXU matmul color/depth accumulation); saves only the inputs.
- **backward pass 1**: a forward scan that recomputes per-chunk alphas and
  accumulates only the TOTAL log-transmittance  lT = sum log1p(-alpha)
  per pixel (carry [P], nothing stored per step).
- **backward pass 2**: a reverse scan over chunks carrying
  (lT_after [P], S [P]) where S is the running suffix
  sum_{j>g} w_j * (c_j . g_rgb + d_j * g_dep)  (+ T_final * g_trans).
  Each chunk recomputes its alphas, recovers its entry transmittance in
  log space (subtraction, never division — alpha is clamped <= 0.999 so
  log1p(-alpha) >= log(0.001) is always finite), and emits per-gaussian
  gradients via the analytic compositing rules
      d out / d color_g = w_g
      d out / d alpha_g = T_g * u_g - S_g / (1 - alpha_g)
  with the alpha -> (xy, conic, opacity) chain evaluated by `jax.vjp` of
  the (recomputed) per-chunk alpha function.

Gradients match `jax.grad` of the naive scan to fp32 accuracy (the
backward recomputes transmittance in log space while the forward uses
cumprod; both are exact to ~1e-6 relative at any alpha <= 0.999).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _chunk_alpha(pix, cxys, cconic, copa, crad):
    """Per-chunk alpha matrix [P, C]; identical math to the naive body."""
    d = pix[:, None, :] - cxys[None, :, :]  # [P, C, 2]
    power = -0.5 * (
        cconic[None, :, 0] * d[..., 0] ** 2
        + cconic[None, :, 2] * d[..., 1] ** 2
    ) - cconic[None, :, 1] * d[..., 0] * d[..., 1]
    alpha = jnp.minimum(0.999, copa[None, :] * jnp.exp(jnp.minimum(power, 0.0)))
    alpha = jnp.where((crad > 0)[None, :], alpha, 0.0)
    return jnp.where(alpha > 1.0 / 255.0, alpha, 0.0)


@jax.custom_vjp
def composite_chunks(pix, xys_c, conics_c, radii_c, opac_c, cols_c, deps_c):
    """Front-to-back composite of depth-sorted chunked gaussians.

    Args: pix [P, 2] pixel centers (iota grid — gets a zero cotangent);
    the rest are [n_chunks, C, ...]
    chunked, depth-sorted, padded gaussian attributes (pad rows must have
    radius 0 or opacity 0).
    Returns (rgb_raw [P, ch], dep_raw [P, 1], trans [P]): the UN-normalized
    color/depth sums and the final transmittance — background blending and
    depth normalization live in the caller.
    """
    out, _ = _composite_fwd(pix, xys_c, conics_c, radii_c, opac_c, cols_c, deps_c)
    return out


def _composite_fwd(pix, xys_c, conics_c, radii_c, opac_c, cols_c, deps_c):
    P = pix.shape[0]
    num_ch = cols_c.shape[-1]

    def body(carry, ch):
        rgb_acc, dep_acc, trans = carry
        cxys, cconic, crad, copa, ccol, cdep = ch
        alpha = _chunk_alpha(pix, cxys, cconic, copa, crad)
        one_minus = 1.0 - alpha  # [P, C]
        t_in = jnp.cumprod(
            jnp.concatenate([jnp.ones_like(one_minus[:, :1]), one_minus[:, :-1]], 1),
            axis=1,
        )
        w = trans[:, None] * t_in * alpha  # [P, C]
        rgb_acc = rgb_acc + w @ ccol
        dep_acc = dep_acc + w @ cdep[:, None]
        trans = trans * jnp.prod(one_minus, axis=1)
        return (rgb_acc, dep_acc, trans), None

    init = (
        jnp.zeros((P, num_ch), xys_c.dtype),
        jnp.zeros((P, 1), xys_c.dtype),
        jnp.ones((P,), xys_c.dtype),
    )
    chunks = (xys_c, conics_c, radii_c, opac_c, cols_c, deps_c)
    (rgb, dep, trans), _ = lax.scan(body, init, chunks)
    return (rgb, dep, trans), (pix, xys_c, conics_c, radii_c, opac_c, cols_c, deps_c)


def _composite_bwd(res, cotangents):
    pix, xys_c, conics_c, radii_c, opac_c, cols_c, deps_c = res
    g_rgb, g_dep, g_trans = cotangents
    P = pix.shape[0]

    # ---- pass 1: total log-transmittance per pixel (O(P) carry) ----
    def lt_body(lt, ch):
        cxys, cconic, crad, copa = ch
        alpha = _chunk_alpha(pix, cxys, cconic, copa, crad)
        return lt + jnp.sum(jnp.log1p(-alpha), axis=1), None

    lt_total, _ = lax.scan(
        lt_body, jnp.zeros((P,), xys_c.dtype),
        (xys_c, conics_c, radii_c, opac_c),
    )
    t_final = jnp.exp(lt_total)

    # ---- pass 2: reverse over chunks, carry (lT_after, suffix S) ----
    def rev_body(carry, ch):
        lt_after, s = carry
        cxys, cconic, crad, copa, ccol, cdep = ch

        def alpha_fn(cxys, cconic, copa):
            return _chunk_alpha(pix, cxys, cconic, copa, crad)

        alpha, alpha_vjp = jax.vjp(alpha_fn, cxys, cconic, copa)
        log1m = jnp.log1p(-alpha)  # [P, C]
        chunk_sum = jnp.sum(log1m, axis=1)
        lt_entry = lt_after - chunk_sum
        # in-chunk exclusive prefix -> entry transmittance of each gaussian
        t_g = jnp.exp(
            lt_entry[:, None]
            + jnp.cumsum(log1m, axis=1)
            - log1m
        )
        w = t_g * alpha  # [P, C]
        # u[p, c] = c_c . g_rgb[p] + d_c * g_dep[p]
        u = g_rgb @ ccol.T + g_dep * cdep[None, :]
        wu = w * u
        # suffix WITHIN the chunk: sum_{j > g} w_j u_j  (+ carried S)
        suffix = s[:, None] + (
            jnp.sum(wu, axis=1, keepdims=True) - jnp.cumsum(wu, axis=1)
        )
        g_alpha = t_g * u - suffix / (1.0 - alpha)
        # culled entries (alpha == 0) got suffix/(1-0) = suffix — but their
        # alpha_fn vjp zeroes it (the jnp.where cull); no masking needed.
        d_xys, d_conic, d_opa = alpha_vjp(g_alpha)
        d_col = w.T @ g_rgb  # [C, ch]
        d_dep = (w.T @ g_dep)[:, 0]  # [C]
        new_carry = (lt_entry, s + jnp.sum(wu, axis=1))
        return new_carry, (d_xys, d_conic, jnp.zeros_like(crad), d_opa, d_col, d_dep)

    chunks = (xys_c, conics_c, radii_c, opac_c, cols_c, deps_c)
    s0 = t_final * g_trans
    (_, _), grads = lax.scan(
        rev_body, (lt_total, s0), chunks, reverse=True
    )
    return (jnp.zeros_like(pix),) + grads


composite_chunks.defvjp(_composite_fwd, _composite_bwd)
