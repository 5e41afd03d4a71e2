"""Lie-group exponential maps for pose optimization.

Behavioral spec: reference `nerfstudio/cameras/lie_groups.py:24-116`
(tangent vector = [translation(3), so(3)/se(3) rotation(3)] -> [R|t] 3x4).
"""

import jax.numpy as jnp


def _skew(v):
    """[..., 3] -> [..., 3, 3] skew-symmetric matrices."""
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def exp_map_SO3xR3(tangent_vector):
    """Exp map of SO(3) x R^3: rotation via Rodrigues, translation verbatim.

    tangent_vector: [..., 6] -> [..., 3, 4].
    """
    log_rot = tangent_vector[..., 3:]
    nrms = jnp.sum(log_rot * log_rot, axis=-1)
    rot_angles = jnp.sqrt(jnp.clip(nrms, 1e-4, None))
    inv = 1.0 / rot_angles
    fac1 = inv * jnp.sin(rot_angles)
    fac2 = inv * inv * (1.0 - jnp.cos(rot_angles))
    skews = _skew(log_rot)
    skews_sq = skews @ skews
    eye = jnp.eye(3, dtype=tangent_vector.dtype)
    rot = fac1[..., None, None] * skews + fac2[..., None, None] * skews_sq + eye
    return jnp.concatenate([rot, tangent_vector[..., :3, None]], axis=-1)


def exp_map_SE3(tangent_vector):
    """Exp map se(3) -> SE(3). tangent_vector: [..., 6] -> [..., 3, 4]."""
    lin = tangent_vector[..., :3]
    ang = tangent_vector[..., 3:]

    theta2 = jnp.sum(ang * ang, axis=-1)
    theta = jnp.sqrt(jnp.clip(theta2, 1e-30, None))
    near_zero = theta < 1e-2
    theta_nz = jnp.where(near_zero, 1.0, theta)
    theta2_nz = jnp.where(near_zero, 1.0, theta2)
    theta3_nz = theta_nz * theta2_nz

    sine = jnp.sin(theta)
    cosine = jnp.where(near_zero, 8.0 / (4.0 + theta2) - 1.0, jnp.cos(theta))
    sine_by_theta = jnp.where(near_zero, 0.5 * cosine + 0.5, sine / theta_nz)
    one_minus_cos_by_t2 = jnp.where(
        near_zero, 0.5 * sine_by_theta, (1.0 - cosine) / theta2_nz
    )

    outer = ang[..., :, None] * ang[..., None, :]
    skews = _skew(ang)
    eye = jnp.eye(3, dtype=tangent_vector.dtype)
    rot = (
        one_minus_cos_by_t2[..., None, None] * outer
        + cosine[..., None, None] * eye
        + sine_by_theta[..., None, None] * skews
    )

    sbt_t = jnp.where(near_zero, 1.0 - theta2 / 6.0, sine_by_theta)
    omc_t = jnp.where(near_zero, 0.5 - theta2 / 24.0, one_minus_cos_by_t2)
    tms_t = jnp.where(near_zero, 1.0 / 6.0 - theta2 / 120.0, (theta - sine) / theta3_nz)

    cross = jnp.cross(ang, lin)
    ang_dot_lin = jnp.sum(ang * lin, axis=-1, keepdims=True)
    trans = sbt_t[..., None] * lin + omc_t[..., None] * cross + tms_t[..., None] * ang * ang_dot_lin
    return jnp.concatenate([rot, trans[..., :, None]], axis=-1)
