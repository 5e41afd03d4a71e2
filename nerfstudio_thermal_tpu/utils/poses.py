"""Pose (3x4 [R|t]) utilities.

Behavioral spec: reference `nerfstudio/utils/poses.py`.
"""

import jax.numpy as jnp


def to4x4(pose):
    """[..., 3, 4] -> [..., 4, 4] with bottom row (0,0,0,1)."""
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=pose.dtype), (*pose.shape[:-2], 1, 4)
    )
    return jnp.concatenate([pose, bottom], axis=-2)


def multiply(pose_a, pose_b):
    """Compose two [..., 3, 4] poses: returns pose_a @ pose_b (as 3x4)."""
    return (to4x4(pose_a) @ to4x4(pose_b))[..., :3, :4]


def inverse(pose):
    """Invert a [..., 3, 4] rigid pose."""
    r = pose[..., :3, :3]
    t = pose[..., :3, 3:]
    r_inv = jnp.swapaxes(r, -1, -2)
    t_inv = -r_inv @ t
    return jnp.concatenate([r_inv, t_inv], axis=-1)


def normalize(pose):
    """Scale translations so the largest is 1."""
    scale = jnp.max(jnp.abs(pose[..., :3, 3]))
    out = pose.at[..., :3, 3].set(pose[..., :3, 3] / (scale + 1e-8))
    return out
