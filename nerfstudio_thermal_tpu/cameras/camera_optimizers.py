"""Camera pose optimizers (per-camera, and the fork's shared/penalized modes).

Behavioral spec: reference `nerfstudio/cameras/camera_optimizers.py` —
modes off/SO3xR3/SE3/shared_SO3xR3 (:46, shared mode :116-117,150-151),
`penalty_scale` (-1 => off, :55-56,108-109), non-trainable camera indices via
identity-transform masking (:122-128,156-163), metric/loss `suffix` (:121).

Functional design: the optimizer is a flax module whose only param is
`pose_adjustment` ([num_cameras, 6] or [1, 6] shared). It *returns* corrected
rays instead of mutating a bundle, so no deepcopy is needed and the same
bundle can feed the RGB and thermal branches independently (the reference
deep-copies, thermal_nerfacto.py:403-412).
"""

from dataclasses import dataclass, field as dataclass_field
from typing import Optional, Tuple, Type

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_thermal_tpu.cameras.lie_groups import exp_map_SE3, exp_map_SO3xR3
from nerfstudio_thermal_tpu.cameras.rays import RayBundle


@dataclass
class CameraOptimizerConfig:
    """Configuration of camera pose optimization."""

    mode: str = "off"  # off | SO3xR3 | SE3 | shared_SO3xR3
    trans_l2_penalty: float = 1e-2
    rot_l2_penalty: float = 1e-3
    penalty_scale: float = 1.0
    """Multiplier on the pose regularizer. -1 turns the optimizer off."""

    def resolved_mode(self) -> str:
        return "off" if self.penalty_scale < 0 else self.mode


class CameraOptimizer(nn.Module):
    """Learnable pose deltas applied to ray bundles."""

    mode: str
    num_cameras: int
    non_trainable_camera_indices: Tuple[int, ...] = ()
    suffix: str = ""
    trans_l2_penalty: float = 1e-2
    rot_l2_penalty: float = 1e-3
    penalty_scale: float = 1.0

    def _adjustment(self):
        n = 1 if self.mode == "shared_SO3xR3" else self.num_cameras
        return self.param("pose_adjustment", nn.initializers.zeros, (n, 6))

    @nn.compact
    def __call__(self, indices: jax.Array) -> jax.Array:
        """[R] camera indices -> [R, 3, 4] correction matrices."""
        eye = jnp.broadcast_to(
            jnp.eye(4)[:3, :4], (*indices.shape, 3, 4)
        )
        if self.mode == "off":
            return eye
        adj = self._adjustment()
        # Exp maps are computed per CAMERA ([num_cameras, 6] -> [num_cameras,
        # 3, 4]) and the resulting matrices gathered per ray — not per ray —
        # so the trig/compose work (and its backward scatter) is O(cameras),
        # not O(rays). Identical math to reference camera_optimizers.py:142-163.
        if self.mode == "SO3xR3":
            mats = exp_map_SO3xR3(adj)
        elif self.mode == "SE3":
            mats = exp_map_SE3(adj)
        elif self.mode == "shared_SO3xR3":
            return jnp.broadcast_to(exp_map_SO3xR3(adj)[0], (*indices.shape, 3, 4))
        else:
            raise ValueError(f"unknown camera optimizer mode {self.mode}")

        if self.non_trainable_camera_indices:
            mask = jnp.zeros((self.num_cameras,), bool)
            mask = mask.at[jnp.asarray(self.non_trainable_camera_indices)].set(True)
            eye_cam = jnp.broadcast_to(jnp.eye(4)[:3, :4], mats.shape)
            mats = jnp.where(mask[:, None, None], eye_cam, mats)
        if self.num_cameras * int(np.prod(indices.shape)) <= 32 * 2**20:
            # one-hot matmul instead of mats[indices]: the gather's VJP is an
            # XLA scatter-add (~0.35 ms/step each on v5e); as a matmul both
            # directions ride the MXU. Gated on the [rays, cameras] one-hot
            # staying <= 128 MB f32; beyond that the scatter-add is cheaper
            # than the O(R*C) memory. HIGHEST precision: DEFAULT rounds the
            # f32 pose matrices to bf16 on TPU.
            onehot = (
                indices[..., None] == jnp.arange(self.num_cameras)
            ).astype(mats.dtype)
            per_ray = jnp.matmul(
                onehot,
                mats.reshape(self.num_cameras, 12),
                precision=jax.lax.Precision.HIGHEST,
            )
            return per_ray.reshape(*indices.shape, 3, 4)
        return mats[indices]

    def apply_to_raybundle(self, bundle: RayBundle) -> RayBundle:
        """Return a new bundle with corrected origins/directions
        (reference camera_optimizers.py:171-177)."""
        if self.mode == "off":
            return bundle
        corr = self(bundle.camera_indices[..., 0])
        origins = bundle.origins + corr[..., :3, 3]
        directions = jnp.einsum("...ij,...j->...i", corr[..., :3, :3], bundle.directions)
        return bundle.replace(origins=origins, directions=directions)

    # --- pure helpers over raw params (usable outside module application) ---

    def regularization_loss(self, params) -> jax.Array:
        """L2 pose penalty (reference :188-199). safe_norm: torch's norm has a
        zero subgradient at 0; jnp.linalg.norm would give NaN at the zero
        init."""
        from nerfstudio_thermal_tpu.utils.math import safe_norm

        adj = params["pose_adjustment"]
        return (
            jnp.mean(safe_norm(adj[:, :3])) * self.trans_l2_penalty
            + jnp.mean(safe_norm(adj[:, 3:])) * self.rot_l2_penalty
        ) * self.penalty_scale

    def metrics(self, params) -> dict:
        adj = params["pose_adjustment"]
        return {
            f"camera_opt_translation{self.suffix}": jnp.linalg.norm(adj[:, :3]),
            f"camera_opt_rotation{self.suffix}": jnp.linalg.norm(adj[:, 3:]),
        }


def build_camera_optimizer(
    config: CameraOptimizerConfig,
    num_cameras: int,
    non_trainable_camera_indices: Tuple[int, ...] = (),
    suffix: str = "",
) -> CameraOptimizer:
    return CameraOptimizer(
        mode=config.resolved_mode(),
        num_cameras=num_cameras,
        non_trainable_camera_indices=tuple(non_trainable_camera_indices),
        suffix=suffix,
        trans_l2_penalty=config.trans_l2_penalty,
        rot_l2_penalty=config.rot_l2_penalty,
        penalty_scale=abs(config.penalty_scale),
    )
