"""Cameras as a pytree + jit-friendly ray generation.

Behavioral spec: reference `nerfstudio/cameras/cameras.py` (`Cameras:72`,
`generate_rays:320`, `_generate_rays_from_coords:504-930`). Conventions match
the reference exactly: image coords are (y, x) + 0.5 pixel centers; camera
space is OpenGL (+x right, +y up, -z forward; the OpenCV->OpenGL y-flip
happens after undistortion); pixel_area from unit-offset ray differentials.

TPU design: ray generation is a pure function of gathered per-ray camera
parameters, so it runs *inside* the jitted train step (keeping pose gradients
flowing to camera-optimizer params) over rectangular ray batches, instead of
the reference's host-side jagged-list handling.
"""

from enum import Enum
from typing import Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp

from nerfstudio_thermal_tpu.cameras import camera_utils
from nerfstudio_thermal_tpu.cameras.rays import RayBundle
from nerfstudio_thermal_tpu.utils import poses as pose_utils


class CameraType(Enum):
    """Camera projection models (reference cameras.py:40-56)."""

    PERSPECTIVE = 1
    FISHEYE = 2
    EQUIRECTANGULAR = 3
    OMNIDIRECTIONALSTEREO_L = 4
    OMNIDIRECTIONALSTEREO_R = 5
    VR180_L = 6
    VR180_R = 7
    ORTHOPHOTO = 8
    FISHEYE624 = 9


@flax.struct.dataclass
class Cameras:
    """Batched camera intrinsics/extrinsics as arrays of shape [N, ...]."""

    camera_to_worlds: jax.Array  # [N, 3, 4]
    fx: jax.Array  # [N]
    fy: jax.Array  # [N]
    cx: jax.Array  # [N]
    cy: jax.Array  # [N]
    width: jax.Array  # [N] int32
    height: jax.Array  # [N] int32
    distortion_params: Optional[jax.Array] = None  # [N, 6]
    camera_type: Optional[jax.Array] = None  # [N] int32
    times: Optional[jax.Array] = None  # [N]
    metadata: Dict[str, jax.Array] = flax.struct.field(default_factory=dict)

    def __len__(self):
        return self.camera_to_worlds.shape[0]

    @property
    def image_height(self):
        return self.height

    @property
    def image_width(self):
        return self.width

    def rescale_output_resolution(self, scaling_factor: float) -> "Cameras":
        """Scale intrinsics (reference cameras.py:986-1009)."""
        return self.replace(
            fx=self.fx * scaling_factor,
            fy=self.fy * scaling_factor,
            cx=self.cx * scaling_factor,
            cy=self.cy * scaling_factor,
            width=(self.width.astype(jnp.float32) * scaling_factor).astype(jnp.int32),
            height=(self.height.astype(jnp.float32) * scaling_factor).astype(jnp.int32),
        )

    def generate_rays(
        self,
        camera_indices: jax.Array,  # [...num_rays] int
        coords: jax.Array,  # [...num_rays, 2] (y, x) pixel-center coords
        camera_opt_to_camera: Optional[jax.Array] = None,  # [...num_rays, 3, 4]
        disable_distortion: bool = False,
    ) -> RayBundle:
        """Generate world-space rays for (camera, pixel) pairs.

        Pure and shape-static: safe to call inside jit. Mixed camera types in
        one batch are handled with elementwise selects.
        """
        idx = camera_indices.astype(jnp.int32)
        y = coords[..., 0]
        x = coords[..., 1]
        fx, fy = self.fx[idx], self.fy[idx]
        cx, cy = self.cx[idx], self.cy[idx]

        # Base coord and unit-offset coords for ray differentials
        # (reference cameras.py:619-632).
        def make_coord(dx_pix, dy_pix):
            return jnp.stack(
                [(x - cx + dx_pix) / fx, (y - cy + dy_pix) / fy], axis=-1
            )

        coord_stack = jnp.stack(
            [make_coord(0.0, 0.0), make_coord(1.0, 0.0), make_coord(0.0, 1.0)], axis=0
        )  # [3, ..., 2]

        if self.camera_type is None:
            cam_type = jnp.full(idx.shape, CameraType.PERSPECTIVE.value, jnp.int32)
        else:
            cam_type = self.camera_type[idx]

        dist = (
            self.distortion_params[idx]
            if self.distortion_params is not None
            else None
        )
        if not disable_distortion and dist is not None:
            undistorted = camera_utils.radial_and_tangential_undistort(
                coord_stack, dist[None, ..., :6]
            )
            # equirect never undistorts; fisheye624 uses its own 12-param
            # model on raw pixels below (reference cameras.py:645-651,856).
            no_distortion = (
                (cam_type == CameraType.EQUIRECTANGULAR.value)
                | (cam_type == CameraType.FISHEYE624.value)
            )[..., None]
            coord_stack = jnp.where(no_distortion[None], coord_stack, undistorted)

        # OpenCV -> OpenGL y flip (reference cameras.py:655).
        coord_stack = coord_stack * jnp.asarray([1.0, -1.0])

        cxs = coord_stack[..., 0]
        cys = coord_stack[..., 1]

        # Perspective (reference cameras.py:781-787).
        persp = jnp.stack([cxs, cys, -jnp.ones_like(cxs)], axis=-1)

        # Fisheye (equidistant; reference cameras.py:789-805).
        theta = jnp.clip(jnp.sqrt(cxs**2 + cys**2), 1e-9, jnp.pi)
        sin_over_theta = jnp.sin(theta) / theta
        fish = jnp.stack(
            [cxs * sin_over_theta, cys * sin_over_theta, -jnp.cos(theta)], axis=-1
        )

        # Equirectangular (reference cameras.py:807-817).
        etheta = -jnp.pi * cxs
        # note: cys already has the OpenGL flip applied; the reference flips
        # before direction math too, so phi uses the flipped value.
        ephi = jnp.pi * (0.5 - cys)
        equi = jnp.stack(
            [
                -jnp.sin(etheta) * jnp.sin(ephi),
                jnp.cos(ephi),
                -jnp.cos(etheta) * jnp.sin(ephi),
            ],
            axis=-1,
        )

        # Orthophoto: constant -z direction; ray origins offset on the image
        # plane (reference cameras.py:839-855).
        ortho = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), persp.shape)

        # VR180 L/R: equirect-style directions with theta range halved to
        # +/-90 deg (reference cameras.py:731-760; the reference derives
        # theta from raw pixel coords of the base ray only — using the
        # undistorted per-offset coords here is equivalent for the
        # distortion-free VR use case and gives correct ray differentials).
        vtheta = -jnp.pi * cxs / 2.0
        vr180 = jnp.stack(
            [
                -jnp.sin(vtheta) * jnp.sin(ephi),
                jnp.cos(ephi),
                -jnp.cos(vtheta) * jnp.sin(ephi),
            ],
            axis=-1,
        )

        # Trace-time pruning: with concrete (non-tracer) camera types the
        # unused branches fold away; under tracing all branches compile.
        def _maybe_has(value: int) -> bool:
            try:
                return bool((cam_type == value).any())
            except jax.errors.TracerBoolConversionError:
                return True

        ct = cam_type[None, ..., None]
        directions_stack = jnp.where(
            ct == CameraType.FISHEYE.value,
            fish,
            jnp.where(
                (ct == CameraType.EQUIRECTANGULAR.value)
                | (ct == CameraType.OMNIDIRECTIONALSTEREO_L.value)
                | (ct == CameraType.OMNIDIRECTIONALSTEREO_R.value),
                equi,
                jnp.where(
                    (ct == CameraType.VR180_L.value)
                    | (ct == CameraType.VR180_R.value),
                    vr180,
                    jnp.where(ct == CameraType.ORTHOPHOTO.value, ortho, persp),
                ),
            ),
        )

        # Fisheye624 (radial + tangential + thin-prism, reference
        # cameras.py:856-904): unprojects raw pixel coords with the 12-param
        # model; needs distortion_params[..., :12].
        if dist is not None and dist.shape[-1] >= 12 and _maybe_has(
            CameraType.FISHEYE624.value
        ):
            pix_stack = jnp.stack(
                [
                    jnp.stack([x, y], -1),
                    jnp.stack([x + 1.0, y], -1),
                    jnp.stack([x, y + 1.0], -1),
                ],
                axis=0,
            )
            camera_params = jnp.concatenate(
                [
                    fx[..., None], fy[..., None], cx[..., None], cy[..., None],
                    dist[..., :12],
                ],
                axis=-1,
            )
            f624 = camera_utils.fisheye624_unproject(
                pix_stack, camera_params[None]
            )
            directions_stack = jnp.where(
                ct == CameraType.FISHEYE624.value, f624, directions_stack
            )

        c2w = self.camera_to_worlds[idx]
        if camera_opt_to_camera is not None:
            c2w = pose_utils.multiply(c2w, camera_opt_to_camera)
        rotation = c2w[..., :3, :3]

        directions_stack = jnp.sum(
            directions_stack[..., None, :] * rotation[None], axis=-1
        )
        directions_stack, directions_norm = camera_utils.normalize_with_norm(
            directions_stack, -1
        )

        origins = c2w[..., :3, 3]
        # orthophoto origins: translate on the image plane (y flipped back to
        # left-handed per reference :851)
        grid = jnp.stack(
            [coord_stack[0, ..., 0], -coord_stack[0, ..., 1], jnp.zeros_like(cx)],
            axis=-1,
        )
        ortho_origins = origins + jnp.einsum("...ij,...j->...i", rotation, grid)
        origins = jnp.where(
            (cam_type == CameraType.ORTHOPHOTO.value)[..., None], ortho_origins, origins
        )

        # Stereo eye origins (reference cameras.py:673-760): ODS rays start on
        # a horizontal IPD/2 circle (phase set by the pixel azimuth), VR180
        # rays on a fixed interocular offset; both rotated into world space.
        vr_ipd = 0.064  # meters (reference :700)
        eye_sign = jnp.where(
            (cam_type == CameraType.OMNIDIRECTIONALSTEREO_R.value)
            | (cam_type == CameraType.VR180_R.value),
            1.0,
            -1.0,
        )
        ods_theta = -jnp.pi * (x - cx) / fx
        ods_offset = (
            eye_sign[..., None]
            * (vr_ipd / 2.0)
            * jnp.stack(
                [jnp.cos(ods_theta), jnp.zeros_like(ods_theta), -jnp.sin(ods_theta)],
                axis=-1,
            )
        )
        vr180_offset = eye_sign[..., None] * (vr_ipd / 2.0) * jnp.asarray([1.0, 0.0, 0.0])
        is_ods = (
            (cam_type == CameraType.OMNIDIRECTIONALSTEREO_L.value)
            | (cam_type == CameraType.OMNIDIRECTIONALSTEREO_R.value)
        )[..., None]
        is_vr180 = (
            (cam_type == CameraType.VR180_L.value)
            | (cam_type == CameraType.VR180_R.value)
        )[..., None]
        stereo_offset = jnp.where(
            is_ods, ods_offset, jnp.where(is_vr180, vr180_offset, 0.0)
        )
        origins = origins + jnp.einsum("...ij,...j->...i", rotation, stereo_offset)
        directions = directions_stack[0]
        dx = jnp.sqrt(jnp.sum((directions - directions_stack[1]) ** 2, axis=-1))
        dy = jnp.sqrt(jnp.sum((directions - directions_stack[2]) ** 2, axis=-1))
        pixel_area = (dx * dy)[..., None]

        times = self.times[idx][..., None] if self.times is not None else None
        metadata = {k: v[idx] for k, v in self.metadata.items()}
        metadata["directions_norm"] = jax.lax.stop_gradient(directions_norm[0])

        return RayBundle(
            origins=origins,
            directions=directions,
            pixel_area=pixel_area,
            camera_indices=idx[..., None],
            times=times,
            metadata=metadata,
        )
