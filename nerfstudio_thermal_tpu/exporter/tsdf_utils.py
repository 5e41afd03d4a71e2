"""TSDF fusion: integrate rendered depth/color maps into a truncated
signed-distance volume and extract a mesh.

Behavioral spec: reference `nerfstudio/exporter/tsdf_utils.py` (`TSDF`
dataclass :42-281, `integrate_tsdf:175-281`, `export_tsdf_mesh:284-361`).
TPU design: the volume update is one jitted dense program per image —
project all voxels into the camera, nearest-sample depth/color, and blend
with the running weighted average. No scatter is needed (the voxel grid is
the dense left-hand side), so the whole update runs at VPU speed; the
reference's per-image boolean indexing loop (:259-281) becomes a masked
`where`. Mesh extraction reuses the table-free marching cubes
(`exporter/marching_cubes.py`), colored by trilinear lookup into the color
volume like the reference (:121-133).
"""

from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional, Tuple, Union

import numpy as np


@dataclass
class TSDF:
    """Dense TSDF volume. values/weights [X,Y,Z], colors [X,Y,Z,3]."""

    values: np.ndarray
    weights: np.ndarray
    colors: np.ndarray
    voxel_size: np.ndarray  # [3]
    origin: np.ndarray  # [3]
    truncation_margin: float = 5.0

    @property
    def truncation(self) -> float:
        return float(self.voxel_size[0]) * self.truncation_margin

    @staticmethod
    def from_aabb(aabb: np.ndarray, volume_dims) -> "TSDF":
        """aabb [[min],[max]] (2,3); volume_dims [3] ints
        (reference tsdf_utils.py:88-115)."""
        aabb = np.asarray(aabb, np.float32)
        dims = np.asarray(volume_dims, np.int64)
        origin = aabb[0]
        voxel_size = (aabb[1] - aabb[0]) / dims
        values = -np.ones(tuple(dims), np.float32)
        weights = np.zeros(tuple(dims), np.float32)
        colors = np.zeros(tuple(dims) + (3,), np.float32)
        return TSDF(values, weights, colors, voxel_size, origin)

    def voxel_world_coords(self) -> np.ndarray:
        """[X, Y, Z, 3] world coordinates of voxel centers (reference puts
        voxel (i,j,k) at origin + (i,j,k) * voxel_size)."""
        dims = self.values.shape
        grid = np.stack(
            np.meshgrid(
                np.arange(dims[0]), np.arange(dims[1]), np.arange(dims[2]),
                indexing="ij",
            ),
            axis=-1,
        ).astype(np.float32)
        return self.origin[None, None, None] + grid * self.voxel_size[None, None, None]

    def integrate_tsdf(
        self,
        c2w: np.ndarray,  # [B, 4, 4] OpenGL/nerfstudio convention
        K: np.ndarray,  # [B, 3, 3]
        depth_images: np.ndarray,  # [B, H, W]
        color_images: Optional[np.ndarray] = None,  # [B, H, W, 3]
    ) -> None:
        """Fuse a batch of depth (+color) maps
        (reference tsdf_utils.py:175-281, vectorized, gather-free on the
        volume side)."""
        import jax.numpy as jnp

        values, weights, colors = (
            jnp.asarray(self.values), jnp.asarray(self.weights),
            jnp.asarray(self.colors),
        )
        voxels = jnp.asarray(self.voxel_world_coords())  # [X,Y,Z,3]
        shape = values.shape
        pts = voxels.reshape(-1, 3)
        trunc = self.truncation

        for i in range(c2w.shape[0]):
            w2c = jnp.asarray(np.linalg.inv(c2w[i]), jnp.float32)
            cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
            # nerfstudio cameras look down -z with +y up; flip to the
            # +z-forward, +y-down pinhole frame (reference :215-218)
            cam = cam * jnp.asarray([1.0, -1.0, -1.0])
            voxel_depth = jnp.linalg.norm(cam, axis=-1)  # distance, not z
            z = cam[:, 2]
            Ki = jnp.asarray(K[i], jnp.float32)
            uv = (cam / jnp.where(z == 0, 1e-9, z)[:, None]) @ Ki.T
            u = uv[:, 0]
            v = uv[:, 1]
            H, W = depth_images.shape[1:3]
            ui = jnp.clip(jnp.round(u - 0.5).astype(jnp.int32), 0, W - 1)
            vi = jnp.clip(jnp.round(v - 0.5).astype(jnp.int32), 0, H - 1)
            in_view = (z > 0) & (u >= 0) & (u < W) & (v >= 0) & (v < H)

            dimg = jnp.asarray(depth_images[i], jnp.float32)
            sampled_depth = dimg[vi, ui]
            dist = sampled_depth - voxel_depth
            tsdf_vals = jnp.clip(dist / trunc, -1.0, 1.0)
            valid = (
                in_view & (voxel_depth > 0) & (sampled_depth > 0)
                & (dist > -trunc)
            )

            new_w = valid.astype(jnp.float32)
            total_w = weights.reshape(-1) + new_w
            safe = jnp.where(total_w == 0, 1.0, total_w)
            merged = (
                values.reshape(-1) * weights.reshape(-1) + tsdf_vals * new_w
            ) / safe
            values = jnp.where(valid, merged, values.reshape(-1)).reshape(shape)

            if color_images is not None:
                cimg = jnp.asarray(color_images[i], jnp.float32)
                sampled_c = cimg[vi, ui]
                merged_c = (
                    colors.reshape(-1, 3) * weights.reshape(-1)[:, None]
                    + sampled_c * new_w[:, None]
                ) / safe[:, None]
                colors = jnp.where(
                    valid[:, None], merged_c, colors.reshape(-1, 3)
                ).reshape(shape + (3,))

            weights = jnp.where(
                valid, jnp.minimum(total_w, 1.0), weights.reshape(-1)
            ).reshape(shape)

        self.values = np.asarray(values)
        self.weights = np.asarray(weights)
        self.colors = np.asarray(colors)

    def get_mesh(self):
        """Marching cubes over the clamped TSDF, vertex colors by trilinear
        lookup (reference :117-141). Returns (verts, faces, normals, colors)."""
        from nerfstudio_thermal_tpu.exporter.marching_cubes import (
            _trilinear, marching_cubes,
        )

        verts_idx, faces, normals = marching_cubes(
            np.clip(self.values, -1, 1), level=0.0,
            gradient_direction="ascent",
        )
        if len(verts_idx) == 0:
            return verts_idx, faces, normals, np.zeros((0, 3), np.float32)
        cols = np.stack(
            [_trilinear(self.colors[..., c], verts_idx) for c in range(3)],
            axis=-1,
        )
        verts = self.origin[None] + verts_idx * self.voxel_size[None]
        return verts.astype(np.float32), faces, normals, cols


def export_tsdf_mesh(
    model,
    params,
    cameras,
    output_dir: Path,
    downscale_factor: int = 2,
    depth_output_name: str = "depth",
    rgb_output_name: str = "rgb",
    resolution: Union[int, List[int]] = 128,
    batch_size: int = 10,
    use_bounding_box: bool = True,
    bounding_box_min: Tuple[float, float, float] = (-1.0, -1.0, -1.0),
    bounding_box_max: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    filename: str = "tsdf_mesh.ply",
) -> Path:
    """Render train cameras -> fuse into a TSDF -> write a PLY mesh
    (reference tsdf_utils.py:284-361)."""
    from nerfstudio_thermal_tpu.exporter.exporter_utils import (
        render_cameras_for_export, write_ply_mesh,
    )

    aabb = np.asarray([bounding_box_min, bounding_box_max], np.float32)
    dims = (
        np.asarray([resolution] * 3)
        if isinstance(resolution, int)
        else np.asarray(resolution)
    )
    tsdf = TSDF.from_aabb(aabb, dims)

    rgbs, depths, c2ws, Ks = render_cameras_for_export(
        model, params, cameras,
        rgb_output_name=rgb_output_name,
        depth_output_name=depth_output_name,
        downscale_factor=downscale_factor,
    )
    # per-modality image resolutions vary, so integrate image-by-image
    # (the dense volume update is already the unit of work on TPU)
    for i in range(len(c2ws)):
        tsdf.integrate_tsdf(
            c2ws[i : i + 1],
            Ks[i : i + 1],
            depths[i][None],
            color_images=rgbs[i][None],
        )

    verts, faces, normals, cols = tsdf.get_mesh()
    out = Path(output_dir) / filename
    write_ply_mesh(out, verts, faces, normals=normals, colors=cols)
    return out
