"""Poisson surface reconstruction from an oriented point cloud.

Behavioral spec: the reference's `ns-export poisson` path
(`nerfstudio/scripts/exporter.py:261-383`) generates a point cloud with
model-output normals and calls open3d's
`TriangleMesh.create_from_point_cloud_poisson`. open3d is absent here, so the
reconstruction is implemented directly in its classical regular-grid form
(Kazhdan et al. 2006, eq. 2): find the indicator function chi whose gradient
best matches the splatted normal field V by solving the Poisson equation
laplacian(chi) = div(V), then extract the isosurface at the mean indicator
value over the input samples.

TPU design: on a regular grid the Poisson solve diagonalizes under the DFT,
so the entire solve is three FFTs (jnp.fft on device) — no sparse octree, no
conjugate gradients. Splatting is a dense trilinear scatter-add (np.add.at on
host; the grid is small). Mesh extraction reuses the table-free marching
cubes (`exporter/marching_cubes.py`).
"""

from pathlib import Path
from typing import Optional, Tuple

import numpy as np


def _splat_trilinear(grid: np.ndarray, idx: np.ndarray, values: np.ndarray):
    """Scatter-add values [N, C] into grid [D,D,D,C] at fractional indices
    idx [N, 3] with trilinear weights."""
    D = grid.shape[0]
    i0 = np.floor(idx).astype(np.int64)
    f = idx - i0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (
                    (f[:, 0] if dx else 1 - f[:, 0])
                    * (f[:, 1] if dy else 1 - f[:, 1])
                    * (f[:, 2] if dz else 1 - f[:, 2])
                )
                gi = np.clip(i0 + np.array([dx, dy, dz]), 0, D - 1)
                np.add.at(grid, (gi[:, 0], gi[:, 1], gi[:, 2]), w[:, None] * values)


def poisson_reconstruct(
    points: np.ndarray,  # [N, 3]
    normals: np.ndarray,  # [N, 3] outward-oriented
    resolution: int = 128,
    padding: float = 0.1,
    smooth_sigma: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Reconstruct a watertight mesh. Returns (vertices, faces, normals)."""
    import jax.numpy as jnp

    points = np.asarray(points, np.float32)
    normals = np.asarray(normals, np.float32)
    nrm = np.linalg.norm(normals, axis=-1, keepdims=True)
    normals = normals / np.maximum(nrm, 1e-12)

    bb_min = points.min(0)
    bb_max = points.max(0)
    extent = (bb_max - bb_min).max() * (1 + 2 * padding)
    center = (bb_min + bb_max) / 2
    origin = center - extent / 2
    h = extent / (resolution - 1)

    idx = (points - origin) / h  # fractional grid coords

    # splat the normal field V (one vector per voxel)
    V = np.zeros((resolution,) * 3 + (3,), np.float32)
    _splat_trilinear(V, idx, normals)

    Vj = jnp.asarray(V)
    # mild Gaussian smoothing in Fourier domain stabilizes sparse splats
    # (plays the role of the octree basis's intrinsic smoothing)
    k = jnp.fft.fftfreq(resolution)  # cycles per voxel
    kx, ky, kz = jnp.meshgrid(k, k, k, indexing="ij")
    if smooth_sigma > 0:
        gauss = jnp.exp(
            -2 * (jnp.pi * smooth_sigma) ** 2 * (kx**2 + ky**2 + kz**2)
        )
    else:
        gauss = 1.0

    # div(V) and the inverse Laplacian, both via the DFT of the centered
    # finite-difference stencils: d/dx -> i*sin(2 pi k)/h,
    # laplacian -> -(4/h^2) sum sin^2(pi k)
    Fx = jnp.fft.fftn(Vj[..., 0])
    Fy = jnp.fft.fftn(Vj[..., 1])
    Fz = jnp.fft.fftn(Vj[..., 2])
    i_sin = lambda kk: 1j * jnp.sin(2 * jnp.pi * kk) / h
    div_hat = (i_sin(kx) * Fx + i_sin(ky) * Fy + i_sin(kz) * Fz) * gauss
    lap_eig = (
        -4.0
        / h**2
        * (
            jnp.sin(jnp.pi * kx) ** 2
            + jnp.sin(jnp.pi * ky) ** 2
            + jnp.sin(jnp.pi * kz) ** 2
        )
    )
    lap_eig = lap_eig.at[0, 0, 0].set(1.0)  # zero-mean gauge
    chi_hat = div_hat / lap_eig
    chi_hat = chi_hat.at[0, 0, 0].set(0.0)
    chi = np.asarray(jnp.real(jnp.fft.ifftn(chi_hat)), np.float32)

    # iso level = mean indicator value at the input samples (Kazhdan sec. 4)
    from nerfstudio_thermal_tpu.exporter.marching_cubes import (
        _trilinear, marching_cubes,
    )

    level = float(np.mean(_trilinear(chi, idx)))
    verts, faces, vnormals = marching_cubes(
        chi, level=level, origin=origin, spacing=np.full(3, h, np.float32),
        gradient_direction="descent",  # chi is larger inside
    )
    return verts, faces, vnormals


def export_poisson_mesh(
    model,
    params,
    cameras,
    output_dir: Path,
    num_points: Optional[int] = 500000,
    resolution: int = 128,
    min_accumulation: float = 0.5,
    stride: int = 4,
    filename: str = "poisson_mesh.ply",
) -> Path:
    """Point cloud (with finite-difference normals from expected depth) ->
    Poisson mesh (reference scripts/exporter.py:309-383)."""
    from nerfstudio_thermal_tpu.exporter.exporter_utils import (
        generate_point_cloud, write_ply_mesh,
    )

    points, colors, normals = generate_point_cloud(
        model, params, cameras,
        min_accumulation=min_accumulation,
        stride=stride,
        return_normals=True,
    )
    if num_points is not None and len(points) > num_points:
        sel = np.random.default_rng(0).choice(len(points), num_points, replace=False)
        points, colors, normals = points[sel], colors[sel], normals[sel]
    verts, faces, vnormals = poisson_reconstruct(
        points, normals, resolution=resolution
    )
    out = Path(output_dir) / filename
    write_ply_mesh(out, verts, faces, normals=vnormals)
    return out
