"""Export helpers: depth-backprojected point clouds + PLY writing.

Behavioral spec: reference `nerfstudio/exporter/exporter_utils.py`
(`generate_point_cloud`: render rays, keep points with accumulation above a
threshold, backproject expected depth; the reference uses open3d/torch — here
plain numpy with a built-in binary PLY writer since open3d/plyfile are not in
the image).
"""

from pathlib import Path
from typing import Optional, Tuple

import numpy as np


def write_ply(
    path: Path,
    points: np.ndarray,  # [N, 3] float
    colors: Optional[np.ndarray] = None,  # [N, 3] float in [0,1]
    normals: Optional[np.ndarray] = None,
) -> None:
    """Binary little-endian PLY."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    n = points.shape[0]
    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
    header += [f"property float {a}" for a in "xyz"]
    dtype = [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]
    if normals is not None:
        header += [f"property float n{a}" for a in "xyz"]
        dtype += [("nx", "<f4"), ("ny", "<f4"), ("nz", "<f4")]
    if colors is not None:
        header += [
            "property uchar red", "property uchar green", "property uchar blue",
        ]
        dtype += [("red", "u1"), ("green", "u1"), ("blue", "u1")]
    header.append("end_header")

    data = np.empty(n, dtype=dtype)
    data["x"], data["y"], data["z"] = points[:, 0], points[:, 1], points[:, 2]
    if normals is not None:
        data["nx"], data["ny"], data["nz"] = normals[:, 0], normals[:, 1], normals[:, 2]
    if colors is not None:
        c = (np.clip(colors, 0, 1) * 255).astype(np.uint8)
        data["red"], data["green"], data["blue"] = c[:, 0], c[:, 1], c[:, 2]

    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        f.write(data.tobytes())


def read_ply(path: Path) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Read back a PLY written by write_ply (for tests/round-trips)."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode().strip()
            header.append(line)
            if line == "end_header":
                break
        n = int(next(l for l in header if l.startswith("element vertex")).split()[-1])
        props = [l.split()[1:] for l in header if l.startswith("property")]
        dtype = []
        for typ, name in props:
            dtype.append((name, "<f4" if typ == "float" else "u1"))
        data = np.frombuffer(f.read(), dtype=dtype, count=n)
    points = np.stack([data["x"], data["y"], data["z"]], -1)
    colors = None
    if "red" in data.dtype.names:
        colors = np.stack([data["red"], data["green"], data["blue"]], -1) / 255.0
    return points, colors


def write_ply_mesh(
    path: Path,
    vertices: np.ndarray,  # [V, 3]
    faces: np.ndarray,  # [F, 3] int
    normals: Optional[np.ndarray] = None,  # [V, 3]
    colors: Optional[np.ndarray] = None,  # [V, 3] in [0,1]
) -> None:
    """Binary little-endian PLY triangle mesh (vertex list + int32 face
    list). Replaces the reference's pymeshlab writer
    (reference exporter/tsdf_utils.py:144-173)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    nv, nf = vertices.shape[0], faces.shape[0]
    header = ["ply", "format binary_little_endian 1.0", f"element vertex {nv}"]
    header += [f"property float {a}" for a in "xyz"]
    dtype = [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]
    if normals is not None:
        header += [f"property float n{a}" for a in "xyz"]
        dtype += [("nx", "<f4"), ("ny", "<f4"), ("nz", "<f4")]
    if colors is not None:
        header += ["property uchar red", "property uchar green", "property uchar blue"]
        dtype += [("red", "u1"), ("green", "u1"), ("blue", "u1")]
    header += [
        f"element face {nf}",
        "property list uchar int vertex_indices",
        "end_header",
    ]
    vdata = np.empty(nv, dtype=dtype)
    vdata["x"], vdata["y"], vdata["z"] = vertices[:, 0], vertices[:, 1], vertices[:, 2]
    if normals is not None:
        vdata["nx"], vdata["ny"], vdata["nz"] = (
            normals[:, 0], normals[:, 1], normals[:, 2],
        )
    if colors is not None:
        c = (np.clip(colors, 0, 1) * 255).astype(np.uint8)
        vdata["red"], vdata["green"], vdata["blue"] = c[:, 0], c[:, 1], c[:, 2]
    fdata = np.empty(nf, dtype=[("n", "u1"), ("idx", "<i4", (3,))])
    fdata["n"] = 3
    fdata["idx"] = faces.astype(np.int32)
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        f.write(vdata.tobytes())
        f.write(fdata.tobytes())


def read_ply_mesh(path: Path) -> Tuple[np.ndarray, np.ndarray]:
    """Read back a mesh written by write_ply_mesh (tests/round-trips).
    Returns (vertices [V,3], faces [F,3])."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode().strip()
            header.append(line)
            if line == "end_header":
                break
        nv = int(next(l for l in header if l.startswith("element vertex")).split()[-1])
        nf = int(next(l for l in header if l.startswith("element face")).split()[-1])
        props = [
            l.split()[1:]
            for l in header[header.index(f"element vertex {nv}") + 1 :]
            if l.startswith("property") and not l.startswith("property list")
        ]
        vdtype = [
            (name, "<f4" if typ == "float" else "u1") for typ, name in props
        ]
        vdata = np.frombuffer(f.read(np.dtype(vdtype).itemsize * nv), dtype=vdtype)
        fdata = np.frombuffer(
            f.read(), dtype=[("n", "u1"), ("idx", "<i4", (3,))], count=nf
        )
    verts = np.stack([vdata["x"], vdata["y"], vdata["z"]], -1)
    return verts, np.asarray(fdata["idx"])


def render_cameras_for_export(
    model,
    params,
    cameras,
    rgb_output_name: str = "rgb",
    depth_output_name: str = "depth",
    downscale_factor: int = 2,
    num_cameras: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Render every camera at reduced resolution for volumetric fusion
    (reference exporter_utils.py `render_trajectory` + tsdf_utils :326-346).
    Returns (rgbs: list of [H,W,3], depths: list of [H,W], c2ws [B,4,4],
    Ks [B,3,3]) — lists because cameras may have per-modality resolutions
    (RGB vs thermal)."""
    cams = cameras.rescale_output_resolution(1.0 / downscale_factor)
    n = min(num_cameras or len(cams), len(cams))
    rgbs, depths, c2ws, Ks = [], [], [], []
    for i in range(n):
        outputs = model.get_outputs_for_camera(params, cams, i)
        rgb = outputs[rgb_output_name]
        if rgb.shape[-1] == 1:
            rgb = np.repeat(rgb, 3, -1)
        rgbs.append(rgb[..., :3])
        depths.append(outputs[depth_output_name][..., 0])
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3] = np.asarray(cams.camera_to_worlds[i])
        c2ws.append(c2w)
        K = np.array(
            [
                [float(cams.fx[i]), 0, float(cams.cx[i])],
                [0, float(cams.fy[i]), float(cams.cy[i])],
                [0, 0, 1],
            ],
            np.float32,
        )
        Ks.append(K)
    return rgbs, depths, np.stack(c2ws), np.stack(Ks)


def generate_point_cloud(
    model,
    params,
    cameras,
    num_cameras: Optional[int] = None,
    min_accumulation: float = 0.5,
    use_thermal_color: bool = False,
    stride: int = 4,
    return_normals: bool = False,
):
    """Backproject expected depth from eval cameras into a colored point
    cloud. Returns (points [N,3], colors [N,3]) or, with
    return_normals=True, (points, colors, normals) where normals come from
    the cross product of the point map's image-space gradients, oriented
    toward the camera (the reference's `normal_method="model_output"`
    needs a normal-predicting field; depth-derived normals serve the same
    role for fields that don't predict them, reference
    scripts/exporter.py:99-127)."""
    points_all, colors_all, normals_all = [], [], []
    n = num_cameras if num_cameras is not None else len(cameras)
    for i in range(min(n, len(cameras))):
        outputs = model.get_outputs_for_camera(params, cameras, i)
        depth = outputs["expected_depth"][::stride, ::stride, 0]
        acc = outputs["accumulation"][::stride, ::stride, 0]
        rgb_key = "rgb_thermal" if use_thermal_color and "rgb_thermal" in outputs else "rgb"
        rgb = outputs[rgb_key][::stride, ::stride]
        if rgb.shape[-1] == 1:
            rgb = np.repeat(rgb, 3, -1)

        h, w = depth.shape
        fx = float(cameras.fx[i]) / stride
        fy = float(cameras.fy[i]) / stride
        cx = float(cameras.cx[i]) / stride
        cy = float(cameras.cy[i]) / stride
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        # OpenGL camera: x right, y up, -z forward
        dirs = np.stack(
            [
                (xs + 0.5 - cx) / fx,
                -(ys + 0.5 - cy) / fy,
                -np.ones_like(depth),
            ],
            -1,
        )
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        c2w = np.asarray(cameras.camera_to_worlds[i])
        world_dirs = dirs @ c2w[:3, :3].T
        origin = c2w[:3, 3]
        pts = origin + world_dirs * depth[..., None]

        mask = acc > min_accumulation
        points_all.append(pts[mask])
        colors_all.append(rgb[mask])
        if return_normals:
            du = np.gradient(pts, axis=1)
            dv = np.gradient(pts, axis=0)
            n = np.cross(du, dv)
            n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
            # orient toward the camera
            to_cam = origin - pts
            sign = np.sign(np.sum(n * to_cam, axis=-1, keepdims=True))
            n = n * np.where(sign == 0, 1.0, sign)
            normals_all.append(n[mask])
    if return_normals:
        return (
            np.concatenate(points_all),
            np.concatenate(colors_all),
            np.concatenate(normals_all),
        )
    return np.concatenate(points_all), np.concatenate(colors_all)
