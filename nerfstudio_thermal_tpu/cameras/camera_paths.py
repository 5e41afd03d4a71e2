"""Camera trajectory generation for rendering.

Behavioral spec: reference `nerfstudio/cameras/camera_paths.py`
(`get_interpolated_camera_path`, `get_spiral_path`) and
`viewer/utils.py` camera-path JSON parsing in `scripts/render.py:439-520`.
"""

from typing import Optional

import numpy as np

from nerfstudio_thermal_tpu.cameras.cameras import Cameras, CameraType


def _slerp(q0: np.ndarray, q1: np.ndarray, t: float) -> np.ndarray:
    dot = float(np.dot(q0, q1))
    if dot < 0:
        q1, dot = -q1, -dot
    if dot > 0.9995:
        q = q0 + t * (q1 - q0)
        return q / np.linalg.norm(q)
    theta0 = np.arccos(np.clip(dot, -1, 1))
    theta = theta0 * t
    s0 = np.cos(theta) - dot * np.sin(theta) / np.sin(theta0)
    s1 = np.sin(theta) / np.sin(theta0)
    return s0 * q0 + s1 * q1


def _rot_to_quat(r: np.ndarray) -> np.ndarray:
    w = np.sqrt(max(0.0, 1 + r[0, 0] + r[1, 1] + r[2, 2])) / 2
    if w < 1e-8:
        # fallback for 180-degree rotations
        i = int(np.argmax(np.diag(r)))
        q = np.zeros(4)
        q[1 + i] = 1.0
        return q
    x = (r[2, 1] - r[1, 2]) / (4 * w)
    y = (r[0, 2] - r[2, 0]) / (4 * w)
    z = (r[1, 0] - r[0, 1]) / (4 * w)
    return np.array([w, x, y, z])


def _quat_to_rot(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q / np.linalg.norm(q)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def get_interpolated_camera_path(
    cameras: Cameras, steps: int, order_poses: bool = False,
    indices: Optional[np.ndarray] = None,
) -> Cameras:
    """Interpolate between the given cameras (positions lerp, rotations
    slerp, intrinsics lerp)."""
    c2w = np.asarray(cameras.camera_to_worlds)
    fx = np.asarray(cameras.fx)
    fy = np.asarray(cameras.fy)
    cx = np.asarray(cameras.cx)
    cy = np.asarray(cameras.cy)
    w = np.asarray(cameras.width)
    h = np.asarray(cameras.height)
    if indices is not None:
        c2w, fx, fy, cx, cy, w, h = (
            a[indices] for a in (c2w, fx, fy, cx, cy, w, h)
        )
    n = c2w.shape[0]
    if n < 2:
        reps = max(steps, 1)
        return Cameras(
            camera_to_worlds=np.repeat(c2w, reps, 0),
            fx=np.repeat(fx, reps), fy=np.repeat(fy, reps),
            cx=np.repeat(cx, reps), cy=np.repeat(cy, reps),
            width=np.repeat(w, reps), height=np.repeat(h, reps),
            camera_type=np.full((reps,), CameraType.PERSPECTIVE.value, np.int32),
        )
    per_seg = max(steps // (n - 1), 1)
    out_c2w, out_fx, out_fy, out_cx, out_cy = [], [], [], [], []
    for i in range(n - 1):
        q0 = _rot_to_quat(c2w[i, :3, :3])
        q1 = _rot_to_quat(c2w[i + 1, :3, :3])
        for s in range(per_seg):
            t = s / per_seg
            rot = _quat_to_rot(_slerp(q0, q1, t))
            trans = (1 - t) * c2w[i, :3, 3] + t * c2w[i + 1, :3, 3]
            pose = np.concatenate([rot, trans[:, None]], axis=-1)
            out_c2w.append(pose)
            out_fx.append((1 - t) * fx[i] + t * fx[i + 1])
            out_fy.append((1 - t) * fy[i] + t * fy[i + 1])
            out_cx.append((1 - t) * cx[i] + t * cx[i + 1])
            out_cy.append((1 - t) * cy[i] + t * cy[i + 1])
    k = len(out_c2w)
    return Cameras(
        camera_to_worlds=np.stack(out_c2w).astype(np.float32),
        fx=np.asarray(out_fx, np.float32),
        fy=np.asarray(out_fy, np.float32),
        cx=np.asarray(out_cx, np.float32),
        cy=np.asarray(out_cy, np.float32),
        width=np.full((k,), int(w[0]), np.int32),
        height=np.full((k,), int(h[0]), np.int32),
        camera_type=np.full((k,), CameraType.PERSPECTIVE.value, np.int32),
    )


def get_spiral_path(
    camera_c2w: np.ndarray, fx: float, fy: float, cx: float, cy: float,
    width: int, height: int, steps: int = 30, radius: float = 0.1,
    rots: int = 2, zrate: float = 0.5,
) -> Cameras:
    """Spiral around a central camera (reference camera_paths.py:34-77)."""
    up = camera_c2w[:3, 1]
    focal = min(fx, fy)
    target = camera_c2w[:3, 3] - camera_c2w[:3, 2] * focal * 0.01

    poses = []
    for theta in np.linspace(0.0, 2.0 * np.pi * rots, steps + 1)[:-1]:
        center = (
            camera_c2w[:3, 3]
            + radius * (np.cos(theta) * camera_c2w[:3, 0] + np.sin(theta) * camera_c2w[:3, 1])
            - radius * np.sin(theta * zrate) * camera_c2w[:3, 2]
        )
        forward = target - center
        forward = forward / np.linalg.norm(forward)
        right = np.cross(forward, up)
        right /= np.linalg.norm(right)
        true_up = np.cross(right, forward)
        pose = np.stack([right, true_up, -forward, center], axis=-1)
        poses.append(pose)
    k = len(poses)
    return Cameras(
        camera_to_worlds=np.stack(poses).astype(np.float32),
        fx=np.full((k,), fx, np.float32),
        fy=np.full((k,), fy, np.float32),
        cx=np.full((k,), cx, np.float32),
        cy=np.full((k,), cy, np.float32),
        width=np.full((k,), width, np.int32),
        height=np.full((k,), height, np.int32),
        camera_type=np.full((k,), CameraType.PERSPECTIVE.value, np.int32),
    )
