"""Camera math helpers.

Behavioral spec: reference `nerfstudio/cameras/camera_utils.py`
(`radial_and_tangential_undistort:409-446` Newton solver with fixed iteration
count — already jit-shaped; `auto_orient_and_center_poses:515-580` used
host-side by dataparsers).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _residual_and_jacobian(x, y, xd, yd, distortion_params):
    """OpenCV radial(k1..k4)+tangential(p1,p2) forward model residuals
    (reference camera_utils.py:343-405)."""
    k1 = distortion_params[..., 0]
    k2 = distortion_params[..., 1]
    k3 = distortion_params[..., 2]
    k4 = distortion_params[..., 3]
    p1 = distortion_params[..., 4]
    p2 = distortion_params[..., 5]

    r = x * x + y * y
    d = 1.0 + r * (k1 + r * (k2 + r * (k3 + r * k4)))

    fx = d * x + 2 * p1 * x * y + p2 * (r + 2 * x * x) - xd
    fy = d * y + 2 * p2 * x * y + p1 * (r + 2 * y * y) - yd

    d_r = k1 + r * (2.0 * k2 + r * (3.0 * k3 + r * 4.0 * k4))
    d_x = 2.0 * x * d_r
    d_y = 2.0 * y * d_r

    fx_x = d + d_x * x + 2.0 * p1 * y + 6.0 * p2 * x
    fx_y = d_y * x + 2.0 * p1 * x + 2.0 * p2 * y
    fy_x = d_x * y + 2.0 * p2 * y + 2.0 * p1 * x
    fy_y = d + d_y * y + 2.0 * p2 * x + 6.0 * p1 * y
    return fx, fy, fx_x, fx_y, fy_x, fy_y


def radial_and_tangential_undistort(
    coords: jax.Array,
    distortion_params: jax.Array,
    eps: float = 1e-3,
    max_iterations: int = 10,
) -> jax.Array:
    """Invert the OpenCV distortion model by Newton iteration (fixed count,
    so it traces to a static XLA program). coords [..., 2]."""
    xd, yd = coords[..., 0], coords[..., 1]

    def body(_, xy):
        x, y = xy
        fx, fy, fx_x, fx_y, fy_x, fy_y = _residual_and_jacobian(
            x, y, xd, yd, distortion_params
        )
        denom = fy_x * fx_y - fx_x * fy_y
        x_num = fx * fy_y - fy * fx_y
        y_num = fy * fx_x - fx * fy_x
        ok = jnp.abs(denom) > eps
        step_x = jnp.where(ok, x_num / denom, 0.0)
        step_y = jnp.where(ok, y_num / denom, 0.0)
        return (x + step_x, y + step_y)

    x, y = jax.lax.fori_loop(0, max_iterations, body, (xd, yd))
    return jnp.stack([x, y], axis=-1)


def normalize_with_norm(x: jax.Array, axis: int) -> Tuple[jax.Array, jax.Array]:
    """Normalize and also return the norm (keepdims)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, 1e-12), norm


# ---------------------------------------------------------------------------
# Host-side (numpy) pose utilities used by dataparsers.
# ---------------------------------------------------------------------------


def focus_of_attention_np(poses: np.ndarray, initial_focus: np.ndarray) -> np.ndarray:
    """Least-squares focus point of cameras that look at it
    (reference camera_utils.py:477-514)."""
    active_directions = -poses[:, :3, 2:3]
    active_origins = poses[:, :3, 3:4]
    focus_pt = initial_focus
    active = (
        np.sum(active_directions.squeeze(-1) * (focus_pt - active_origins.squeeze(-1)), axis=-1)
        > 0
    )
    done = False
    while np.sum(active) > 1 and not done:
        active_o = active_origins[active]
        active_d = active_directions[active]
        m = np.eye(3) - active_d * np.transpose(active_d, (0, 2, 1))
        mt_m = np.transpose(m, (0, 2, 1)) @ m
        # pinv: parallel view directions make mt_m singular (e.g. synthetic
        # rigs where every camera faces the same way)
        focus_pt = np.linalg.pinv(mt_m.mean(0)) @ (mt_m @ active_o).mean(0)[:, 0]
        new_active = (
            np.sum(active_directions.squeeze(-1) * (focus_pt - active_origins.squeeze(-1)), axis=-1)
            > 0
        )
        if np.array_equal(active, new_active):
            done = True
        active = new_active
    return focus_pt


def _rotation_matrix_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Rotation taking unit vector a to unit vector b (reference :449-474)."""
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    v = np.cross(a, b)
    c = float(np.dot(a, b))
    if c < -1 + 1e-8:
        eps = (np.random.default_rng(0).random(3) - 0.5) * 0.01
        return _rotation_matrix_np(a + eps, b)
    s = np.linalg.norm(v)
    skew = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + skew + skew @ skew * ((1 - c) / (s**2 + 1e-8))


def auto_orient_and_center_poses(
    poses: np.ndarray, method: str = "up", center_method: str = "poses"
) -> Tuple[np.ndarray, np.ndarray]:
    """Orient and center camera poses (host side).

    Spec: reference camera_utils.py:515-580. Methods: up/vertical(≈up here)/
    pca(not implemented, falls back to up)/none; center: poses/focus/none.
    poses: [N, 4, 4] (or [N, 3, 4]); returns (oriented [N, 3, 4], applied
    transform [3, 4]).
    """
    if poses.shape[-2] == 3:
        bottom = np.tile(np.array([0.0, 0.0, 0.0, 1.0]), (poses.shape[0], 1, 1))
        poses = np.concatenate([poses, bottom], axis=-2)
    origins = poses[..., :3, 3]
    mean_origin = origins.mean(0)

    if center_method == "poses":
        translation = mean_origin
    elif center_method == "focus":
        translation = focus_of_attention_np(poses, mean_origin)
    elif center_method == "none":
        translation = np.zeros(3)
    else:
        raise ValueError(f"unknown center_method {center_method}")

    if method in ("up", "vertical"):
        up = poses[:, :3, 1].mean(0)
        up = up / np.linalg.norm(up)
        rotation = _rotation_matrix_np(up, np.array([0.0, 0.0, 1.0]))
        transform = np.concatenate([rotation, rotation @ -translation[..., None]], axis=-1)
    elif method == "none":
        transform = np.eye(4)[:3]
        transform[:3, 3] = -translation
    else:
        raise ValueError(f"unknown orient method {method}")

    oriented = np.einsum("ij,njk->nik", np.vstack([transform, [0, 0, 0, 1]]), poses)[:, :3]
    return oriented, transform


def get_distortion_params(
    k1: float = 0.0,
    k2: float = 0.0,
    k3: float = 0.0,
    k4: float = 0.0,
    p1: float = 0.0,
    p2: float = 0.0,
) -> np.ndarray:
    """Pack OpenCV distortion params in the [k1 k2 k3 k4 p1 p2] layout
    (reference camera_utils.py:296-341)."""
    return np.array([k1, k2, k3, k4, p1, p2], dtype=np.float32)


def fisheye624_unproject(
    pix: jax.Array, camera_params: jax.Array, max_iters: int = 5
) -> jax.Array:
    """Unproject pixels under the FisheyeRadTanThinPrism (Fisheye624) model.

    Behavioral spec: reference cameras/camera_utils.py:716-845
    (fisheye624_unproject_helper + the OpenCV->OpenGL sign flips of
    fisheye624_unproject). No analytic inverse exists, so two fixed-iteration
    Newton solves run per ray (static trip count: jit-friendly).

    Args:
        pix: [..., 2] pixel coordinates (u, v).
        camera_params: [..., 16] per-ray [fx fy cx cy k0..k5 p0 p1 s0..s3].

    Returns:
        [..., 3] OpenGL camera-space ray directions (z = -1 plane).
    """
    eps = 1e-6
    fx_fy = camera_params[..., 0:2]
    cx_cy = camera_params[..., 2:4]
    ks = [camera_params[..., 4 + i] for i in range(6)]
    p0, p1 = camera_params[..., 10], camera_params[..., 11]
    s0, s1, s2, s3 = (camera_params[..., 12 + i] for i in range(4))

    uv_dist = (pix - cx_cy) / fx_fy  # [..., 2]

    def distort_est(xr_yr):
        xr, yr = xr_yr[..., 0], xr_yr[..., 1]
        xr_sq, yr_sq = xr * xr, yr * yr
        rd_sq = xr_sq + yr_sq
        rd_4 = rd_sq * rd_sq
        u = xr + (2.0 * xr_sq + rd_sq) * p0 + 2.0 * xr * yr * p1 + s0 * rd_sq + s1 * rd_4
        v = yr + (2.0 * yr_sq + rd_sq) * p1 + 2.0 * xr * yr * p0 + s2 * rd_sq + s3 * rd_4
        return jnp.stack([u, v], axis=-1)

    # Newton solve 1: invert tangential + thin-prism to get (x_r, y_r).
    xr_yr = uv_dist
    for _ in range(max_iters):
        est = distort_est(xr_yr)
        xr, yr = xr_yr[..., 0], xr_yr[..., 1]
        sq_norm = xr * xr + yr * yr
        t1 = 2.0 * (s0 + 2.0 * s1 * sq_norm)
        t2 = 2.0 * (s2 + 2.0 * s3 * sq_norm)
        a = 1.0 + 6.0 * xr * p0 + 2.0 * yr * p1 + xr * t1
        b = 2.0 * (xr * p1 + yr * p0) + yr * t1
        c = 2.0 * (xr * p1 + yr * p0) + xr * t2
        d = 1.0 + 6.0 * yr * p1 + 2.0 * xr * p0 + yr * t2
        det = a * d - b * c
        diff = uv_dist - est
        e, f = diff[..., 0], diff[..., 1]
        step = jnp.stack([(d * e - b * f), (-c * e + a * f)], axis=-1) / det[..., None]
        xr_yr = xr_yr + step

    # Newton solve 2: invert the radial polynomial for theta.
    xr_yr_norm = jnp.linalg.norm(xr_yr, axis=-1)
    th = xr_yr_norm
    for _ in range(max_iters):
        th_radial = jnp.ones_like(th)
        dthd_th = jnp.ones_like(th)
        for k in range(6):
            th_radial = th_radial + ks[k] * th ** (2 + k * 2)
            dthd_th = dthd_th + (3.0 + 2.0 * k) * ks[k] * th ** (2 + k * 2)
        th_radial = th_radial * th
        step = (xr_yr_norm - th_radial) / dthd_th
        step = jnp.where(
            jnp.abs(dthd_th) > eps, step, jnp.sign(step) * eps * 10.0
        )
        th = th + step

    close = (jnp.abs(th) < eps) & (jnp.abs(xr_yr_norm) < eps)
    scale = jnp.where(
        close, 1.0, jnp.tan(th) / jnp.maximum(xr_yr_norm, eps)
    )[..., None]
    ray_dir = xr_yr * scale
    # OpenCV -> OpenGL: flip y and z (reference camera_utils.py:839-845).
    return jnp.stack(
        [ray_dir[..., 0], -ray_dir[..., 1], -jnp.ones_like(th)], axis=-1
    )
