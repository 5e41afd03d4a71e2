"""ODS / VR180 / FISHEYE624 camera models (reference cameras.py:642-930)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nerfstudio_thermal_tpu.cameras import camera_utils
from nerfstudio_thermal_tpu.cameras.cameras import Cameras, CameraType

IPD = 0.064


def make_cameras(cam_type, n=1, h=64, w=128, n_dist=6):
    c2w = np.tile(np.eye(4, dtype=np.float32)[:3], (n, 1, 1))
    return Cameras(
        camera_to_worlds=jnp.asarray(c2w),
        fx=jnp.full((n,), w / 2.0),
        fy=jnp.full((n,), h / 1.0),
        cx=jnp.full((n,), w / 2.0),
        cy=jnp.full((n,), h / 2.0),
        width=jnp.full((n,), w, jnp.int32),
        height=jnp.full((n,), h, jnp.int32),
        distortion_params=jnp.zeros((n, n_dist)),
        camera_type=jnp.full((n,), cam_type.value, jnp.int32),
    )


def rays_at(cams, ys, xs):
    coords = jnp.asarray(np.stack([ys, xs], -1), jnp.float32)
    idx = jnp.zeros(coords.shape[:-1], jnp.int32)
    return cams.generate_rays(idx, coords)


def test_ods_directions_match_equirect():
    ys = np.linspace(2, 62, 7)
    xs = np.linspace(2, 126, 7)
    for t in (CameraType.OMNIDIRECTIONALSTEREO_L, CameraType.OMNIDIRECTIONALSTEREO_R):
        b = rays_at(make_cameras(t), ys, xs)
        e = rays_at(make_cameras(CameraType.EQUIRECTANGULAR), ys, xs)
        np.testing.assert_allclose(
            np.asarray(b.directions), np.asarray(e.directions), atol=1e-6
        )


def test_ods_origins_on_ipd_circle():
    ys = np.full(32, 32.0)
    xs = np.linspace(0, 127, 32)
    for t, sign in (
        (CameraType.OMNIDIRECTIONALSTEREO_L, -1.0),
        (CameraType.OMNIDIRECTIONALSTEREO_R, 1.0),
    ):
        b = rays_at(make_cameras(t), ys, xs)
        o = np.asarray(b.origins)
        # on the horizontal circle of radius IPD/2 (identity pose: world == cam)
        np.testing.assert_allclose(
            np.linalg.norm(o[:, [0, 2]], axis=-1), IPD / 2, atol=1e-6
        )
        np.testing.assert_allclose(o[:, 1], 0.0, atol=1e-7)
        # phase: at pixel azimuth theta, offset = sign*(ipd/2)*[cos t, 0, -sin t]
        theta = -np.pi * (xs - 64.0) / 64.0
        np.testing.assert_allclose(
            o[:, 0], sign * IPD / 2 * np.cos(theta), atol=1e-6
        )
        np.testing.assert_allclose(
            o[:, 2], -sign * IPD / 2 * np.sin(theta), atol=1e-6
        )


def test_vr180_origins_fixed_interocular():
    ys = np.linspace(2, 62, 5)
    xs = np.linspace(2, 126, 5)
    left = rays_at(make_cameras(CameraType.VR180_L), ys, xs)
    right = rays_at(make_cameras(CameraType.VR180_R), ys, xs)
    np.testing.assert_allclose(
        np.asarray(left.origins), np.tile([-IPD / 2, 0, 0], (5, 1)), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(right.origins), np.tile([IPD / 2, 0, 0], (5, 1)), atol=1e-7
    )


def test_vr180_theta_range_halved():
    # center pixel looks along -z; x edges bend to +/-90deg instead of 180
    cams = make_cameras(CameraType.VR180_L)
    b = rays_at(cams, np.array([32.0, 32.0, 32.0]), np.array([64.0, 0.0, 128.0]))
    d = np.asarray(b.directions)
    np.testing.assert_allclose(d[0], [0, 0, -1], atol=1e-6)
    # x=0: theta = +pi/2 -> direction -sin(pi/2)*sin(phi)= -1 on x... sign per
    # equirect convention: theta = -pi*(x-cx)/(2fx) = +pi/2 -> dir x = -sin(t)= -1
    np.testing.assert_allclose(d[1], [-1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(d[2], [1, 0, 0], atol=1e-6)


def test_fisheye624_zero_distortion_closed_form():
    # with k=p=s=0 the model reduces to the pure equidistant fisheye:
    # uv_dist = theta*(cos phi, sin phi); dir = tan(theta)*(cos, sin), z=-1
    h, w = 64, 64
    cams = make_cameras(CameraType.FISHEYE624, h=h, w=w, n_dist=12)
    ys = np.array([32.0, 20.0, 44.0, 32.0])
    xs = np.array([32.0, 32.0, 20.0, 44.0])
    b = rays_at(cams, ys, xs)
    d = np.asarray(b.directions)

    fx, fy, cx, cy = w / 2.0, h / 1.0, w / 2.0, h / 2.0
    u = (xs - cx) / fx
    v = (ys - cy) / fy
    theta = np.sqrt(u**2 + v**2)
    with np.errstate(invalid="ignore"):
        scale = np.where(theta > 0, np.tan(theta) / np.maximum(theta, 1e-9), 1.0)
    expect = np.stack([u * scale, -v * scale, -np.ones_like(u)], -1)
    expect /= np.linalg.norm(expect, axis=-1, keepdims=True)
    np.testing.assert_allclose(d, expect, atol=1e-5)


def test_fisheye624_distorted_roundtrip():
    """unproject(project(dir)) == dir via self-consistency: project the
    returned direction forward through the closed-form model and check the
    original pixel comes back."""
    rng = np.random.default_rng(0)
    h, w = 64, 64
    dist = np.zeros((1, 12), np.float32)
    dist[0, :6] = [0.05, -0.01, 0.002, 0.0, 0.0, 0.0]  # k0..k5
    dist[0, 6:8] = [0.004, -0.003]  # p0 p1
    dist[0, 8:] = [0.001, -0.0005, 0.0008, 0.0002]  # s0..s3

    cams = make_cameras(CameraType.FISHEYE624, h=h, w=w, n_dist=12)
    cams = cams.replace(distortion_params=jnp.asarray(dist))
    ys = np.array([30.0, 22.0, 40.0])
    xs = np.array([30.0, 40.0, 25.0])
    b = rays_at(cams, ys, xs)
    d = np.asarray(b.directions)  # unit, OpenGL

    # forward-project with the documented model (reference camera_utils:627)
    x, y, z = d[:, 0], -d[:, 1], -d[:, 2]  # back to OpenCV
    a_, b_ = x / z, y / z
    r = np.sqrt(a_**2 + b_**2)
    th = np.arctan(r)
    th_k = th.copy()
    for i in range(6):
        th_k = th_k + dist[0, i] * th ** (3 + 2 * i)
    xr = th_k * a_ / r
    yr = th_k * b_ / r
    rd_sq = xr**2 + yr**2
    p0, p1 = dist[0, 6], dist[0, 7]
    s0, s1, s2, s3 = dist[0, 8:]
    u_d = xr + (2 * xr**2 + rd_sq) * p0 + 2 * xr * yr * p1 + s0 * rd_sq + s1 * rd_sq**2
    v_d = yr + (2 * yr**2 + rd_sq) * p1 + 2 * xr * yr * p0 + s2 * rd_sq + s3 * rd_sq**2
    fx, fy, cx, cy = w / 2.0, h / 1.0, w / 2.0, h / 2.0
    u_pix = u_d * fx + cx
    v_pix = v_d * fy + cy
    np.testing.assert_allclose(u_pix, xs + 0.0, atol=2e-3)
    np.testing.assert_allclose(v_pix, ys + 0.0, atol=2e-3)


def test_mixed_batch_dispatch():
    """One ray batch across all 9 camera types compiles and is finite."""
    import jax

    n = 9
    c2w = np.tile(np.eye(4, dtype=np.float32)[:3], (n, 1, 1))
    cams = Cameras(
        camera_to_worlds=jnp.asarray(c2w),
        fx=jnp.full((n,), 40.0), fy=jnp.full((n,), 40.0),
        cx=jnp.full((n,), 32.0), cy=jnp.full((n,), 32.0),
        width=jnp.full((n,), 64, jnp.int32), height=jnp.full((n,), 64, jnp.int32),
        distortion_params=jnp.zeros((n, 12)),
        camera_type=jnp.asarray([t.value for t in CameraType], jnp.int32),
    )
    idx = jnp.arange(9, dtype=jnp.int32)
    coords = jnp.full((9, 2), 21.5)
    bundle = jax.jit(lambda i, c: cams.generate_rays(i, c))(idx, coords)
    assert np.isfinite(np.asarray(bundle.directions)).all()
    assert np.isfinite(np.asarray(bundle.origins)).all()
    norms = np.linalg.norm(np.asarray(bundle.directions), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
