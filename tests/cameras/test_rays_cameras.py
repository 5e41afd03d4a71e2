import numpy as np
import jax
import jax.numpy as jnp

from nerfstudio_thermal_tpu.cameras.cameras import Cameras, CameraType
from nerfstudio_thermal_tpu.cameras.camera_optimizers import (
    CameraOptimizerConfig,
    build_camera_optimizer,
)
from nerfstudio_thermal_tpu.cameras.camera_utils import (
    radial_and_tangential_undistort,
)
from nerfstudio_thermal_tpu.cameras.lie_groups import exp_map_SE3, exp_map_SO3xR3
from nerfstudio_thermal_tpu.cameras.rays import RayBundle


def make_cameras(n=2, h=8, w=10):
    c2w = np.tile(np.eye(4)[:3].astype(np.float32), (n, 1, 1))
    c2w[:, :3, 3] = np.arange(n)[:, None] * np.array([1.0, 0.0, 0.0])
    return Cameras(
        camera_to_worlds=jnp.asarray(c2w),
        fx=jnp.full((n,), 5.0),
        fy=jnp.full((n,), 5.0),
        cx=jnp.full((n,), w / 2),
        cy=jnp.full((n,), h / 2),
        width=jnp.full((n,), w, jnp.int32),
        height=jnp.full((n,), h, jnp.int32),
        distortion_params=jnp.zeros((n, 6)),
        camera_type=jnp.full((n,), CameraType.PERSPECTIVE.value, jnp.int32),
    )


def test_center_ray_points_down_minus_z():
    cams = make_cameras()
    # coords are (y, x); the pixel whose center hits the principal point
    coords = jnp.asarray([[4.0, 5.0]])
    rb = cams.generate_rays(jnp.asarray([0]), coords)
    np.testing.assert_allclose(np.asarray(rb.directions), [[0.0, 0.0, -1.0]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rb.origins), [[0.0, 0.0, 0.0]], atol=1e-6)
    assert rb.pixel_area.shape == (1, 1)
    assert float(rb.pixel_area[0, 0]) > 0


def test_ray_direction_off_center_and_origin_gather():
    cams = make_cameras()
    coords = jnp.asarray([[4.0, 7.5]])  # x offset +2.5 px => tan = 0.5
    rb = cams.generate_rays(jnp.asarray([1]), coords)
    d = np.asarray(rb.directions)[0]
    np.testing.assert_allclose(d / np.abs(d[2]), [0.5, 0.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rb.origins)[0], [1.0, 0.0, 0.0], atol=1e-6)


def test_generate_rays_inside_jit():
    cams = make_cameras()

    @jax.jit
    def f(idx, coords):
        rb = cams.generate_rays(idx, coords)
        return rb.directions

    out = f(jnp.zeros((16,), jnp.int32), jnp.tile(jnp.asarray([[2.0, 3.0]]), (16, 1)))
    assert out.shape == (16, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0, rtol=1e-6)


def test_undistort_roundtrip():
    rng = np.random.default_rng(0)
    dist = jnp.asarray([[0.01, -0.005, 0.0, 0.0, 0.001, -0.002]])
    xy = rng.uniform(-0.3, 0.3, size=(20, 2)).astype(np.float32)

    # forward distortion model
    x, y = xy[:, 0], xy[:, 1]
    r = x * x + y * y
    k1, k2, k3, k4, p1, p2 = np.asarray(dist)[0]
    d = 1 + r * (k1 + r * (k2 + r * (k3 + r * k4)))
    xd = d * x + 2 * p1 * x * y + p2 * (r + 2 * x * x)
    yd = d * y + 2 * p2 * x * y + p1 * (r + 2 * y * y)

    undist = radial_and_tangential_undistort(
        jnp.stack([jnp.asarray(xd), jnp.asarray(yd)], -1), dist
    )
    np.testing.assert_allclose(np.asarray(undist), xy, atol=1e-5)


def test_get_weights_matches_manual():
    rng = np.random.default_rng(1)
    R, S = 4, 8
    starts = np.cumsum(rng.uniform(0.01, 0.2, (R, S, 1)), axis=1)
    ends = starts + rng.uniform(0.01, 0.1, (R, S, 1))
    dens = rng.uniform(0, 3, (R, S, 1)).astype(np.float32)

    from nerfstudio_thermal_tpu.cameras.rays import RaySamples

    rs = RaySamples(
        origins=jnp.zeros((R, 3)),
        directions=jnp.zeros((R, 3)),
        pixel_area=jnp.ones((R, 1)),
        camera_indices=jnp.zeros((R, 1), jnp.int32),
        starts=jnp.asarray(starts, jnp.float32),
        ends=jnp.asarray(ends, jnp.float32),
        spacing_starts=jnp.zeros((R, S, 1)),
        spacing_ends=jnp.zeros((R, S, 1)),
        s_near=jnp.zeros((R, 1)),
        s_far=jnp.ones((R, 1)),
    )
    w = np.asarray(rs.get_weights(jnp.asarray(dens)))

    deltas = ends - starts
    dd = deltas * dens
    alphas = 1 - np.exp(-dd)
    trans = np.exp(-np.concatenate([np.zeros((R, 1, 1)), np.cumsum(dd, 1)[:, :-1]], 1))
    np.testing.assert_allclose(w, alphas * trans, rtol=1e-3, atol=1e-7)
    assert (w.sum(1) <= 1.0 + 1e-5).all()


def test_exp_maps_at_zero_are_identity():
    z = jnp.zeros((3, 6))
    for f in (exp_map_SO3xR3, exp_map_SE3):
        out = np.asarray(f(z))
        np.testing.assert_allclose(out, np.tile(np.eye(4)[:3], (3, 1, 1)), atol=1e-3)


def test_exp_map_so3xr3_rotation():
    # 90 degrees about z
    t = jnp.asarray([[0.0, 0.0, 0.0, 0.0, 0.0, np.pi / 2]])
    out = np.asarray(exp_map_SO3xR3(t))[0]
    expected_r = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(out[:, :3], expected_r, atol=1e-5)


def test_camera_optimizer_modes():
    idx = jnp.asarray([0, 1, 2])
    for mode in ("SO3xR3", "SE3", "shared_SO3xR3"):
        opt = build_camera_optimizer(CameraOptimizerConfig(mode=mode), num_cameras=4)
        params = opt.init(jax.random.PRNGKey(0), idx)
        n = 1 if mode == "shared_SO3xR3" else 4
        assert params["params"]["pose_adjustment"].shape == (n, 6)
        out = opt.apply(params, idx)
        np.testing.assert_allclose(
            np.asarray(out), np.tile(np.eye(4)[:3], (3, 1, 1)), atol=1e-3
        )

    # penalty_scale=-1 turns it off
    opt = build_camera_optimizer(
        CameraOptimizerConfig(mode="SO3xR3", penalty_scale=-1), num_cameras=4
    )
    assert opt.mode == "off"


def test_camera_optimizer_non_trainable_masking():
    opt = build_camera_optimizer(
        CameraOptimizerConfig(mode="SO3xR3"),
        num_cameras=4,
        non_trainable_camera_indices=(1, 3),
    )
    params = opt.init(jax.random.PRNGKey(0), jnp.asarray([0]))
    params = jax.tree.map(lambda x: x + 0.3, params)  # nonzero adjustments
    out = np.asarray(opt.apply(params, jnp.asarray([0, 1, 2, 3])))
    eye = np.eye(4)[:3]
    assert not np.allclose(out[0], eye)
    np.testing.assert_allclose(out[1], eye, atol=1e-7)
    assert not np.allclose(out[2], eye)
    np.testing.assert_allclose(out[3], eye, atol=1e-7)


def test_apply_to_raybundle_moves_origins():
    opt = build_camera_optimizer(CameraOptimizerConfig(mode="SO3xR3"), num_cameras=2)
    params = opt.init(jax.random.PRNGKey(0), jnp.asarray([0]))
    params = {"params": {"pose_adjustment": jnp.asarray([[0.1, 0, 0, 0, 0, 0]] * 2)}}
    rb = RayBundle(
        origins=jnp.zeros((5, 3)),
        directions=jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (5, 1)),
        pixel_area=jnp.ones((5, 1)),
        camera_indices=jnp.zeros((5, 1), jnp.int32),
    )
    rb2 = opt.apply(params, rb, method=opt.apply_to_raybundle)
    np.testing.assert_allclose(np.asarray(rb2.origins)[:, 0], 0.1, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rb2.directions), np.asarray(rb.directions), atol=1e-4)
