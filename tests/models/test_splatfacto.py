"""Splatfacto tests: projection/rasterization math, occlusion ordering,
refinement (densify/cull) on the fixed-capacity pools, and a short learning
run. Reference surface: nerfstudio/models/splatfacto.py."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfstudio_thermal_tpu.models.splatfacto import (
    SplatfactoModel,
    SplatfactoModelConfig,
    project_gaussians,
    quat_to_rotmat,
    rasterize,
    sh_basis,
)


def test_quat_to_rotmat_orthonormal():
    q = jnp.asarray(np.random.default_rng(0).normal(size=(10, 4)).astype(np.float32))
    R = quat_to_rotmat(q)
    eye = jnp.eye(3)[None].repeat(10, 0)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)
    # identity quaternion -> identity matrix
    np.testing.assert_allclose(
        np.asarray(quat_to_rotmat(jnp.asarray([[1.0, 0, 0, 0]]))[0]), np.eye(3),
        atol=1e-7,
    )


def test_sh_basis_dc_and_count():
    dirs = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    for deg in range(4):
        b = sh_basis(deg, dirs)
        assert b.shape == (5, (deg + 1) ** 2)
    np.testing.assert_allclose(np.asarray(b[:, 0]), 0.28209479, rtol=1e-6)


def _cam(eye=np.array([0.0, 0.0, 2.0])):
    """OpenGL c2w looking at the origin from +z."""
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[:, 3] = eye
    return jnp.asarray(c2w)


def test_projection_center():
    """A gaussian at the origin seen from (0,0,2) projects to the image
    center with depth 2."""
    means = jnp.zeros((1, 3))
    scales = jnp.full((1, 3), 0.1)
    quats = jnp.asarray([[1.0, 0, 0, 0]])
    xys, depths, conics, radii, comp = project_gaussians(
        means, scales, quats, _cam(), 50.0, 50.0, 32.0, 24.0, 64, 48
    )
    np.testing.assert_allclose(np.asarray(xys[0]), [32.0, 24.0], atol=1e-4)
    np.testing.assert_allclose(float(depths[0]), 2.0, atol=1e-5)
    assert float(radii[0]) > 0


def test_rasterize_blob_and_occlusion():
    H, W = 32, 32
    cam = _cam()
    means = jnp.asarray([[0.0, 0.0, 0.0], [0.3, 0.0, -0.5]])  # 2nd is behind
    scales = jnp.full((2, 3), 0.15)
    quats = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (2, 1))
    xys, depths, conics, radii, comp = project_gaussians(
        means, scales, quats, cam, 40.0, 40.0, W / 2, H / 2, W, H
    )
    opac = jnp.asarray([0.99, 0.99])
    colors = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    alive = jnp.ones((2,), bool)
    rgb, accum, depth = rasterize(
        xys, depths, conics, radii, opac, colors, alive, H, W,
        jnp.zeros(3), chunk=2,
    )
    # center pixel: red (front gaussian) dominates
    c = np.asarray(rgb[H // 2, W // 2])
    assert c[0] > 0.8 and c[1] < 0.2, c
    assert float(accum[H // 2, W // 2, 0]) > 0.9
    # depth at center ~ front gaussian depth (2.0)
    assert abs(float(depth[H // 2, W // 2, 0]) - 2.0) < 0.1
    # corner pixel: background
    assert float(accum[0, 0, 0]) < 0.1


def _tiny_model(cap=512, n_random=64):
    cfg = SplatfactoModelConfig(
        max_num_gaussians=cap, num_random=n_random, random_init=True,
        random_scale=1.5, rasterize_chunk=64, sh_degree=1,
        warmup_length=5, refine_every=10, stop_split_at=1000,
        cull_alpha_thresh=0.05,
    )
    aabb = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
    model = SplatfactoModel(cfg, aabb, num_train_data=4)
    params = model.init_params(jax.random.PRNGKey(0))
    extra = model.init_extra_state()
    return model, params, extra


def test_refinement_densifies_and_culls():
    import optax

    model, params, extra = _tiny_model()
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    n0 = int(np.asarray(extra["alive"]).sum())

    # fake stats: strong gradient on the first 8 gaussians, tiny opacities on
    # gaussians 20..30 (should be culled)
    grad_accum = np.zeros(model.config.max_num_gaussians, np.float32)
    grad_accum[:8] = 1.0
    extra = {**extra, "grad_accum": jnp.asarray(grad_accum),
             "grad_count": jnp.ones_like(extra["grad_count"])}
    params = dict(params)
    params["opacities"] = params["opacities"].at[20:30].set(-8.0)  # ~0 opacity
    # make the first 4 large (split) and next 4 small (dup)
    params["scales"] = params["scales"].at[:4].set(np.log(0.05))
    params["scales"] = params["scales"].at[4:8].set(np.log(0.001))

    p2, o2, e2 = model.refine_host(params, opt_state, extra, step=20)
    alive2 = np.asarray(e2["alive"])
    # densified: split 4 -> +8, dup 4 -> +4; culled 10 transparent ones
    # (culled slots are immediately reusable as free slots)
    assert alive2.sum() == n0 + 12 - 10
    # the transparent slots were culled and refilled with fresh gaussians:
    # their opacity is no longer the sentinel -8
    refilled = alive2[20:30]
    ops2 = np.asarray(p2["opacities"])[20:30]
    assert np.all(ops2[refilled] > -7.0)
    # stats reset
    assert float(np.asarray(e2["grad_accum"]).sum()) == 0.0


@pytest.mark.slow
def test_splatfacto_learns(tmp_path):
    from nerfstudio_thermal_tpu.configs.method_configs import (
        get_method_config, setup_trainer,
    )
    from tests.fixtures import make_consistent_rgbt_dataset

    data = make_consistent_rgbt_dataset(
        tmp_path / "scene", num_pairs=6, rgb_hw=(24, 24), t_hw=(24, 24)
    )
    cfg = get_method_config("splatfacto")
    cfg.data = Path(data)
    cfg.trainer.max_num_iterations = 120
    cfg.trainer.steps_per_save = 10000
    cfg.trainer.steps_per_eval_image = 10000
    cfg.trainer.steps_per_eval_batch = 0
    cfg.trainer.steps_per_eval_all_images = 0
    cfg.trainer.steps_per_log = 10000
    cfg.trainer.num_devices = 1
    cfg.dataparser.train_split_fraction = 0.75
    m = cfg.model
    m.random_init = True
    m.num_random = 1024
    m.max_num_gaussians = 2048
    m.random_scale = 1.2
    m.rasterize_chunk = 128
    m.sh_degree = 1
    m.warmup_length = 30
    m.refine_every = 40
    m.background_color = "black"
    trainer = setup_trainer(cfg, base_dir=tmp_path / "out")
    trainer.setup()
    psnr0, psnr1 = [], []
    for step in range(cfg.trainer.max_num_iterations):
        s = trainer.train_iteration(step)
        if step < 5:
            psnr0.append(float(s["psnr"]))
        if step >= cfg.trainer.max_num_iterations - 10:
            psnr1.append(float(s["psnr"]))
    start, end = np.mean(psnr0), np.mean(psnr1)
    assert end > start + 2.0, f"splatfacto did not learn: {start:.2f} -> {end:.2f}"
    # eval render works with the alive snapshot
    out = trainer.pipeline.model.get_outputs_for_camera(
        trainer.host_params(), trainer.datamanager.eval_cameras, 0
    )
    assert np.isfinite(out["rgb"]).all()


@pytest.mark.slow
def test_splatfacto_render_cli(tmp_path):
    """ns-render interpolated works from a splatfacto checkpoint (the
    rasterization path through the shared full-image renderer)."""
    from nerfstudio_thermal_tpu.configs.method_configs import (
        get_method_config, setup_trainer,
    )
    from nerfstudio_thermal_tpu.configs.serialization import save_config
    from nerfstudio_thermal_tpu.scripts.render import main as ns_render
    from tests.fixtures import make_consistent_rgbt_dataset

    data = make_consistent_rgbt_dataset(
        tmp_path / "scene", num_pairs=4, rgb_hw=(16, 16), t_hw=(16, 16)
    )
    cfg = get_method_config("splatfacto")
    cfg.data = Path(data)
    cfg.trainer.max_num_iterations = 3
    cfg.trainer.steps_per_save = 3
    cfg.trainer.steps_per_eval_image = 0
    cfg.trainer.steps_per_eval_batch = 0
    cfg.trainer.steps_per_eval_all_images = 0
    cfg.trainer.num_devices = 1
    cfg.dataparser.train_split_fraction = 0.75
    m = cfg.model
    m.random_init = True
    m.num_random = 256
    m.max_num_gaussians = 512
    m.rasterize_chunk = 64
    m.sh_degree = 1
    m.warmup_length = 100
    trainer = setup_trainer(cfg, base_dir=tmp_path / "run")
    trainer.setup()
    trainer.train()
    save_config(cfg, tmp_path / "run" / "config.yml")

    rc = ns_render([
        "interpolated", "--load-config", str(tmp_path / "run" / "config.yml"),
        "--output-path", str(tmp_path / "out" / "frames"),
        "--interpolation-steps", "2",
    ])
    assert rc == 0
    imgs = list((tmp_path / "out").glob("**/*.png"))
    assert imgs, "no rendered frames"


def test_model_tile_rasterizer_matches_scan():
    """End-to-end render_camera parity: config.rasterizer="tiles" must
    reproduce the scan rasterizer (white background for determinism)."""
    from nerfstudio_thermal_tpu.cameras.cameras import Cameras, CameraType

    outs = {}
    for mode in ("scan", "tiles"):
        cfg = SplatfactoModelConfig(
            max_num_gaussians=96, num_random=96, random_init=True,
            random_scale=1.0, rasterize_chunk=32, sh_degree=1,
            background_color="white", rasterizer=mode,
            tile_capacity=96, tile_window=4,
        )
        aabb = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
        model = SplatfactoModel(cfg, aabb, num_train_data=2)
        params = model.init_params(jax.random.PRNGKey(0))
        extra = model.init_extra_state()
        c2w = np.eye(4, dtype=np.float32)[:3][None]
        c2w[0, 2, 3] = 3.0
        cams = Cameras(
            camera_to_worlds=jnp.asarray(c2w),
            fx=jnp.full((1,), 40.0), fy=jnp.full((1,), 40.0),
            cx=jnp.full((1,), 24.0), cy=jnp.full((1,), 20.0),
            width=jnp.full((1,), 48, jnp.int32),
            height=jnp.full((1,), 40, jnp.int32),
            distortion_params=jnp.zeros((1, 6)),
            camera_type=jnp.full((1,), CameraType.PERSPECTIVE.value, jnp.int32),
        )
        outs[mode] = model.render_camera(
            params, cams, 0, alive=extra["alive"], train=False,
        )
    np.testing.assert_allclose(
        np.asarray(outs["tiles"]["rgb"]), np.asarray(outs["scan"]["rgb"]),
        atol=3e-5,
    )
    np.testing.assert_allclose(
        np.asarray(outs["tiles"]["accumulation"]),
        np.asarray(outs["scan"]["accumulation"]), atol=3e-5,
    )
