"""Depth losses + occupancy grid unit tests, and depth-nerfacto with real
depth supervision on a fixture with depth files."""

import json
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from nerfstudio_thermal_tpu.model_components.losses import (
    depth_loss,
    ds_nerf_depth_loss,
    urban_radiance_field_depth_loss,
)
from nerfstudio_thermal_tpu.model_components.occupancy_grid import (
    create_occupancy_grid,
    occupancy_mask,
    update_occupancy_grid,
)


def make_samples(R=4, S=16):
    from nerfstudio_thermal_tpu.cameras.rays import RayBundle
    from nerfstudio_thermal_tpu.model_components.ray_samplers import spaced_sample

    rb = RayBundle(
        origins=jnp.zeros((R, 3)),
        directions=jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (R, 1)),
        pixel_area=jnp.ones((R, 1)),
        camera_indices=jnp.zeros((R, 1), jnp.int32),
        nears=jnp.full((R, 1), 0.5),
        fars=jnp.full((R, 1), 4.0),
    )
    return spaced_sample(rb, S, train=False)


def test_ds_nerf_depth_loss_prefers_mass_at_gt_depth():
    rs = make_samples()
    steps = np.asarray((rs.starts + rs.ends) / 2)
    gt_depth = jnp.full((4, 1), 2.0)

    # weights concentrated at the right depth
    good = np.exp(-((steps - 2.0) ** 2) / 0.01).astype(np.float32)
    good /= good.sum(1, keepdims=True)
    # weights at the wrong depth
    bad = np.exp(-((steps - 3.5) ** 2) / 0.01).astype(np.float32)
    bad /= bad.sum(1, keepdims=True)

    l_good = float(depth_loss(jnp.asarray(good), rs, gt_depth, gt_depth, 0.05,
                              jnp.ones((4, 1)), True, "ds_nerf"))
    l_bad = float(depth_loss(jnp.asarray(bad), rs, gt_depth, gt_depth, 0.05,
                             jnp.ones((4, 1)), True, "ds_nerf"))
    assert l_good < l_bad


def test_urf_depth_loss_runs_and_masks_invalid():
    rs = make_samples()
    w = jnp.full((4, 16, 1), 1.0 / 16)
    gt = jnp.asarray([[2.0], [0.0], [1.0], [3.0]])  # 0 = invalid
    loss = depth_loss(w, rs, gt, jnp.full((4, 1), 2.0), 0.1,
                      jnp.ones((4, 1)), True, "urf")
    assert np.isfinite(float(loss))


def test_occupancy_grid_update_and_mask():
    grid = create_occupancy_grid(16, [[-1, -1, -1], [1, 1, 1]])

    def density_fn(p):
        # dense only in the +x half-space
        return (p[..., :1] > 0).astype(jnp.float32) * 5.0

    grid = update_occupancy_grid(grid, density_fn, jax.random.PRNGKey(0),
                                 num_samples=16**3 * 4)
    pts = jnp.asarray([[0.5, 0.0, 0.0], [-0.5, 0.0, 0.0]])
    mask = np.asarray(occupancy_mask(grid, pts, 0.5))
    assert mask[0, 0] == 1.0 and mask[1, 0] == 0.0


def test_depth_nerfacto_with_depth_files(tmp_path):
    from PIL import Image
    from tests.fixtures import look_at
    from nerfstudio_thermal_tpu.configs.method_configs import get_method_config, setup_trainer
    from tests.test_all_methods_train import shrink

    root = tmp_path / "data"
    (root / "images").mkdir(parents=True)
    (root / "depths").mkdir(parents=True)
    rng = np.random.default_rng(0)
    frames = []
    for i in range(4):
        angle = 2 * np.pi * i / 4
        c2w = look_at(2.0 * np.array([np.cos(angle), np.sin(angle), 0.3]))
        Image.fromarray((rng.uniform(size=(10, 12, 3)) * 255).astype(np.uint8)).save(
            root / "images" / f"f_{i}.png"
        )
        depth_mm = (rng.uniform(1000, 3000, size=(10, 12))).astype(np.uint16)
        Image.fromarray(depth_mm, mode="I;16").save(root / "depths" / f"f_{i}.png")
        frames.append({
            "file_path": f"images/f_{i}.png",
            "depth_file_path": f"depths/f_{i}.png",
            "transform_matrix": c2w.tolist(),
            "fl_x": 10.0, "fl_y": 10.0, "cx": 6.0, "cy": 5.0, "w": 12, "h": 10,
        })
    (root / "transforms.json").write_text(json.dumps({"frames": frames}))

    cfg = shrink(get_method_config("depth-nerfacto"))
    cfg.data = root
    cfg.dataparser.train_split_fraction = 0.5
    trainer = setup_trainer(cfg, base_dir=tmp_path / "out")
    trainer.setup()
    batch = trainer.datamanager.next_train(0)
    assert "depth_image" in batch and batch["depth_image"].shape[-1] == 1
    trainer.train()
    scalars = trainer.train_iteration(2)
    assert "depth_loss" in scalars
    assert np.isfinite(float(scalars["loss"]))


def test_tensorf_upsampling_mid_training(tmp_path):
    """VM grids upsample at scheduled steps through the trainer's host
    refinement hook and training continues at the new shapes
    (reference tensorf.py:49-153)."""
    import jax
    import numpy as np

    from nerfstudio_thermal_tpu.configs.method_configs import (
        get_method_config, setup_trainer,
    )
    from tests.test_all_methods_train import make_blender_fixture

    cfg = get_method_config("tensorf")
    cfg.data = make_blender_fixture(tmp_path / "blender")
    cfg.trainer.max_num_iterations = 6
    for a in ("steps_per_save", "steps_per_eval_image", "steps_per_eval_batch",
              "steps_per_log"):
        setattr(cfg.trainer, a, 100000)
    cfg.trainer.steps_per_eval_all_images = 0
    cfg.trainer.num_devices = 1
    cfg.datamanager.train_num_rays_per_batch = 16
    m = cfg.model
    m.compute_dtype = "float32"
    m.resolution = 8
    m.final_resolution = 16
    m.upsampling_iters = (2, 4)
    m.num_uniform_samples = 8
    m.num_samples = 4
    m.density_components = 4
    m.color_components = 6
    m.appearance_dim = 6
    m.head_mlp_width = 8
    m.eval_num_rays_per_chunk = 32
    trainer = setup_trainer(cfg, base_dir=tmp_path / "out")
    trainer.setup()

    r0 = trainer.state.params["fields"]["density_planes"].shape[1]
    assert r0 == 8
    losses = []
    for step in range(6):
        s = trainer.train_iteration(step)
        losses.append(float(s["loss"]))
    r1 = trainer.state.params["fields"]["density_planes"].shape[1]
    assert r1 == 16, r1  # final_resolution reached after both upsamples
    assert np.isfinite(losses).all()
    # optimizer state resized consistently (a further step still works)
    s = trainer.train_iteration(6)
    assert np.isfinite(float(s["loss"]))


def test_dynamic_batch_pipeline(tmp_path):
    """instant-ngp's DynamicBatchPipeline resizes the ray batch toward
    target_num_samples using the occupancy live-sample count, quantized to
    power-of-two jit buckets (reference pipelines/dynamic_batch.py:36-105)."""
    from nerfstudio_thermal_tpu.configs.method_configs import (
        get_method_config, setup_trainer,
    )
    from nerfstudio_thermal_tpu.pipelines.dynamic_batch import DynamicBatchPipeline
    from tests.test_all_methods_train import make_ingp_fixture, shrink

    cfg = shrink(get_method_config("instant-ngp-bounded"))
    cfg.data = make_ingp_fixture(tmp_path / "ingp")
    cfg.dataparser.train_split_fraction = 0.5
    cfg.trainer.max_num_iterations = 3
    cfg.dynamic_batch.update_every = 1
    cfg.dynamic_batch.target_num_samples = 64
    cfg.dynamic_batch.min_num_rays_per_batch = 8
    cfg.dynamic_batch.max_num_rays_per_batch = 64
    trainer = setup_trainer(cfg, base_dir=tmp_path / "out")
    assert isinstance(trainer.pipeline, DynamicBatchPipeline)
    trainer.setup()
    trainer.train()
    n = trainer.datamanager.num_rays_override
    assert n is not None and n in {8, 16, 32, 64}, n
    # training continues fine at the resized batch (new jit bucket)
    scalars = trainer.train_iteration(4)
    assert np.isfinite(float(scalars["loss"]))
    assert float(scalars["num_samples_per_ray"]) > 0
