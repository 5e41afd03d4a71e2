"""Smoke-train every registered method (the reference's test_train.py:34-80
pattern: every method minus a blacklist, tiny config, few iterations)."""

import json
from pathlib import Path

import numpy as np
import pytest

from nerfstudio_thermal_tpu.configs.method_configs import (
    get_method_config,
    method_configs,
    setup_trainer,
)
from tests.fixtures import look_at, make_synthetic_rgbt_dataset

BLACKLIST: set = set()


def make_blender_fixture(root: Path, n=3, hw=(12, 16)):
    from PIL import Image

    root = Path(root)
    (root / "train").mkdir(parents=True, exist_ok=True)
    frames = []
    rng = np.random.default_rng(0)
    for i in range(n):
        angle = 2 * np.pi * i / n
        eye = 3.5 * np.array([np.cos(angle), np.sin(angle), 0.4])
        c2w = look_at(eye)
        name = f"r_{i}"
        Image.fromarray(
            (rng.uniform(size=(*hw, 3)) * 255).astype(np.uint8)
        ).save(root / "train" / f"{name}.png")
        frames.append(
            {"file_path": f"./train/{name}", "transform_matrix": c2w.tolist()}
        )
    meta = {"camera_angle_x": 0.8, "frames": frames}
    (root / "transforms_train.json").write_text(json.dumps(meta))
    (root / "transforms_val.json").write_text(json.dumps(meta))
    (root / "transforms_test.json").write_text(json.dumps(meta))
    return root


def make_ingp_fixture(root: Path, n=4, hw=(12, 16)):
    """Instant-NGP-format dataset: single transforms.json, global intrinsics."""
    from PIL import Image

    root = Path(root)
    (root / "images").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    frames = []
    for i in range(n):
        angle = 2 * np.pi * i / n
        eye = 2.5 * np.array([np.cos(angle), np.sin(angle), 0.3])
        c2w = look_at(eye)
        Image.fromarray(
            (rng.uniform(size=(*hw, 3)) * 255).astype(np.uint8)
        ).save(root / "images" / f"f_{i}.png")
        frames.append(
            {"file_path": f"images/f_{i}.png", "transform_matrix": c2w.tolist()}
        )
    meta = {"fl_x": hw[1] * 0.9, "w": hw[1], "h": hw[0], "cx": hw[1] / 2,
            "cy": hw[0] / 2, "aabb_scale": 2, "frames": frames}
    (root / "transforms.json").write_text(json.dumps(meta))
    return root


def shrink(cfg):
    cfg.trainer.max_num_iterations = 2
    cfg.trainer.steps_per_save = 1000
    cfg.trainer.steps_per_eval_image = 1000
    cfg.trainer.steps_per_log = 1
    cfg.trainer.num_devices = 1
    cfg.datamanager.train_num_rays_per_batch = 16
    cfg.datamanager.eval_num_rays_per_batch = 16
    m = cfg.model
    m.compute_dtype = "float32"
    m.eval_num_rays_per_chunk = 32
    for attr, val in (
        ("num_levels", 2), ("base_res", 4), ("max_res", 8), ("log2_hashmap_size", 8),
        ("hidden_dim", 8), ("hidden_dim_color", 8), ("appearance_embed_dim", 4),
        ("num_proposal_samples_per_ray", (4, 4)), ("num_nerf_samples_per_ray", 4),
        ("freq_num_layers", 2), ("freq_hidden_dim", 8), ("freq_num_frequencies", 2),
        ("num_coarse_samples", 4), ("num_importance_samples", 4),
        ("num_samples_per_ray", 8), ("grid_resolution", 16),
        ("num_uniform_samples", 8), ("num_samples", 4), ("resolution", 16),
        ("density_components", 4), ("color_components", 6), ("appearance_dim", 6),
        ("head_mlp_width", 8),
        ("sdf_num_layers", 2), ("sdf_hidden_dim", 8), ("sdf_geo_feat_dim", 8),
        ("sdf_num_layers_color", 2), ("sdf_hidden_dim_color", 8),
        ("num_samples_importance", 4), ("num_up_sample_steps", 2),
        ("num_samples_outside", 4), ("num_neus_samples_per_ray", 4),
        ("max_num_gaussians", 256), ("num_random", 128),
        ("rasterize_chunk", 64), ("sh_degree", 1),
        ("render_resolution", 8),
    ):
        if hasattr(m, attr):
            setattr(m, attr, val)
    if hasattr(m, "proposal_net_args_list"):
        if any("encoding" in a and a.get("encoding") == "freq" for a in m.proposal_net_args_list):
            m.proposal_net_args_list = [
                {"encoding": "freq", "hidden_dim": 8, "num_layers": 2, "num_frequencies": 2}
            ] * 2
        else:
            m.proposal_net_args_list = [
                {"hidden_dim": 8, "log2_hashmap_size": 7, "num_levels": 2, "max_res": 8, "use_linear": False}
            ] * 2
    return cfg


@pytest.mark.parametrize("method", sorted(method_configs.keys()))
def test_method_trains(tmp_path, method):
    if method in BLACKLIST:
        pytest.skip("blacklisted")
    cfg = shrink(get_method_config(method))
    from nerfstudio_thermal_tpu.data.dataparsers.blender_dataparser import (
        BlenderDataParserConfig,
    )

    from nerfstudio_thermal_tpu.data.dataparsers.instant_ngp_dataparser import (
        InstantNGPDataParserConfig,
    )

    if isinstance(cfg.dataparser, InstantNGPDataParserConfig):
        cfg.data = make_ingp_fixture(tmp_path / "ingp")
        cfg.dataparser.train_split_fraction = 0.5
    elif isinstance(cfg.dataparser, BlenderDataParserConfig):
        cfg.data = make_blender_fixture(tmp_path / "blender")
    elif method == "splatfacto":
        # rasterization steps need uniform image resolution
        cfg.data = make_synthetic_rgbt_dataset(
            tmp_path / "rgbt", rgb_hw=(16, 20), t_hw=(16, 20)
        )
        cfg.dataparser.train_split_fraction = 0.5
        cfg.model.random_init = True
    else:
        cfg.data = make_synthetic_rgbt_dataset(tmp_path / "rgbt")
        cfg.dataparser.train_split_fraction = 0.5
    trainer = setup_trainer(cfg, base_dir=tmp_path / "out")
    trainer.setup()
    trainer.train()
    scalars = trainer.train_iteration(2)
    assert np.isfinite(float(scalars["loss"]))
