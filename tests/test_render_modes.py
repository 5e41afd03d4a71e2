"""ns-render modes e2e (camera-path JSON, interpolated with rgb-poses-only)."""

import json
from pathlib import Path

import numpy as np

from nerfstudio_thermal_tpu.configs.method_configs import get_method_config, setup_trainer
from tests.fixtures import make_synthetic_rgbt_dataset
from tests.test_all_methods_train import shrink


def _train_tiny(tmp_path):
    cfg = shrink(get_method_config("thermal-nerfacto"))
    cfg.trainer.max_num_iterations = 2
    cfg.data = make_synthetic_rgbt_dataset(tmp_path / "data")
    cfg.dataparser.train_split_fraction = 0.5
    from nerfstudio_thermal_tpu.configs.serialization import save_config

    base = tmp_path / "out"
    trainer = setup_trainer(cfg, base_dir=base)
    trainer.setup()
    trainer.train()
    save_config(cfg, base / "config.yml")
    return base / "config.yml"


def test_render_camera_path_and_interpolated(tmp_path):
    cfgp = _train_tiny(tmp_path)

    path_json = {
        "render_height": 12,
        "render_width": 16,
        "camera_path": [
            {"camera_to_world": np.eye(4).ravel().tolist(), "fov": 60},
            {"camera_to_world": np.eye(4).ravel().tolist(), "fov": 60},
        ],
    }
    pj = tmp_path / "path.json"
    pj.write_text(json.dumps(path_json))

    from nerfstudio_thermal_tpu.scripts.render import main as render_main

    rc = render_main([
        "camera-path", "--load-config", str(cfgp),
        "--camera-path-filename", str(pj),
        "--output-path", str(tmp_path / "cam_path_frames"),
    ])
    assert rc == 0
    assert len(list((tmp_path / "cam_path_frames").glob("*.png"))) == 2

    rc = render_main([
        "interpolated", "--load-config", str(cfgp),
        "--rgb-poses-only", "true", "--interpolation-steps", "2",
        "--output-path", str(tmp_path / "interp_frames"),
        "--rendered-output-names", "rgb_thermal",
    ])
    assert rc == 0
    assert len(list((tmp_path / "interp_frames").glob("*.png"))) >= 1
