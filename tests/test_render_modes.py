"""ns-render modes e2e (camera-path JSON, interpolated with rgb-poses-only)."""

import json
from pathlib import Path

import numpy as np
import pytest

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


def test_viewer_camera_path_export_renders(tmp_path):
    """ViewerServer.save_camera_path writes a camera_path.json (keyframe
    slerp/lerp interpolation, reference viewer/render_panel.py) that
    `ns-render camera-path` consumes directly."""
    from nerfstudio_thermal_tpu.scripts.render import main as ns_render
    from nerfstudio_thermal_tpu.viewer.server import ViewerServer

    config_path = _train_tiny(tmp_path)

    server = ViewerServer(
        render_fn=lambda *a: None, output_names=["rgb"],
        save_dir=tmp_path / "run",
    )
    # two keyframes looking at the origin from different azimuths
    def pose(angle):
        eye = 3.0 * np.array([np.cos(angle), np.sin(angle), 0.3])
        f = -eye / np.linalg.norm(eye)
        r = np.cross(f, [0, 0, 1.0]); r /= np.linalg.norm(r)
        u = np.cross(r, f)
        return np.concatenate(
            [np.stack([r, u, -f], -1), eye[:, None]], -1
        ).tolist()

    dest = server.save_camera_path({
        "keyframes": [pose(0.0), pose(1.0)],
        "fovs": [55.0, 65.0],  # per-keyframe fov (render panel)
        "fov": 55.0, "fps": 4, "seconds": 1.5, "width": 32, "height": 24,
    })
    path_json = json.loads(Path(dest).read_text())
    assert path_json["render_width"] == 32
    assert len(path_json["camera_path"]) == 6  # round(fps * seconds)
    # rotations stay orthonormal through the spherical spline
    M = np.array(path_json["camera_path"][3]["camera_to_world"]).reshape(4, 4)
    np.testing.assert_allclose(M[:3, :3] @ M[:3, :3].T, np.eye(3), atol=1e-5)
    # first frame hits the first keyframe pose + fov exactly
    M0 = np.array(path_json["camera_path"][0]["camera_to_world"]).reshape(4, 4)
    np.testing.assert_allclose(M0[:3, :4], np.array(pose(0.0)), atol=1e-5)
    assert path_json["camera_path"][0]["fov"] == pytest.approx(55.0, abs=1e-4)
    fovs = [c["fov"] for c in path_json["camera_path"]]
    assert fovs == sorted(fovs) and fovs[-1] > 60.0  # climbs toward 65

    rc = ns_render([
        "camera-path", "--load-config", str(config_path),
        "--camera-path-filename", str(dest),
        "--output-path", str(tmp_path / "frames"),
    ])
    assert rc == 0
    assert list((tmp_path / "frames").glob("**/*.png"))
