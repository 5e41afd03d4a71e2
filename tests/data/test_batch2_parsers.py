"""Tests for the instant-ngp / dnerf / sdfstudio dataparsers and the video
converter (reference surfaces: instant_ngp_dataparser.py,
dnerf_dataparser.py, sdfstudio_dataparser.py,
video_to_nerfstudio_dataset.py)."""

import json
from pathlib import Path

import numpy as np
import pytest


def _write_pngs(d: Path, n: int, hw=(8, 10)):
    from PIL import Image

    d.mkdir(parents=True, exist_ok=True)
    names = []
    for i in range(n):
        p = d / f"im_{i:03d}.png"
        Image.fromarray(
            np.random.default_rng(i).integers(0, 255, (*hw, 3), np.uint8)
        ).save(p)
        names.append(p)
    return names


def test_instant_ngp_parser(tmp_path):
    from nerfstudio_thermal_tpu.data.dataparsers.instant_ngp_dataparser import (
        InstantNGP, InstantNGPDataParserConfig,
    )

    imgs = _write_pngs(tmp_path / "images", 6)
    frames = [
        {"file_path": f"images/{p.name}", "transform_matrix": np.eye(4).tolist()}
        for p in imgs
    ]
    meta = {
        "fl_x": 100.0, "w": 10, "h": 8, "cx": 5.0, "cy": 4.0,
        "aabb_scale": 4, "k1": 0.01, "frames": frames,
    }
    (tmp_path / "transforms.json").write_text(json.dumps(meta))
    parser = InstantNGP(InstantNGPDataParserConfig(
        data=tmp_path, train_split_fraction=0.5))
    out = parser.get_dataparser_outputs("train")
    assert len(out.image_filenames) == 3
    np.testing.assert_allclose(out.scene_box, [[-2, -2, -2], [2, 2, 2]])
    assert float(out.cameras.fx[0]) == 100.0
    assert float(out.cameras.distortion_params[0, 0]) == pytest.approx(0.01)
    # origins scaled by scene_scale
    assert float(out.cameras.camera_to_worlds[0, 0, 3]) == 0.0
    ev = parser.get_dataparser_outputs("val")
    assert len(ev.image_filenames) == 3

    # camera_angle_x fallback for focal
    meta2 = dict(meta)
    meta2.pop("fl_x")
    meta2["camera_angle_x"] = 0.8
    (tmp_path / "transforms.json").write_text(json.dumps(meta2))
    out2 = InstantNGP(InstantNGPDataParserConfig(data=tmp_path)).get_dataparser_outputs()
    expected = 0.5 * 10 / np.tan(0.4)
    assert float(out2.cameras.fx[0]) == pytest.approx(expected, rel=1e-5)


def test_dnerf_parser_times(tmp_path):
    from nerfstudio_thermal_tpu.data.dataparsers.dnerf_dataparser import (
        DNeRF, DNeRFDataParserConfig,
    )

    imgs = _write_pngs(tmp_path / "train", 4)
    frames = [
        {"file_path": f"./train/{p.stem}", "transform_matrix": np.eye(4).tolist(),
         "time": i / 3.0}
        for i, p in enumerate(imgs)
    ]
    meta = {"camera_angle_x": 0.7, "frames": frames}
    for s in ("train", "val", "test"):
        (tmp_path / f"transforms_{s}.json").write_text(json.dumps(meta))
    out = DNeRF(DNeRFDataParserConfig(data=tmp_path)).get_dataparser_outputs("train")
    assert out.cameras.times is not None
    np.testing.assert_allclose(np.asarray(out.cameras.times), [0, 1 / 3, 2 / 3, 1.0])
    # ray bundles carry per-ray times
    import jax.numpy as jnp

    bundle = out.cameras.generate_rays(
        jnp.asarray([1, 3]), jnp.asarray([[4.0, 5.0], [2.0, 2.0]])
    )
    np.testing.assert_allclose(
        np.asarray(bundle.times[..., 0]), [1 / 3, 1.0], rtol=1e-6
    )


def test_sdfstudio_parser(tmp_path):
    from nerfstudio_thermal_tpu.data.dataparsers.sdfstudio_dataparser import (
        SDFStudio, SDFStudioDataParserConfig,
    )

    imgs = _write_pngs(tmp_path, 4)
    K = [[50.0, 0, 5, 0], [0, 50.0, 4, 0], [0, 0, 1, 0], [0, 0, 0, 1]]
    frames = []
    for i, p in enumerate(imgs):
        c2w = np.eye(4)
        c2w[0, 3] = i * 0.1
        frames.append({
            "rgb_path": p.name, "intrinsics": K, "camtoworld": c2w.tolist(),
        })
    meta = {
        "height": 8, "width": 10,
        "scene_box": {"aabb": [[-1, -1, -1], [1, 1, 1]]},
        "frames": frames, "has_mono_prior": False,
    }
    (tmp_path / "meta_data.json").write_text(json.dumps(meta))
    out = SDFStudio(
        SDFStudioDataParserConfig(data=tmp_path, auto_orient=False)
    ).get_dataparser_outputs("train")
    assert len(out.image_filenames) == 4
    assert float(out.cameras.fx[0]) == 50.0
    np.testing.assert_allclose(out.scene_box, [[-1, -1, -1], [1, 1, 1]])
    # OpenCV -> nerfstudio flip: columns 1,2 negated
    c2w0 = np.asarray(out.cameras.camera_to_worlds[0])
    np.testing.assert_allclose(c2w0[:, 1], [0, -1, 0])
    np.testing.assert_allclose(c2w0[:, 2], [0, 0, -1])


def test_video_converter_extracts_frames(tmp_path):
    import cv2

    video = tmp_path / "clip.avi"
    w, h = 32, 24
    vw = cv2.VideoWriter(
        str(video), cv2.VideoWriter_fourcc(*"MJPG"), 10, (w, h)
    )
    if not vw.isOpened():
        pytest.skip("cv2 video writing unavailable in this image")
    for i in range(30):
        frame = np.full((h, w, 3), i * 8 % 255, np.uint8)
        vw.write(frame)
    vw.release()

    from nerfstudio_thermal_tpu.process_data.process_data_utils import (
        convert_video_to_images,
    )

    out = tmp_path / "frames"
    summary, n = convert_video_to_images(
        video, out, num_frames_target=10, num_downscales=1
    )
    assert 8 <= n <= 12
    assert len(list(out.glob("frame_*.png"))) == n
    assert len(list((tmp_path / "frames_2").glob("*.png"))) == n


def test_video_dataset_converter_skip_colmap(tmp_path):
    import cv2

    video = tmp_path / "clip.avi"
    vw = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"MJPG"), 10, (32, 24))
    if not vw.isOpened():
        pytest.skip("cv2 video writing unavailable in this image")
    for i in range(20):
        vw.write(np.full((24, 32, 3), i * 10 % 255, np.uint8))
    vw.release()

    from nerfstudio_thermal_tpu.process_data.video_to_nerfstudio_dataset import (
        VideoToNerfstudioDataset,
    )

    conv = VideoToNerfstudioDataset(
        data=video, output_dir=tmp_path / "out", num_frames_target=5,
        num_downscales=0, skip_colmap=True,
    )
    conv.main()
    assert len(list((tmp_path / "out" / "images").glob("frame_*.png"))) >= 4
