"""Tests for the scene-capture dataparsers (scannet, scannetpp, arkitscenes,
sitcoms3d, nerfosr, phototourism, dycheck) using tiny synthetic fixtures.
Reference surfaces: nerfstudio/data/dataparsers/*."""

import json
import struct
from pathlib import Path

import numpy as np
import pytest


def _png(path: Path, hw=(8, 10)):
    from PIL import Image

    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (*hw, 3), np.uint8)
    ).save(path)


def test_scannet(tmp_path):
    from nerfstudio_thermal_tpu.data.dataparsers.scene_parsers import (
        ScanNet, ScanNetDataParserConfig,
    )

    for d in ("color", "depth", "pose", "intrinsic"):
        (tmp_path / d).mkdir()
    K = np.array([[50.0, 0, 5, 0], [0, 50, 4, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
    np.savetxt(tmp_path / "intrinsic" / "intrinsic_color.txt", K)
    n = 6
    for i in range(n):
        _png(tmp_path / "color" / f"{i}.jpg")
        _png(tmp_path / "depth" / f"{i}.png", hw=(8, 10))
        pose = np.eye(4)
        pose[0, 3] = 0.1 * i
        np.savetxt(tmp_path / "pose" / f"{i}.txt", pose)
    # one invalid pose must be skipped (reference :92-95)
    bad = np.eye(4); bad[1, 3] = np.inf
    np.savetxt(tmp_path / "pose" / f"{n}.txt", bad)
    _png(tmp_path / "color" / f"{n}.jpg")
    _png(tmp_path / "depth" / f"{n}.png")

    parser = ScanNet(ScanNetDataParserConfig(data=tmp_path, train_split_fraction=0.5))
    out = parser.get_dataparser_outputs("train")
    ev = parser.get_dataparser_outputs("val")
    assert len(out.image_filenames) + len(ev.image_filenames) == n  # bad skipped
    assert float(out.cameras.fx[0]) == 50.0
    assert out.metadata["depth_filenames"] is not None


def test_scannetpp(tmp_path):
    from nerfstudio_thermal_tpu.data.dataparsers.scene_parsers import (
        ScanNetpp, ScanNetppDataParserConfig,
    )

    img_dir = tmp_path / "dslr" / "resized_images"
    (tmp_path / "dslr" / "nerfstudio").mkdir(parents=True)
    frames, test_frames = [], []
    for i in range(5):
        name = f"f{i}.jpg"
        _png(img_dir / name)
        fr = {"file_path": name, "transform_matrix": np.eye(4).tolist()}
        (test_frames if i >= 4 else frames).append(fr)
    meta = {
        "frames": frames, "test_frames": test_frames, "has_mask": False,
        "fl_x": 60.0, "fl_y": 61.0, "cx": 5.0, "cy": 4.0, "w": 10, "h": 8,
    }
    (tmp_path / "dslr" / "nerfstudio" / "transforms.json").write_text(
        json.dumps(meta)
    )
    parser = ScanNetpp(ScanNetppDataParserConfig(data=tmp_path))
    out = parser.get_dataparser_outputs("train")
    ev = parser.get_dataparser_outputs("val")
    assert len(out.image_filenames) == 4 and len(ev.image_filenames) == 1
    assert float(out.cameras.fy[0]) == 61.0


def test_arkitscenes(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from nerfstudio_thermal_tpu.data.dataparsers.scene_parsers import (
        ARKitScenes, ARKitScenesDataParserConfig,
    )

    scene_dir = tmp_path / "41069021"  # video ids are numeric
    scene_dir.mkdir()
    vid = scene_dir.name
    base = scene_dir / f"{vid}_frames"
    for d in ("lowres_wide", "lowres_depth", "lowres_wide_intrinsics"):
        (base / d).mkdir(parents=True)
    lines = []
    for i in range(4):
        ts = f"{i + 0.1:.3f}"
        _png(base / "lowres_wide" / f"{vid}_{ts}.png")
        _png(base / "lowres_depth" / f"{vid}_{ts}.png")
        np.savetxt(
            base / "lowres_wide_intrinsics" / f"{vid}_{ts}.pincam",
            np.array([[10, 8, 40.0, 41.0, 5.0, 4.0]]),
        )
        lines.append(f"{ts} 0.0 0.0 0.0 {0.1 * i} 0.0 0.5")
    (base / "lowres_wide.traj").write_text("\n".join(lines))
    parser = ARKitScenes(
        ARKitScenesDataParserConfig(data=scene_dir, train_split_fraction=0.75)
    )
    out = parser.get_dataparser_outputs("train")
    assert len(out.image_filenames) == 3
    assert float(out.cameras.fx[0]) == 40.0
    assert np.isfinite(np.asarray(out.cameras.camera_to_worlds)).all()


def test_sitcoms3d(tmp_path):
    from nerfstudio_thermal_tpu.data.dataparsers.scene_parsers import (
        Sitcoms3D, Sitcoms3DDataParserConfig,
    )

    frames = []
    for i in range(3):
        name = f"im{i}.jpg"
        _png(tmp_path / "images_4" / name)
        K = [[80.0, 0, 40.0], [0, 80.0, 30.0], [0, 0, 1]]
        c2w = np.eye(4); c2w[0, 3] = i * 0.5
        frames.append({"image_name": name, "intrinsics": K,
                       "camtoworld": c2w.tolist()})
    (tmp_path / "cameras.json").write_text(
        json.dumps({"frames": frames,
                    "bbox": [[-2, -1, -1], [2, 1, 1]]})
    )
    (tmp_path / "panoptic_classes.json").write_text(
        json.dumps({"thing": ["person", "sofa"],
                    "thing_colors": [[255, 0, 0], [0, 255, 0]]})
    )
    parser = Sitcoms3D(Sitcoms3DDataParserConfig(data=tmp_path))
    out = parser.get_dataparser_outputs("train")
    assert len(out.image_filenames) == 3
    # longest bbox dim scaled to scene_scale
    lengths = out.scene_box[1] - out.scene_box[0]
    assert abs(float(lengths.max()) - 2.0) < 1e-5
    assert out.metadata["semantics"]["classes"] == ["person", "sofa"]
    # downscale factor applied to intrinsics
    assert float(out.cameras.fx[0]) == pytest.approx(20.0)


def test_nerfosr(tmp_path):
    from nerfstudio_thermal_tpu.data.dataparsers.scene_parsers import (
        NeRFOSR, NeRFOSRDataParserConfig,
    )

    scene = tmp_path / "stjacob" / "final"
    rng = np.random.default_rng(0)
    for sp, n in (("train", 4), ("validation", 2), ("test", 2)):
        for d in ("intrinsics", "pose", "rgb"):
            (scene / sp / d).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            K = np.eye(4); K[0, 0] = 50; K[1, 1] = 50; K[0, 2] = 5; K[1, 2] = 4
            np.savetxt(scene / sp / "intrinsics" / f"{i:02d}.txt", K.reshape(-1))
            pose = np.eye(4)
            pose[:3, 3] = rng.uniform(-1, 1, 3)
            np.savetxt(scene / sp / "pose" / f"{i:02d}.txt", pose.reshape(-1))
            _png(scene / sp / "rgb" / f"{i:02d}.png")
    parser = NeRFOSR(NeRFOSRDataParserConfig(data=tmp_path, scene="stjacob"))
    out = parser.get_dataparser_outputs("train")
    assert len(out.image_filenames) == 4
    assert len(out.cameras) == 4
    ev = parser.get_dataparser_outputs("val")
    assert len(ev.image_filenames) == 2


def _write_colmap_binaries(sparse: Path, n=4):
    sparse.mkdir(parents=True, exist_ok=True)
    with open(sparse / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(1, n + 1):
            f.write(struct.pack("<iiQQ", i, 1, 10, 8))  # PINHOLE
            f.write(struct.pack("<dddd", 50.0, 51.0, 5.0, 4.0))
    with open(sparse / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(1, n + 1):
            f.write(struct.pack("<idddddddi", i, 1.0, 0, 0, 0,
                                0.1 * i, 0.0, 0.0, i))
            f.write(f"img{i}.jpg".encode() + b"\x00")
            f.write(struct.pack("<Q", 0))


def test_phototourism(tmp_path):
    from nerfstudio_thermal_tpu.data.dataparsers.scene_parsers import (
        Phototourism, PhototourismDataParserConfig,
    )

    _write_colmap_binaries(tmp_path / "dense" / "sparse")
    for i in range(1, 5):
        _png(tmp_path / "dense" / "images" / f"img{i}.jpg")
    parser = Phototourism(
        PhototourismDataParserConfig(data=tmp_path, train_split_fraction=0.75)
    )
    out = parser.get_dataparser_outputs("train")
    assert len(out.image_filenames) == 3
    assert float(out.cameras.fx[0]) == 50.0
    assert int(out.cameras.width[0]) == 10


def test_dycheck(tmp_path):
    from nerfstudio_thermal_tpu.data.dataparsers.scene_parsers import (
        Dycheck, DycheckDataParserConfig,
    )

    (tmp_path / "splits").mkdir(parents=True)
    (tmp_path / "camera").mkdir()
    names = [f"0_{i:05d}" for i in range(3)]
    (tmp_path / "scene.json").write_text(json.dumps(
        {"center": [0, 0, 0], "scale": 1.0, "near": 0.1, "far": 2.0}))
    (tmp_path / "dataset.json").write_text(json.dumps({"ids": names}))
    (tmp_path / "metadata.json").write_text(json.dumps(
        {n: {"warp_id": i, "camera_id": 0} for i, n in enumerate(names)}))
    (tmp_path / "splits" / "train.json").write_text(json.dumps(
        {"frame_names": names, "time_ids": list(range(3))}))
    for n in names:
        _png(tmp_path / "rgb" / "1x" / f"{n}.png")
        (tmp_path / "camera" / f"{n}.json").write_text(json.dumps({
            "orientation": np.eye(3).tolist(),
            "position": [0, 0, 2],
            "focal_length": 50.0,
            "pixel_aspect_ratio": 1.0,
            "principal_point": [5.0, 4.0],
            "image_size": [10, 8],
        }))
    parser = Dycheck(DycheckDataParserConfig(data=tmp_path))
    out = parser.get_dataparser_outputs("train")
    assert len(out.image_filenames) == 3
    assert out.cameras.times is not None
    np.testing.assert_allclose(np.asarray(out.cameras.times), [0, 0.5, 1.0])


def test_registry_has_all_parsers():
    from nerfstudio_thermal_tpu.configs.dataparser_configs import (
        dataparser_configs,
    )

    expected = {
        "nerfstudio-data", "thermalnerf-data", "blender-data", "colmap",
        "minimal-parser", "instant-ngp-data", "dnerf-data", "sdfstudio-data",
        "scannet-data", "scannetpp-data", "arkitscenes-data", "sitcoms3d-data",
        "nerfosr-data", "phototourism-data", "nuscenes-data", "dycheck-data",
    }
    assert expected <= set(dataparser_configs)
