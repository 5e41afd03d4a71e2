import json
from pathlib import Path

import numpy as np
import pytest

from nerfstudio_thermal_tpu.process_data.flir_utils import fix_endian, raw2temp
from nerfstudio_thermal_tpu.process_data import process_data_utils


def test_raw2temp_monotonic_and_reasonable():
    raws = np.array([10000, 12000, 14000, 16000], np.float64)
    temps = raw2temp(raws)
    assert np.all(np.diff(temps) > 0)  # more counts -> hotter
    # room-ish temperatures for typical FLIR raw ranges with default Planck
    assert -50 < temps[0] < 150


def test_raw2temp_identity_conditions():
    # With E=1, IRT=1 and default Planck constants, raw2temp inverts planck
    t = 25.0
    PR1, PB, PF, PO, PR2 = 21106.77, 1501.0, 1.0, -7340.0, 0.012545258
    raw = PR1 / (PR2 * (np.exp(PB / (t + 273.15)) - PF)) - PO
    # atmosphere attenuates slightly; with OD=0 tau=1, RTemp=ATemp=IRWTemp=t
    out = raw2temp(raw, E=1.0, OD=0.0, RTemp=t, ATemp=t, IRWTemp=t, IRT=1.0, RH=0.0)
    np.testing.assert_allclose(out, t, atol=0.2)


def test_fix_endian():
    vals = np.array([0x1234, 0xFF00], np.uint16)
    out = fix_endian(vals)
    assert out[0] == 0x3412
    assert out[1] == 0x00FF


def test_copy_and_downscale_images(tmp_path):
    from PIL import Image

    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        Image.fromarray(
            (np.random.default_rng(i).uniform(size=(32, 48, 3)) * 255).astype(np.uint8)
        ).save(src / f"img_{i}.png")

    out = tmp_path / "out" / "images"
    copied = process_data_utils.copy_images(src, out, num_downscales=2)
    assert len(copied) == 3
    assert sorted(p.name for p in out.iterdir()) == [
        "frame_00001.png", "frame_00002.png", "frame_00003.png",
    ]
    half = tmp_path / "out" / "images_2"
    quarter = tmp_path / "out" / "images_4"
    assert len(list(half.iterdir())) == 3 and len(list(quarter.iterdir())) == 3
    im = Image.open(half / "frame_00001.png")
    assert im.size == (24, 16)


def test_circle_grid_target_geometry():
    from nerfstudio_thermal_tpu.process_data.calibration_utils import (
        get_calibration_target_circle_centers,
    )

    pts = get_calibration_target_circle_centers()
    assert pts.shape == (44, 3)
    assert np.all(pts[:, 2] == 0)
    # vertical spacing between successive columns is half center-center
    np.testing.assert_allclose(pts[4, 0] - pts[0, 0], 1.9, atol=1e-6)
    # odd columns offset by half spacing in x
    np.testing.assert_allclose(pts[4, 1] - pts[0, 1], 1.9, atol=1e-6)


def test_circle_detect_on_synthetic_grid():
    cv2 = pytest.importorskip("cv2")
    from nerfstudio_thermal_tpu.process_data.calibration_utils import circle_detect

    # Render an asymmetric 4x11 circle grid (dark circles on white)
    img = np.full((600, 800), 255, np.uint8)
    c_c = 60
    for col in range(11):
        y = 60 + c_c // 2 * col
        for row in range(4):
            x = 100 + c_c * row + (c_c // 2 if col % 2 else 0)
            cv2.circle(img, (x, y), 16, 0, -1)
    img3 = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)
    centers, found = circle_detect(img3, is_thermal=False)
    assert found
    assert centers.shape[0] == 44


def test_rgbt_transforms_append(tmp_path):
    """append_thermal_frames doubles the frame list with is_thermal flags and
    per-frame intrinsics (no calibration -> identity transform)."""
    from nerfstudio_thermal_tpu.process_data.rgbt_to_nerfstudio_dataset import (
        RGBTToNerfstudioDataset,
    )
    from PIL import Image

    out = tmp_path / "out"
    (out / "images").mkdir(parents=True)
    (out / "images_thermal").mkdir(parents=True)
    for i in range(2):
        Image.fromarray(np.zeros((8, 10, 3), np.uint8)).save(
            out / "images" / f"frame_{i:05d}.png"
        )
        Image.fromarray(np.zeros((6, 8, 3), np.uint8)).save(
            out / "images_thermal" / f"frame_{i:05d}.png"
        )
    transforms = {
        "w": 10, "h": 8, "fl_x": 9.0, "fl_y": 9.0, "cx": 5.0, "cy": 4.0,
        "k1": 0.0, "k2": 0.0, "p1": 0.0, "p2": 0.0,
        "frames": [
            {
                "file_path": f"images/frame_{i:05d}.png",
                "transform_matrix": np.eye(4).tolist(),
                "colmap_im_id": i,
            }
            for i in range(2)
        ],
    }
    (out / "transforms.json").write_text(json.dumps(transforms))

    conv = RGBTToNerfstudioDataset.__new__(RGBTToNerfstudioDataset)
    conv.output_dir = out
    conv.scale_pair = ("images/frame_00003.png", "images/frame_00004.png")
    conv.scale_pair_distance_cm = 30.48
    conv.append_thermal_frames(None)

    data = json.loads((out / "transforms.json").read_text())
    assert len(data["frames"]) == 4
    thermal = [f for f in data["frames"] if f["is_thermal"] == 1]
    rgb = [f for f in data["frames"] if f["is_thermal"] == 0]
    assert len(thermal) == 2 and len(rgb) == 2
    assert thermal[0]["w"] == 8 and thermal[0]["h"] == 6
    assert "w" not in data  # unfixed params removed from the header
