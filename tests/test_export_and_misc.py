import numpy as np

from nerfstudio_thermal_tpu.exporter.exporter_utils import read_ply, write_ply
from nerfstudio_thermal_tpu.utils.misc import human_format, step_check
from nerfstudio_thermal_tpu.utils.colormaps import apply_depth_colormap


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    cols = rng.uniform(size=(100, 3)).astype(np.float32)
    path = tmp_path / "cloud.ply"
    write_ply(path, pts, cols)
    pts2, cols2 = read_ply(path)
    np.testing.assert_allclose(pts2, pts, rtol=1e-6)
    np.testing.assert_allclose(cols2, cols, atol=1 / 255 + 1e-6)


def test_step_check():
    assert not step_check(0, 10)
    assert step_check(0, 10, run_at_zero=True)
    assert step_check(20, 10)
    assert not step_check(21, 10)
    assert not step_check(5, 0)


def test_human_format():
    assert human_format(1234567) == "1.23 M"
    assert human_format(999) == "999.00 "


def test_depth_colormap_masks_background():
    depth = np.linspace(1, 5, 16).reshape(4, 4, 1).astype(np.float32)
    acc = np.ones((4, 4, 1), np.float32)
    acc[0, 0] = 0.0
    img = apply_depth_colormap(depth, accumulation=acc)
    assert img.shape == (4, 4, 3)
    np.testing.assert_allclose(img[0, 0], [1, 1, 1], atol=1e-6)  # empty -> white
