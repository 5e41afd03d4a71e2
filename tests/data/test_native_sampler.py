"""Native (C++) batch sampler: build, semantics vs the Python sampler, and
datamanager integration. Skips cleanly when no toolchain is available."""

import numpy as np
import pytest

from nerfstudio_thermal_tpu.data.native_sampler import (
    NativeBatchSampler,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native sampler not buildable here"
)


def _images(n=4, hw=(12, 16), c=3):
    rng = np.random.default_rng(0)
    return [rng.uniform(size=(*hw, c)).astype(np.float32) for _ in range(n)]


def test_gathered_pixels_match_indices():
    imgs = _images()
    s = NativeBatchSampler(imgs, [0, 1, 0, 1], patch_size=1, seed=3)
    batch = s.sample(256)
    ri = batch["ray_indices"]
    assert ri.shape == (256, 3)
    for r in range(0, 256, 17):
        cam, y, x = ri[r]
        np.testing.assert_allclose(batch["image"][r], imgs[cam][y, x])
        assert batch["is_thermal"][r] == float(cam % 2)
    # indices in range
    assert (ri[:, 1] < 12).all() and (ri[:, 2] < 16).all()
    assert (ri >= 0).all()


def test_patch_alignment_and_balance():
    imgs = _images(n=3, hw=(20, 20))
    s = NativeBatchSampler(imgs, [0, 0, 0], patch_size=2, seed=7)
    batch = s.sample(240)
    ri = batch["ray_indices"].reshape(-1, 4, 3)
    # each group of 4 rays is a 2x2 patch on one camera
    assert (ri[:, :, 0] == ri[:, :1, 0]).all()
    np.testing.assert_array_equal(ri[:, 1, 2] - ri[:, 0, 2], 1)  # x+1
    np.testing.assert_array_equal(ri[:, 2, 1] - ri[:, 0, 1], 1)  # y+1
    # rays roughly balanced across the 3 images
    counts = np.bincount(batch["ray_indices"][:, 0], minlength=3)
    assert counts.min() >= 240 // 3 - 8


def test_deterministic_given_seed_and_step():
    imgs = _images()
    a = NativeBatchSampler(imgs, [0, 1, 0, 1], patch_size=2, seed=11)
    b = NativeBatchSampler(imgs, [0, 1, 0, 1], patch_size=2, seed=11)
    a0 = a.sample(64)["ray_indices"]
    np.testing.assert_array_equal(a0, b.sample(64)["ray_indices"])
    # successive steps differ from the first
    assert not np.array_equal(a0, a.sample(64)["ray_indices"])
    # and a different seed differs
    c = NativeBatchSampler(imgs, [0, 1, 0, 1], patch_size=2, seed=12)
    assert not np.array_equal(a0, c.sample(64)["ray_indices"])


def test_datamanager_uses_native_path(tmp_path):
    from nerfstudio_thermal_tpu.configs.dataparser_configs import build_dataparser
    from nerfstudio_thermal_tpu.data.datamanagers import (
        VanillaDataManager, VanillaDataManagerConfig,
    )
    from nerfstudio_thermal_tpu.data.dataparsers.nerfstudio_dataparser import (
        ThermalNerfDataParserConfig,
    )
    from tests.fixtures import make_synthetic_rgbt_dataset

    data = make_synthetic_rgbt_dataset(tmp_path / "d")
    cfg = ThermalNerfDataParserConfig(data=data, train_split_fraction=0.5)
    dm = VanillaDataManager(
        VanillaDataManagerConfig(
            train_num_rays_per_batch=64, patch_size=2, use_native_sampler=True
        ),
        build_dataparser(cfg),
    )
    assert dm._native is not None, "native sampler should engage on RGBT data"
    batch = dm.next_train(0)
    assert batch["ray_indices"].shape == (64, 3)
    assert batch["image"].shape == (64, 3)
    assert set(np.unique(batch["is_thermal"])) <= {0.0, 1.0}
    # sanity: gathered pixels match the dataset
    ri = batch["ray_indices"]
    img0 = dm.train_dataset.get_image(int(ri[0, 0]))
    np.testing.assert_allclose(batch["image"][0], img0[ri[0, 1], ri[0, 2]])
