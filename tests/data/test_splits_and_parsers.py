"""Dataparser split pairing + thermal metadata tests."""

import numpy as np

from nerfstudio_thermal_tpu.data.utils.dataparsers_utils import (
    get_train_eval_split_all,
    get_train_eval_split_fraction,
    get_train_eval_split_interval,
)


def test_thermal_paired_split():
    # 10 RGB then 10 thermal files; splits must pair index-for-index
    files = [f"images/f_{i}.png" for i in range(10)] + [
        f"images_thermal/f_{i}.png" for i in range(10)
    ]
    i_train, i_eval = get_train_eval_split_fraction(files, 0.8)
    assert len(i_train) + len(i_eval) == 20
    train = set(i_train)
    for i in range(10):
        # rgb index i and thermal index i+10 land in the same split
        assert (i in train) == (i + 10 in train)


def test_thermal_paired_split_unequal_counts():
    files = [f"images/f_{i}.png" for i in range(8)] + [
        f"images_thermal/f_{i}.png" for i in range(5)
    ]
    i_train, i_eval = get_train_eval_split_fraction(files, 0.8)
    assert len(i_train) + len(i_eval) == 13
    assert len(np.intersect1d(i_train, i_eval)) == 0


def test_plain_split_modes():
    files = [f"f_{i}.png" for i in range(16)]
    i_train, i_eval = get_train_eval_split_interval(files, 8)
    assert len(i_eval) == 2 and set(i_eval) == {0, 8}
    i_train, i_eval = get_train_eval_split_all(files)
    assert len(i_train) == len(i_eval) == 16


def test_thermalnerf_parser_surfaces_is_thermal(tmp_path):
    from tests.fixtures import make_synthetic_rgbt_dataset
    from nerfstudio_thermal_tpu.data.dataparsers.nerfstudio_dataparser import (
        ThermalNerf, ThermalNerfDataParserConfig,
    )

    root = make_synthetic_rgbt_dataset(tmp_path / "d")
    parser = ThermalNerf(ThermalNerfDataParserConfig(data=root, train_split_fraction=0.5))
    out = parser.get_dataparser_outputs("train")
    it = np.asarray(out.metadata["is_thermal"], np.float32)
    # paired split: equal rgb/thermal counts
    assert it.sum() == (1 - it).sum()
    # filenames consistent with flags
    for f, flag in zip(out.image_filenames, it):
        assert ("images_thermal" in str(f)) == bool(flag)


def test_equirectangular_rays():
    import jax.numpy as jnp
    from nerfstudio_thermal_tpu.cameras.cameras import Cameras, CameraType

    h, w = 8, 16
    cams = Cameras(
        camera_to_worlds=jnp.eye(4)[None, :3],
        fx=jnp.asarray([h * 1.0]), fy=jnp.asarray([h * 1.0]),
        cx=jnp.asarray([w / 2]), cy=jnp.asarray([h / 2]),
        width=jnp.asarray([w], jnp.int32), height=jnp.asarray([h], jnp.int32),
        camera_type=jnp.asarray([CameraType.EQUIRECTANGULAR.value], jnp.int32),
    )
    # center pixel looks along -z; poles look along +/-y
    rb = cams.generate_rays(jnp.zeros((3,), jnp.int32),
                            jnp.asarray([[h / 2, w / 2], [0.0, w / 2], [h * 1.0, w / 2]]))
    d = np.asarray(rb.directions)
    np.testing.assert_allclose(d[0], [0, 0, -1], atol=1e-5)
    assert d[1][1] > 0.95   # top row ~ +y (up)
    assert d[2][1] < -0.95  # bottom row ~ -y
