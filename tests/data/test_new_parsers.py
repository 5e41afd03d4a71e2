import numpy as np
import jax.numpy as jnp

from nerfstudio_thermal_tpu.cameras.cameras import Cameras, CameraType


def test_minimal_dataparser(tmp_path):
    from PIL import Image
    from nerfstudio_thermal_tpu.data.dataparsers.minimal_dataparser import (
        MinimalDataParser, MinimalDataParserConfig,
    )

    rng = np.random.default_rng(0)
    names = []
    for i in range(3):
        name = f"img_{i}.png"
        Image.fromarray((rng.uniform(size=(8, 10, 3)) * 255).astype(np.uint8)).save(
            tmp_path / name
        )
        names.append(name)
    c2w = np.tile(np.eye(4), (3, 1, 1)).astype(np.float32)
    np.savez(
        tmp_path / "train.npz",
        image_filenames=np.array(names),
        cameras_to_worlds=c2w,
        fx=8.0, fy=8.0, cx=5.0, cy=4.0,
        width=np.asarray(10), height=np.asarray(8),
    )
    parser = MinimalDataParser(MinimalDataParserConfig(data=tmp_path))
    out = parser.get_dataparser_outputs("train")
    assert len(out.image_filenames) == 3
    assert int(out.cameras.width[0]) == 10
    # val falls back to train.npz when no val split exists
    out2 = parser.get_dataparser_outputs("val")
    assert len(out2.image_filenames) == 3


def test_orthophoto_rays():
    cams = Cameras(
        camera_to_worlds=jnp.eye(4)[None, :3],
        fx=jnp.asarray([4.0]), fy=jnp.asarray([4.0]),
        cx=jnp.asarray([4.0]), cy=jnp.asarray([4.0]),
        width=jnp.asarray([8], jnp.int32), height=jnp.asarray([8], jnp.int32),
        camera_type=jnp.asarray([CameraType.ORTHOPHOTO.value], jnp.int32),
    )
    rb = cams.generate_rays(
        jnp.zeros((2,), jnp.int32), jnp.asarray([[4.0, 4.0], [4.0, 8.0]])
    )
    d = np.asarray(rb.directions)
    o = np.asarray(rb.origins)
    np.testing.assert_allclose(d, [[0, 0, -1], [0, 0, -1]], atol=1e-6)
    np.testing.assert_allclose(o[0], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(o[1], [1.0, 0, 0], atol=1e-6)  # +1 in x plane units
