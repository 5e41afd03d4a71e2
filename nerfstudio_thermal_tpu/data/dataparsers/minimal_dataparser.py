"""Minimal dataparser: .npz/.npy bundles.

Behavioral spec: reference `nerfstudio/data/dataparsers/minimal_dataparser.py`
— loads {split}.npz containing image_filenames, c2w [N,3/4,4], intrinsics
(fx,fy,cx,cy or a width/height + K), used by the simple-IO smoke test
(reference tests/test_train.py:83-88).
"""

from dataclasses import dataclass
from pathlib import Path

import numpy as np

from nerfstudio_thermal_tpu.cameras.cameras import Cameras, CameraType
from nerfstudio_thermal_tpu.data.dataparsers.base_dataparser import (
    DataParser,
    DataParserConfig,
    DataparserOutputs,
)


@dataclass
class MinimalDataParserConfig(DataParserConfig):
    data: Path = Path("data/minimal")


class MinimalDataParser(DataParser):
    config: MinimalDataParserConfig

    def _generate_dataparser_outputs(self, split: str = "train", **kwargs):
        data = Path(self.config.data)
        filepath = data / f"{split}.npz"
        if not filepath.exists():
            # fall back: eval splits reuse val.npz, else train.npz
            for candidate in ("val.npz", "train.npz"):
                if (data / candidate).exists():
                    filepath = data / candidate
                    break
        d = np.load(filepath, allow_pickle=True)

        image_filenames = [data / f for f in d["image_filenames"].tolist()]
        poses = np.asarray(d["cameras_to_worlds"], np.float32)[:, :3, :4]
        n = len(image_filenames)

        def arr(key, default=None):
            if key in d:
                a = np.asarray(d[key], np.float32)
                return np.broadcast_to(a, (n,)).astype(np.float32).copy()
            return np.full((n,), default, np.float32)

        width = np.asarray(d["width"], np.int32) if "width" in d else None
        height = np.asarray(d["height"], np.int32) if "height" in d else None
        if width is None or height is None:
            from PIL import Image

            w, h = Image.open(image_filenames[0]).size
            width = np.full((n,), w, np.int32)
            height = np.full((n,), h, np.int32)
        else:
            width = np.broadcast_to(width, (n,)).astype(np.int32).copy()
            height = np.broadcast_to(height, (n,)).astype(np.int32).copy()

        cameras = Cameras(
            camera_to_worlds=poses,
            fx=arr("fx", float(width[0])),
            fy=arr("fy", float(width[0])),
            cx=arr("cx", float(width[0]) / 2),
            cy=arr("cy", float(height[0]) / 2),
            width=width,
            height=height,
            distortion_params=np.zeros((n, 6), np.float32),
            camera_type=np.full((n,), CameraType.PERSPECTIVE.value, np.int32),
        )
        aabb = (
            np.asarray(d["scene_box"], np.float32)
            if "scene_box" in d
            else np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
        )
        return DataparserOutputs(
            image_filenames=image_filenames, cameras=cameras, scene_box=aabb
        )
