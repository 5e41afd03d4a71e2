"""D-NeRF (dynamic blender) dataparser: blender format + per-frame time.

Behavioral spec: reference
`nerfstudio/data/dataparsers/dnerf_dataparser.py:30-109`: per-split
transforms_{split}.json, camera_angle_x focal, per-frame `time` surfaced on
the Cameras so ray bundles carry times.
"""

import json
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
class DNeRFDataParserConfig(DataParserConfig):
    data: Path = Path("data/dnerf/lego")
    scale_factor: float = 1.0
    alpha_color: str = "white"


class DNeRF(DataParser):
    config: DNeRFDataParserConfig
    includes_time: bool = True

    def _generate_dataparser_outputs(self, split: str = "train", **kwargs):
        data = Path(self.config.data)
        split_name = {"train": "train", "val": "val", "test": "test"}.get(split, "val")
        meta_path = data / f"transforms_{split_name}.json"
        if not meta_path.exists():
            meta_path = data / "transforms_test.json"
        meta = json.loads(meta_path.read_text())

        image_filenames, poses, times = [], [], []
        for frame in meta["frames"]:
            fname = data / Path(frame["file_path"].replace("./", "") + ".png")
            if not fname.exists():
                fname = data / Path(frame["file_path"].replace("./", ""))
            image_filenames.append(fname)
            poses.append(np.asarray(frame["transform_matrix"], np.float32))
            times.append(float(frame.get("time", 0.0)))
        poses = np.stack(poses)[:, :3, :4]
        poses[:, :3, 3] *= self.config.scale_factor

        from PIL import Image

        w, h = Image.open(image_filenames[0]).size
        focal = 0.5 * w / np.tan(0.5 * float(meta["camera_angle_x"]))

        n = len(image_filenames)
        cameras = Cameras(
            camera_to_worlds=poses.astype(np.float32),
            fx=np.full((n,), focal, np.float32),
            fy=np.full((n,), focal, np.float32),
            cx=np.full((n,), w / 2, np.float32),
            cy=np.full((n,), h / 2, np.float32),
            width=np.full((n,), w, np.int32),
            height=np.full((n,), h, np.int32),
            distortion_params=np.zeros((n, 6), np.float32),
            camera_type=np.full((n,), CameraType.PERSPECTIVE.value, np.int32),
            times=np.asarray(times, np.float32),
        )
        aabb = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32)
        return DataparserOutputs(
            image_filenames=image_filenames,
            cameras=cameras,
            scene_box=aabb,
            dataparser_scale=self.config.scale_factor,
        )
