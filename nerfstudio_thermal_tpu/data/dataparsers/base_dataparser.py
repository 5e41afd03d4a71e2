"""Dataparser base types.

Behavioral spec: reference `nerfstudio/data/dataparsers/base_dataparser.py`
(`DataparserOutputs`: image filenames + Cameras + scene box + dataparser
transform/scale + metadata).
"""

from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

from nerfstudio_thermal_tpu.cameras.cameras import Cameras


@dataclass
class DataparserOutputs:
    image_filenames: List[Path]
    cameras: Cameras
    scene_box: np.ndarray  # [2, 3] aabb
    mask_filenames: Optional[List[Path]] = None
    dataparser_transform: np.ndarray = field(
        default_factory=lambda: np.eye(4, dtype=np.float32)[:3]
    )
    dataparser_scale: float = 1.0
    metadata: Dict[str, Any] = field(default_factory=dict)

    def as_dict(self) -> dict:
        return {
            "dataparser_transform": self.dataparser_transform.tolist(),
            "dataparser_scale": self.dataparser_scale,
        }


@dataclass
class DataParserConfig:
    data: Path = Path()


class DataParser:
    def __init__(self, config: DataParserConfig):
        self.config = config

    def get_dataparser_outputs(self, split: str = "train", **kwargs) -> DataparserOutputs:
        return self._generate_dataparser_outputs(split=split, **kwargs)

    def _generate_dataparser_outputs(self, split: str = "train", **kwargs) -> DataparserOutputs:
        raise NotImplementedError
