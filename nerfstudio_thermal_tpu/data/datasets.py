"""Image datasets (host side).

Behavioral spec: reference `nerfstudio/data/datasets/base_dataset.py:40-161`
(images as float32 HxWx3(4) in [0,1]; grayscale replicated to 3 channels —
thermal PNGs arrive as 3-channel grey, `rgb_to_rgbt_image` later takes channel
0) and `data/datasets/thermal_dataset.py:11-12` (surface per-image
`is_thermal` from dataparser metadata).
"""

from typing import Dict, List, Optional

import numpy as np

from nerfstudio_thermal_tpu.data.dataparsers.base_dataparser import DataparserOutputs


def load_image(path, scale_factor: float = 1.0) -> np.ndarray:
    """Load an image as float32 [H, W, 3 or 4] in [0, 1]."""
    from PIL import Image

    pil = Image.open(path)
    if scale_factor != 1.0:
        w, h = pil.size
        pil = pil.resize((int(w * scale_factor), int(h * scale_factor)), Image.BILINEAR)
    arr = np.asarray(pil)
    if arr.dtype == np.uint16:
        img = arr.astype(np.float32) / 65535.0
    else:
        img = arr.astype(np.float32) / 255.0
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    elif img.shape[-1] == 2:  # grey + alpha
        img = np.concatenate([np.repeat(img[..., :1], 3, -1), img[..., 1:]], -1)
    return img


class InputDataset:
    """Dataset over the dataparser outputs; images lazily loaded and cached
    in RAM (the reference's CacheDataloader caches on GPU; HBM is precious on
    TPU so the cache lives host-side and batches stream per step)."""

    def __init__(self, dataparser_outputs: DataparserOutputs, scale_factor: float = 1.0):
        self._dataparser_outputs = dataparser_outputs
        self.scale_factor = scale_factor
        self.cameras = dataparser_outputs.cameras
        self.metadata = dataparser_outputs.metadata
        self._cache: Dict[int, np.ndarray] = {}

    def __len__(self):
        return len(self._dataparser_outputs.image_filenames)

    @property
    def image_filenames(self):
        return self._dataparser_outputs.image_filenames

    def get_image(self, idx: int) -> np.ndarray:
        if idx not in self._cache:
            self._cache[idx] = load_image(
                self._dataparser_outputs.image_filenames[idx], self.scale_factor
            )
        return self._cache[idx]

    def get_depth(self, idx: int):
        """Depth image [H, W, 1] in scene units, or None
        (reference datasets/depth_dataset.py: 16-bit png / npy scaled by
        depth_unit_scale_factor)."""
        depth_files = self.metadata.get("depth_filenames")
        if not depth_files:
            return None
        scale = float(self.metadata.get("depth_unit_scale_factor", 1e-3))
        path = depth_files[idx]
        if str(path).endswith(".npy"):
            depth = np.load(path).astype(np.float32)
        else:
            from PIL import Image

            depth = np.asarray(Image.open(path)).astype(np.float32)
        if depth.ndim == 2:
            depth = depth[..., None]
        return depth * scale

    def get_normal(self, idx: int):
        """Monocular normal prior [H, W, 3] in [-1, 1], or None (reference
        sdfstudio mono_normal_path: npy in [0,1] -> *2-1, world-aligned by
        the dataparser's camera_to_worlds when needed)."""
        files = self.metadata.get("normal_filenames")
        if not files:
            return None
        path = files[idx]
        if str(path).endswith(".npy"):
            n = np.load(path).astype(np.float32)
        else:
            from PIL import Image

            n = np.asarray(Image.open(path)).astype(np.float32) / 255.0
        if n.ndim == 3 and n.shape[0] == 3 and n.shape[-1] != 3:
            n = np.moveaxis(n, 0, -1)
        return n * 2.0 - 1.0

    def get_semantics(self, idx: int):
        """Per-pixel integer class labels [H, W] or None (reference
        datasets/semantic_dataset.py: label PNGs listed in
        metadata['semantics']['filenames'])."""
        sem = self.metadata.get("semantics")
        if not sem or not sem.get("filenames"):
            return None
        from PIL import Image

        arr = np.asarray(Image.open(sem["filenames"][idx]))
        if arr.ndim == 3:
            arr = arr[..., 0]
        return arr.astype(np.int32)

    def get_is_thermal(self, idx: int) -> float:
        vals = self.metadata.get("is_thermal")
        return float(vals[idx]) if vals is not None else 0.0

    @property
    def is_thermal(self) -> np.ndarray:
        vals = self.metadata.get("is_thermal")
        if vals is None:
            return np.zeros((len(self),), np.float32)
        return np.asarray(vals, np.float32)

    def preload(self):
        for i in range(len(self)):
            self.get_image(i)


# Alias matching the reference's class name (thermal_dataset.py:11).
ThermalDataset = InputDataset
