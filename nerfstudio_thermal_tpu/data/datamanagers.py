"""Data managers: own datasets + pixel samplers, produce per-step ray batches.

Behavioral spec: reference `nerfstudio/data/datamanagers/base_datamanager.py`
(`VanillaDataManager:365-584` — setup_train/eval, next_train = sample pixels,
next_eval_image for full-image eval) and `parallel_datamanager.py:65-130`
(background workers pre-computing batches onto a queue).

TPU design: ray *generation* moved on-device into the jitted train step (see
models), so the host pipeline only samples pixel indices and gathers GT
values — cheap enough that the "parallel" flavor is a single prefetch thread
keeping a small queue full while the TPU steps.
"""

import queue
import threading
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import numpy as np

from nerfstudio_thermal_tpu.data.dataparsers.base_dataparser import DataParser
from nerfstudio_thermal_tpu.data.datasets import InputDataset
from nerfstudio_thermal_tpu.data.pixel_samplers import PixelSampler, PixelSamplerConfig


@dataclass
class VanillaDataManagerConfig:
    train_num_rays_per_batch: int = 4096
    eval_num_rays_per_batch: int = 4096
    patch_size: int = 1
    camera_res_scale_factor: float = 1.0
    seed: int = 0


class VanillaDataManager:
    def __init__(
        self,
        config: VanillaDataManagerConfig,
        dataparser: DataParser,
        test_split: str = "val",
    ):
        self.config = config
        self.dataparser = dataparser
        self.train_dataparser_outputs = dataparser.get_dataparser_outputs(split="train")
        self.eval_dataparser_outputs = dataparser.get_dataparser_outputs(split=test_split)

        self.train_dataset = InputDataset(
            self.train_dataparser_outputs, self.config.camera_res_scale_factor
        )
        self.eval_dataset = InputDataset(
            self.eval_dataparser_outputs, self.config.camera_res_scale_factor
        )
        self.train_pixel_sampler = PixelSampler(
            PixelSamplerConfig(
                num_rays_per_batch=config.train_num_rays_per_batch,
                patch_size=config.patch_size,
            ),
            self.train_dataset,
            seed=config.seed,
        )
        self.eval_pixel_sampler = PixelSampler(
            PixelSamplerConfig(
                num_rays_per_batch=config.eval_num_rays_per_batch,
                patch_size=config.patch_size,
            ),
            self.eval_dataset,
            seed=config.seed + 1,
        )
        self._eval_image_index = 0

    @property
    def train_cameras(self):
        return self.train_dataset.cameras

    @property
    def eval_cameras(self):
        return self.eval_dataset.cameras

    def next_train(self, step: int) -> Dict[str, np.ndarray]:
        return self.train_pixel_sampler.sample()

    def next_eval(self, step: int) -> Dict[str, np.ndarray]:
        return self.eval_pixel_sampler.sample()

    def next_eval_image(self, step: int) -> Tuple[int, Dict[str, np.ndarray]]:
        """(camera_index, {'image': HxWxC, 'is_thermal': scalar})."""
        idx = self._eval_image_index
        self._eval_image_index = (self._eval_image_index + 1) % len(self.eval_dataset)
        return idx, {
            "image": self.eval_dataset.get_image(idx),
            "is_thermal": self.eval_dataset.get_is_thermal(idx),
        }

    def num_train_data(self) -> int:
        return len(self.train_dataset)


@dataclass
class FullImageDatamanagerConfig(VanillaDataManagerConfig):
    """(reference data/datamanagers/full_images_datamanager.py:49-77)."""

    cache_images_type: str = "uint8"  # uint8 | float32


class FullImageDatamanager(VanillaDataManager):
    """Whole-image batches for rasterization methods (splatfacto) —
    reference `full_images_datamanager.py:80-502`. next_train returns one
    full image + its camera index instead of a ray batch; images are cached
    on first load."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._train_order = None
        self._train_pos = 0
        self._rng = np.random.default_rng(self.config.seed)
        self._image_cache: Dict[Tuple[str, int], np.ndarray] = {}

    def _cached_image(self, dataset, tag: str, idx: int) -> np.ndarray:
        key = (tag, idx)
        if key not in self._image_cache:
            img = dataset.get_image(idx)
            if self.config.cache_images_type == "uint8":
                img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            self._image_cache[key] = img
        img = self._image_cache[key]
        if img.dtype == np.uint8:
            return img.astype(np.float32) / 255.0
        return img

    def next_train(self, step: int) -> Dict[str, np.ndarray]:
        """One random full image per step (random permutation epochs,
        reference :395-410)."""
        n = len(self.train_dataset)
        if self._train_order is None or self._train_pos >= n:
            self._train_order = self._rng.permutation(n)
            self._train_pos = 0
        idx = int(self._train_order[self._train_pos])
        self._train_pos += 1
        return {
            "image": self._cached_image(self.train_dataset, "train", idx),
            "camera_index": np.asarray(idx, np.int32),
            "is_thermal": self.train_dataset.get_is_thermal(idx),
        }

    def next_eval(self, step: int) -> Dict[str, np.ndarray]:
        idx = step % len(self.eval_dataset)
        return {
            "image": self._cached_image(self.eval_dataset, "eval", idx),
            "camera_index": np.asarray(idx, np.int32),
            "is_thermal": self.eval_dataset.get_is_thermal(idx),
        }


class PrefetchingDataManager(VanillaDataManager):
    """Host prefetch thread keeping a batch queue full
    (TPU analogue of reference parallel_datamanager.py:65-130)."""

    def __init__(self, *args, queue_size: int = 4, **kwargs):
        super().__init__(*args, **kwargs)
        self._queue: "queue.Queue[Dict[str, np.ndarray]]" = queue.Queue(maxsize=queue_size)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while not self._stop.is_set():
            batch = self.train_pixel_sampler.sample()
            while not self._stop.is_set():
                try:
                    self._queue.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def next_train(self, step: int) -> Dict[str, np.ndarray]:
        return self._queue.get()

    def close(self):
        self._stop.set()

    def __del__(self):
        self._stop.set()
