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
    use_native_sampler: bool = True
    """Use the C++ batch sampler (native/batch_sampler.cpp) for the per-step
    host hot path when it is buildable and the dataset has no extra per-pixel
    channels (depth/semantics); falls back to the Python sampler otherwise."""


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
        self._native = None
        if config.use_native_sampler:
            self._native = self._try_native_sampler()

    def _try_native_sampler(self):
        """Build the C++ fast-path sampler when the dataset qualifies
        (no per-pixel sidecar channels; uniform channel count)."""
        md = self.train_dataset.metadata
        if md.get("depth_filenames") or (
            md.get("semantics") and md["semantics"].get("filenames")
        ):
            return None
        try:
            from nerfstudio_thermal_tpu.data.native_sampler import (
                NativeBatchSampler, native_available,
            )

            if not native_available():
                return None
            self.train_dataset.preload()
            images = [
                self.train_dataset.get_image(i)
                for i in range(len(self.train_dataset))
            ]
            if len({im.shape[-1] for im in images}) != 1:
                return None
            return NativeBatchSampler(
                images, self.train_dataset.is_thermal,
                patch_size=self.config.patch_size, seed=self.config.seed,
            )
        except Exception:
            return None

    @property
    def train_cameras(self):
        return self.train_dataset.cameras

    @property
    def eval_cameras(self):
        return self.eval_dataset.cameras

    # Set by DynamicBatchPipeline (power-of-two bucketed) to resize the ray
    # batch without touching the config; None = config value.
    num_rays_override: Optional[int] = None

    def next_train(self, step: int) -> Dict[str, np.ndarray]:
        n = self.num_rays_override or self.config.train_num_rays_per_batch
        if self._native is not None:
            return self._native.sample(n, step=step)
        return self.train_pixel_sampler.sample(n, step=step)

    def next_eval(self, step: int) -> Dict[str, np.ndarray]:
        return self.eval_pixel_sampler.sample(step=step)

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
        reference :395-410). The epoch permutation is a pure function of
        (seed, epoch), so resumed runs replay the same image order."""
        n = len(self.train_dataset)
        epoch, pos = divmod(step, n)
        order = np.random.default_rng((self.config.seed, epoch)).permutation(n)
        idx = int(order[pos])
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


@dataclass
class RandomCamerasDataManagerConfig(VanillaDataManagerConfig):
    """(reference data/datamanagers/random_cameras_datamanager.py): random
    spherical cameras for generative (text-to-3D) training."""

    radius_mean: float = 2.5
    radius_std: float = 0.1
    focal_range: Tuple[float, float] = (0.7, 1.35)
    vertical_rotation_range: Tuple[float, float] = (-90.0, 0.0)
    jitter_std: float = 0.01
    resolution: int = 64


class RandomCamerasDataManager:
    """Produces one random camera pose per step (no images). The eval
    'dataset' is a fixed ring of cameras for rendering checks."""

    def __init__(self, config: RandomCamerasDataManagerConfig, dataparser=None,
                 test_split: str = "val"):
        from nerfstudio_thermal_tpu.cameras.cameras import Cameras, CameraType

        self.config = config
        self._rng = np.random.default_rng(config.seed)
        res = config.resolution
        n_eval = 8
        angles = np.linspace(0, 2 * np.pi, n_eval, endpoint=False)
        c2ws = np.stack([
            self._look_at(config.radius_mean * np.array(
                [np.cos(a), np.sin(a), 0.4]))
            for a in angles
        ])
        focal = res * 1.0
        self._cams = Cameras(
            camera_to_worlds=c2ws.astype(np.float32),
            fx=np.full((n_eval,), focal, np.float32),
            fy=np.full((n_eval,), focal, np.float32),
            cx=np.full((n_eval,), res / 2, np.float32),
            cy=np.full((n_eval,), res / 2, np.float32),
            width=np.full((n_eval,), res, np.int32),
            height=np.full((n_eval,), res, np.int32),
            distortion_params=np.zeros((n_eval, 6), np.float32),
            camera_type=np.full((n_eval,), CameraType.PERSPECTIVE.value, np.int32),
        )
        self.train_dataparser_outputs = type(
            "O", (), {"metadata": {}, "scene_box":
                      np.array([[-1, -1, -1], [1, 1, 1]], np.float32),
                      "as_dict": lambda self: {}}
        )()
        self.train_dataset = [None]  # len() == 1 (no images)
        self.eval_dataset = [None] * n_eval

    @staticmethod
    def _look_at(eye, target=np.zeros(3), up=np.array([0.0, 0.0, 1.0])):
        fwd = target - eye
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(fwd, up)
        right = right / max(np.linalg.norm(right), 1e-9)
        true_up = np.cross(right, fwd)
        c2w = np.eye(4, dtype=np.float32)[:3]
        c2w[:, 0], c2w[:, 1], c2w[:, 2], c2w[:, 3] = right, true_up, -fwd, eye
        return c2w

    @property
    def train_cameras(self):
        return self._cams

    @property
    def eval_cameras(self):
        return self._cams

    def next_train(self, step: int) -> Dict[str, np.ndarray]:
        """Random spherical pose + per-view angles (reference
        random_cameras_datamanager.py `RandomCameras`). Stateless per step
        for resume-equivalence."""
        cfg = self.config
        r = np.random.default_rng((cfg.seed, step))
        vertical = r.uniform(*cfg.vertical_rotation_range)  # degrees
        central = r.uniform(0.0, 360.0)
        radius = r.normal(cfg.radius_mean, cfg.radius_std)
        v = np.deg2rad(vertical)
        h = np.deg2rad(central)
        eye = radius * np.array(
            [np.cos(h) * np.cos(v), np.sin(h) * np.cos(v), -np.sin(v)]
        )
        eye = eye + r.normal(0, cfg.jitter_std, 3)
        c2w = self._look_at(eye)
        focal = r.uniform(*cfg.focal_range) * cfg.resolution
        return {
            "c2w": c2w.astype(np.float32),
            "focal": np.float32(focal),
            "vertical": np.float32(-vertical),  # ref: positive = overhead
            "central": np.float32(central),
        }

    def next_eval(self, step: int) -> Dict[str, np.ndarray]:
        return self.next_train(step)

    def next_eval_image(self, step: int):
        raise NotImplementedError("generative training has no GT images")

    def num_train_data(self) -> int:
        return 1


class PrefetchingDataManager(VanillaDataManager):
    """Host prefetch thread keeping a batch queue full
    (TPU analogue of reference parallel_datamanager.py:65-130)."""

    def __init__(self, *args, queue_size: int = 4, **kwargs):
        super().__init__(*args, **kwargs)
        self._queue: "queue.Queue[Dict[str, np.ndarray]]" = queue.Queue(maxsize=queue_size)
        self._stop = threading.Event()
        self._prefetch_step = 0
        self._gen = 0  # realignment generation; guarded by _step_lock
        self._step_lock = threading.Lock()
        self._lookahead = None  # stashed future-tagged batch (trainer thread only)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def set_start_step(self, step: int):
        """Realign the prefetch stream after a checkpoint load: drop queued
        batches and restart the stateless (seed, step) sequence at `step`.
        The generation bump makes any batch the worker is sampling *right
        now* (claimed under the old generation) droppable on dequeue — the
        worker cannot clobber the realigned step because it claims
        `_prefetch_step` under the lock before sampling."""
        with self._step_lock:
            self._gen += 1
            self._prefetch_step = int(step)
            # drain under the SAME lock: the worker cannot claim a
            # new-generation step (and enqueue a batch we'd swallow) until
            # the drain finishes
            while True:
                try:
                    self._queue.get_nowait()
                except queue.Empty:
                    break
        self._lookahead = None

    def _worker(self):
        while not self._stop.is_set():
            n = self.num_rays_override or self.config.train_num_rays_per_batch
            with self._step_lock:
                s = self._prefetch_step
                gen = self._gen
                self._prefetch_step = s + 1
            if self._native is not None:
                batch = self._native.sample(n, step=s)
            else:
                batch = self.train_pixel_sampler.sample(n, step=s)
            while not self._stop.is_set():
                try:
                    self._queue.put((gen, s, batch), timeout=0.5)
                    break
                except queue.Full:
                    continue

    def next_train(self, step: int) -> Dict[str, np.ndarray]:
        # Batches are tagged with (generation, step); drop anything from a
        # previous generation or drawn for an earlier step. A future-tagged
        # batch is STASHED (not discarded) so one rewind costs one inline
        # sample, after which the prefetched stream is picked back up.
        if self._lookahead is not None:
            gen, tag, batch = self._lookahead
            with self._step_lock:
                cur_gen = self._gen
            if gen != cur_gen or tag < step:
                self._lookahead = None
            elif tag == step:
                self._lookahead = None
                return batch
            else:  # still in the future
                return super().next_train(step)
        while True:
            gen, tag, batch = self._queue.get()
            with self._step_lock:
                cur_gen = self._gen
            if gen != cur_gen or tag < step:
                continue
            if tag == step:
                return batch
            # prefetch ran ahead of an unexpected rewind: keep the batch
            # for when `step` catches up; sample this one inline (the
            # stateless (seed, step) sampler makes that thread-safe)
            self._lookahead = (gen, tag, batch)
            return super().next_train(step)

    def close(self):
        self._stop.set()

    def __del__(self):
        self._stop.set()
