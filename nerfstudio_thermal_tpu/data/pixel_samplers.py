"""Pixel samplers (host side, numpy RNG).

Behavioral spec: reference `nerfstudio/data/pixel_samplers.py:54-506` —
uniform and 2x2-patch sampling over the cached image set; per-ray `is_thermal`
attached from per-image metadata instead of pixelwise gather (:241-254).
Jagged (mixed-resolution) image sets sample equal ray counts per image
(:316-335), which also reproduces the fork's balanced RGB/thermal sampling
(dataloaders.py:104-117) since thermal datasets are half RGB, half thermal.

TPU note: sampling happens on host; the device step receives rectangular
(camera_idx, y, x) index batches plus gathered GT values.
"""

from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np

from nerfstudio_thermal_tpu.data.datasets import InputDataset


@dataclass
class PixelSamplerConfig:
    num_rays_per_batch: int = 4096
    patch_size: int = 1
    """>1 samples whole patch_size x patch_size patches (the thermal model
    requires 2 for its TV/cross-channel losses)."""


class PixelSampler:
    """Samples (camera, y, x) + GT values from an InputDataset."""

    def __init__(self, config: PixelSamplerConfig, dataset: InputDataset, seed: int = 0):
        self.config = config
        self.dataset = dataset
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        p = config.patch_size
        self.num_rays_per_batch = (config.num_rays_per_batch // (p * p)) * (p * p)

    def _sample_in_image(self, idx: int, num_rays: int, rng=None):
        """Returns [num_rays, 2] integer (y, x) for one image."""
        rng = self.rng if rng is None else rng
        img = self.dataset.get_image(idx)
        h, w = img.shape[:2]
        p = self.config.patch_size
        if p <= 1:
            ys = rng.integers(0, h, num_rays)
            xs = rng.integers(0, w, num_rays)
            return np.stack([ys, xs], -1)
        n_patches = num_rays // (p * p)
        # patch top-left uniform in [0, dim - p) (reference :421-434)
        ys0 = rng.uniform(0, h - p, n_patches).astype(np.int64)
        xs0 = rng.uniform(0, w - p, n_patches).astype(np.int64)
        dy, dx = np.meshgrid(np.arange(p), np.arange(p), indexing="ij")
        ys = (ys0[:, None, None] + dy).reshape(-1)
        xs = (xs0[:, None, None] + dx).reshape(-1)
        return np.stack([ys, xs], -1)

    def sample(
        self, num_rays: Optional[int] = None, step: Optional[int] = None
    ) -> Dict[str, np.ndarray]:
        """Sample a ray batch: equal ray counts per image, patch-aligned.

        When `step` is given the draw is a pure function of (seed, step) —
        stateless RNG, so a resumed run reproduces the exact batch sequence
        of an uninterrupted one (resume-equivalence; reference restores full
        training state at engine/trainer.py:389-453). The step-keyed path
        uses a LOCAL generator: the prefetch worker and an inline
        next_train may sample concurrently (datamanagers.py), so the draw
        must not touch shared state."""
        rng = (
            np.random.default_rng((self.seed, step))
            if step is not None else self.rng
        )
        num_rays = num_rays or self.num_rays_per_batch
        n_images = len(self.dataset)
        if n_images == 0:
            raise ValueError(
                "cannot sample rays from an empty dataset (is the eval "
                "split empty? small datasets assign every image to train)"
            )
        p = self.config.patch_size
        unit = p * p
        per_image = max(unit, (num_rays // n_images) // unit * unit)

        cams, coords = [], []
        total = 0
        order = rng.permutation(n_images)
        for j, idx in enumerate(order):
            want = min(per_image, num_rays - total)
            if j == len(order) - 1:
                want = num_rays - total
            want = (want // unit) * unit
            if want <= 0:
                continue
            yx = self._sample_in_image(int(idx), want, rng)
            cams.append(np.full((want,), idx, np.int64))
            coords.append(yx)
            total += want
            if total >= num_rays:
                break
        # top up from random images if short (small datasets)
        while total < num_rays:
            idx = int(rng.integers(0, n_images))
            yx = self._sample_in_image(idx, unit, rng)
            cams.append(np.full((unit,), idx, np.int64))
            coords.append(yx)
            total += unit

        cam_idx = np.concatenate(cams)[:num_rays]
        yx = np.concatenate(coords)[:num_rays]

        # gather GT pixels + per-ray is_thermal (reference :241-254)
        image_vals = np.empty((num_rays, self.dataset.get_image(int(cam_idx[0])).shape[-1]), np.float32)
        for idx in np.unique(cam_idx):
            m = cam_idx == idx
            img = self.dataset.get_image(int(idx))
            image_vals[m] = img[yx[m, 0], yx[m, 1]]
        is_thermal_per_image = self.dataset.is_thermal
        batch = {
            "ray_indices": np.concatenate(
                [cam_idx[:, None], yx], axis=-1
            ).astype(np.int32),
            "image": image_vals,
            "is_thermal": is_thermal_per_image[cam_idx].astype(np.float32),
        }
        if self.dataset.metadata.get("depth_filenames"):
            depth_vals = np.zeros((num_rays, 1), np.float32)
            for idx in np.unique(cam_idx):
                m = cam_idx == idx
                depth = self.dataset.get_depth(int(idx))
                depth_vals[m] = depth[yx[m, 0], yx[m, 1]][:, :1]
            batch["depth_image"] = depth_vals
        if self.dataset.metadata.get("normal_filenames"):
            normal_vals = np.zeros((num_rays, 3), np.float32)
            for idx in np.unique(cam_idx):
                m = cam_idx == idx
                normal = self.dataset.get_normal(int(idx))
                if normal is None:
                    continue
                normal_vals[m] = normal[yx[m, 0], yx[m, 1]]
            batch["normal"] = normal_vals
        sem_meta = self.dataset.metadata.get("semantics")
        if sem_meta and sem_meta.get("filenames"):
            sem_vals = np.zeros((num_rays,), np.int32)
            for idx in np.unique(cam_idx):
                m = cam_idx == idx
                sem = self.dataset.get_semantics(int(idx))
                sem_vals[m] = sem[yx[m, 0], yx[m, 1]]
            batch["semantics"] = sem_vals
        return batch


class PatchPixelSampler(PixelSampler):
    """Alias with patch semantics (reference :370-442); behavior selected by
    config.patch_size."""


class PairPixelSampler(PixelSampler):
    """Samples pixels in pairs within a small radius, the layout the
    depth-ranking loss expects (reference pixel_samplers.py:450-506:
    consecutive rays [anchor, neighbor, anchor, neighbor, ...])."""

    def __init__(self, config: PixelSamplerConfig, dataset: InputDataset,
                 seed: int = 0, radius: int = 2):
        super().__init__(config, dataset, seed)
        self.radius = radius
        # pairs, not patches
        self.num_rays_per_batch = config.num_rays_per_batch // 2 * 2

    def _sample_in_image(self, idx: int, num_rays: int, rng=None):
        rng = self.rng if rng is None else rng
        img = self.dataset.get_image(idx)
        h, w = img.shape[:2]
        r = self.radius
        n_pairs = max(num_rays // 2, 1)
        ys = rng.integers(r, max(h - r, r + 1), n_pairs)
        xs = rng.integers(r, max(w - r, r + 1), n_pairs)
        dy = rng.integers(-r, r + 1, n_pairs)
        dx = rng.integers(-r, r + 1, n_pairs)
        ys2 = np.clip(ys + dy, 0, h - 1)
        xs2 = np.clip(xs + dx, 0, w - 1)
        yx = np.empty((n_pairs * 2, 2), np.int64)
        yx[0::2, 0], yx[0::2, 1] = ys, xs
        yx[1::2, 0], yx[1::2, 1] = ys2, xs2
        return yx[:num_rays]
