"""ctypes bindings for the native (C++) batch sampler.

The C++ library (nerfstudio_thermal_tpu/native/batch_sampler.cpp) implements
the per-step host hot path — patch-aligned pixel sampling + GT gather — as a
multithreaded shared object; this wrapper loads it, auto-building with `make`
on first use when a toolchain is present. The Python PixelSampler remains the
behavioral spec and the fallback.
"""

import ctypes
import subprocess
from pathlib import Path
from typing import Dict, Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libbatch_sampler.so"
_lib = None
_load_failed = False


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not _LIB_PATH.exists():
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        assert lib.native_sampler_abi_version() == 1
        lib.sample_batch.restype = ctypes.c_int
        lib.sample_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),  # images
            ctypes.POINTER(ctypes.c_int32),   # heights
            ctypes.POINTER(ctypes.c_int32),   # widths
            ctypes.c_int32,                   # channels
            ctypes.POINTER(ctypes.c_float),   # is_thermal
            ctypes.c_int32,                   # n_images
            ctypes.c_uint64,                  # seed
            ctypes.c_int32,                   # num_rays
            ctypes.c_int32,                   # patch
            ctypes.c_int32,                   # num_threads
            ctypes.POINTER(ctypes.c_int32),   # ray_indices out
            ctypes.POINTER(ctypes.c_float),   # image out
            ctypes.POINTER(ctypes.c_float),   # thermal out
        ]
        _lib = lib
    except Exception:
        _load_failed = True
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


class NativeBatchSampler:
    """Drop-in fast path for PixelSampler.sample() over a fully cached
    same-channel-count image set."""

    def __init__(self, images, is_thermal, patch_size: int = 1, seed: int = 0,
                 num_threads: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native batch sampler unavailable (build with "
                "`make -C nerfstudio_thermal_tpu/native`)"
            )
        self._lib = lib
        # keep contiguous float32 copies alive for the pointer table
        self._images = [np.ascontiguousarray(im, np.float32) for im in images]
        channels = {im.shape[-1] for im in self._images}
        assert len(channels) == 1, "all images must share a channel count"
        self.channels = channels.pop()
        n = len(self._images)
        self._ptrs = (ctypes.c_void_p * n)(
            *[im.ctypes.data_as(ctypes.c_void_p).value for im in self._images]
        )
        self._heights = np.asarray([im.shape[0] for im in self._images], np.int32)
        self._widths = np.asarray([im.shape[1] for im in self._images], np.int32)
        self._thermal = np.asarray(is_thermal, np.float32)
        assert len(self._thermal) == n
        self.patch = int(patch_size)
        self.seed = int(seed)
        self.num_threads = int(num_threads)
        self._step = 0

    def sample(self, num_rays: int, step: "int | None" = None) -> Dict[str, np.ndarray]:
        # Per-call seeding makes the draw a pure function of (seed, step);
        # pinning `step` gives resume-equivalence after checkpoint load.
        # `eff_step` stays local: the prefetch worker and an inline
        # next_train may call concurrently (datamanagers.py), so the seed
        # must not read shared state another thread can move.
        eff_step = int(step) if step is not None else self._step
        unit = self.patch * self.patch
        num_rays = (num_rays // unit) * unit
        ray_indices = np.empty((num_rays, 3), np.int32)
        image_out = np.empty((num_rays, self.channels), np.float32)
        thermal_out = np.empty((num_rays,), np.float32)
        rc = self._lib.sample_batch(
            self._ptrs,
            self._heights.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.channels,
            self._thermal.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(self._images),
            ctypes.c_uint64(self.seed + eff_step * 1000003),
            num_rays,
            self.patch,
            self.num_threads,
            ray_indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            image_out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            thermal_out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise RuntimeError(f"native sample_batch failed rc={rc}")
        self._step = eff_step + 1
        return {
            "ray_indices": ray_indices,
            "image": image_out,
            "is_thermal": thermal_out,
        }
