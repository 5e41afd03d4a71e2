"""Host data-path bench: Python pixel sampler vs the C++ native sampler.

Measures the real `datamanager.next_train` hot loop (pixel sampling + GT
gather + is_thermal attach) on a realistic cached image set — the part
bench.py's device-side measurement excludes. Pure host; no TPU needed.

Prints per-sampler batches/s and the implied overhead fraction of a
flagship train step (46-52 ms/step device time at 8192 rays).
"""

import time

import numpy as np


def main():
    from nerfstudio_thermal_tpu.data.native_sampler import (
        NativeBatchSampler,
        native_available,
    )
    from nerfstudio_thermal_tpu.data.pixel_samplers import (
        PixelSampler,
        PixelSamplerConfig,
    )

    rng = np.random.default_rng(0)
    # realistic capture: 64 images, mixed 480x640 RGB / 480x640 thermal
    n_images, h, w = 64, 480, 640
    images = [rng.uniform(0, 1, (h, w, 3)).astype(np.float32) for _ in range(n_images)]
    is_thermal = np.asarray([i % 2 for i in range(n_images)], np.float32)

    class _FakeDataset:
        metadata = {}

        def __init__(self):
            self.is_thermal = is_thermal

        def __len__(self):
            return n_images

        def get_image(self, i):
            return images[i]

    ds = _FakeDataset()
    num_rays = 8192
    py = PixelSampler(
        PixelSamplerConfig(num_rays_per_batch=num_rays, patch_size=2), ds, seed=0
    )

    def bench(fn, label, reps=50):
        fn(0)  # warm
        t0 = time.perf_counter()
        for s in range(reps):
            fn(s)
        dt = (time.perf_counter() - t0) / reps
        step_ms = 47.0  # flagship device step (r2 trace)
        print(
            f"{label}: {dt*1e3:7.2f} ms/batch  ({1/dt:6.1f} batches/s; "
            f"{dt*1e3/step_ms*100:5.1f}% of a {step_ms:.0f} ms device step)",
            flush=True,
        )
        return dt

    t_py = bench(lambda s: py.sample(num_rays, step=s), "python sampler  ")

    if native_available():
        nat = NativeBatchSampler(images, is_thermal, patch_size=2, seed=0)
        t_nat = bench(lambda s: nat.sample(num_rays, step=s), "native sampler  ")
        print(f"native speedup: {t_py / t_nat:.1f}x", flush=True)
    else:
        print("native sampler unavailable (build: make -C nerfstudio_thermal_tpu/native)")


if __name__ == "__main__":
    main()
