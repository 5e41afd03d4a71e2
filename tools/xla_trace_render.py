"""Capture an XLA device trace of the 1080p eval render (render_camera_device)
and print the per-op decomposition — the input for docs/ROOFLINE_render.md.

The question this answers (VERDICT r4 weak #5): forward-only work is ~1/3 of
the train step's FLOPs, yet measured eval throughput is only ~1.64x train
throughput — where does the forward-only path lose the other ~2x?

Same model/camera setup as bench.py's eval row (flagship thermal-nerfacto-tpu,
one 1920x1080 perspective camera, device-resident render synced by a scalar
fetch); report_direct reuses xla_trace_bench's direct xplane.pb parse (the
tensorboard_plugin_profile converter is broken in this image).

Usage (live TPU):
    python tools/xla_trace_render.py           # capture + report
    python tools/xla_trace_render.py report    # re-report the last trace
    NS_TRACE_FRAY=1 python tools/xla_trace_render.py   # fray-base variant
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

LOGDIR = "/tmp/xla_trace_render"


def capture():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfstudio_thermal_tpu.cameras.cameras import Cameras, CameraType
    from nerfstudio_thermal_tpu.configs.method_configs import get_method_config
    from nerfstudio_thermal_tpu.models.thermal_nerfacto import ThermalNerfactoModel

    h, w = 1080, 1920
    method = get_method_config("thermal-nerfacto-tpu")
    if os.environ.get("NS_TRACE_FRAY") == "1":
        method.model.fused_raymarch = True
    aabb = np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]], np.float32)
    model = ThermalNerfactoModel(
        method.model, aabb, num_train_data=2, metadata={"is_thermal": [0, 1]}
    )
    params = model.init_params(jax.random.PRNGKey(0))
    c2w = np.eye(4, dtype=np.float32)[:3][None]
    c2w[:, 0, 3] = 2.0
    cam = Cameras(
        camera_to_worlds=jnp.asarray(c2w),
        fx=jnp.full((1,), 1400.0), fy=jnp.full((1,), 1400.0),
        cx=jnp.full((1,), w / 2), cy=jnp.full((1,), h / 2),
        width=jnp.full((1,), w, jnp.int32),
        height=jnp.full((1,), h, jnp.int32),
        distortion_params=jnp.zeros((1, 6)),
        camera_type=jnp.full((1,), CameraType.PERSPECTIVE.value, jnp.int32),
    )

    import time

    out = model.render_camera_device(params, cam, 0)  # compile + warm
    float(out["rgb"][0, 0])
    t0 = time.perf_counter()
    out = model.render_camera_device(params, cam, 0)
    float(out["rgb"][0, 0])
    dt = time.perf_counter() - t0
    print(f"warm frame: {dt*1000:.1f} ms = {h*w/dt/1e3:.1f}k rays/s "
          f"= {1/dt:.3f} fps at 1080p", flush=True)

    jax.profiler.start_trace(LOGDIR)
    for _ in range(2):
        out = model.render_camera_device(params, cam, 0)
    float(out["rgb"][0, 0])
    jax.profiler.stop_trace()
    print("trace captured (2 frames)", flush=True)


if __name__ == "__main__":
    from xla_trace_bench import report_direct

    if "report" not in sys.argv:
        capture()
    report_direct(LOGDIR, top=45)
