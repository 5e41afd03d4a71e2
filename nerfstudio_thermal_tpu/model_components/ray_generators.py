"""Ray generator: (camera index, pixel coords) -> rays.

Behavioral spec: reference `nerfstudio/model_components/ray_generators.py:25-55`.
Runs inside jit; camera-optimizer corrections are composed by the model
instead (pose deltas are model params here).
"""

import jax

from nerfstudio_thermal_tpu.cameras.cameras import Cameras
from nerfstudio_thermal_tpu.cameras.rays import RayBundle


class RayGenerator:
    def __init__(self, cameras: Cameras):
        self.cameras = cameras

    def __call__(self, ray_indices: jax.Array) -> RayBundle:
        """ray_indices: [R, 3] int (camera, row, col) -> RayBundle.

        Pixel centers (+0.5) follow reference cameras.py:292-320.
        """
        c = ray_indices[:, 0]
        coords = ray_indices[:, 1:].astype(jax.numpy.float32) + 0.5  # (y, x)
        return self.cameras.generate_rays(c, coords)
