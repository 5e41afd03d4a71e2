"""nerfstudio_thermal_tpu: TPU-native multispectral (RGB + LWIR) radiance fields.

A ground-up JAX/XLA/Pallas rebuild of ThermalNeRF (yvette256/nerfstudio-thermal,
the official code of arXiv:2407.15337). The compute path (hash-grid fields,
proposal sampling, volume rendering, cross-spectral losses) compiles into fused
XLA programs with Pallas kernels for the hot ops; scaling is SPMD over a
`jax.sharding.Mesh` instead of DDP.
"""

__version__ = "0.1.0"
