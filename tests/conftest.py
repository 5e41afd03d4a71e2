"""Test config: force an 8-device virtual CPU platform so sharding/pjit code
paths can be exercised without TPU hardware (the reference's analogue is its
CPU-only smoke tests, see /root/reference/tests/test_train.py:34-80)."""

import os

# Must be set before the jax backend initializes. Force CPU even if the outer
# environment points at a TPU: the suite needs 8 virtual devices + exact fp32.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# A sitecustomize on this image (PYTHONPATH=.axon_site) pins jax_platforms to
# the TPU tunnel; override it after import, before backend init.
jax.config.update("jax_platforms", "cpu")

