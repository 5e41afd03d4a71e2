"""Capture an XLA device trace of the PARITY-workload train step.

Same harness as tools/xla_trace_bench.py but with the reference workload
constants applied ((256,96) proposal + 48 nerf samples/ray, full-rate
cross-density regularizer — BASELINE.md / bench.py's `@parity` row), so the
measured parity ratio (0.474 as of round 4, docs/ROOFLINE_parity.md) can be
decomposed the way docs/ROOFLINE_flagship.md decomposes the flagship step.

Usage (live TPU): python tools/xla_trace_parity.py [report]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from nerfstudio_thermal_tpu.configs import method_configs as mc  # noqa: E402

_orig = mc.get_method_config


def _patched(name):
    cfg = _orig(name)
    m = cfg.model
    m.num_proposal_samples_per_ray = (256, 96)
    m.num_nerf_samples_per_ray = 48
    if hasattr(m, "density_loss_rays_fraction"):
        m.density_loss_rays_fraction = 1.0
    return cfg


mc.get_method_config = _patched

from tools import xla_trace_bench as tb  # noqa: E402

if __name__ == "__main__":
    logdir = "/tmp/xla_trace_parity"
    if len(sys.argv) > 1 and sys.argv[1] == "report":
        tb.report_direct(logdir)
    else:
        tb.capture(logdir)
        tb.report_direct(logdir)
