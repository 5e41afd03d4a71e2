"""Flagship-only throughput run (for quick A/B of step-level changes).

Same measurement as bench.py's final line; skips the slow hash-parity and
eval rows. Run from the repo root:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_flagship_only.py [n_steps]
"""

import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    bench.run("thermal-nerfacto-tpu", "train_rays_per_sec", n_steps=n)
