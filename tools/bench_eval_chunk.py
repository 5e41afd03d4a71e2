"""Sweep eval_num_rays_per_chunk (and optionally fray-base) for the 1080p
device-resident render — the forward path's dispatch granularity.

The 1080p frame is 2.07 M rays; at the flagship's 8192-ray chunk the in-jit
lax.map runs 254 serial iterations. Larger chunks amortize per-iteration
machinery (forward-only runs store no activations, so memory allows much
larger chunks than training's 32k-ray OOM bound). Each config runs in this
one process (program cache makes repeat timings honest); first compile of
each chunk size is its own program.

Usage (live TPU):
    python tools/bench_eval_chunk.py [chunks...]      # default 8192 16384 32768
    NS_EVAL_FRAY=1 python tools/bench_eval_chunk.py   # fused ray-march fwd
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

import bench  # noqa: E402


def main():
    chunks = [int(a) for a in sys.argv[1:]] or [8192, 16384, 32768]
    fray = os.environ.get("NS_EVAL_FRAY", "0") == "1"
    ffield = os.environ.get("NS_EVAL_FFIELD", "0") == "1"
    for c in chunks:
        overrides = {"eval_num_rays_per_chunk": c}
        if fray:
            overrides["fused_raymarch"] = True
        if ffield:
            overrides["fused_raymarch"] = True
            overrides["fused_field"] = True
        t0 = time.perf_counter()
        rays_s, fps = bench._measure_eval_1080p(
            "thermal-nerfacto-tpu", overrides
        )
        wall = time.perf_counter() - t0
        print(
            f"chunk {c:>6} fray={int(fray)}  {rays_s/1e3:8.1f}k rays/s  "
            f"{fps:.3f} fps   (incl compile wall {wall:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
