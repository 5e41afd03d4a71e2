"""On-TPU flagship quality spot-check (CLAUDE.md round-3 checklist item 5).

Runs the REAL flagship configuration (`thermal-nerfacto-tpu`: bf16 compute,
Pallas fused MLP, lean schedule) on the 16-pair/64-px 3D-consistent scene
that tests/engine/test_flagship_stability.py uses on CPU, and prints the
early/late train-batch PSNRs. Purpose: validate that TPU-only numerics
changes (the f32 matmul precision pin, explicit Pallas kernel precisions,
fused ray-march knobs) keep the model learning — the CPU suite can't see
any of those paths.

Healthy bars (same scene as the CPU stability test, which clears them by
400 steps): late RGB > 13 dB and > early+2; late thermal > 15 dB. Seed
spread on this class of scene is ~2 dB (CLAUDE.md) — run >=3 seeds before
believing a regression.

Usage:
    python tools/tpu_quality_spotcheck.py [--steps 700] [--seed 42]
        [--fused-raymarch] [--fused-field] [--fused-props]
"""

import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

from nerfstudio_thermal_tpu.utils.precision import ensure_exact_f32_matmuls  # noqa: E402

ensure_exact_f32_matmuls()

from nerfstudio_thermal_tpu.configs.method_configs import (  # noqa: E402
    get_method_config,
    setup_trainer,
)
from tests.fixtures import make_consistent_rgbt_dataset  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=700)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--no-fused-raymarch", action="store_true")
    ap.add_argument("--fused-field", action="store_true")
    ap.add_argument("--fused-props", action="store_true")
    ap.add_argument(
        "--no-contraction", action="store_true",
        help="disable scene contraction (bounded-scene style; note the "
        "fused ray-march kernel requires contraction and will fall back)",
    )
    args = ap.parse_args()

    root = Path(tempfile.mkdtemp(prefix="tpu_spotcheck_"))
    data = make_consistent_rgbt_dataset(
        root / "scene", num_pairs=16, rgb_hw=(64, 64), t_hw=(56, 56)
    )

    cfg = get_method_config("thermal-nerfacto-tpu")
    cfg.data = Path(data)
    cfg.trainer.max_num_iterations = args.steps
    cfg.trainer.steps_per_save = 10**6
    cfg.trainer.steps_per_eval_image = 10**6
    cfg.trainer.steps_per_eval_batch = 10**6
    cfg.trainer.steps_per_eval_all_images = 0
    cfg.trainer.steps_per_log = 10**6
    cfg.trainer.num_devices = 1
    cfg.trainer.seed = args.seed
    cfg.datamanager.seed = args.seed
    cfg.dataparser.train_split_fraction = 0.875
    cfg.datamanager.train_num_rays_per_batch = 2048
    cfg.datamanager.eval_num_rays_per_batch = 2048
    m = cfg.model
    # keep the SHIPPED flagship model knobs (bf16, pallas, lean schedule,
    # contraction, fused_raymarch); only geometry bounds adapt to the scene
    m.near_plane = 0.5
    m.far_plane = 4.0
    if args.no_contraction:
        m.disable_scene_contraction = True
    if args.no_fused_raymarch:
        m.fused_raymarch = False
    if args.fused_field:
        m.fused_raymarch = True
        m.fused_field = True
    m.fused_raymarch_proposals = args.fused_props

    trainer = setup_trainer(cfg, base_dir=root / f"out_seed{args.seed}")
    trainer.setup()
    early_rgb, late_rgb, late_t = [], [], []
    for step in range(args.steps):
        scalars = trainer.train_iteration(step)
        if step < 5:
            early_rgb.append(float(scalars["psnr_rgb"]))
        if step >= args.steps - 20:
            late_rgb.append(float(scalars["psnr_rgb"]))
            late_t.append(float(scalars["psnr_thermal"]))
        if step % 100 == 0:
            print(
                f"step {step}: psnr_rgb={float(scalars['psnr_rgb']):.2f} "
                f"psnr_thermal={float(scalars['psnr_thermal']):.2f}",
                flush=True,
            )
    rgb0, rgb1, t1 = np.mean(early_rgb), np.mean(late_rgb), np.mean(late_t)
    verdict = "OK" if (rgb1 > 13.0 and rgb1 > rgb0 + 2.0 and t1 > 15.0) else "FAIL"
    print(
        f"RESULT seed={args.seed} steps={args.steps} "
        f"early_rgb={rgb0:.2f} late_rgb={rgb1:.2f} late_thermal={t1:.2f} "
        f"fused=({int(cfg.model.fused_raymarch)},{int(cfg.model.fused_field)},"
        f"{int(cfg.model.fused_raymarch_proposals)}) -> {verdict}",
        flush=True,
    )


if __name__ == "__main__":
    main()
