"""Longer-horizon quality artifacts (VERDICT r4 item 6).

One flagship run per density mode at >=3k steps on the 16-pair/64-px
3D-consistent synthetic scene (3 seeds for `separate`, the shipped default),
each ending in an ns-eval-style JSON written under docs/quality/ plus the
eval image grid PNGs — the committed quality record the 700-step seed
checks could not provide. Reference eval contract:
/root/reference/nerfstudio/scripts/eval.py:32-61.

Usage (live TPU; ~1h total on a warm-ish cache):
    python tools/quality_runs_r5.py [--steps 3000] [--out docs/quality]
    python tools/quality_runs_r5.py --only separate:43   # one run
"""

import argparse
import json
import sys
import tempfile
import time
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

RUNS = [
    ("rgb_only", 42),
    ("shared", 42),
    ("separate", 42),
    ("separate", 43),
    ("separate", 44),
]


def run_one(data, out_dir: Path, mode: str, seed: int, steps: int,
            tiny: bool = False, pairs: int = 16) -> dict:
    cfg = get_method_config("thermal-nerfacto-tpu")
    cfg.data = Path(data)
    cfg.trainer.max_num_iterations = steps
    cfg.trainer.steps_per_save = 10**6
    cfg.trainer.steps_per_eval_image = 10**6
    cfg.trainer.steps_per_eval_batch = 10**6
    cfg.trainer.steps_per_eval_all_images = 0
    cfg.trainer.steps_per_log = 10**6
    cfg.trainer.num_devices = 1
    cfg.trainer.seed = seed
    cfg.datamanager.seed = seed
    cfg.dataparser.train_split_fraction = 0.875
    cfg.datamanager.train_num_rays_per_batch = 2048
    cfg.datamanager.eval_num_rays_per_batch = 2048
    cfg.model.near_plane = 0.5
    cfg.model.far_plane = 4.0
    cfg.model.density_mode = mode
    # Synthetic scene: poses are exact and lighting is view-consistent, so
    # per-image appearance embeddings and pose optimization only add
    # per-view capacity that hurts NOVEL-view eval (measured A/B, tiny
    # scale, 800 steps, seed 42: eval RGB 10.8 -> 21.3 dB with both off —
    # the embedding absorbs color; camera-opt drifts the gauge away from
    # the held-out poses). Real-capture runs keep both on (shipped method
    # defaults unchanged); the reference's synthetic (blender) configs
    # disable pose-opt for the same reason.
    cfg.model.use_appearance_embedding = False
    cfg.model.camera_optimizer.mode = "off"
    cfg.model.camera_optimizer_thermal.mode = "off"
    if tiny:  # CPU plumbing smoke only — never a quality artifact
        cfg.model.num_proposal_samples_per_ray = (8, 8)
        cfg.model.num_nerf_samples_per_ray = 8
        cfg.model.eval_num_rays_per_chunk = 512
        cfg.datamanager.train_num_rays_per_batch = 256
        cfg.datamanager.eval_num_rays_per_batch = 256

    root = Path(tempfile.mkdtemp(prefix=f"quality_{mode}_s{seed}_"))
    trainer = setup_trainer(cfg, base_dir=root / "out")
    trainer.setup()
    t0 = time.perf_counter()
    for step in range(steps):
        scalars = trainer.train_iteration(step)
        if step % 500 == 0:
            msg = f"  [{mode} seed{seed}] step {step}"
            for k in ("psnr_rgb", "psnr_thermal"):
                if k in scalars:
                    msg += f" {k}={float(scalars[k]):.2f}"
            print(msg, flush=True)
    train_s = time.perf_counter() - t0

    params = trainer.host_params()
    metrics = trainer.pipeline.get_average_eval_image_metrics(params)
    from nerfstudio_thermal_tpu.utils.lpips import lpips_provenance

    record = {
        "scene": f"synthetic consistent {pairs}-pair 64px (tests.fixtures."
                 "make_consistent_rgbt_dataset)",
        "method_name": "thermal-nerfacto-tpu",
        "density_mode": mode,
        "seed": seed,
        "steps": steps,
        "train_seconds": round(train_s, 1),
        "lpips_provenance": lpips_provenance(),
        "results": metrics,
    }
    out_dir.mkdir(parents=True, exist_ok=True)
    stem = f"flagship_{mode}_seed{seed}" + (
        f"_{pairs}pairs" if pairs != 16 else ""
    )
    (out_dir / f"{stem}.json").write_text(json.dumps(record, indent=2))

    # eval image grids (GT | pred RGB | pred thermal), one per eval image
    try:
        from PIL import Image

        dm = trainer.datamanager
        n_eval = len(dm.eval_cameras)
        for i in range(min(n_eval, 2)):
            _, batch = dm.next_eval_image(i)
            outputs = trainer.model.get_outputs_for_camera(
                params, dm.eval_cameras, i
            )
            _, images = trainer.pipeline.compute_image_metrics(
                outputs, batch, i
            )
            grid = np.clip(np.asarray(images["img"]), 0, 1)
            Image.fromarray((grid * 255).astype(np.uint8)).save(
                out_dir / f"{stem}_eval{i}.png"
            )
    except Exception as e:  # noqa: BLE001 — the JSON is the must-have
        print(f"  image grid failed: {e}", flush=True)
    return record


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--out", type=Path,
                    default=Path(__file__).resolve().parents[1]
                    / "docs" / "quality")
    ap.add_argument("--only", type=str, default=None,
                    help="mode:seed to run a single entry")
    ap.add_argument("--tiny", action="store_true",
                    help="shrink the model for a CPU plumbing smoke test")
    ap.add_argument("--pairs", type=int, default=16,
                    help="scene view pairs (same train-batch shapes at any "
                    "value, so the compiled programs are reused)")
    args = ap.parse_args()

    root = Path(tempfile.mkdtemp(prefix="quality_scene_"))
    data = make_consistent_rgbt_dataset(
        root / "scene", num_pairs=args.pairs, rgb_hw=(64, 64), t_hw=(56, 56)
    )

    runs = RUNS
    if args.only:
        mode, seed = args.only.split(":")
        runs = [(mode, int(seed))]
    summary = []
    for mode, seed in runs:
        print(f"== {mode} seed {seed} ({args.steps} steps) ==", flush=True)
        rec = run_one(data, args.out, mode, seed, args.steps, tiny=args.tiny,
                      pairs=args.pairs)
        res = rec["results"]
        line = {k: res.get(k) for k in sorted(res) if k.startswith(("psnr", "ssim"))}
        print(f"  -> {line}", flush=True)
        summary.append((mode, seed, line))
    print("\n== summary ==")
    for mode, seed, line in summary:
        print(f"{mode:<9} seed{seed}: {line}")
    print("QUALITY RUNS DONE")


if __name__ == "__main__":
    main()
