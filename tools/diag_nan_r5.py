"""Root-cause the round-5 quality-run NaN (separate seed 44 / shared seed 42).

Reruns the failing configuration (quality_runs_r5 settings: 16-pair/64px
scene, embeddings+pose-opt off, 2048 rays) and every N steps fetches ONE
scalar per param group (sum of abs) plus the loss scalars — first group to
go non-finite localizes the blow-up; the step bracket bounds it in time.
Scalar fetches are ~25 ms each through the tunnel, so the whole probe adds
~1 s per check.

Usage (live TPU): python tools/diag_nan_r5.py [--seed 44] [--mode separate]
    [--steps 2200] [--every 50]
"""

import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

from nerfstudio_thermal_tpu.utils.precision import ensure_exact_f32_matmuls  # noqa: E402

ensure_exact_f32_matmuls()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nerfstudio_thermal_tpu.configs.method_configs import (  # noqa: E402
    get_method_config,
    setup_trainer,
)
from tests.fixtures import make_consistent_rgbt_dataset  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=44)
    ap.add_argument("--mode", type=str, default="separate")
    ap.add_argument("--steps", type=int, default=2200)
    ap.add_argument("--every", type=int, default=50)
    args = ap.parse_args()

    root = Path(tempfile.mkdtemp(prefix="diag_nan_"))
    data = make_consistent_rgbt_dataset(
        root / "scene", num_pairs=16, rgb_hw=(64, 64), t_hw=(56, 56)
    )
    cfg = get_method_config("thermal-nerfacto-tpu")
    cfg.data = Path(data)
    cfg.trainer.max_num_iterations = args.steps
    for k in ("steps_per_save", "steps_per_eval_image", "steps_per_eval_batch",
              "steps_per_log"):
        setattr(cfg.trainer, k, 10**6)
    cfg.trainer.steps_per_eval_all_images = 0
    cfg.trainer.num_devices = 1
    cfg.trainer.seed = args.seed
    cfg.datamanager.seed = args.seed
    cfg.dataparser.train_split_fraction = 0.875
    cfg.datamanager.train_num_rays_per_batch = 2048
    cfg.datamanager.eval_num_rays_per_batch = 2048
    cfg.model.near_plane = 0.5
    cfg.model.far_plane = 4.0
    cfg.model.density_mode = args.mode
    cfg.model.use_appearance_embedding = False
    cfg.model.camera_optimizer.mode = "off"
    cfg.model.camera_optimizer_thermal.mode = "off"

    trainer = setup_trainer(cfg, base_dir=root / "out")
    trainer.setup()

    @jax.jit
    def group_abssums(params):
        return {
            g: jnp.asarray(
                sum(jnp.sum(jnp.abs(l).astype(jnp.float32))
                    for l in jax.tree.leaves(p)), jnp.float32
            )
            for g, p in params.items()
        }

    @jax.jit
    def group_absmax(params):
        return {
            g: jnp.asarray(
                max_or_zero([jnp.max(jnp.abs(l).astype(jnp.float32))
                             for l in jax.tree.leaves(p)]), jnp.float32
            )
            for g, p in params.items()
        }

    def max_or_zero(xs):
        out = xs[0]
        for x in xs[1:]:
            out = jnp.maximum(out, x)
        return out

    last_ok = None
    for step in range(args.steps):
        scalars = trainer.train_iteration(step)
        if step % args.every == 0 or step == args.steps - 1:
            sums = {g: float(v) for g, v in
                    group_abssums(trainer.state.params).items()}
            bad = [g for g, v in sums.items() if not np.isfinite(v)]
            loss_bad = [k for k, v in scalars.items()
                        if hasattr(v, "dtype") and not np.isfinite(float(v))]
            mx = {g: float(v) for g, v in
                  group_absmax(trainer.state.params).items()}
            top = sorted(mx.items(), key=lambda kv: -kv[1])[:3]
            print(f"step {step:5d}  bad_groups={bad}  bad_scalars={loss_bad}  "
                  f"max|p|: " + ", ".join(f"{g}={v:.3g}" for g, v in top),
                  flush=True)
            if bad or loss_bad:
                print(f"FIRST NON-FINITE between step {last_ok} and {step}")
                for g, v in sorted(sums.items()):
                    print(f"  sum|{g}| = {v:.6g}")
                return
            last_ok = step
    print("no NaN up to", args.steps)


if __name__ == "__main__":
    main()
