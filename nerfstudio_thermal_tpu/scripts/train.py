"""ns-train: train a registered method.

Behavioral spec: reference `nerfstudio/scripts/train.py` — method subcommand,
nested config flags, config.yml + dataparser_transforms.json persistence.
Multi-process GPU spawn (reference :160-223) is replaced by one JAX process
per host + SPMD sharding (see parallel/mesh.py); multi-host runs pass
--machine.num-machines etc. and call jax.distributed.initialize.

Usage:
    ns-train thermal-nerfacto --data /path/to/scene \
        [--pipeline.model.density-mode separate] [--max-num-iterations 30000] ...
"""

import json
import sys
import time
from pathlib import Path

from nerfstudio_thermal_tpu.configs.cli import CLIError, apply_cli_overrides, print_config_help
from nerfstudio_thermal_tpu.configs.method_configs import (
    descriptions,
    get_method_config,
    method_configs,
    setup_trainer,
)
from nerfstudio_thermal_tpu.configs.serialization import save_config


def main(argv=None) -> int:
    from nerfstudio_thermal_tpu.utils.precision import ensure_exact_f32_matmuls

    ensure_exact_f32_matmuls()  # also re-asserts $JAX_PLATFORMS (see util)
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: ns-train METHOD [--data PATH] [--<config.path> VALUE ...]\n")
        print("methods:")
        from nerfstudio_thermal_tpu.plugins.registry import discover_methods

        discover_methods(method_configs)
        for name in sorted(method_configs):
            print(f"  {name:24s} {descriptions.get(name, '')}")
        return 0

    method = argv[0]
    config = get_method_config(method)

    rest = argv[1:]
    if "-h" in rest or "--help" in rest or "--help-flags" in rest:
        # per-method full nested flag surface (tyro-equivalent help,
        # reference scripts/train.py:258-267)
        print(f"usage: ns-train {method} --data PATH [--<config.path> VALUE ...]")
        print(f"\n{descriptions.get(method, '')}\n\nflags:")
        print_config_help(config)
        print("\n(reference-style --pipeline.model.X aliases also accepted)")
        return 0
    # top-level conveniences mapped into the tree
    mapped = []
    i = 0
    while i < len(rest):
        tok = rest[i]
        key = tok.lstrip("-").replace("-", "_").split("=")[0]
        if tok.startswith("--") and key in (
            "data", "max_num_iterations", "output_dir", "experiment_name",
            "viewer_port", "vis",
        ):
            val = tok.split("=", 1)[1] if "=" in tok else rest[i + 1]
            i += 1 if "=" in tok else 2
            if key == "data":
                config.data = Path(val)
            elif key == "max_num_iterations":
                config.trainer.max_num_iterations = int(val)
            elif key == "output_dir":
                config.trainer.output_dir = Path(val)
            elif key == "experiment_name":
                config.trainer.experiment_name = val
            elif key == "vis":
                config.trainer.vis = val  # 'viewer' serves during training
            elif key == "viewer_port":
                config.trainer.viewer_port = int(val)
            continue
        mapped.append(tok)
        i += 1

    try:
        config, positionals = apply_cli_overrides(config, mapped)
    except CLIError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    if positionals:
        print(f"error: unexpected arguments {positionals}", file=sys.stderr)
        return 2
    from nerfstudio_thermal_tpu.models.generfacto import GenerfactoModelConfig

    is_generative = isinstance(config.model, GenerfactoModelConfig)
    if config.data is None and not is_generative:
        print("error: --data is required", file=sys.stderr)
        return 2

    # comma-separated --data = multi-scene batched training: K scenes as one
    # vmapped SPMD program over a `scene` mesh (engine/multi_scene.py)
    if config.data is not None and "," in str(config.data):
        from nerfstudio_thermal_tpu.engine.multi_scene import train_multi_scene

        dirs = [Path(p) for p in str(config.data).split(",") if p]
        timestamp = time.strftime("%Y-%m-%d_%H%M%S")
        out = (
            Path(config.trainer.output_dir)
            / f"multi_{len(dirs)}scenes" / method / timestamp
        )
        out.mkdir(parents=True, exist_ok=True)
        # pass the CLI-overridden config itself so --model.*/--datamanager.*
        # flags survive into every scene's copy
        summary = train_multi_scene(
            config, dirs,
            steps=config.trainer.max_num_iterations,
            num_devices=config.trainer.num_devices,
            seed=config.trainer.seed,
            out_dir=out,
        )
        print(
            f"multi-scene training complete: {summary.num_scenes} scenes on "
            f"{summary.num_devices} device(s), final losses "
            f"{['%.4f' % x for x in summary.final_losses]}; outputs in {out}"
        )
        return 0

    timestamp = time.strftime("%Y-%m-%d_%H%M%S")
    exp = config.trainer.experiment_name
    if exp == "experiment":
        exp = Path(config.data).name if config.data is not None else method
        config.trainer.experiment_name = exp
    base_dir = Path(config.trainer.output_dir) / exp / method / timestamp
    base_dir.mkdir(parents=True, exist_ok=True)

    save_config(config, base_dir / "config.yml")
    print(f"config saved to {base_dir / 'config.yml'}")

    trainer = setup_trainer(config, base_dir=base_dir)
    trainer.setup()

    # Persist the dataparser transform for later renders
    # (reference trainer.py:228-230).
    dpo = trainer.datamanager.train_dataparser_outputs
    (base_dir / "dataparser_transforms.json").write_text(
        json.dumps(dpo.as_dict(), indent=2)
    )

    trainer.train()
    print(f"training complete; outputs in {base_dir}")
    return 0


def entrypoint():
    sys.exit(main())


if __name__ == "__main__":
    entrypoint()
