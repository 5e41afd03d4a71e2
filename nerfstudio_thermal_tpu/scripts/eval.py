"""ns-eval: compute and save eval-image metrics for a trained run.

Behavioral spec: reference `nerfstudio/scripts/eval.py:32-70` (`ns-eval
--load-config ... --output-path psnr.json` -> mean/std metrics JSON).
"""

import json
import sys
from pathlib import Path


def main(argv=None) -> int:
    from nerfstudio_thermal_tpu.utils.precision import ensure_exact_f32_matmuls

    ensure_exact_f32_matmuls()  # also re-asserts $JAX_PLATFORMS (see util)
    argv = list(sys.argv[1:] if argv is None else argv)
    load_config = None
    output_path = Path("output.json")
    i = 0
    while i < len(argv):
        tok = argv[i]
        if tok in ("-h", "--help"):
            print("usage: ns-eval --load-config CONFIG.yml [--output-path out.json]")
            return 0
        if tok.startswith("--load-config"):
            load_config = Path(tok.split("=", 1)[1] if "=" in tok else argv[i + 1])
            i += 1 if "=" in tok else 2
            continue
        if tok.startswith("--output-path"):
            output_path = Path(tok.split("=", 1)[1] if "=" in tok else argv[i + 1])
            i += 1 if "=" in tok else 2
            continue
        i += 1
    if load_config is None:
        print("error: --load-config is required", file=sys.stderr)
        return 2

    from nerfstudio_thermal_tpu.utils.eval_utils import eval_setup

    config, trainer, params = eval_setup(load_config)
    metrics = trainer.pipeline.get_average_eval_image_metrics(params)
    from nerfstudio_thermal_tpu.utils.lpips import lpips_provenance

    out = {
        "experiment_name": config.trainer.experiment_name,
        "method_name": config.method_name,
        "checkpoint": str(config.trainer.load_dir),
        "lpips_provenance": lpips_provenance(),
        "results": metrics,
    }
    output_path.parent.mkdir(parents=True, exist_ok=True)
    output_path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))
    return 0


def entrypoint():
    sys.exit(main())


if __name__ == "__main__":
    entrypoint()
