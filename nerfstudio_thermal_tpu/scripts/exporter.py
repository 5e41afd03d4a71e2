"""ns-export: export point clouds / cameras from a trained run.

Behavioral spec: reference `nerfstudio/scripts/exporter.py` (pointcloud /
cameras subcommands; tsdf/poisson/marching-cubes require mesh libs absent
from this image and report so).
"""

import json
import sys
from pathlib import Path

import numpy as np


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(
            "usage: ns-export {pointcloud|cameras} --load-config CONFIG.yml "
            "--output-dir DIR [--num-points N] [--min-accumulation X] "
            "[--use-thermal-color true]"
        )
        return 0
    mode = argv[0]
    opts = {
        "load_config": None,
        "output_dir": Path("exports"),
        "min_accumulation": 0.5,
        "use_thermal_color": False,
        "stride": 4,
    }
    i = 1
    while i < len(argv):
        tok = argv[i]
        key = tok.lstrip("-").replace("-", "_")
        val = tok.split("=", 1)[1] if "=" in tok else argv[i + 1]
        i += 1 if "=" in tok else 2
        if "=" in tok:
            key = key.split("=")[0]
        if key == "load_config":
            opts[key] = Path(val)
        elif key == "output_dir":
            opts[key] = Path(val)
        elif key in ("min_accumulation",):
            opts[key] = float(val)
        elif key in ("stride",):
            opts[key] = int(val)
        elif key == "use_thermal_color":
            opts[key] = val.lower() in ("1", "true", "yes")
        else:
            print(f"error: unknown flag --{key}", file=sys.stderr)
            return 2
    if opts["load_config"] is None:
        print("error: --load-config is required", file=sys.stderr)
        return 2

    from nerfstudio_thermal_tpu.utils.eval_utils import eval_setup

    config, trainer, params = eval_setup(opts["load_config"])
    out_dir = Path(opts["output_dir"])
    out_dir.mkdir(parents=True, exist_ok=True)

    if mode == "cameras":
        cams = trainer.datamanager.train_cameras
        frames = []
        for i in range(len(cams)):
            frames.append(
                {
                    "camera_to_world": np.asarray(cams.camera_to_worlds[i]).tolist(),
                    "fx": float(cams.fx[i]),
                    "fy": float(cams.fy[i]),
                    "cx": float(cams.cx[i]),
                    "cy": float(cams.cy[i]),
                    "width": int(cams.width[i]),
                    "height": int(cams.height[i]),
                }
            )
        (out_dir / "cameras.json").write_text(json.dumps(frames, indent=2))
        print(f"wrote {out_dir / 'cameras.json'}")
        return 0

    if mode == "pointcloud":
        from nerfstudio_thermal_tpu.exporter.exporter_utils import (
            generate_point_cloud,
            write_ply,
        )

        points, colors = generate_point_cloud(
            trainer.pipeline.model,
            params,
            trainer.datamanager.eval_cameras,
            min_accumulation=opts["min_accumulation"],
            use_thermal_color=opts["use_thermal_color"],
            stride=opts["stride"],
        )
        write_ply(out_dir / "point_cloud.ply", points, colors)
        print(f"wrote {len(points)} points to {out_dir / 'point_cloud.ply'}")
        return 0

    if mode in ("tsdf", "poisson", "marching-cubes", "gaussian-splat"):
        print(
            f"error: '{mode}' export requires mesh libraries not present in "
            "this environment (open3d/trimesh); pointcloud and cameras are "
            "available.",
            file=sys.stderr,
        )
        return 2

    print(f"error: unknown export mode '{mode}'", file=sys.stderr)
    return 2


def entrypoint():
    sys.exit(main())


if __name__ == "__main__":
    entrypoint()
