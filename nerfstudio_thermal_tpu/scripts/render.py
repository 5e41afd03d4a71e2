"""ns-render: render a trained model along camera paths / eval dataset.

Behavioral spec: reference `nerfstudio/scripts/render.py` — subcommands
camera-path / interpolated / spiral / dataset; the fork's thermal additions:
`--rendered-output-names removal removal_thermal`,
`--removal-min-density-diff` (:737-738), `--rgb-poses-only` filtering
interpolation to RGB poses via is_thermal (:619-631), and `_thermal` output
names using `accumulation_thermal` for depth colormaps (:213-214, 864-865).

Video encoding: ffmpeg is not assumed; frames are written as PNGs and a video
is attempted via imageio when available.
"""

import json
import sys
from pathlib import Path
from typing import List, Optional

import numpy as np


def _save_frames(frames: List[np.ndarray], output_path: Path, fps: float = 24.0):
    output_path.parent.mkdir(parents=True, exist_ok=True)
    if output_path.suffix in (".mp4", ".gif"):
        try:
            import imageio

            imageio.mimsave(
                output_path, [(f * 255).astype(np.uint8) for f in frames], fps=fps
            )
            print(f"wrote {output_path}")
            return
        except Exception as e:
            print(f"video encode unavailable ({e}); writing frames instead")
            output_path = output_path.with_suffix("")
    output_path.mkdir(parents=True, exist_ok=True)
    from PIL import Image

    for i, f in enumerate(frames):
        Image.fromarray((np.clip(f, 0, 1) * 255).astype(np.uint8)).save(
            output_path / f"{i:05d}.png"
        )
    print(f"wrote {len(frames)} frames to {output_path}")


def _render_trajectory(
    trainer, params, cameras, output_names: List[str], removal_min_density_diff=None
):
    """Per-frame full renders -> dict of frame lists keyed by output name."""
    from nerfstudio_thermal_tpu.utils import colormaps

    model = trainer.pipeline.model
    if removal_min_density_diff is not None and hasattr(
        model.config, "removal_min_density_diff"
    ):
        model.config.removal_min_density_diff = removal_min_density_diff

    results = {name: [] for name in output_names}
    n = len(cameras)
    # depth colormaps also need the matching accumulation output
    needed = set(output_names)
    for name in output_names:
        if name.startswith("depth"):
            needed.add(
                "accumulation_thermal" if name.endswith("_thermal")
                else "accumulation"
            )
    include_per_sample = False
    for i in range(n):
        # render on device, fetch ONLY the requested outputs (the tunnel's
        # D2H bandwidth is ~17.5 MB/s; all-output frames are 100s of MB)
        dev = model.render_camera_device(
            params, cameras, i, include_per_sample=include_per_sample
        )
        if not include_per_sample and not needed.issubset(dev):
            # a requested output (e.g. raw `density`) is per-sample, which
            # the device render drops by default — opt back into reference
            # get_outputs_for_camera_ray_bundle parity and re-render
            include_per_sample = True
            dev = model.render_camera_device(
                params, cameras, i, include_per_sample=True
            )
        h, w = int(cameras.height[i]), int(cameras.width[i])

        def fetch(v):
            a = np.asarray(v)
            # [h, w, C] images pass through; flat per-ray [h*w, C] and
            # per-sample [h*w, S, 1] (include_per_sample) reshape to (h, w, *)
            # matching reference get_outputs_for_camera_ray_bundle
            if a.ndim == 3 and a.shape[0] == h and a.shape[1] == w:
                return a
            return a.reshape(h, w, -1)

        outputs = {k: fetch(v) for k, v in dev.items() if k in needed}
        for name in output_names:
            if name not in outputs:
                raise KeyError(
                    f"output '{name}' not produced by the model; available: "
                    f"{sorted(dev)}"
                )
            img = outputs[name]
            if name.startswith("depth"):
                suffix = "_thermal" if name.endswith("_thermal") else ""
                acc = outputs.get(f"accumulation{suffix}")
                img = colormaps.apply_depth_colormap(img, accumulation=acc)
            elif img.shape[-1] == 1:
                img = np.repeat(np.clip(img, 0, 1), 3, axis=-1)
            elif img.shape[-1] not in (3, 4):
                # per-sample output (e.g. raw density, [h, w, S]) has no
                # image form (the reference's apply_colormap raises on it
                # too); visualize the per-pixel mean
                img = np.clip(
                    img.mean(axis=-1, keepdims=True), 0, 1
                ).repeat(3, axis=-1)
            results[name].append(np.asarray(img))
        print(f"rendered {i + 1}/{n}", end="\r", flush=True)
    print()
    return results


def main(argv=None) -> int:
    from nerfstudio_thermal_tpu.utils.precision import ensure_exact_f32_matmuls

    ensure_exact_f32_matmuls()  # also re-asserts $JAX_PLATFORMS (see util)
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(
            "usage: ns-render {camera-path|interpolated|spiral|dataset} "
            "--load-config CONFIG.yml [--output-path PATH] "
            "[--rendered-output-names rgb rgb_thermal depth removal ...] "
            "[--camera-path-filename PATH.json] [--interpolation-steps N] "
            "[--rgb-poses-only true] [--removal-min-density-diff X] [--fps N]"
        )
        return 0

    mode = argv[0]
    args = argv[1:]
    opts = {
        "load_config": None,
        "output_path": Path("renders/output.mp4"),
        "rendered_output_names": ["rgb"],
        "camera_path_filename": None,
        "interpolation_steps": 10,
        "rgb_poses_only": False,
        "removal_min_density_diff": None,
        "fps": 24.0,
        "split": "val",
    }
    i = 0
    while i < len(args):
        tok = args[i]
        key = tok.lstrip("-").replace("-", "_")
        if key == "rendered_output_names":
            names = []
            i += 1
            while i < len(args) and not args[i].startswith("--"):
                names.append(args[i])
                i += 1
            opts[key] = names
            continue
        if key in opts:
            val = args[i + 1]
            if key in ("interpolation_steps",):
                val = int(val)
            elif key in ("fps", "removal_min_density_diff"):
                val = float(val)
            elif key in ("rgb_poses_only",):
                val = val.lower() in ("1", "true", "yes")
            elif key in ("load_config", "camera_path_filename", "output_path"):
                val = Path(val)
            opts[key] = val
            i += 2
            continue
        print(f"error: unknown flag {tok}", file=sys.stderr)
        return 2

    if opts["load_config"] is None:
        print("error: --load-config is required", file=sys.stderr)
        return 2

    from nerfstudio_thermal_tpu.utils.eval_utils import eval_setup
    from nerfstudio_thermal_tpu.cameras import camera_paths
    from nerfstudio_thermal_tpu.cameras.cameras import Cameras

    config, trainer, params = eval_setup(opts["load_config"])
    dm = trainer.datamanager

    if mode == "dataset":
        cameras = dm.eval_cameras
        out_root = Path(opts["output_path"])
        results = _render_trajectory(
            trainer, params, cameras, opts["rendered_output_names"],
            opts["removal_min_density_diff"],
        )
        for name, frames in results.items():
            _save_frames(frames, out_root / name, opts["fps"])
        return 0

    if mode == "interpolated":
        cameras_np = dm.eval_cameras
        indices = None
        if opts["rgb_poses_only"]:
            is_thermal = dm.eval_dataset.is_thermal
            indices = np.nonzero(is_thermal == 0)[0]
        cameras = camera_paths.get_interpolated_camera_path(
            cameras_np, steps=opts["interpolation_steps"] * max(len(cameras_np) - 1, 1),
            indices=indices,
        )
    elif mode == "spiral":
        c = dm.eval_cameras
        cameras = camera_paths.get_spiral_path(
            np.asarray(c.camera_to_worlds[0]),
            float(c.fx[0]), float(c.fy[0]), float(c.cx[0]), float(c.cy[0]),
            int(c.width[0]), int(c.height[0]), steps=30,
        )
    elif mode == "camera-path":
        if opts["camera_path_filename"] is None:
            print("error: --camera-path-filename is required", file=sys.stderr)
            return 2
        path_json = json.loads(Path(opts["camera_path_filename"]).read_text())
        h = int(path_json["render_height"])
        w = int(path_json["render_width"])
        poses, fxs, fys = [], [], []
        for cam in path_json["camera_path"]:
            mat = np.asarray(cam["camera_to_world"], np.float32).reshape(4, 4)
            poses.append(mat[:3])
            fov = float(cam.get("fov", 50.0))
            focal = h / (2 * np.tan(np.radians(fov) / 2))
            fxs.append(focal)
            fys.append(focal)
        k = len(poses)
        from nerfstudio_thermal_tpu.cameras.cameras import CameraType

        cameras = Cameras(
            camera_to_worlds=np.stack(poses),
            fx=np.asarray(fxs, np.float32),
            fy=np.asarray(fys, np.float32),
            cx=np.full((k,), w / 2, np.float32),
            cy=np.full((k,), h / 2, np.float32),
            width=np.full((k,), w, np.int32),
            height=np.full((k,), h, np.int32),
            camera_type=np.full((k,), CameraType.PERSPECTIVE.value, np.int32),
        )
    else:
        print(f"error: unknown render mode '{mode}'", file=sys.stderr)
        return 2

    import jax.numpy as jnp
    import jax

    cameras = jax.tree.map(jnp.asarray, cameras)
    results = _render_trajectory(
        trainer, params, cameras, opts["rendered_output_names"],
        opts["removal_min_density_diff"],
    )
    if len(results) == 1:
        _save_frames(next(iter(results.values())), Path(opts["output_path"]), opts["fps"])
    else:
        for name, frames in results.items():
            out = Path(opts["output_path"])
            _save_frames(frames, out.parent / f"{out.stem}_{name}{out.suffix}", opts["fps"])
    return 0


def entrypoint():
    sys.exit(main())


if __name__ == "__main__":
    entrypoint()
