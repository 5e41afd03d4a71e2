"""ns-export: export point clouds / meshes / cameras from a trained run.

Behavioral spec: reference `nerfstudio/scripts/exporter.py` — pointcloud
(:90-185), tsdf (:188-258), poisson (:261-383), marching-cubes (:386-449),
cameras (:452-477). The reference leans on open3d/pymeshlab/skimage; here the
meshing stack is self-contained (exporter/marching_cubes.py tetrahedral
extractor, exporter/tsdf_utils.py JAX fusion, exporter/poisson.py FFT Poisson
solve, exporter/texture_utils.py baking).
"""

import json
import sys
from pathlib import Path

import numpy as np


def main(argv=None) -> int:
    from nerfstudio_thermal_tpu.utils.precision import ensure_exact_f32_matmuls

    ensure_exact_f32_matmuls()  # also re-asserts $JAX_PLATFORMS (see util)
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(
            "usage: ns-export "
            "{pointcloud|tsdf|poisson|marching-cubes|texture|cameras} "
            "--load-config CONFIG.yml --output-dir DIR\n"
            "  pointcloud: [--num-points N] [--min-accumulation X] "
            "[--use-thermal-color true] [--stride K]\n"
            "  tsdf: [--resolution R] [--downscale-factor K] "
            "[--bounding-box-min x,y,z] [--bounding-box-max x,y,z]\n"
            "  poisson: [--resolution R] [--num-points N] "
            "[--min-accumulation X]\n"
            "  marching-cubes: [--resolution R] [--isosurface-threshold T] "
            "[--bounding-box-min x,y,z] [--bounding-box-max x,y,z]\n"
            "  texture: [--resolution R] [--px-per-uv-triangle P] "
            "[--isosurface-threshold T]"
        )
        return 0
    mode = argv[0]
    opts = {
        "load_config": None,
        "output_dir": Path("exports"),
        "min_accumulation": 0.5,
        "use_thermal_color": False,
        "stride": 4,
        "resolution": None,
        "downscale_factor": 2,
        "isosurface_threshold": None,
        "num_points": None,
        "px_per_uv_triangle": 8,
        "bounding_box_min": (-1.0, -1.0, -1.0),
        "bounding_box_max": (1.0, 1.0, 1.0),
    }
    i = 1
    while i < len(argv):
        tok = argv[i]
        key = tok.lstrip("-").replace("-", "_")
        val = tok.split("=", 1)[1] if "=" in tok else argv[i + 1]
        i += 1 if "=" in tok else 2
        if "=" in tok:
            key = key.split("=")[0]
        if key in ("load_config", "output_dir"):
            opts[key] = Path(val)
        elif key in ("min_accumulation", "isosurface_threshold"):
            opts[key] = float(val)
        elif key in ("stride", "resolution", "downscale_factor",
                     "num_points", "px_per_uv_triangle"):
            opts[key] = int(val)
        elif key == "use_thermal_color":
            opts[key] = val.lower() in ("1", "true", "yes")
        elif key in ("bounding_box_min", "bounding_box_max"):
            opts[key] = tuple(float(x) for x in val.split(","))
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

    model = trainer.pipeline.model

    if mode == "tsdf":
        from nerfstudio_thermal_tpu.exporter.tsdf_utils import export_tsdf_mesh

        out = export_tsdf_mesh(
            model, params, trainer.datamanager.train_cameras, out_dir,
            downscale_factor=opts["downscale_factor"],
            resolution=opts["resolution"] or 128,
            bounding_box_min=opts["bounding_box_min"],
            bounding_box_max=opts["bounding_box_max"],
        )
        print(f"wrote {out}")
        return 0

    if mode == "poisson":
        from nerfstudio_thermal_tpu.exporter.poisson import export_poisson_mesh

        out = export_poisson_mesh(
            model, params, trainer.datamanager.eval_cameras, out_dir,
            num_points=opts["num_points"] or 500000,
            resolution=opts["resolution"] or 128,
            min_accumulation=opts["min_accumulation"],
            stride=opts["stride"],
        )
        print(f"wrote {out}")
        return 0

    if mode in ("marching-cubes", "texture"):
        from nerfstudio_thermal_tpu.exporter.exporter_utils import write_ply_mesh
        from nerfstudio_thermal_tpu.exporter.marching_cubes import (
            generate_mesh_with_multires_marching_cubes,
        )

        # SDF-family models expose sdf_fn; density models mesh a density
        # level set (reference ExportMarchingCubesMesh targets SDF fields,
        # scripts/exporter.py:408-449)
        if hasattr(model, "sdf_fn"):
            fn = lambda pts: np.asarray(model.sdf_fn(params, pts)).reshape(-1)
            level = opts["isosurface_threshold"] or 0.0
        else:
            import jax.numpy as jnp

            def fn(pts):
                d = model.density_fn(params, jnp.asarray(pts, jnp.float32))
                return -np.asarray(d).reshape(-1)  # negative: inside < level

            level = -(opts["isosurface_threshold"] or 15.0)
        verts, faces, normals = generate_mesh_with_multires_marching_cubes(
            fn,
            resolution=opts["resolution"] or 128,
            bounding_box_min=opts["bounding_box_min"],
            bounding_box_max=opts["bounding_box_max"],
            isosurface_threshold=level,
        )
        if len(faces) == 0:
            # threshold missed the field's range: fall back to the median
            # level so an isosurface always exists
            from nerfstudio_thermal_tpu.exporter.marching_cubes import (
                evaluate_sdf_grid, marching_cubes as _mc,
            )

            grid, origin, spacing = evaluate_sdf_grid(
                fn, opts["resolution"] or 128,
                opts["bounding_box_min"], opts["bounding_box_max"],
            )
            level = float(np.median(grid))
            print(f"threshold produced an empty mesh; retrying at the "
                  f"median field value {level:.4f}")
            verts, faces, normals = _mc(
                grid, level=level, origin=origin, spacing=spacing,
                gradient_direction="ascent",
            )
        if mode == "marching-cubes":
            out = out_dir / "sdf_marching_cubes_mesh.ply"
            write_ply_mesh(out, verts, faces, normals=normals)
            print(f"wrote {out} ({len(verts)} verts, {len(faces)} faces)")
            return 0
        from nerfstudio_thermal_tpu.exporter.texture_utils import (
            export_textured_mesh,
        )

        out = export_textured_mesh(
            model, params, verts, faces, out_dir,
            px_per_uv_triangle=opts["px_per_uv_triangle"],
        )
        print(f"wrote {out}")
        return 0

    if mode == "gaussian-splat":
        from nerfstudio_thermal_tpu.models.splatfacto import SplatfactoModel

        if not isinstance(model, SplatfactoModel):
            print(
                "error: 'gaussian-splat' export requires a splatfacto model",
                file=sys.stderr,
            )
            return 2
        # 3DGS-convention PLY (reference scripts/exporter.py:480-546):
        # x y z nx ny nz f_dc_* f_rest_* opacity scale_* rot_*
        p = trainer.host_params()
        alive = (
            np.asarray(model._host_alive)
            if getattr(model, "_host_alive", None) is not None
            else np.ones(len(p["xyz"]), bool)
        )
        pos = np.asarray(p["xyz"])[alive]
        dc = np.asarray(p["features_dc"])[alive]  # [n, 3]
        rest = np.asarray(p["features_rest"])[alive]  # [n, B-1, 3]
        n = len(pos)
        # Inria ordering: f_rest grouped channel-major (transpose(1, 2))
        rest = rest.transpose(0, 2, 1).reshape(n, -1)
        cols = {"x": pos[:, 0], "y": pos[:, 1], "z": pos[:, 2]}
        for a in "xyz":
            cols[f"n{a}"] = np.zeros(n, np.float32)
        for i in range(3):
            cols[f"f_dc_{i}"] = dc[:, i]
        for i in range(rest.shape[1]):
            cols[f"f_rest_{i}"] = rest[:, i]
        cols["opacity"] = np.asarray(p["opacities"])[alive]
        for i in range(3):
            cols[f"scale_{i}"] = np.asarray(p["scales"])[alive][:, i]
        for i in range(4):
            cols[f"rot_{i}"] = np.asarray(p["quats"])[alive][:, i]
        finite = np.ones(n, bool)
        for v in cols.values():
            finite &= np.isfinite(v)
        header = ["ply", "format binary_little_endian 1.0",
                  f"element vertex {int(finite.sum())}"]
        header += [f"property float {k}" for k in cols]
        header.append("end_header")
        data = np.empty(int(finite.sum()), dtype=[(k, "<f4") for k in cols])
        for k, v in cols.items():
            data[k] = v[finite].astype(np.float32)
        out = out_dir / "splat.ply"
        with open(out, "wb") as f:
            f.write(("\n".join(header) + "\n").encode())
            f.write(data.tobytes())
        print(f"wrote {out} ({int(finite.sum())} gaussians)")
        return 0

    print(f"error: unknown export mode '{mode}'", file=sys.stderr)
    return 2


def entrypoint():
    sys.exit(main())


if __name__ == "__main__":
    entrypoint()
