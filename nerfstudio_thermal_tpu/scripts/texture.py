"""ns-texture: texture an existing mesh file with colors queried from a
trained NeRF.

Behavioral spec: reference `nerfstudio/scripts/texture.py:32-80` — load a
mesh from disk (optionally decimated to a target face count), load the
trained pipeline from its config.yml, bake a texture by querying the field
along surface normals, write mesh.obj + .mtl + texture png. The baking
itself is `exporter/texture_utils.py` here (shared with `ns-export texture`,
which meshes via marching cubes first; this script takes a user-provided
mesh instead).
"""

import sys
from pathlib import Path


def _decimate(vertices, faces, target_num_faces):
    """Cheap decimation: uniformly subsample faces (the reference delegates
    to pymeshlab's quadric collapse; face subsampling keeps this
    dependency-free and is adequate for texturing a dense MC mesh)."""
    import numpy as np

    if target_num_faces is None or len(faces) <= target_num_faces:
        return vertices, faces
    keep = np.round(np.linspace(0, len(faces) - 1, target_num_faces)).astype(int)
    faces = faces[keep]
    used = np.unique(faces)
    remap = np.full(len(vertices), -1, dtype=np.int64)
    remap[used] = np.arange(len(used))
    return vertices[used], remap[faces]


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(
            "usage: ns-texture --load-config CONFIG --input-mesh-filename MESH.ply "
            "--output-dir DIR [--px-per-uv-triangle N] [--target-num-faces N]"
        )
        return 0

    opts = {
        "load_config": None,
        "input_mesh_filename": None,
        "output_dir": Path("texture"),
        "px_per_uv_triangle": 4,
        "target_num_faces": 50000,
    }
    i = 0
    while i < len(argv):
        key = argv[i].lstrip("-").replace("-", "_")
        if "=" in argv[i]:
            key, val = key.split("=", 1)
            i += 1
        else:
            val = argv[i + 1]
            i += 2
        if key not in opts:
            print(f"error: unknown flag --{key.replace('_', '-')}", file=sys.stderr)
            return 2
        opts[key] = val
    if opts["load_config"] is None or opts["input_mesh_filename"] is None:
        print("error: --load-config and --input-mesh-filename are required",
              file=sys.stderr)
        return 2

    from nerfstudio_thermal_tpu.exporter.exporter_utils import read_ply_mesh
    from nerfstudio_thermal_tpu.exporter.texture_utils import export_textured_mesh
    from nerfstudio_thermal_tpu.utils.eval_utils import eval_setup

    vertices, faces = read_ply_mesh(Path(opts["input_mesh_filename"]))
    target = opts["target_num_faces"]
    vertices, faces = _decimate(
        vertices, faces, None if target in (None, "none") else int(target)
    )

    _, trainer, params = eval_setup(Path(opts["load_config"]))
    out_dir = Path(opts["output_dir"])
    out_dir.mkdir(parents=True, exist_ok=True)
    out = export_textured_mesh(
        trainer.pipeline.model, params, vertices, faces, out_dir,
        px_per_uv_triangle=int(opts["px_per_uv_triangle"]),
    )
    print(f"wrote {out}")
    return 0


def entrypoint():
    sys.exit(main())


if __name__ == "__main__":
    entrypoint()
