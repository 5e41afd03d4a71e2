"""Exporter suite: marching cubes (tetrahedral), TSDF fusion, FFT Poisson,
texture baking, and the ns-export CLI end-to-end on a 2-step-trained model.
Reference surface: nerfstudio/scripts/exporter.py subcommands."""

from pathlib import Path

import numpy as np
import pytest

from nerfstudio_thermal_tpu.exporter.exporter_utils import (
    read_ply_mesh, write_ply_mesh,
)
from nerfstudio_thermal_tpu.exporter.marching_cubes import (
    generate_mesh_with_multires_marching_cubes, marching_cubes,
)
from nerfstudio_thermal_tpu.exporter.poisson import poisson_reconstruct
from nerfstudio_thermal_tpu.exporter.tsdf_utils import TSDF


def _sphere_grid(res=33, radius=0.6):
    lin = np.linspace(-1, 1, res, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    return np.sqrt(x**2 + y**2 + z**2) - radius  # SDF


def test_marching_cubes_sphere_vertices_on_surface():
    grid = _sphere_grid()
    spacing = np.full(3, 2 / 32, np.float32)
    verts, faces, normals = marching_cubes(
        grid, level=0.0, origin=np.full(3, -1.0, np.float32), spacing=spacing,
        gradient_direction="ascent",
    )
    assert len(verts) > 100 and len(faces) > 100
    r = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(r, 0.6, atol=0.01)
    # normals point outward (along the position vector for a sphere)
    cos = np.sum(normals * verts / r[:, None], axis=-1)
    assert np.all(cos > 0.9)
    # faces index valid deduplicated vertices
    assert faces.max() < len(verts)
    # watertight: every edge appears exactly twice
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    e = np.sort(e, axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    assert np.all(counts == 2)


def test_multires_sdf_meshing():
    sdf = lambda p: np.linalg.norm(p, axis=-1) - 0.5
    verts, faces, _ = generate_mesh_with_multires_marching_cubes(
        sdf, resolution=48, bounding_box_min=(-1, -1, -1),
        bounding_box_max=(1, 1, 1), isosurface_threshold=0.0,
    )
    r = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(r, 0.5, atol=0.01)


def test_ply_mesh_roundtrip(tmp_path):
    verts = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
    faces = np.arange(48, dtype=np.int32).reshape(-1, 3)
    p = tmp_path / "m.ply"
    write_ply_mesh(p, verts, faces, normals=verts, colors=np.abs(verts) % 1)
    v2, f2 = read_ply_mesh(p)
    np.testing.assert_allclose(v2, verts, rtol=1e-6)
    np.testing.assert_array_equal(f2, faces)


def test_tsdf_integration_recovers_sphere():
    # synthetic depth maps of a radius-0.5 sphere at the origin seen from a
    # ring of cameras at distance 2
    res, H, W, f = 48, 40, 40, 40.0
    aabb = np.array([[-0.8, -0.8, -0.8], [0.8, 0.8, 0.8]], np.float32)
    tsdf = TSDF.from_aabb(aabb, [res] * 3)
    tsdf.truncation_margin = 3.0

    c2ws, Ks, depths, colors = [], [], [], []
    golden = np.pi * (3 - np.sqrt(5))
    for k in range(16):  # Fibonacci sphere: full coverage incl. poles
        z = 1 - 2 * (k + 0.5) / 16
        rr = np.sqrt(1 - z * z)
        eye = 2.0 * np.array([rr * np.cos(golden * k), rr * np.sin(golden * k), z])
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 0.0, 1.0])
        if abs(fwd @ up) > 0.99:
            up = np.array([1.0, 0.0, 0.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, eye
        K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
        ys, xs = np.meshgrid(np.arange(H) + 0.5, np.arange(W) + 0.5, indexing="ij")
        d = np.stack([(xs - W / 2) / f, -(ys - H / 2) / f, -np.ones_like(xs)], -1)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        wd = d @ c2w[:3, :3].T
        # ray-sphere intersection: |eye + t wd| = 0.5
        b = 2 * np.sum(wd * eye, -1)
        c = np.sum(eye**2) - 0.25
        disc = b**2 - 4 * c
        # rays that miss the sphere see background at depth 10 so empty
        # space carves cleanly
        t = np.where(disc > 0, (-b - np.sqrt(np.maximum(disc, 0))) / 2, 10.0)
        depths.append(t.astype(np.float32))  # euclidean distance along ray
        colors.append(np.full((H, W, 3), 0.5, np.float32))
        c2ws.append(c2w)
        Ks.append(K)
    tsdf.integrate_tsdf(
        np.stack(c2ws), np.stack(Ks), np.stack(depths), np.stack(colors)
    )
    verts, faces, normals, cols = tsdf.get_mesh()
    assert len(verts) > 100
    r = np.linalg.norm(verts, axis=-1)
    assert abs(np.median(r) - 0.5) < 0.08
    np.testing.assert_allclose(cols[np.isfinite(cols).all(-1)], 0.5, atol=0.05)


def test_poisson_sphere():
    rng = np.random.default_rng(0)
    n = rng.normal(size=(4000, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    pts = 0.5 * n
    verts, faces, _ = poisson_reconstruct(pts, n, resolution=64)
    assert len(verts) > 100
    r = np.linalg.norm(verts, axis=-1)
    assert abs(np.median(r) - 0.5) < 0.08


def test_texture_unwrap_mapping():
    from nerfstudio_thermal_tpu.exporter.texture_utils import (
        _texel_to_face, unwrap_mesh_per_face,
    )

    uv, tw, th, P = unwrap_mesh_per_face(10, px_per_triangle=8)
    assert uv.shape == (10, 3, 2)
    assert (uv >= 0).all() and (uv <= 1).all()
    face, bary = _texel_to_face(tw, th, P, 8, 10)
    assert face.max() == 9
    np.testing.assert_allclose(bary.sum(-1), 1.0, atol=1e-6)


@pytest.mark.slow
def test_ns_export_end_to_end(tmp_path):
    """Train 2 steps on the synthetic RGBT fixture, then run every export
    mode through the CLI."""
    from nerfstudio_thermal_tpu.configs.method_configs import (
        get_method_config, setup_trainer,
    )
    from nerfstudio_thermal_tpu.scripts.exporter import main as export_main
    from tests.fixtures import make_synthetic_rgbt_dataset

    data = make_synthetic_rgbt_dataset(tmp_path / "data")
    cfg = get_method_config("thermal-nerfacto")
    cfg.data = Path(data)
    cfg.trainer.max_num_iterations = 2
    cfg.trainer.steps_per_save = 1
    cfg.trainer.steps_per_eval_batch = 1000
    cfg.trainer.steps_per_eval_image = 1000
    cfg.trainer.steps_per_eval_all_images = 0
    cfg.trainer.num_devices = 1
    cfg.dataparser.train_split_fraction = 0.5
    cfg.datamanager.train_num_rays_per_batch = 32
    cfg.datamanager.eval_num_rays_per_batch = 32
    cfg.model.density_mode = "shared"
    cfg.model.num_levels = 2
    cfg.model.base_res = 4
    cfg.model.max_res = 16
    cfg.model.log2_hashmap_size = 8
    cfg.model.hidden_dim = 8
    cfg.model.hidden_dim_color = 8
    cfg.model.appearance_embed_dim = 4
    cfg.model.num_proposal_samples_per_ray = (8,)
    cfg.model.num_proposal_iterations = 1
    cfg.model.num_nerf_samples_per_ray = 4
    cfg.model.proposal_net_args_list = [
        {"hidden_dim": 8, "log2_hashmap_size": 8, "num_levels": 2,
         "max_res": 16, "use_linear": False},
    ]
    cfg.model.eval_num_rays_per_chunk = 256
    cfg.model.compute_dtype = "float32"
    trainer = setup_trainer(cfg, base_dir=tmp_path / "run")
    trainer.setup()
    trainer.train()

    from nerfstudio_thermal_tpu.configs.serialization import save_config

    config_path = tmp_path / "run" / "config.yml"
    save_config(cfg, config_path)
    out = tmp_path / "exports"

    rc = export_main(["tsdf", "--load-config", str(config_path),
                      "--output-dir", str(out / "tsdf"),
                      "--resolution", "24", "--downscale-factor", "4"])
    assert rc == 0
    assert (out / "tsdf" / "tsdf_mesh.ply").exists()

    rc = export_main(["marching-cubes", "--load-config", str(config_path),
                      "--output-dir", str(out / "mc"), "--resolution", "24",
                      "--isosurface-threshold", "1.0"])
    assert rc == 0
    assert (out / "mc" / "sdf_marching_cubes_mesh.ply").exists()

    rc = export_main(["poisson", "--load-config", str(config_path),
                      "--output-dir", str(out / "poisson"),
                      "--resolution", "32", "--stride", "4",
                      "--min-accumulation", "0.0"])
    assert rc == 0
    assert (out / "poisson" / "poisson_mesh.ply").exists()

    rc = export_main(["texture", "--load-config", str(config_path),
                      "--output-dir", str(out / "tex"), "--resolution", "24",
                      "--isosurface-threshold", "1.0",
                      "--px-per-uv-triangle", "4"])
    assert rc == 0
    assert (out / "tex" / "mesh.obj").exists()
    assert (out / "tex" / "texture.png").exists()
    assert (out / "tex" / "mesh.mtl").exists()

    # ns-texture: texture the existing marching-cubes mesh (decimated)
    from nerfstudio_thermal_tpu.scripts.texture import main as texture_main

    rc = texture_main([
        "--load-config", str(config_path),
        "--input-mesh-filename", str(out / "mc" / "sdf_marching_cubes_mesh.ply"),
        "--output-dir", str(out / "tex2"),
        "--px-per-uv-triangle", "4", "--target-num-faces", "200",
    ])
    assert rc == 0
    assert (out / "tex2" / "mesh.obj").exists()
    assert (out / "tex2" / "texture.png").exists()
