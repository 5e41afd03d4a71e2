"""End-to-end smoke train, mirroring the reference's CPU smoke test pattern
(reference tests/test_train.py:34-80): tiny config, a few iterations, real
trainer loop, then checkpoint resume."""

from pathlib import Path

import numpy as np
import pytest

from nerfstudio_thermal_tpu.configs.method_configs import get_method_config, setup_trainer
from tests.fixtures import make_synthetic_rgbt_dataset


def tiny_method(name, data, max_iters=4, **model_kw):
    cfg = get_method_config(name)
    cfg.data = Path(data)
    cfg.trainer.max_num_iterations = max_iters
    cfg.trainer.steps_per_save = 1000
    cfg.trainer.steps_per_eval_image = 1000
    cfg.trainer.steps_per_log = 1
    cfg.trainer.num_devices = 1
    cfg.dataparser.train_split_fraction = 0.5  # 4 frames/modality -> 2 eval
    cfg.datamanager.train_num_rays_per_batch = 32
    cfg.datamanager.eval_num_rays_per_batch = 32
    cfg.model.num_levels = 4
    cfg.model.base_res = 4
    cfg.model.max_res = 32
    cfg.model.log2_hashmap_size = 9
    cfg.model.hidden_dim = 8
    cfg.model.hidden_dim_color = 8
    cfg.model.appearance_embed_dim = 4
    cfg.model.num_proposal_samples_per_ray = (8, 4)
    cfg.model.num_nerf_samples_per_ray = 4
    cfg.model.proposal_net_args_list = [
        {"hidden_dim": 8, "log2_hashmap_size": 8, "num_levels": 2, "max_res": 16, "use_linear": False},
    ] * 2
    cfg.model.eval_num_rays_per_chunk = 64
    cfg.model.compute_dtype = "float32"
    for k, v in model_kw.items():
        setattr(cfg.model, k, v)
    return cfg


@pytest.mark.parametrize("mode", ["rgb_only", "shared", "separate"])
def test_thermal_nerfacto_trains(tmp_path, mode):
    data = make_synthetic_rgbt_dataset(tmp_path / "data")
    cfg = tiny_method("thermal-nerfacto", data, density_mode=mode)
    trainer = setup_trainer(cfg, base_dir=tmp_path / "out")
    trainer.setup()
    trainer.train()
    assert int(trainer.state.step) == 4
    # loss finite
    scalars = trainer.train_iteration(4)
    assert np.isfinite(float(scalars["loss"]))
    # checkpoint written
    ckpts = list((tmp_path / "out" / "nerfstudio_models").glob("step-*"))
    assert len(ckpts) == 1


def test_checkpoint_resume(tmp_path):
    data = make_synthetic_rgbt_dataset(tmp_path / "data")
    cfg = tiny_method("thermal-nerfacto", data, density_mode="rgb_only", max_iters=3)
    trainer = setup_trainer(cfg, base_dir=tmp_path / "out")
    trainer.setup()
    trainer.train()
    params_before = trainer.host_params()

    cfg2 = tiny_method("thermal-nerfacto", data, density_mode="rgb_only", max_iters=5)
    cfg2.trainer.load_dir = tmp_path / "out" / "nerfstudio_models"
    trainer2 = setup_trainer(cfg2, base_dir=tmp_path / "out2")
    trainer2.setup()
    assert trainer2._start_step == 3
    restored = trainer2.host_params()
    a = np.asarray(params_before["fields"]["mlp_head"]["Dense_0"]["kernel"])
    b = np.asarray(restored["fields"]["mlp_head"]["Dense_0"]["kernel"])
    np.testing.assert_allclose(a, b, rtol=1e-6)
    trainer2.train()
    assert int(trainer2.state.step) == 5


def test_eval_image_metrics(tmp_path):
    data = make_synthetic_rgbt_dataset(tmp_path / "data")
    cfg = tiny_method("thermal-nerfacto", data, density_mode="separate", max_iters=2)
    trainer = setup_trainer(cfg, base_dir=tmp_path / "out")
    trainer.setup()
    trainer.train()
    metrics, images = trainer.pipeline.get_eval_image_metrics_and_images(
        trainer.host_params(), step=0
    )
    assert ("psnr_rgb" in metrics) or ("psnr_thermal" in metrics)
    assert "img" in images and images["img"].ndim == 3
