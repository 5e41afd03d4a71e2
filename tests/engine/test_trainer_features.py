"""Trainer feature tests: grad accumulation, eval-batch cadence, viewer flag."""

from pathlib import Path

import numpy as np

from tests.engine.test_train_end_to_end import tiny_method
from tests.fixtures import make_synthetic_rgbt_dataset
from nerfstudio_thermal_tpu.configs.method_configs import setup_trainer


def test_gradient_accumulation_trains(tmp_path):
    data = make_synthetic_rgbt_dataset(tmp_path / "data")
    cfg = tiny_method("thermal-nerfacto", data, density_mode="rgb_only", max_iters=4)
    cfg.trainer.gradient_accumulation_steps = 2
    trainer = setup_trainer(cfg, base_dir=tmp_path / "out")
    trainer.setup()
    p0 = np.asarray(trainer.host_params()["fields"]["mlp_head"]["Dense_0"]["kernel"]).copy()
    trainer.train()
    p1 = np.asarray(trainer.host_params()["fields"]["mlp_head"]["Dense_0"]["kernel"])
    assert not np.allclose(p0, p1)  # params moved after accumulated updates


def test_eval_batch_cadence(tmp_path):
    data = make_synthetic_rgbt_dataset(tmp_path / "data")
    cfg = tiny_method("thermal-nerfacto", data, density_mode="rgb_only", max_iters=3)
    cfg.trainer.steps_per_eval_batch = 2
    trainer = setup_trainer(cfg, base_dir=tmp_path / "out")
    trainer.setup()
    trainer.train()
    events = (tmp_path / "out" / "events.jsonl").read_text()
    assert "eval/eval_rgb_loss" in events or "eval_rgb_loss" in events
