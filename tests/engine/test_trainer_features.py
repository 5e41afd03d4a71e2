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


def test_resume_equivalence(tmp_path):
    """3 steps + save/load + 3 steps must produce the same losses as 6
    uninterrupted steps (reference restores full train state,
    engine/trainer.py:389-453; here device RNG is checkpointed and host
    sampling is a pure function of (seed, step))."""
    data = make_synthetic_rgbt_dataset(tmp_path / "data")

    cfg = tiny_method("thermal-nerfacto", data, density_mode="rgb_only", max_iters=6)
    trainer = setup_trainer(cfg, base_dir=tmp_path / "uninterrupted")
    trainer.setup()
    losses_full = []
    for step in range(6):
        scalars = trainer.train_iteration(step)
        losses_full.append(float(scalars["loss"]))

    cfg_a = tiny_method("thermal-nerfacto", data, density_mode="rgb_only", max_iters=3)
    tr_a = setup_trainer(cfg_a, base_dir=tmp_path / "part_a")
    tr_a.setup()
    losses_resumed = []
    for step in range(3):
        losses_resumed.append(float(tr_a.train_iteration(step)["loss"]))
    tr_a.save_checkpoint(3)

    cfg_b = tiny_method("thermal-nerfacto", data, density_mode="rgb_only", max_iters=6)
    cfg_b.trainer.load_dir = tmp_path / "part_a" / "nerfstudio_models"
    tr_b = setup_trainer(cfg_b, base_dir=tmp_path / "part_b")
    tr_b.setup()
    assert tr_b._start_step == 3
    for step in range(3, 6):
        losses_resumed.append(float(tr_b.train_iteration(step)["loss"]))

    np.testing.assert_allclose(losses_resumed, losses_full, rtol=1e-6, atol=0)


def test_eval_image_logging(tmp_path):
    """Eval image grids must be written to log_dir/images as PNGs
    (reference utils/writer.py:149-171 put_image)."""
    data = make_synthetic_rgbt_dataset(tmp_path / "data")
    cfg = tiny_method("thermal-nerfacto", data, density_mode="rgb_only", max_iters=3)
    cfg.trainer.steps_per_eval_image = 2
    trainer = setup_trainer(cfg, base_dir=tmp_path / "out")
    trainer.setup()
    trainer.train()
    pngs = list((tmp_path / "out" / "images").rglob("*.png"))
    assert pngs, "no eval images written"
    names = {p.parent.name for p in pngs}
    assert "eval_img" in names  # GT | pred grid panel


def test_eval_batch_cadence(tmp_path):
    data = make_synthetic_rgbt_dataset(tmp_path / "data")
    cfg = tiny_method("thermal-nerfacto", data, density_mode="rgb_only", max_iters=3)
    cfg.trainer.steps_per_eval_batch = 2
    trainer = setup_trainer(cfg, base_dir=tmp_path / "out")
    trainer.setup()
    trainer.train()
    events = (tmp_path / "out" / "events.jsonl").read_text()
    assert "eval/eval_rgb_loss" in events or "eval_rgb_loss" in events


def test_empty_eval_split_skips_evals(tmp_path, capsys):
    """4 pairs at the default 0.9 paired split -> 0 eval images. All eval
    cadences must be skipped with a single notice, never an exception."""
    data = make_synthetic_rgbt_dataset(tmp_path / "data")
    cfg = tiny_method("thermal-nerfacto", data, density_mode="rgb_only", max_iters=3)
    cfg.dataparser.train_split_fraction = 0.9  # undo tiny_method's 0.5
    cfg.trainer.steps_per_eval_batch = 1
    cfg.trainer.steps_per_eval_image = 2
    trainer = setup_trainer(cfg, base_dir=tmp_path / "out")
    trainer.setup()
    assert len(trainer.datamanager.eval_dataset) == 0
    trainer.train()
    out = capsys.readouterr().out
    assert out.count("eval split is empty") == 1
    assert "eval batch failed" not in out and "eval image failed" not in out


def test_pixel_sampler_empty_dataset_raises():
    from nerfstudio_thermal_tpu.data.pixel_samplers import (
        PixelSampler, PixelSamplerConfig,
    )

    sampler = PixelSampler(PixelSamplerConfig(num_rays_per_batch=16), [], seed=0)
    try:
        sampler.sample(step=0)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "empty dataset" in str(e)
