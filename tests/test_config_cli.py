"""CLI override + config YAML round-trip tests."""

from pathlib import Path

import pytest

from nerfstudio_thermal_tpu.configs.cli import CLIError, apply_cli_overrides
from nerfstudio_thermal_tpu.configs.method_configs import get_method_config
from nerfstudio_thermal_tpu.configs.serialization import load_config, save_config


def test_reference_style_flag_aliases():
    cfg = get_method_config("thermal-nerfacto")
    cfg, pos = apply_cli_overrides(cfg, [
        "--pipeline.model.density-mode", "shared",
        "--pipeline.datamanager.train-num-rays-per-batch", "123",
        "--pipeline.datamanager.dataparser.train-split-fraction", "0.5",
        "--max-num-iterations", "77",
        "--model.thermal-loss-mult", "5.5",
    ])
    assert pos == []
    assert cfg.model.density_mode == "shared"
    assert cfg.datamanager.train_num_rays_per_batch == 123
    assert cfg.dataparser.train_split_fraction == 0.5
    assert cfg.trainer.max_num_iterations == 77
    assert cfg.model.thermal_loss_mult == 5.5


def test_tuple_and_bool_coercion():
    cfg = get_method_config("nerfacto")
    cfg, _ = apply_cli_overrides(cfg, [
        "--model.num-proposal-samples-per-ray", "32,16",
        "--model.use-single-jitter", "false",
    ])
    assert cfg.model.num_proposal_samples_per_ray == (32, 16)
    assert cfg.model.use_single_jitter is False


def test_unknown_flag_raises():
    cfg = get_method_config("nerfacto")
    with pytest.raises(CLIError):
        apply_cli_overrides(cfg, ["--model.not-a-field", "1"])


def test_yaml_round_trip(tmp_path):
    cfg = get_method_config("thermal-nerfacto-tpu")
    cfg.model.density_mode = "shared"
    cfg.data = Path("/some/data")
    path = tmp_path / "config.yml"
    save_config(cfg, path)
    loaded = load_config(path)
    assert loaded.method_name == "thermal-nerfacto-tpu"
    assert loaded.model.density_mode == "shared"
    assert loaded.data == Path("/some/data")
    assert loaded.model.num_proposal_samples_per_ray == cfg.model.num_proposal_samples_per_ray
    assert type(loaded.model) is type(cfg.model)
    # optimizer groups survive
    assert set(loaded.optimizers) == set(cfg.optimizers)


def test_pair_pixel_sampler(tmp_path):
    import numpy as np
    from tests.fixtures import make_synthetic_rgbt_dataset
    from nerfstudio_thermal_tpu.data.dataparsers.nerfstudio_dataparser import (
        ThermalNerf, ThermalNerfDataParserConfig,
    )
    from nerfstudio_thermal_tpu.data.datasets import InputDataset
    from nerfstudio_thermal_tpu.data.pixel_samplers import (
        PairPixelSampler, PixelSamplerConfig,
    )

    root = make_synthetic_rgbt_dataset(tmp_path / "d")
    parser = ThermalNerf(ThermalNerfDataParserConfig(data=root, train_split_fraction=0.5))
    ds = InputDataset(parser.get_dataparser_outputs("train"))
    sampler = PairPixelSampler(PixelSamplerConfig(num_rays_per_batch=32), ds, radius=2)
    batch = sampler.sample()
    idx = batch["ray_indices"]
    assert idx.shape == (32, 3)
    # pairs are within radius and in the same image
    anchors, neighbors = idx[0::2], idx[1::2]
    assert (anchors[:, 0] == neighbors[:, 0]).all()
    assert (np.abs(anchors[:, 1:] - neighbors[:, 1:]) <= 2).all()
