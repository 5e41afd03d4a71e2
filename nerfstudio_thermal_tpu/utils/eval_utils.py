"""eval_setup: reload a trained run from its config.yml + latest checkpoint.

Behavioral spec: reference `nerfstudio/utils/eval_utils.py` (used by ns-eval,
ns-render, ns-viewer).
"""

from pathlib import Path
from typing import Optional, Tuple

from nerfstudio_thermal_tpu.configs.method_configs import setup_trainer
from nerfstudio_thermal_tpu.configs.serialization import load_config


def eval_setup(
    config_path: Path, load_step: Optional[int] = None
) -> Tuple[object, object, dict]:
    """Returns (method_config, trainer-with-restored-state, host params)."""
    config_path = Path(config_path)
    config = load_config(config_path)
    base_dir = config_path.parent
    ckpt_dir = base_dir / "nerfstudio_models"
    config.trainer.load_dir = ckpt_dir
    config.trainer.load_step = load_step
    trainer = setup_trainer(config, base_dir=base_dir)
    trainer.setup()
    return config, trainer, trainer.host_params()
