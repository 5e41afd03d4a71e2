"""Event/metric writers.

Behavioral spec: reference `nerfstudio/utils/writer.py` — an event buffer
(`put_scalar/put_dict/put_time`) flushed to enabled writers (local console,
TensorBoard, W&B/Comet). Here: rich console table + JSONL event log +
optional TensorBoard. Keeps the reference's metric names
(`ITER_TRAIN_TIME`, `TRAIN_RAYS_PER_SEC`, `TEST_RAYS_PER_SEC`, `ETA`).
"""

import json
import time
from pathlib import Path
from typing import Dict, Optional


class EventName:
    ITER_TRAIN_TIME = "Train Iter (time)"
    TRAIN_RAYS_PER_SEC = "Train Rays / Sec"
    TEST_RAYS_PER_SEC = "Test Rays / Sec"
    ETA = "ETA (time)"
    CURR_TEST_PSNR = "Eval PSNR"


class Writer:
    """Console + JSONL (+ optional TensorBoard) metric writer."""

    def __init__(
        self,
        log_dir: Optional[Path] = None,
        steps_per_log: int = 10,
        use_tensorboard: bool = False,
        use_wandb: bool = False,
        use_comet: bool = False,
        experiment_name: str = "experiment",
    ):
        self.log_dir = Path(log_dir) if log_dir else None
        self.steps_per_log = steps_per_log
        self._jsonl = None
        self._tb = None
        self._wandb = None
        self._comet = None
        if self.log_dir is not None:
            self.log_dir.mkdir(parents=True, exist_ok=True)
            self._jsonl = open(self.log_dir / "events.jsonl", "a")
            if use_tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter

                    self._tb = SummaryWriter(log_dir=str(self.log_dir))
                except Exception:
                    self._tb = None
        # W&B / Comet backends (reference utils/writer.py:305-380), gated on
        # package availability.
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(
                    project="nerfstudio-thermal-tpu", name=experiment_name,
                    dir=str(self.log_dir) if self.log_dir else None,
                )
            except Exception as e:
                print(f"wandb unavailable ({e}); skipping")
        if use_comet:
            try:
                import comet_ml

                self._comet = comet_ml.Experiment(project_name="nerfstudio-thermal-tpu")
            except Exception as e:
                print(f"comet unavailable ({e}); skipping")

    def write_scalar_dict(self, scalars: Dict[str, float], step: int, group: str = ""):
        record = {"step": step, "time": time.time()}
        prefix = f"{group}/" if group else ""
        for k, v in scalars.items():
            record[f"{prefix}{k}"] = float(v)
            if self._tb is not None:
                self._tb.add_scalar(f"{prefix}{k}", float(v), step)
        if self._wandb is not None:
            self._wandb.log({k: v for k, v in record.items() if k != "time"}, step=step)
        if self._comet is not None:
            self._comet.log_metrics(
                {k: v for k, v in record.items() if k not in ("time", "step")}, step=step
            )
        if self._jsonl is not None:
            self._jsonl.write(json.dumps(record) + "\n")
            self._jsonl.flush()

    def write_image(self, name: str, image, step: int):
        """Write an eval image (HxWx3 float [0,1] or uint8) to
        `log_dir/images/<name>/step-<N>.png` and to TB/W&B/Comet when enabled
        (reference utils/writer.py:149-171 put_image)."""
        import numpy as np

        img = np.asarray(image)
        if img.ndim == 2:
            img = img[..., None]
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        if self.log_dir is not None:
            safe = name.replace("/", "_")
            out_dir = self.log_dir / "images" / safe
            out_dir.mkdir(parents=True, exist_ok=True)
            try:
                from PIL import Image

                Image.fromarray(img).save(out_dir / f"step-{step:09d}.png")
            except Exception as e:
                print(f"image write failed ({name}): {e}")
        if self._tb is not None:
            try:
                self._tb.add_image(name, img, step, dataformats="HWC")
            except Exception:
                pass
        if self._wandb is not None:
            try:
                import wandb

                self._wandb.log({name: wandb.Image(img)}, step=step)
            except Exception:
                pass
        if self._comet is not None:
            try:
                self._comet.log_image(img, name=name, step=step)
            except Exception:
                pass

    def console_log(self, step: int, scalars: Dict[str, float]):
        if step % self.steps_per_log != 0:
            return
        parts = [f"step {step}"]
        for k, v in scalars.items():
            parts.append(f"{k}={v:.5g}")
        print("  ".join(parts), flush=True)

    def close(self):
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
