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
    ):
        self.log_dir = Path(log_dir) if log_dir else None
        self.steps_per_log = steps_per_log
        self._jsonl = None
        self._tb = None
        if self.log_dir is not None:
            self.log_dir.mkdir(parents=True, exist_ok=True)
            self._jsonl = open(self.log_dir / "events.jsonl", "a")
            if use_tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter

                    self._tb = SummaryWriter(log_dir=str(self.log_dir))
                except Exception:
                    self._tb = None

    def write_scalar_dict(self, scalars: Dict[str, float], step: int, group: str = ""):
        record = {"step": step, "time": time.time()}
        prefix = f"{group}/" if group else ""
        for k, v in scalars.items():
            record[f"{prefix}{k}"] = float(v)
            if self._tb is not None:
                self._tb.add_scalar(f"{prefix}{k}", float(v), step)
        if self._jsonl is not None:
            self._jsonl.write(json.dumps(record) + "\n")
            self._jsonl.flush()

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
