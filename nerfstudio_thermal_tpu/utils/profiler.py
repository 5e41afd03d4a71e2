"""Profiling: lightweight timing profiler + XLA trace capture.

Behavioral spec: reference `nerfstudio/utils/profiler.py` — (1) the
`@time_function` decorator/context recording running-average durations
(:44-117, dumped at exit via `flush_profiler:119-122`); (2) deep profiler
integration dumping Chrome traces (:125-180, torch.profiler there,
`jax.profiler` here — view with TensorBoard or Perfetto).
"""

import atexit
import functools
import time
from collections import defaultdict
from contextlib import ContextDecorator
from pathlib import Path
from typing import Optional

PROFILER_ENABLED = False
_records = defaultdict(lambda: [0.0, 0])  # name -> [total_seconds, count]


def setup_profiler(enabled: bool, log_dir: Optional[Path] = None):
    global PROFILER_ENABLED
    PROFILER_ENABLED = enabled
    if enabled:
        atexit.register(flush_profiler)


class time_function(ContextDecorator):
    """Decorator/context recording running-average wall time per name."""

    def __init__(self, name_or_func=None):
        self._func = None
        if callable(name_or_func):
            self._func = name_or_func
            self.name = name_or_func.__qualname__
            functools.update_wrapper(self, name_or_func)
        else:
            self.name = name_or_func

    def __call__(self, *args, **kwargs):
        if self._func is not None:
            with time_function(self.name):
                return self._func(*args, **kwargs)
        # being used as @time_function("name")
        func = args[0]
        wrapped = time_function(func)
        wrapped.name = self.name or func.__qualname__
        return wrapped

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if PROFILER_ENABLED:
            rec = _records[self.name]
            rec[0] += time.perf_counter() - self._start
            rec[1] += 1
        return False


def flush_profiler():
    """Print average durations, slowest first (reference :119-122)."""
    if not _records:
        return
    print("\nProfiler results (avg duration):")
    rows = sorted(_records.items(), key=lambda kv: -kv[1][0] / max(kv[1][1], 1))
    for name, (total, count) in rows:
        print(f"  {name:50s} {total / max(count, 1) * 1e3:10.3f} ms x{count}")


class XLAProfiler:
    """Capture an XLA device trace for a span of steps (the TPU analogue of
    the reference's PytorchProfiler Chrome traces)."""

    def __init__(self, log_dir: Path, start_step: int = 10, num_steps: int = 5):
        self.log_dir = Path(log_dir) / "profiler_traces"
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False

    def step(self, step: int):
        import jax

        if step == self.start_step and not self._active:
            self.log_dir.mkdir(parents=True, exist_ok=True)
            jax.profiler.start_trace(str(self.log_dir))
            self._active = True
        elif step >= self.stop_step and self._active:
            jax.profiler.stop_trace()
            self._active = False
