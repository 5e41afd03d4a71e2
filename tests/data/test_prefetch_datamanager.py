"""PrefetchingDataManager: stream equivalence with the stateless sampler and
checkpoint-resume realignment (the set_start_step race fixed in round 3: the
worker claims its step under a lock BEFORE sampling, and batches are tagged
with a realignment generation so in-flight stale batches are droppable)."""

import numpy as np

from nerfstudio_thermal_tpu.configs.dataparser_configs import build_dataparser
from nerfstudio_thermal_tpu.data.datamanagers import (
    PrefetchingDataManager,
    VanillaDataManager,
    VanillaDataManagerConfig,
)
from nerfstudio_thermal_tpu.data.dataparsers.nerfstudio_dataparser import (
    ThermalNerfDataParserConfig,
)
from tests.fixtures import make_synthetic_rgbt_dataset


def _managers(tmp_path):
    data = make_synthetic_rgbt_dataset(tmp_path / "d")
    cfg = ThermalNerfDataParserConfig(data=data, train_split_fraction=0.5)
    mk = lambda cls: cls(
        VanillaDataManagerConfig(
            train_num_rays_per_batch=32, patch_size=2, use_native_sampler=False
        ),
        build_dataparser(cfg),
    )
    return mk(PrefetchingDataManager), mk(VanillaDataManager)


def test_prefetch_matches_stateless_stream(tmp_path):
    pre, van = _managers(tmp_path)
    try:
        for step in range(4):
            a = pre.next_train(step)
            b = van.next_train(step)
            np.testing.assert_array_equal(a["ray_indices"], b["ray_indices"])
    finally:
        pre.close()


def test_prefetch_realigns_after_resume(tmp_path):
    pre, van = _managers(tmp_path)
    try:
        pre.next_train(0)
        pre.next_train(1)
        # checkpoint resume far ahead: must NOT replay 2..9999 one batch at
        # a time (the pre-fix behavior when the worker clobbered the step)
        pre.set_start_step(10_000)
        a = pre.next_train(10_000)
        b = van.next_train(10_000)
        np.testing.assert_array_equal(a["ray_indices"], b["ray_indices"])
        # and a rewind (tag > step) still serves the right batch inline
        pre.set_start_step(500)
        # let the worker run ahead a little so future-tagged batches queue up
        import time

        time.sleep(0.2)
        a = pre.next_train(3)
        b = van.next_train(3)
        np.testing.assert_array_equal(a["ray_indices"], b["ray_indices"])
    finally:
        pre.close()


def test_prefetch_realign_hammer(tmp_path):
    """Race regression: realign repeatedly while the worker is mid-sample;
    every next_train must return the right stateless batch promptly."""
    pre, van = _managers(tmp_path)
    try:
        steps = [7, 123, 45, 9000, 2, 777]
        for s in steps:
            pre.set_start_step(s)
            a = pre.next_train(s)
            b = van.next_train(s)
            np.testing.assert_array_equal(a["ray_indices"], b["ray_indices"])
    finally:
        pre.close()
