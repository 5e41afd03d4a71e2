"""LPIPS gating + computation with synthetic weights."""

import numpy as np
import pytest


def make_weights(tmp_path, monkeypatch):
    rng = np.random.default_rng(0)
    plan = [(64, 3), (64, 64), (128, 64), (128, 128), (256, 128), (256, 256),
            (256, 256), (512, 256), (512, 512), (512, 512), (512, 512),
            (512, 512), (512, 512)]
    arrs = {}
    for i, (out_c, in_c) in enumerate(plan):
        arrs[f"conv{i}_kernel"] = rng.normal(size=(3, 3, in_c, out_c)).astype(np.float32) * 0.05
        arrs[f"conv{i}_bias"] = np.zeros((out_c,), np.float32)
    for k, ch in enumerate([64, 128, 256, 512, 512]):
        arrs[f"lin{k}_weight"] = np.abs(rng.normal(size=(ch,))).astype(np.float32) * 0.01
    path = tmp_path / "lpips.npz"
    np.savez(path, **arrs)
    monkeypatch.setenv("NS_LPIPS_WEIGHTS", str(path))
    import nerfstudio_thermal_tpu.utils.lpips as L
    L._weights_path.cache_clear()  # may hold a stale None from earlier tests
    L._load_weights.cache_clear()
    return path


def test_lpips_untrained_fallback_without_weights(monkeypatch):
    """No weights anywhere -> the deterministic seeded tier serves the metric
    (default-on, reference nerfacto.py:247-253 computes lpips in every eval)."""
    monkeypatch.delenv("NS_LPIPS_WEIGHTS", raising=False)
    monkeypatch.delenv("NS_LPIPS", raising=False)
    import nerfstudio_thermal_tpu.utils.lpips as L
    L._weights_path.cache_clear()
    L._load_weights.cache_clear()
    assert L.lpips_available()
    assert "untrained-seeded" in L.lpips_provenance()
    rng = np.random.default_rng(2)
    a = rng.uniform(size=(16, 16, 3)).astype(np.float32)
    b = rng.uniform(size=(16, 16, 3)).astype(np.float32)
    same = L.lpips(a, a.copy())
    assert same == pytest.approx(0.0, abs=1e-6)
    d1, d2 = L.lpips(a, b), L.lpips(a, b)
    assert d1 > 1e-6 and d1 == pytest.approx(d2)  # deterministic
    L._load_weights.cache_clear()


def test_lpips_disabled_via_env(monkeypatch):
    monkeypatch.delenv("NS_LPIPS_WEIGHTS", raising=False)
    monkeypatch.setenv("NS_LPIPS", "0")
    import nerfstudio_thermal_tpu.utils.lpips as L
    L._weights_path.cache_clear()
    L._load_weights.cache_clear()
    assert not L.lpips_available()
    assert L.lpips_provenance() is None
    assert L.lpips(np.zeros((8, 8, 3)), np.zeros((8, 8, 3))) is None


def test_lpips_zero_for_identical_and_positive_for_different(tmp_path, monkeypatch):
    make_weights(tmp_path, monkeypatch)
    from nerfstudio_thermal_tpu.utils.lpips import lpips, lpips_available
    assert lpips_available()
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    same = lpips(img, img.copy())
    assert same == pytest.approx(0.0, abs=1e-6)
    other = lpips(img, rng.uniform(size=(32, 32, 3)).astype(np.float32))
    assert other > 1e-6


def test_lpips_metric_name_carries_provenance(tmp_path, monkeypatch):
    """Untrained tier-4 weights must rename the metric key so eval JSONs can
    never be read as torchmetrics-comparable (VERDICT r4 item 7)."""
    import nerfstudio_thermal_tpu.utils.lpips as L

    monkeypatch.delenv("NS_LPIPS_WEIGHTS", raising=False)
    monkeypatch.delenv("NS_LPIPS", raising=False)
    L._weights_path.cache_clear()
    L._load_weights.cache_clear()
    assert L.lpips_metric_name("rgb") == "lpips_untrained_rgb"
    assert L.lpips_metric_name("thermal") == "lpips_untrained_thermal"

    make_weights(tmp_path, monkeypatch)
    assert L.lpips_metric_name("rgb") == "lpips_rgb"
    L._weights_path.cache_clear()
    L._load_weights.cache_clear()
