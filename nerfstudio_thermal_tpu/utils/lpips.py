"""LPIPS perceptual metric in JAX (VGG16 backbone).

Behavioral spec: reference uses torchmetrics LPIPS with normalize=True
(reference nerfacto.py:253, thermal_nerfacto.py:537-552). This is the same
computation: VGG16 features at relu1_2/2_2/3_3/4_3/5_3, unit-normalized per
channel, squared differences reduced by learned linear weights, averaged over
space and layers.

Weight resolution (first hit wins):
  1. $NS_LPIPS_WEIGHTS .npz (keys: conv{i}_kernel/conv{i}_bias for the 13 VGG
     convs in order, lin{k}_weight for the 5 LPIPS heads),
  2. an npz vendored in-package or in ~/.nerfstudio,
  3. on-the-fly conversion from a locally present torchvision VGG16
     checkpoint (tools/convert_lpips_weights.py),
  4. deterministic seeded He-initialized VGG16 with uniform heads — the
     "untrained LPIPS" variant (random-feature perceptual distances correlate
     well with trained ones; Zhang et al. 2018 §5 report this for random
     AlexNet). Tier 4 keeps lpips default-on in zero-egress images; its
     provenance is surfaced via `lpips_provenance()` and recorded in the
     ns-eval JSON so untrained values are never mistaken for torchmetrics
     parity. Set NS_LPIPS=0 to disable lpips entirely.
"""

import os
from functools import lru_cache
from pathlib import Path
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, followed_by_pool)
_VGG16_PLAN = [
    (64, False), (64, True),
    (128, False), (128, True),
    (256, False), (256, False), (256, True),
    (512, False), (512, False), (512, True),
    (512, False), (512, False), (512, True),
]
# indices (into conv list) whose post-relu activations feed LPIPS
_FEATURE_LAYERS = [1, 3, 6, 9, 12]

_IMAGENET_MEAN = np.array([-0.030, -0.088, -0.188], np.float32)  # lpips 'shift'
_IMAGENET_SCALE = np.array([0.458, 0.448, 0.450], np.float32)  # lpips 'scale'


def _candidate_paths() -> List[Path]:
    cands = []
    env = os.environ.get("NS_LPIPS_WEIGHTS")
    if env:
        cands.append(Path(env))
    # vendored next to the package, and the user cache
    cands.append(Path(__file__).resolve().parent.parent / "data" / "lpips_vgg16.npz")
    cands.append(Path.home() / ".nerfstudio" / "lpips_vgg16.npz")
    return cands


@lru_cache(maxsize=1)
def _weights_path() -> Optional[Path]:
    """Locate (or build) the LPIPS weight file.

    Search order: $NS_LPIPS_WEIGHTS, a vendored npz in the package, the user
    cache; as a last resort auto-convert from a locally present torchvision
    VGG16 checkpoint + lpips package (tools/convert_lpips_weights.py logic)
    and cache the result. In a zero-egress image with no torch checkpoints
    the metric stays unavailable and eval omits lpips keys."""
    for p in _candidate_paths():
        if p.exists():
            return p
    try:
        import glob

        hub = Path.home() / ".cache" / "torch" / "hub" / "checkpoints"
        vggs = sorted(glob.glob(str(hub / "vgg16-*.pth")))
        import lpips as lpips_pkg  # noqa: F401  (needs the linear heads)

        if vggs:
            out = Path.home() / ".nerfstudio" / "lpips_vgg16.npz"
            out.parent.mkdir(parents=True, exist_ok=True)
            import subprocess
            import sys

            conv = Path(__file__).resolve().parents[2] / "tools" / "convert_lpips_weights.py"
            subprocess.run(
                [sys.executable, str(conv), "--vgg16-pth", vggs[-1], "--out", str(out)],
                check=True,
            )
            return out
    except Exception:
        pass
    return None


def _enabled() -> bool:
    return os.environ.get("NS_LPIPS", "1").lower() not in ("0", "off", "false")


def lpips_available() -> bool:
    """True unless explicitly disabled (NS_LPIPS=0): with no pretrained
    weights findable, the seeded untrained tier still serves the metric."""
    return _enabled()


def lpips_provenance() -> Optional[str]:
    """Where the active weights come from — recorded in the ns-eval JSON."""
    if not _enabled():
        return None
    path = _weights_path()
    if path is not None:
        return f"weights:{path}"
    return "untrained-seeded(vgg16-he, seed 0, uniform heads)"


def lpips_metric_name(suffix: str) -> str:
    """Metric key carrying its own provenance: `lpips_<suffix>` only when
    trained VGG weights are loaded; the tier-4 untrained fallback emits
    `lpips_untrained_<suffix>` so an eval JSON can never be misread as
    torchmetrics-comparable (reference nerfacto.py:247-253 always has
    pretrained weights; this image is zero-egress and may not)."""
    prov = lpips_provenance()
    if prov is not None and prov.startswith("weights:"):
        return f"lpips_{suffix}"
    return f"lpips_untrained_{suffix}"


@lru_cache(maxsize=1)
def _seeded_weights():
    """Tier-4 fallback: deterministic He-initialized VGG16 convs + uniform
    non-negative linear heads (1/C so the head equals a channel mean)."""
    rng = np.random.default_rng(0)
    convs = []
    in_ch = 3
    for out_ch, _ in _VGG16_PLAN:
        fan_in = 3 * 3 * in_ch
        k = rng.normal(size=(3, 3, in_ch, out_ch)).astype(np.float32)
        k *= np.sqrt(2.0 / fan_in)
        convs.append((jnp.asarray(k), jnp.zeros((out_ch,), jnp.float32)))
        in_ch = out_ch
    lins = [
        jnp.full((_VGG16_PLAN[i][0],), 1.0 / _VGG16_PLAN[i][0], jnp.float32)
        for i in _FEATURE_LAYERS
    ]
    return convs, lins


_warned_untrained = False


@lru_cache(maxsize=1)
def _load_weights():
    path = _weights_path()
    if path is None:
        global _warned_untrained
        if not _warned_untrained:
            _warned_untrained = True
            import sys

            print(
                "[lpips] no pretrained weights found; using the deterministic "
                "untrained-VGG16 variant (set NS_LPIPS_WEIGHTS for "
                "torchmetrics-parity values, NS_LPIPS=0 to disable)",
                file=sys.stderr,
            )
        return _seeded_weights()
    data = np.load(path)
    convs = []
    for i in range(13):
        convs.append(
            (jnp.asarray(data[f"conv{i}_kernel"]), jnp.asarray(data[f"conv{i}_bias"]))
        )
    lins = [jnp.asarray(data[f"lin{k}_weight"]) for k in range(5)]
    return convs, lins


def _vgg_features(x: jax.Array, convs) -> List[jax.Array]:
    """x: [N, H, W, 3] in [-1, 1] (lpips-normalized). Returns feature maps."""
    h = (x - _IMAGENET_MEAN) / _IMAGENET_SCALE
    feats = []
    ci = 0
    for out_ch, pool in _VGG16_PLAN:
        k, b = convs[ci]
        h = jax.lax.conv_general_dilated(
            h, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b
        h = jax.nn.relu(h)
        if ci in _FEATURE_LAYERS:
            feats.append(h)
        if pool:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
        ci += 1
    return feats


def lpips(pred: jax.Array, target: jax.Array) -> Optional[float]:
    """pred/target: [H, W, 3] in [0, 1] (normalize=True semantics). None when
    weights are unavailable."""
    if not lpips_available():
        return None
    convs, lins = _load_weights()
    # normalize=True: map [0,1] -> [-1,1]
    p = (pred[None] * 2.0 - 1.0).astype(jnp.float32)
    t = (target[None] * 2.0 - 1.0).astype(jnp.float32)
    fp = _vgg_features(p, convs)
    ft = _vgg_features(t, convs)
    total = 0.0
    for k, (a, b) in enumerate(zip(fp, ft)):
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
        b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
        d = (a - b) ** 2
        w = lins[k].reshape(1, 1, 1, -1)
        total = total + jnp.mean(jnp.sum(d * w, axis=-1))
    return float(total)
