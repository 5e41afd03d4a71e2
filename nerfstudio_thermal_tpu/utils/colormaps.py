"""Colormaps for visualization (host side, numpy).

Behavioral spec: reference `nerfstudio/utils/colormaps.py:46-160`
(apply_colormap: 1-ch -> turbo colormap, 3-ch passthrough;
apply_depth_colormap: normalize by near/far, mask by accumulation).
"""

from dataclasses import dataclass
from typing import Optional

import numpy as np


@dataclass
class ColormapOptions:
    colormap: str = "default"
    normalize: bool = False
    colormap_min: float = 0.0
    colormap_max: float = 1.0
    invert: bool = False


def apply_float_colormap(image: np.ndarray, colormap: str = "viridis") -> np.ndarray:
    """[..., 1] in [0,1] -> [..., 3]."""
    if colormap == "default":
        colormap = "turbo"
    image = np.nan_to_num(image, nan=0.0)
    if colormap == "gray":
        return np.repeat(image, 3, axis=-1)
    import matplotlib

    table = np.asarray(matplotlib.colormaps[colormap].colors, np.float32)
    idx = np.clip((image * 255).astype(np.int64), 0, 255)
    return table[idx[..., 0]]


def apply_colormap(
    image: np.ndarray,
    colormap_options: ColormapOptions = ColormapOptions(),
    eps: float = 1e-9,
) -> np.ndarray:
    if image.shape[-1] == 3:
        return image
    if image.shape[-1] == 1 and np.issubdtype(image.dtype, np.floating):
        output = image
        if colormap_options.normalize:
            output = output - output.min()
            output = output / (output.max() + eps)
        output = (
            output * (colormap_options.colormap_max - colormap_options.colormap_min)
            + colormap_options.colormap_min
        )
        output = np.clip(output, 0, 1)
        if colormap_options.invert:
            output = 1 - output
        return apply_float_colormap(output, colormap_options.colormap)
    if image.shape[-1] == 1 and image.dtype == bool:
        return np.where(image, np.ones_like(image, np.float32), np.zeros_like(image, np.float32)).repeat(3, -1)
    raise NotImplementedError(f"colormap for shape {image.shape}")


def apply_depth_colormap(
    depth: np.ndarray,
    accumulation: Optional[np.ndarray] = None,
    near_plane: Optional[float] = None,
    far_plane: Optional[float] = None,
    colormap_options: ColormapOptions = ColormapOptions(),
) -> np.ndarray:
    near_plane = near_plane if near_plane is not None else float(np.min(depth))
    far_plane = far_plane if far_plane is not None else float(np.max(depth))
    d = (depth - near_plane) / (far_plane - near_plane + 1e-10)
    d = np.clip(d, 0, 1)
    colored = apply_colormap(d, colormap_options)
    if accumulation is not None:
        colored = colored * accumulation + (1 - accumulation)
    return colored
