"""Synthetic RGBT dataset fixture (the analogue of the reference's 1-image
lego fixture, tests/data/lego_test)."""

import json
from pathlib import Path

import numpy as np


def look_at(eye, target=np.zeros(3), up=np.array([0.0, 0.0, 1.0])):
    """OpenGL c2w: -z forward, +y up."""
    forward = target - eye
    forward = forward / np.linalg.norm(forward)
    right = np.cross(forward, up)
    right = right / np.linalg.norm(right)
    true_up = np.cross(right, forward)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = -forward
    c2w[:3, 3] = eye
    return c2w


def make_synthetic_rgbt_dataset(
    root: Path, num_pairs: int = 4, rgb_hw=(16, 20), t_hw=(12, 16), seed: int = 0
) -> Path:
    """Writes images/ + images_thermal/ + transforms.json. RGB frames first,
    then thermal frames (the ordering the paired split assumes)."""
    from PIL import Image

    root = Path(root)
    (root / "images").mkdir(parents=True, exist_ok=True)
    (root / "images_thermal").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)

    frames = []
    angles = np.linspace(0, 2 * np.pi, num_pairs, endpoint=False)

    def render(h, w, angle, grey=False):
        # simple view-dependent gradient so there's structure to fit
        ys, xs = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
        r = 0.5 + 0.5 * np.sin(2 * np.pi * xs + angle)
        g = 0.5 + 0.5 * np.cos(2 * np.pi * ys + angle)
        b = 0.5 + 0.25 * np.sin(4 * np.pi * (xs + ys))
        img = np.stack([r, g, b], -1)
        if grey:
            img = np.repeat(img.mean(-1, keepdims=True), 3, -1)
        return (img * 255).astype(np.uint8)

    for modality, (h, w), subdir in (
        ("rgb", rgb_hw, "images"),
        ("thermal", t_hw, "images_thermal"),
    ):
        for i, angle in enumerate(angles):
            eye = 2.0 * np.array([np.cos(angle), np.sin(angle), 0.4])
            c2w = look_at(eye)
            name = f"frame_{i:04d}.png"
            img = render(h, w, angle, grey=(modality == "thermal"))
            Image.fromarray(img).save(root / subdir / name)
            frames.append(
                {
                    "file_path": f"{subdir}/{name}",
                    "transform_matrix": c2w.tolist(),
                    "fl_x": w * 0.8,
                    "fl_y": w * 0.8,
                    "cx": w / 2,
                    "cy": h / 2,
                    "w": w,
                    "h": h,
                    "is_thermal": 0 if modality == "rgb" else 1,
                }
            )

    (root / "transforms.json").write_text(json.dumps({"frames": frames}, indent=1))
    return root


def make_consistent_rgbt_dataset(
    root: Path, num_pairs: int = 8, rgb_hw=(24, 24), t_hw=(20, 20), radius=0.5
) -> Path:
    """A 3D-CONSISTENT synthetic scene (ray-traced colored sphere on a dark
    background; thermal = a distinct surface pattern) so convergence tests can
    assert the model actually learns geometry + appearance, not just fit
    view-dependent noise."""
    from PIL import Image

    root = Path(root)
    (root / "images").mkdir(parents=True, exist_ok=True)
    (root / "images_thermal").mkdir(parents=True, exist_ok=True)

    def render(eye, c2w, h, w, f, thermal=False):
        ys, xs = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5, indexing="ij")
        d = np.stack(
            [(xs - w / 2) / f, -(ys - h / 2) / f, -np.ones_like(xs)], -1
        )
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        wd = d @ c2w[:3, :3].T
        b = 2 * np.sum(wd * eye, -1)
        c = np.sum(eye**2) - radius**2
        disc = b**2 - 4 * c
        hit = disc > 0
        t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0))) / 2, 0.0)
        p = eye + wd * t[..., None]  # surface points
        n = p / np.maximum(np.linalg.norm(p, axis=-1, keepdims=True), 1e-9)
        if thermal:
            v = 0.5 + 0.5 * np.sin(6 * p[..., 0] / radius)
            img = np.repeat(v[..., None], 3, -1)
        else:
            img = 0.5 + 0.5 * n  # normal-colored sphere
        img = np.where(hit[..., None], img, 0.05)
        return (np.clip(img, 0, 1) * 255).astype(np.uint8)

    frames = []
    angles = np.linspace(0, 2 * np.pi, num_pairs, endpoint=False)
    for modality, (h, w), subdir in (
        ("rgb", rgb_hw, "images"),
        ("thermal", t_hw, "images_thermal"),
    ):
        f = w * 1.2
        for i, angle in enumerate(angles):
            eye = 2.0 * np.array(
                [np.cos(angle), np.sin(angle), 0.3 * np.sin(2 * angle)]
            )
            c2w = look_at(eye)
            name = f"frame_{i:04d}.png"
            img = render(eye, c2w, h, w, f, thermal=(modality == "thermal"))
            Image.fromarray(img).save(root / subdir / name)
            frames.append(
                {
                    "file_path": f"{subdir}/{name}",
                    "transform_matrix": c2w.tolist(),
                    "fl_x": f, "fl_y": f, "cx": w / 2, "cy": h / 2,
                    "w": w, "h": h,
                    "is_thermal": 0 if modality == "rgb" else 1,
                }
            )
    (root / "transforms.json").write_text(json.dumps({"frames": frames}, indent=1))
    return root
