"""Score-distillation (SDS) guidance interface for text-to-3D (generfacto).

Behavioral spec: reference `nerfstudio/generative/stable_diffusion.py` /
`deepfloyd.py` — `sds_loss(text_embedding, image, guidance_scale)` backprops
the diffusion score into the rendered image. Diffusion checkpoints cannot be
downloaded in this zero-egress environment, so guidance is a pluggable
interface:

- `StableDiffusionGuidance`: loads a JAX/flax diffusion checkpoint from
  $NS_SD_WEIGHTS when present (diffusers-flax format); otherwise
  `available()` is False and generfacto refuses to train with it.
- `ColorMatchGuidance`: a deterministic test guidance that pulls renders
  toward a target color — exercises the full SDS plumbing (per-view prompts,
  gradient-through-render) without any weights.
"""

import os
from pathlib import Path
from typing import Optional, Protocol

import jax
import jax.numpy as jnp


class Guidance(Protocol):
    def available(self) -> bool: ...

    def embed_prompts(self, base: str, top: str, side: str, front: str, back: str): ...

    def sds_loss(self, embeddings, image: jax.Array, *, vertical: jax.Array,
                 horizontal: jax.Array, guidance_scale: float,
                 rng: Optional[jax.Array]) -> jax.Array: ...


def select_view_embedding(embeddings, vertical, horizontal):
    """Discrete positional prompting (reference generfacto.py:301-320 /
    positional_text_embeddings): overhead when vertical > 40 deg, else
    front/side/back by horizontal quadrant. Traced-safe via jnp.where."""
    top, side, front, back = (
        embeddings["top"], embeddings["side"], embeddings["front"],
        embeddings["back"],
    )
    h = jnp.mod(horizontal, 360.0)
    quad = jnp.where(
        (h < 45) | (h >= 315), 0,  # front
        jnp.where(h < 135, 1, jnp.where(h < 225, 2, 1)),  # side/back/side
    )
    by_quad = jnp.stack([front, side, back], axis=0)[quad]
    return jnp.where(vertical > 40.0, top, by_quad)


class ColorMatchGuidance:
    """Test/reference-free guidance: 'the prompt is a color'. Each view
    embedding is an RGB target; sds_loss = mean squared pull toward it."""

    def __init__(self, base_color=(0.8, 0.3, 0.2)):
        self.base_color = jnp.asarray(base_color)

    def available(self) -> bool:
        return True

    def embed_prompts(self, base, top, side, front, back):
        shift = {
            "top": jnp.asarray([0.0, 0.1, 0.0]),
            "side": jnp.asarray([0.0, 0.0, 0.1]),
            "front": jnp.asarray([0.0, 0.0, 0.0]),
            "back": jnp.asarray([0.1, 0.0, 0.0]),
        }
        return {k: jnp.clip(self.base_color + v, 0, 1) for k, v in shift.items()}

    def sds_loss(self, embeddings, image, *, vertical, horizontal,
                 guidance_scale=1.0, rng=None):
        target = select_view_embedding(embeddings, vertical, horizontal)
        return guidance_scale * jnp.mean((image - target[None, None]) ** 2)


class StableDiffusionGuidance:
    """Flax Stable Diffusion SDS, gated on local checkpoints
    ($NS_SD_WEIGHTS -> a diffusers flax pipeline directory)."""

    def __init__(self, sd_version: str = "1-5", guidance_scale: float = 20.0):
        self.sd_version = sd_version
        self.guidance_scale = guidance_scale
        self._path = os.environ.get("NS_SD_WEIGHTS")

    def available(self) -> bool:
        return bool(self._path) and Path(self._path).exists()

    def embed_prompts(self, base, top, side, front, back):
        if not self.available():
            raise RuntimeError(
                "Stable Diffusion weights not found. Set NS_SD_WEIGHTS to a "
                "diffusers-flax pipeline directory (this image has no egress "
                "to download checkpoints)."
            )
        from diffusers import FlaxStableDiffusionPipeline  # type: ignore

        pipe, pipe_params = FlaxStableDiffusionPipeline.from_pretrained(self._path)
        self._pipe, self._pipe_params = pipe, pipe_params

        def embed(text):
            ids = pipe.tokenizer(
                text, padding="max_length",
                max_length=pipe.tokenizer.model_max_length, return_tensors="np",
            ).input_ids
            return pipe.text_encoder(
                ids, params=pipe_params["text_encoder"]
            )[0]

        return {
            "top": embed(top), "side": embed(side),
            "front": embed(front), "back": embed(back),
        }

    def sds_loss(self, embeddings, image, *, vertical, horizontal,
                 guidance_scale=None, rng=None):
        raise NotImplementedError(
            "SDS with flax StableDiffusion requires the diffusers runtime; "
            "gate generfacto on guidance.available() before training."
        )


def build_guidance(name: str, **kwargs) -> Guidance:
    if name == "colormatch":
        return ColorMatchGuidance(**kwargs)
    if name == "stablediffusion":
        return StableDiffusionGuidance(**kwargs)
    raise ValueError(f"unknown guidance '{name}'")
