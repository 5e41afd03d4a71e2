"""Field-op library: encodings, MLPs, activations, spatial distortions.

TPU-native replacement for the reference's `nerfstudio/field_components/`
(which dispatches the hot ops to tiny-cuda-nn CUDA kernels, see
reference `field_components/mlp.py:102-115` and `encodings.py:356-368`).
Here every op is a pure JAX function / flax module that XLA fuses onto the
MXU; the hash-grid gather additionally has a Pallas kernel in `ops/pallas/`.
"""

from nerfstudio_thermal_tpu.ops.activations import trunc_exp
from nerfstudio_thermal_tpu.ops.encodings import (
    HashEncoding,
    NeRFEncoding,
    SHEncoding,
    hash_encode,
    sh_encoding,
)
from nerfstudio_thermal_tpu.ops.mlp import MLP, MLPWithHashEncoding
from nerfstudio_thermal_tpu.ops.embeddings import Embedding
from nerfstudio_thermal_tpu.ops.spatial_distortions import SceneContraction

__all__ = [
    "trunc_exp",
    "HashEncoding",
    "NeRFEncoding",
    "SHEncoding",
    "hash_encode",
    "sh_encoding",
    "MLP",
    "MLPWithHashEncoding",
    "Embedding",
    "SceneContraction",
]
