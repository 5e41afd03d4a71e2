"""Field base helpers.

Behavioral spec: reference `nerfstudio/fields/base_field.py` (FieldHeadNames
enum in `field_components/field_heads.py`; `get_normalized_directions`).
"""

from enum import Enum

import jax


class FieldHeadNames(Enum):
    """Possible field outputs (reference field_components/field_heads.py:25-40)."""

    RGB = "rgb"
    SH = "sh"
    DENSITY = "density"
    NORMALS = "normals"
    PRED_NORMALS = "pred_normals"
    UNCERTAINTY = "uncertainty"
    TRANSIENT_RGB = "transient_rgb"
    TRANSIENT_DENSITY = "transient_density"
    SEMANTICS = "semantics"
    SDF = "sdf"
    ALPHA = "alpha"
    GRADIENT = "gradient"


def get_normalized_directions(directions: jax.Array) -> jax.Array:
    """Shift unit directions from [-1, 1] to [0, 1] (reference base_field.py)."""
    return (directions + 1.0) / 2.0
