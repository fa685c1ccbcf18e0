from .conv3d import conv3d, conv3d_up, leaky_relu
from .style import (
    style_vector,
    style_modulation,
    modulated_style_weight,
    premodulate_layer,
)

__all__ = [
    "conv3d",
    "conv3d_up",
    "leaky_relu",
    "style_vector",
    "style_modulation",
    "modulated_style_weight",
    "premodulate_layer",
]
