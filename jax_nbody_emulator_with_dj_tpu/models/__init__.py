from .cores import (
    NBodyEmulatorCore,
    NBodyEmulatorVelCore,
    StyleNBodyEmulatorCore,
    StyleNBodyEmulatorVelCore,
)
from .unet import (
    input_margin,
    output_size,
    valid_input_size,
    min_input_size,
)

__all__ = [
    "NBodyEmulatorCore",
    "NBodyEmulatorVelCore",
    "StyleNBodyEmulatorCore",
    "StyleNBodyEmulatorVelCore",
    "input_margin",
    "output_size",
    "valid_input_size",
    "min_input_size",
]
