"""TPU-native cosmological N-body emulation engine.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``oleg-savchenko/jax_nbody_emulator_with_dj``: a StyleGAN-modulated 3D U-Net
maps Zel'dovich/1LPT linear displacement fields plus cosmology (z, Om) to
nonlinear displacement (and velocity) fields, with spatial decomposition for
arbitrarily large periodic boxes — on a single chip via a fused device-side
subbox loop, and across a TPU pod slice via ``shard_map`` + halo-exchange
collectives (``parallel/``).

Public surface mirrors the reference package's ``__init__.py:73-95``.
"""

from .cosmology import (
    acc_norm,
    dlogH_dloga,
    growth_factor,
    growth_rate,
    hubble_rate,
    vel_norm,
)
from .emulator import (
    NBodyEmulator,
    create_emulator,
    load_default_parameters,
    modulate_emulator_parameters,
    modulate_emulator_parameters_vel,
)
from .models.cores import (
    NBodyEmulatorCore,
    NBodyEmulatorVelCore,
    StyleNBodyEmulatorCore,
    StyleNBodyEmulatorVelCore,
)
from .subbox import SubboxConfig, SubboxProcessor
from .chunked import ChunkedHierarchicalConfig, ChunkedHierarchicalProcessor
from .hierarchical import HierarchicalConfig, HierarchicalProcessor
from .geometry import auto_hierarchical_config

__version__ = "0.1.0"

__all__ = [
    # Factory and bundle
    "create_emulator",
    "NBodyEmulator",
    "load_default_parameters",
    "modulate_emulator_parameters",
    "modulate_emulator_parameters_vel",
    # Big-box runtimes
    "SubboxConfig",
    "SubboxProcessor",
    "HierarchicalConfig",
    "HierarchicalProcessor",
    "ChunkedHierarchicalConfig",
    "ChunkedHierarchicalProcessor",
    "auto_hierarchical_config",
    # Cosmology
    "growth_factor",
    "hubble_rate",
    "growth_rate",
    "dlogH_dloga",
    "vel_norm",
    "acc_norm",
    # Model cores
    "StyleNBodyEmulatorCore",
    "StyleNBodyEmulatorVelCore",
    "NBodyEmulatorCore",
    "NBodyEmulatorVelCore",
]
