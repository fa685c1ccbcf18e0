from .timing import force_sync
from .params import (
    convert_reference_params,
    convert_to_reference_params,
    load_params_npz,
    save_params_npz,
    tree_cast,
)

__all__ = [
    "convert_reference_params",
    "convert_to_reference_params",
    "load_params_npz",
    "save_params_npz",
    "tree_cast",
]
