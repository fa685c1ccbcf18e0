"""Build-on-demand native (C++) kernels, loaded through ctypes.

The package's compute path is JAX/XLA; these kernels serve the *host-side*
runtime pieces where the reference leans on external native code — today
the FoF pair-linking loop (the reference uses nbodykit's C/MPI FOF,
``scripts/halos.py:407-450`` there).  Sources compile on first use with
``g++ -O3 -shared -fPIC`` into a cache directory (override with
``JAX_NBODY_NATIVE_CACHE``); every caller treats the native kernel as an
accelerator with the pure-numpy implementation as the always-available
canonical fallback, and equivalence is asserted in tests.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).with_name("fof.cpp")
_CACHE: dict[str, object] = {}


def _cache_dir() -> Path:
    d = os.environ.get("JAX_NBODY_NATIVE_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "jax_nbody_native"
    )
    p = Path(d)
    p.mkdir(parents=True, exist_ok=True)
    return p


def _load_library():
    """Compile (if needed) and dlopen the kernel library; None on failure."""
    if "lib" in _CACHE:
        return _CACHE["lib"]
    lib = None
    try:
        src = _SRC.read_bytes()
        tag = hashlib.sha256(src).hexdigest()[:16]
        so = _cache_dir() / f"fof_{tag}.so"
        if not so.exists():
            tmp = so.with_suffix(".so.build")
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                 str(_SRC), "-o", str(tmp)],
                check=True, capture_output=True, timeout=300,
            )
            os.replace(tmp, so)
        lib = ctypes.CDLL(str(so))
        lib.fof_labels.restype = ctypes.c_int
        lib.fof_labels.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_int64),
        ]
    except Exception:
        lib = None
    _CACHE["lib"] = lib
    return lib


def native_fof_available() -> bool:
    return _load_library() is not None


def fof_labels(positions: np.ndarray, boxsize: float, linking_length: float):
    """Union-find root label per particle, or None if the kernel is
    unavailable.  Roots are the minimum particle index of each component —
    the same representative the numpy engine produces, so results are
    array-identical."""
    lib = _load_library()
    if lib is None:
        return None
    pos = np.ascontiguousarray(positions, np.float32)
    n_p = len(pos)
    labels = np.empty(n_p, np.int64)
    rc = lib.fof_labels(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n_p),
        ctypes.c_double(float(boxsize)),
        ctypes.c_double(float(linking_length)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        raise ValueError(f"native fof_labels failed with code {rc}")
    return labels
