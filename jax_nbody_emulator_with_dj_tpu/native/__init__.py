"""Build-on-demand native (C++) kernels, loaded through ctypes.

The package's compute path is JAX/XLA; these kernels serve the *host-side*
runtime pieces where the reference leans on external native code or on
slow interpreted loops:

- ``fof.cpp`` — the FoF pair-linking loop (the reference uses nbodykit's
  C/MPI FOF, ``scripts/halos.py:407-450`` there);
- ``staging.cpp`` — periodic chunk gather for the chunked big-box
  runtime's host-staged inputs (the reference's numpy broadcast
  fancy-index crop, ``subbox.py:197-201`` there, runs element-by-element).

Sources compile on first use with ``g++ -O3 -shared -fPIC`` into a cache
directory (override with ``JAX_NBODY_NATIVE_CACHE``); every caller treats
the native kernel as an accelerator with the pure-numpy implementation as
the always-available canonical fallback, and equivalence is asserted in
tests.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

_CACHE: dict[str, object] = {}


def _cache_dir() -> Path:
    d = os.environ.get("JAX_NBODY_NATIVE_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "jax_nbody_native"
    )
    p = Path(d)
    p.mkdir(parents=True, exist_ok=True)
    return p


def _compile_and_load(name: str, extra_flags: tuple[str, ...] = ()):
    """Compile <name>.cpp (if needed) and dlopen it; None on failure."""
    src_path = Path(__file__).with_name(f"{name}.cpp")
    try:
        src = src_path.read_bytes()
        tag = hashlib.sha256(src).hexdigest()[:16]
        so = _cache_dir() / f"{name}_{tag}.so"

        def build():
            # per-process temp name: concurrent first-use builds (pytest
            # workers, pod hosts on a shared cache) must not interleave
            # writes before the atomic publish
            tmp = so.parent / f"{so.name}.build.{os.getpid()}"
            try:
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     "-pthread", *extra_flags, str(src_path), "-o", str(tmp)],
                    check=True, capture_output=True, timeout=300,
                )
                os.replace(tmp, so)
            finally:
                tmp.unlink(missing_ok=True)

        if not so.exists():
            build()
        try:
            return ctypes.CDLL(str(so))
        except OSError:
            # a stale/corrupted cache entry: rebuild once before giving up
            so.unlink(missing_ok=True)
            build()
            return ctypes.CDLL(str(so))
    except Exception:
        return None


def _get_lib(name: str, configure):
    """Cached compile+load of one kernel library; ``configure`` sets the
    ctypes signatures on first successful load.  None on failure (cached
    too, so a broken toolchain is probed once per process)."""
    if name in _CACHE:
        return _CACHE[name]
    lib = _compile_and_load(name)
    if lib is not None:
        configure(lib)
    _CACHE[name] = lib
    return lib


def _load_library():
    """The FoF kernel library (compiled on demand); None on failure."""

    def configure(lib):
        lib.fof_labels.restype = ctypes.c_int
        lib.fof_labels.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
        ]

    return _get_lib("fof", configure)


def native_fof_available() -> bool:
    return _load_library() is not None


def fof_labels(positions: np.ndarray, boxsize: float, linking_length: float,
               n_threads: int | None = None):
    """Union-find root label per particle, or None if the kernel is
    unavailable.  Roots are the minimum particle index of each component —
    the same representative the numpy engine produces, so results are
    array-identical (and deterministic at ANY thread count: the lock-free
    union-find hooks larger roots under smaller, so the final labels are a
    pure function of the pair set — see fof.cpp).

    ``n_threads``: workers for the pair-linking loop.  Default: the
    ``JAX_NBODY_FOF_THREADS`` env var, else all cores (the reference
    scales its nbodykit FoF by MPI ranks; one pod host gets the same
    effect from cores)."""
    lib = _load_library()
    if lib is None:
        return None
    if n_threads is None:
        n_threads = int(os.environ.get("JAX_NBODY_FOF_THREADS", "0"))
    pos = np.ascontiguousarray(positions, np.float32)
    n_p = len(pos)
    labels = np.empty(n_p, np.int64)
    rc = lib.fof_labels(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n_p),
        ctypes.c_double(float(boxsize)),
        ctypes.c_double(float(linking_length)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int(int(n_threads)),
    )
    if rc != 0:
        raise ValueError(f"native fof_labels failed with code {rc}")
    return labels


def _load_staging():
    def configure(lib):
        lib.periodic_gather.restype = ctypes.c_int
        lib.periodic_gather.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            *([ctypes.c_int64] * 11),
            ctypes.c_int,
        ]

    return _get_lib("staging", configure)


def native_staging_available() -> bool:
    return _load_staging() is not None


def periodic_gather(src: np.ndarray, start, out_shape, out: np.ndarray | None = None):
    """Gather ``src[:, (start+i) % shape]`` — a periodically wrapped
    subvolume of a C-order ``(C, D, H, W)`` array — via segment memcpys.

    ``start`` and ``out_shape`` are per-spatial-axis (3-tuples); extents
    larger than the source tile the torus, matching the numpy broadcast
    fancy-index semantics the chunked runtime otherwise uses.  Returns
    None when the kernel is unavailable (callers fall back to numpy).
    """
    lib = _load_staging()
    if lib is None:
        return None
    if src.ndim != 4 or not src.flags.c_contiguous:
        raise ValueError("src must be a C-contiguous (C, D, H, W) array")
    sd, sh, sw = (int(s) % int(n) for s, n in zip(start, src.shape[1:]))
    od, oh, ow = (int(m) for m in out_shape)
    if out is None:
        out = np.empty((src.shape[0], od, oh, ow), src.dtype)
    elif out.shape != (src.shape[0], od, oh, ow) or out.dtype != src.dtype \
            or not out.flags.c_contiguous:
        raise ValueError("out must be C-contiguous (C, od, oh, ow) of src dtype")
    rc = lib.periodic_gather(
        src.ctypes.data, out.ctypes.data,
        *map(ctypes.c_int64, src.shape),
        ctypes.c_int64(sd), ctypes.c_int64(sh), ctypes.c_int64(sw),
        ctypes.c_int64(od), ctypes.c_int64(oh), ctypes.c_int64(ow),
        ctypes.c_int64(src.dtype.itemsize),
        ctypes.c_int(0),
    )
    if rc != 0:
        raise ValueError(f"native periodic_gather failed with code {rc}")
    return out
