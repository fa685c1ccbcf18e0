"""Platform selection that works even with force-registered PJRT plugins.

Some environments pre-register an accelerator backend (e.g. a tunneled TPU
plugin installed via sitecustomize) whose presence makes JAX ignore the
``JAX_PLATFORMS`` environment variable.  The ``jax_platforms`` *config knob*
still wins as long as no backend has been initialized, so CLIs call
:func:`apply_jax_platforms_env` right after importing jax to make the env
var behave as documented.
"""

from __future__ import annotations

import os


def apply_jax_platforms_env() -> None:
    """Honor ``JAX_PLATFORMS`` via the config knob (no-op when unset)."""
    platforms = os.environ.get("JAX_PLATFORMS")
    if not platforms:
        return
    import jax

    if not jax._src.xla_bridge._backends:  # backend not initialized yet
        jax.config.update("jax_platforms", platforms)
