"""Process-level runtime/platform helpers shared by benchmark entrypoints.

This image's sitecustomize prepends the ``axon`` TPU platform to
``jax_platforms`` and the ``JAX_PLATFORMS`` env var is ignored, so CPU-only
wiring smokes must force the platform through ``jax.config`` AFTER importing
jax but BEFORE any device query (see CLAUDE.md "Platform forcing").
"""

from __future__ import annotations

import os


def force_cpu_if_requested(env_var: str = "BAYESGM_FORCE_CPU") -> bool:
    """Pin jax to CPU when ``env_var`` is set; returns True if forced.

    Call at the top of a benchmark ``main()`` (before the first jax device
    query) so ``BAYESGM_FORCE_CPU=1 python benchmarks/...`` smokes never grab
    the single shared TPU chip.
    """
    if not os.environ.get(env_var):
        return False
    import jax

    jax.config.update("jax_platforms", "cpu")
    return True
