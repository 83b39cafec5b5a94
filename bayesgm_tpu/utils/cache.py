"""Persistent XLA compilation cache setup.

TPU compiles of the big scan bodies take minutes and, in this environment,
are not shared across processes by default.  Enabling JAX's persistent cache
makes repeat experiments start in seconds.  Idempotent and safe to call from
every model constructor; silently no-ops if the backend is already
initialized with conflicting settings.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
    os.path.expanduser("~"), ".cache", "bayesgm_tpu_xla"
)

_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> bool:
    """Enable the persistent compilation cache (once per process)."""
    global _enabled
    if _enabled:
        return True
    try:
        import jax

        path = cache_dir or _DEFAULT_DIR
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        _enabled = True
        return True
    except Exception:
        return False
