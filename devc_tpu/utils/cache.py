"""Persistent XLA compilation cache.

TPU compilation in this image happens on a single host core and takes
minutes for the full pipeline; the on-disk cache makes every subsequent
process start warm. Call enable_compilation_cache() before compiling.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("DEVC_JAX_CACHE", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
