"""Persistent XLA compilation cache.

TPU compilation in this image happens on a single host core and takes
minutes for the full pipeline; the on-disk cache makes every subsequent
process start warm. Call enable_compilation_cache() before compiling.
"""

from __future__ import annotations

import hashlib
import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")


def _machine_tag() -> str:
    """Short tag identifying this host's CPU capabilities.

    XLA:CPU cache entries embed AOT code compiled for the *compiling*
    host's CPU features; loading them on a host with different features
    logs per-entry "machine feature mismatch" errors and risks SIGILL
    (observed: a driver run on another machine spent its whole time budget
    failing to load this machine's cache entries). Keying the cache dir by
    CPU-feature hash makes each machine type warm its own cache.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:10]


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("DEVC_JAX_CACHE", _DEFAULT_DIR)
    path = os.path.join(path, _machine_tag())
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
