"""Persistent XLA compilation cache for user-facing entry points.

A cold compile of the SD-scale sampling program costs 130-900 s on the
tunneled remote-compile service (docs/PERF_r2.md); the persistent cache makes
every same-shape re-invocation skip it entirely.  ``bench.py`` always enabled
this — the CLIs must too (VERDICT r2 Weak #5).

Call ``enable_compilation_cache()`` once, before the first jit execution.
Safe to call multiple times or from multiple entry points.
"""

from __future__ import annotations

import os

_enabled = False

DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "jax_cc")


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir`` (default
    ``~/.cache/jax_cc``, overridable via ``CCEDIT_JAX_CACHE``).  Returns the
    directory used."""
    global _enabled
    import jax

    d = cache_dir or os.environ.get("CCEDIT_JAX_CACHE") or DEFAULT_CACHE_DIR
    if _enabled:
        return d
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    # cache everything that took meaningful compile time; the big sampler
    # programs take minutes, but even the VAE/annotator jits are worth it
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _enabled = True
    return d
