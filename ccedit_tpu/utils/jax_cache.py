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


def cpu_fingerprint() -> str:
    """Short hash of the host CPU's identity.  XLA:CPU AOT cache entries
    embed the compile machine's target features and either ABORT
    (SIGILL-class 'Fatal Python error') or raise 'Machine type used for
    XLA:CPU compilation doesn't match' when loaded on a different host —
    and cache keys do NOT include them, so a cache volume that survives a
    container migration between heterogeneous hosts poisons every
    CPU-backend process.  Observed twice this round: first a feature-set
    change, then a SapphireRapids→EmeraldRapids move with an IDENTICAL
    /proc/cpuinfo flags line where only LLVM's model-derived tuning bits
    (+prefer-no-gather/+prefer-no-scatter) differed — so the fingerprint
    must cover vendor/family/model/stepping (the exact inputs of LLVM's
    getHostCPUName), not just the flags line.  TPU entries are target-keyed
    by the compile service and are safe to share."""
    import hashlib
    import platform

    txt = platform.machine()
    want = ("flags", "Features", "vendor_id", "cpu family", "model",
            "stepping", "CPU implementer", "CPU part")
    seen = set()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in want and key not in seen:
                    seen.add(key)
                    txt += line
                if len(seen) == len(want) or line.strip() == "":
                    break  # first core's block is enough
    except OSError:
        pass
    return hashlib.sha1(txt.encode()).hexdigest()[:10]


def cache_dir_for_backend(base: str | None = None) -> str:
    """The persistent-cache directory: shared for TPU, per-CPU-fingerprint
    for the CPU backend (see cpu_fingerprint)."""
    import jax

    base = base or os.environ.get("CCEDIT_JAX_CACHE") or DEFAULT_CACHE_DIR
    if jax.default_backend() == "cpu":
        return f"{base}_cpu_{cpu_fingerprint()}"
    return base


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir`` (default
    ``~/.cache/jax_cc``, overridable via ``CCEDIT_JAX_CACHE``; CPU backend
    gets a per-host-fingerprint suffix).  Returns the directory used."""
    global _enabled
    import jax

    d = cache_dir_for_backend(cache_dir)
    if _enabled:
        return d
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    # persist EVERY program, however fast it compiled.  The pipeline
    # dispatches ~280 programs per clip and ~140 of them compile under the
    # old 0.5 s threshold — so they were re-compiled by every process, each
    # paying a remote-compile RPC round trip on the tunneled backend at
    # highly variable latency (measured round 5: identical warm requests
    # spent 400-1800 s on ~140 sub-threshold fresh compiles, while cache
    # RETRIEVAL of the same count costs ~10 s total).  Disk cost of the tiny
    # entries is negligible next to the multi-GB sampler programs.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _enabled = True
    return d
