"""Persistent XLA compilation cache for the TPU pipelines.

The fused prover / MSM programs are large (tens of thousands of HLO ops at
2^20 points); their first compile on the axon TPU backend costs minutes.
JAX's persistent compilation cache keys on (program, flags, backend,
jax version), so a warm on-disk cache turns those minutes into seconds for
every later process — the CLI, the bench driver, and repeated test runs.

Call :func:`enable_compile_cache` before building any engine.  Disabled with
``GOSNARK_NO_CACHE=1``; the directory defaults to ``<repo>/.jax_cache`` and
can be moved with ``GOSNARK_CACHE_DIR``.
"""

from __future__ import annotations

import os

_ACTIVE_DIR: str | None = None


def default_cache_dir() -> str:
    return os.environ.get(
        "GOSNARK_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )


def enable_compile_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``path`` (idempotent;
    a second call with a DIFFERENT explicit path re-points the cache).

    Returns the active cache directory, or None when disabled via env."""
    global _ACTIVE_DIR
    if os.environ.get("GOSNARK_NO_CACHE", "") not in ("", "0"):
        return None
    path = path or default_cache_dir()
    if _ACTIVE_DIR == path:
        return _ACTIVE_DIR
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache even fast compiles: the bench pipeline has many medium programs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _ACTIVE_DIR = path
    return _ACTIVE_DIR
