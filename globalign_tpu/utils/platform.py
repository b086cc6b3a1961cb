"""Platform/runtime knobs for the device engine.

The single-pair CLI is a fresh process per invocation; without a persistent
compilation cache every run pays the full XLA compile (minutes on a remote
TPU tunnel).  Enabling JAX's on-disk cache makes repeat CLI invocations with
the same shapes near-instant after the first.
"""

from __future__ import annotations

import os
from pathlib import Path

_CACHE_ENABLED = False


def enable_compilation_cache(cache_dir: str | os.PathLike | None = None) -> None:
    """Turn on JAX's persistent compilation cache (idempotent).

    Honors ``GLOBALIGN_TPU_CACHE_DIR``; defaults to
    ``~/.cache/globalign_tpu/xla``.  Set ``GLOBALIGN_TPU_NO_CACHE=1`` to skip.
    """
    global _CACHE_ENABLED
    if _CACHE_ENABLED or os.environ.get("GLOBALIGN_TPU_NO_CACHE"):
        return
    import jax

    # CPU executables are AOT-compiled for the exact host CPU; a
    # persistent cache read back on a migrated VM can SIGILL (dev
    # machines here move between hosts).  CPU compiles are seconds —
    # cache only the remote-accelerator binaries, which cost minutes.
    # The configured-platform string is checked FIRST so that callers
    # who opted out of the accelerator (jax.config jax_platforms="cpu",
    # the axon-proof opt-out) are honored without initializing a
    # backend; only when no explicit platform is set does this probe
    # (and thereby lock in) the default backend.
    try:
        plats = jax.config.jax_platforms
        if plats and plats.split(",")[0].strip() == "cpu":
            return
        if jax.default_backend() == "cpu":
            return
    except Exception:
        return

    path = Path(
        cache_dir
        or os.environ.get("GLOBALIGN_TPU_CACHE_DIR")
        or Path.home() / ".cache" / "globalign_tpu" / "xla"
    )
    try:
        path.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        # Cache is an optimization only — never fail an alignment over it.
        return
    _CACHE_ENABLED = True
