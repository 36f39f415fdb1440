"""JAX runtime configuration: persistent compilation cache.

First compilation of the SAM2/encoder programs costs tens of seconds; the
persistent cache makes subsequent processes start hot. Call early (before the
first jit execution). Safe to call multiple times.
"""

from __future__ import annotations

import os
from pathlib import Path

_DONE = False


def setup_jax_cache(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    path = Path(
        cache_dir
        or os.environ.get("ATLASPATCH_JAX_CACHE")
        or Path.home() / ".cache" / "atlaspatch_tpu" / "jax_cache"
    )
    try:
        path.mkdir(parents=True, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # noqa: BLE001  — cache is best-effort
        import logging

        logging.getLogger("atlaspatch_tpu.utils.jaxsetup").warning(
            "Persistent JAX compile cache disabled (%s: %s) — expect the "
            "multi-minute SAM2 recompile on every process start.",
            path,
            e,
        )
