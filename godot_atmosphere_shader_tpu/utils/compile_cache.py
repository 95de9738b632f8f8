"""Persistent XLA/Mosaic compile cache shared by the CLI and the tools.

Repeat invocations (CLI renders, bench runs, verification passes) skip the
multi-second first compile — on the tunneled setup the compile service
round-trip dominates cold starts.  Public home for what used to be
``cli._enable_compile_cache`` (ADVICE r3: tools should not import a
leading-underscore helper and mutate jax config at module import).
"""

from __future__ import annotations

import os


def enable_compile_cache() -> None:
    """Point jax's persistent compilation cache at a writable directory.

    Safe to call repeatedly; silently no-ops when the directory can't be
    created or the running jax lacks the config knobs.
    """
    import jax

    cache_dir = os.environ.get(
        "ATMO_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "atmo_jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (OSError, AttributeError):
        pass
