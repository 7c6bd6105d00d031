"""Runtime knobs.

This environment's XLA compiles are latency-bound (remote compile service),
so the persistent compilation cache is the difference between ~13 s and
~0.9 s per program.  Every entry point (tests, tools, bench) calls
`enable_compilation_cache()` once at startup.
"""

from __future__ import annotations

import os

_DEFAULT_CACHE = os.path.expanduser('~/.cache/jmodt_tpu/xla')


def enable_compilation_cache(path: str | None = None) -> None:
    import jax
    cache_dir = path or os.environ.get('JMODT_XLA_CACHE', _DEFAULT_CACHE)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
