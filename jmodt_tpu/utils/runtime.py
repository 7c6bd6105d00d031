"""Runtime knobs.

This environment's XLA compiles are latency-bound (remote compile service),
so the persistent compilation cache is the difference between ~13 s and
~0.9 s per program.  Every entry point (tests, tools, bench) calls
`enable_compilation_cache()` once at startup.
"""

from __future__ import annotations

import os

_DEFAULT_CACHE = os.path.expanduser('~/.cache/jmodt_tpu/xla')


def apply_platform_override() -> None:
    """Honor `JMODT_PLATFORM` (e.g. `cpu`) at tool startup.

    On hosts where a sitecustomize imports jax and forces `JAX_PLATFORMS`
    before user code runs, the env var is pre-empted — but backends
    initialize lazily, so flipping the config knob at main() still works
    (same mechanism as tests/conftest.py).  Lets every tools/ CLI run on
    the CPU backend (`JMODT_PLATFORM=cpu python tools/train.py --small ...`)
    without touching the TPU relay."""
    plat = os.environ.get('JMODT_PLATFORM')
    if plat:
        import jax
        jax.config.update('jax_platforms', plat)


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable the persistent XLA compilation cache — TPU only.

    On the CPU backend (jax 0.9) the cache persists AOT machine code whose
    target-feature check fails on reload (cpu_aot_loader.cc warns
    "+prefer-no-scatter ... could lead to execution errors such as SIGILL")
    and large sharded executables then abort the process, so CPU runs
    (tests, the virtual-mesh dryrun, CPU tool invocations) must compile
    fresh."""
    import jax
    if jax.default_backend() != 'tpu':
        return
    cache_dir = path or os.environ.get('JMODT_XLA_CACHE', _DEFAULT_CACHE)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)


class profile_trace:
    """Context manager around `jax.profiler` tracing — the observability
    upgrade over the reference's wall-clock-only timing
    (tools/eval.py:387-400).  View with TensorBoard or Perfetto.

    Usage::

        with profile_trace('/tmp/jmodt-trace'):
            run_frames()
    """

    def __init__(self, log_dir: str):
        self.log_dir = log_dir

    def __enter__(self):
        import jax
        jax.profiler.start_trace(self.log_dir)
        return self

    def __exit__(self, *exc):
        import jax
        jax.profiler.stop_trace()
        return False


def annotate(name: str):
    """Named trace region (jax.profiler.TraceAnnotation) for host-side
    phases of the pipeline (data loading, solvers, file IO)."""
    import jax
    return jax.profiler.TraceAnnotation(name)
