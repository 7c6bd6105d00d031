"""Runtime utilities: compilation cache, profiling, logging, checkpointing."""

from jmodt_tpu.utils.runtime import (annotate, apply_platform_override,
                                     enable_compilation_cache, profile_trace)

__all__ = ['enable_compilation_cache', 'profile_trace', 'annotate',
           'apply_platform_override']
