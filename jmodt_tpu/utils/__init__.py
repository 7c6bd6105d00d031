"""Runtime utilities: compilation cache, profiling, logging, checkpointing."""

from jmodt_tpu.utils.runtime import (annotate, enable_compilation_cache,
                                     profile_trace)

__all__ = ['enable_compilation_cache', 'profile_trace', 'annotate']
