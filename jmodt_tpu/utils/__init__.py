"""Runtime utilities: compilation cache, logging, checkpointing."""

from jmodt_tpu.utils.runtime import enable_compilation_cache

__all__ = ['enable_compilation_cache']
