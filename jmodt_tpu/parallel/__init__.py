"""Device-mesh parallelism utilities."""

from jmodt_tpu.parallel.mesh import (data_parallel_sharding, make_mesh,
                                     replicated_sharding, shard_batch)

__all__ = ['make_mesh', 'shard_batch', 'data_parallel_sharding',
           'replicated_sharding']
