"""Device-mesh parallelism utilities."""

from jmodt_tpu.parallel.mesh import (batch_sharding, data_parallel_sharding,
                                     make_mesh, make_mesh_2d,
                                     put_replicated,
                                     replicated_sharding, shard_batch)

__all__ = ['make_mesh', 'make_mesh_2d', 'shard_batch', 'batch_sharding',
           'data_parallel_sharding', 'replicated_sharding',
           'put_replicated']
