"""Parallelism: device meshes, batch sharding, point-sharded moments.

The reference's only parallelism is intra-node threads (8 pthreads with
per-voxel mutexes + OpenMP, SURVEY.md §2.3). Here scaling is expressed
TPU-natively: a jax.sharding.Mesh, batch sharded over a 'data' axis under
jit (XLA inserts gradient/BN collectives over ICI), and an exact
point-sharded moment reduction via shard_map + psum for clouds too large
for one chip.
"""
from ndtpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    init_distributed,
)
from ndtpu.parallel.point_sharded import (  # noqa: F401
    make_point_sharded_downsample,
    sharded_count_occupied,
    sharded_segment_moments,
)
