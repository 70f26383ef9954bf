from gnnla_tpu.parallel.partition import (
    PartitionedOperator, partition_rows, shard_vector, unshard_vector)
from gnnla_tpu.parallel.distributed import (initialize_distributed,
                                             global_row_mesh, grid_mesh,
                                             replicate_global, to_global)
from gnnla_tpu.parallel.krylov import make_sharded_mg_pcg
from gnnla_tpu.parallel.vcycle import (make_sharded_multigrid_cycle,
                                       make_sharded_stream_vcycle,
                                       make_sharded_vcycle,
                                       partition_rows_rect)
from gnnla_tpu.parallel.spmv import (
    make_sharded_matvec, make_sharded_jacobi, make_sharded_norm,
    make_sharded_power_method, device_put_sharded)
from gnnla_tpu.parallel.stencil import (
    make_sharded_stencil_matvec, make_sharded_stencil_jacobi,
    shard_planes, shard_vec2d, stencil_scaling_model)
from gnnla_tpu.parallel.stream import (ShardedStreamSpMV,
                                       build_sharded_stream,
                                       stream_scaling_model)

__all__ = ["PartitionedOperator", "partition_rows", "shard_vector",
           "unshard_vector", "make_sharded_matvec", "make_sharded_jacobi",
           "make_sharded_norm", "make_sharded_power_method", "device_put_sharded",
           "initialize_distributed", "global_row_mesh", "grid_mesh",
           "to_global", "replicate_global",
           "make_sharded_vcycle", "make_sharded_stream_vcycle",
           "make_sharded_multigrid_cycle", "make_sharded_mg_pcg",
           "partition_rows_rect",
           "make_sharded_stencil_matvec", "make_sharded_stencil_jacobi",
           "shard_planes", "shard_vec2d", "stencil_scaling_model",
           "ShardedStreamSpMV", "build_sharded_stream",
           "stream_scaling_model"]
