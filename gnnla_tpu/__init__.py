"""gnnla_tpu — a TPU-native graph-network framework for applied linear algebra.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
sandialabs/gnn-applied-linear-algebra (reference mounted at /root/reference):
classical sparse linear-algebra kernels (SpMV, residual, weighted norms,
Jacobi/Chebyshev relaxation, the power method, AMG strength-of-connection,
direct interpolation and a two-grid V-cycle) expressed as Graph Network
blocks (Battaglia et al. 2018), plus two learned model families
(trainable Jacobi diagonal, diffusion-coefficient recovery).

Design stance (not a port):
  * one functional GN-block engine (`gnnla_tpu.core.block`) instead of one
    MetaLayer instantiation per kernel,
  * sparse matrices as HBM-resident, jit-compatible pytrees
    (`gnnla_tpu.ops.sparse.SparseOperator`),
  * neighborhood aggregation as fused gather/segment reductions
    (`gnnla_tpu.ops.segment`) with a Pallas ELL SpMV fast path,
  * iteration via `lax.scan`, global reductions via `psum`-ready sums,
  * distribution via `jax.sharding.Mesh` + `shard_map` row partitioning
    (`gnnla_tpu.parallel`).
"""

from gnnla_tpu.ops.sparse import SparseOperator
from gnnla_tpu.core.graph import GraphState
from gnnla_tpu.core.block import GNBlock, EdgeAggregator, NodeAggregator

__version__ = "0.1.0"

__all__ = [
    "SparseOperator",
    "GraphState",
    "GNBlock",
    "EdgeAggregator",
    "NodeAggregator",
]
