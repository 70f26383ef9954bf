from gnnla_tpu.core.graph import GraphState, GraphBatch, columns
from gnnla_tpu.core.block import GNBlock, EdgeAggregator, NodeAggregator, chain

__all__ = ["GraphState", "GraphBatch", "columns", "GNBlock",
           "EdgeAggregator", "NodeAggregator", "chain"]
