from gnnla_tpu.core.graph import GraphState, GraphBatch, columns
from gnnla_tpu.core.block import (GNBlock, EdgeAggregator, NodeAggregator,
                                  make_edge_aggregator, chain)
from gnnla_tpu.core.convert import (as_operator, coo_to_gnn_input,
                                    remove_diag_entries, matrix_to_graph,
                                    graph_to_matrix, graph_state_from_matrix)
from gnnla_tpu.core.batch import (batch_operators, batch_states,
                                  graph_sizes, unbatch_vertices)

__all__ = ["GraphState", "GraphBatch", "columns", "GNBlock",
           "EdgeAggregator", "NodeAggregator", "make_edge_aggregator", "chain", "as_operator",
           "coo_to_gnn_input", "remove_diag_entries", "matrix_to_graph",
           "graph_to_matrix", "graph_state_from_matrix", "batch_operators",
           "batch_states", "graph_sizes", "unbatch_vertices"]
