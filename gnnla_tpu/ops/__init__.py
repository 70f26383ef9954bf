from gnnla_tpu.ops.sparse import SparseOperator
from gnnla_tpu.ops.segment import (
    segment_sum, segment_mean, segment_max, segment_min,
    segment_reduce, multi_segment_reduce,
)

__all__ = ["SparseOperator", "segment_sum", "segment_mean", "segment_max",
           "segment_min", "segment_reduce", "multi_segment_reduce"]
