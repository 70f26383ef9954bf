from gnnla_tpu.ops.sparse import SparseOperator
from gnnla_tpu.ops.segment import (
    segment_sum, segment_mean, segment_max, segment_min,
    segment_reduce, multi_segment_reduce,
)
from gnnla_tpu.ops.band import (BandLayout, BandPattern, GridBandLayout,
                                GridPattern, band_multi_reduce,
                                band_neighbor_values, band_spmv)
from gnnla_tpu.ops.dia import DIAOperator, to_dia, dia_transpose
from gnnla_tpu.ops.bsr import BSROperator, to_bsr, rcm_permutation, permute
from gnnla_tpu.ops.stream_op import StreamOperator, stream_operator

__all__ = ["SparseOperator", "segment_sum", "segment_mean", "segment_max",
           "segment_min", "segment_reduce", "multi_segment_reduce",
           "BandLayout", "BandPattern", "GridBandLayout", "GridPattern",
           "band_multi_reduce", "band_neighbor_values", "band_spmv",
           "DIAOperator", "to_dia", "dia_transpose", "BSROperator",
           "to_bsr", "rcm_permutation", "permute",
           "StreamOperator", "stream_operator"]
