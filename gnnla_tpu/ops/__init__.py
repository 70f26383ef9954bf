from gnnla_tpu.ops.sparse import SparseOperator
from gnnla_tpu.ops.segment import (
    segment_sum, segment_mean, segment_max, segment_min,
    segment_reduce, multi_segment_reduce,
)
from gnnla_tpu.ops.band import (BandLayout, BandPattern, EllLayout,
                                EllPattern, GridBandLayout, GridPattern,
                                band_multi_reduce, band_neighbor_values,
                                band_spmv, choose_edge_layout,
                                ell_multi_reduce)
from gnnla_tpu.ops.dia import DIAOperator, to_dia, dia_transpose
from gnnla_tpu.ops.bsr import BSROperator, to_bsr, rcm_permutation, permute
from gnnla_tpu.ops.stream_op import StreamOperator, stream_operator

__all__ = ["SparseOperator", "segment_sum", "segment_mean", "segment_max",
           "segment_min", "segment_reduce", "multi_segment_reduce",
           "BandLayout", "BandPattern", "EllLayout", "EllPattern",
           "GridBandLayout", "GridPattern", "choose_edge_layout",
           "band_multi_reduce", "band_neighbor_values", "band_spmv",
           "ell_multi_reduce",
           "DIAOperator", "to_dia", "dia_transpose", "BSROperator",
           "to_bsr", "rcm_permutation", "permute",
           "StreamOperator", "stream_operator"]
