from gnnla_tpu.models.matvec import matvec, matvec_gnn, MatVecBlock
from gnnla_tpu.models.residual import residual, residual_gnn, ResidualBlock
from gnnla_tpu.models.norm import (
    matrix_weighted_norm, matrix_weighted_norm_gnn, WeightedNormBlock)
from gnnla_tpu.models.jacobi import jacobi, jacobi_gnn, JacobiBlock
from gnnla_tpu.models.chebyshev import chebyshev, chebyshev_gnn
from gnnla_tpu.models.power_method import power_method, power_method_gnn
from gnnla_tpu.models.soc import soc_classic, soc_sa, soc_classic_blocks
from gnnla_tpu.models.direct_interp import direct_interp
from gnnla_tpu.models.geometric import (GeometricVCycle,
    make_geometric_vcycle)
from gnnla_tpu.models.vcycle import (TwoGridSetup, setup_twogrid,
    setup_with_dia, setup_with_stream, setup_with_stream_p,
    setup_auto, AutoTwoGrid,
    vcycle, solve, StencilVCycle,
    make_stencil_vcycle)
from gnnla_tpu.models.multigrid import (MultigridSetup, setup_multigrid,
    setup_sa_multigrid, setup_with_dia_multigrid, multigrid_cycle,
    multigrid_solve)
from gnnla_tpu.models.krylov import cg, amg_pcg, mg_pcg

__all__ = [
    "matvec", "matvec_gnn", "MatVecBlock",
    "residual", "residual_gnn", "ResidualBlock",
    "matrix_weighted_norm", "matrix_weighted_norm_gnn", "WeightedNormBlock",
    "jacobi", "jacobi_gnn", "JacobiBlock",
    "chebyshev", "chebyshev_gnn",
    "power_method", "power_method_gnn",
    "soc_classic", "soc_sa", "soc_classic_blocks",
    "direct_interp",
    "TwoGridSetup", "setup_twogrid", "setup_with_dia",
    "setup_with_stream", "setup_with_stream_p", "setup_auto", "AutoTwoGrid", "vcycle", "solve",
    "StencilVCycle", "make_stencil_vcycle",
    "GeometricVCycle", "make_geometric_vcycle",
    "cg", "amg_pcg", "mg_pcg",
    "MultigridSetup", "setup_multigrid", "setup_sa_multigrid",
    "setup_with_dia_multigrid",
    "multigrid_cycle",
    "multigrid_solve",
]
