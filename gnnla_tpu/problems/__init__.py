from gnnla_tpu.problems.laplacian import (laplacian_2d, laplacian_nd,
                                          grid_coords_2d)
from gnnla_tpu.problems.fem_heateqn import (heateqn_fem_2d,
                                            stretched_mesh_matrix)
from gnnla_tpu.problems.quad_fem import build_matrix_quads, structured_quads
from gnnla_tpu.problems.small_band import small_band_matrix
from gnnla_tpu.problems.diffusion_fem import (constant_diffusion_matrix,
                                              cosine_diffusion_matrix,
                                              alpha_beta_targets,
                                              cosine_field, constant_field)

__all__ = ["laplacian_2d", "laplacian_nd", "grid_coords_2d",
           "heateqn_fem_2d", "stretched_mesh_matrix", "build_matrix_quads",
           "structured_quads", "small_band_matrix",
           "constant_diffusion_matrix", "cosine_diffusion_matrix",
           "alpha_beta_targets", "cosine_field", "constant_field"]
