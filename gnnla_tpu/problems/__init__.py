from gnnla_tpu.problems.laplacian import laplacian_2d, laplacian_nd, grid_coords_2d

__all__ = ["laplacian_2d", "laplacian_nd", "grid_coords_2d"]
