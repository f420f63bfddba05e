from .sparse import (PaddedRowSparse, GatherRows, from_coo,
                     gather_op_from_idx, ell_matmul, ell_matmul_raw,
                     gather_rows, transpose_coo)
from .pool import pool, build_pool_operator, selection_indices
from .spiral_conv import (SpiralOp, build_spiral_op, spiral_conv,
                          init_spiral_conv, spiral_gather,
                          spiral_conv_out_gather)
from .distances import (nearest_dists_sq, chamfer_distance,
                        point_mesh_distance, sinkhorn_divergence)
from .eigh import laplacian_eigendecomposition, spectral_project, \
    spectral_reconstruct
