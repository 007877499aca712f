from foodrec_tpu.ops.graph import (  # noqa: F401
    NormalizedAdjacency,
    row_normalized_adjacency,
    sym_normalized_adjacency,
)
from foodrec_tpu.ops.spmm import Propagator, spmm_coo, spmm_ell  # noqa: F401
