from .collectives import (
    gram_h,
    gram_h_rank,
    gram_w,
    reshard_cols_to_rows,
    reshard_rows_to_cols,
    ring_xht,
    ring_xht_rotate_h,
    wh_psum_rank,
    wtx_psum,
    xht_psum,
)
from .mesh import build_mesh, nmf_shardings, rank_shardings, shard_problem
from .ntf_sharded import ntf_sharded
from .sharded_solvers import mur_rank_sharded, mur_sharded, mur_ulysses
from .multihost import (
    assemble_global_columns,
    assert_collective_consistency,
    global_mesh,
    host_local_column_range,
    initialize_multihost,
)

__all__ = [
    "build_mesh",
    "nmf_shardings",
    "shard_problem",
    "gram_h",
    "gram_w",
    "xht_psum",
    "wtx_psum",
    "ring_xht",
    "ring_xht_rotate_h",
    "reshard_rows_to_cols",
    "reshard_cols_to_rows",
    "mur_ulysses",
    "mur_rank_sharded",
    "ntf_sharded",
    "mur_sharded",
    "wh_psum_rank",
    "gram_h_rank",
    "rank_shardings",
    "initialize_multihost",
    "global_mesh",
    "host_local_column_range",
    "assemble_global_columns",
    "assert_collective_consistency",
]
