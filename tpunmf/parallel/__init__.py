from .collectives import gram_h, gram_w, ring_xht, wtx_psum, xht_psum
from .mesh import build_mesh, nmf_shardings, shard_problem

__all__ = [
    "build_mesh",
    "nmf_shardings",
    "shard_problem",
    "gram_h",
    "gram_w",
    "xht_psum",
    "wtx_psum",
    "ring_xht",
]
