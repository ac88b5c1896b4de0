from .loaders import (flatten_stack, load_matrix, load_movielens,
                      load_newsgroups_tfidf)
from .sparse_panels import PanelStream, densify
from .synthetic import lowrank_dense, movielens_like, sparse_csr, tfidf_like

__all__ = [
    "load_matrix",
    "load_movielens",
    "load_newsgroups_tfidf",
    "flatten_stack",
    "lowrank_dense",
    "tfidf_like",
    "movielens_like",
    "sparse_csr",
    "PanelStream",
    "densify",
]
