from .nndsvd import nndsvd
from .random import random_init
from .rsvd import randomized_svd

__all__ = ["nndsvd", "random_init", "randomized_svd"]
