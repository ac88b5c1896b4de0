from .admm import admm
from .anls import anls
from .beta import beta_divergence, mur_beta
from .convex import convex_nmf
from .ao_admm import ao_admm
from .gnmf import gnmf, knn_graph
from .hals import hals
from .masked import mur_masked
from .online import OnlineNMF, online_nmf
from .onmf import onmf, orthogonality_residual
from .semi import semi_nmf
from .mur import mur
from .nmtf import nmtf
from .ntf import NtfResults, cp_reconstruct, mttkrp, ntf
from .robust import robust_nmf
from .multilevel import multilevel, mur_multilevel
from .streaming import mur_streaming
from .symnmf import symnmf
from .transform import inverse_transform, transform
from .streaming_sharded import mur_streaming_sharded

__all__ = [
    "mur",
    "mur_beta",
    "beta_divergence",
    "anls",
    "admm",
    "convex_nmf",
    "ao_admm",
    "hals",
    "gnmf",
    "knn_graph",
    "mur_masked",
    "multilevel",
    "nmtf",
    "ntf",
    "NtfResults",
    "mttkrp",
    "cp_reconstruct",
    "mur_multilevel",
    "onmf",
    "orthogonality_residual",
    "OnlineNMF",
    "online_nmf",
    "robust_nmf",
    "semi_nmf",
    "mur_streaming",
    "symnmf",
    "transform",
    "inverse_transform",
    "mur_streaming_sharded",
]
