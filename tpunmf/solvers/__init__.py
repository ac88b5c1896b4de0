from .admm import admm
from .anls import anls
from .ao_admm import ao_admm
from .mur import mur

__all__ = ["mur", "anls", "admm", "ao_admm"]
