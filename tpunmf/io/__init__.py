from .checkpoint import (checkpoint_exists, checkpoint_exists_orbax,
                         load_state, load_state_orbax, save_state,
                         save_state_orbax)
from .npz import load_results, save_results

__all__ = [
    "save_results",
    "load_results",
    "save_state",
    "load_state",
    "checkpoint_exists",
    "checkpoint_exists_orbax",
    "save_state_orbax",
    "load_state_orbax",
]
