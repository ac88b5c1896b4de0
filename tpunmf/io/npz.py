"""Reference-compatible .npz persistence, plus the load path the reference lacks.

Save layout matches reference ``save_results`` (reference: nmf/utils.py:96-105):
``np.savez(save_str, w=w, h=h, i=i, obj_history=obj_history, experiment=exp)``
where ``experiment`` is the experiment-record dict.  The reference has no
loader at all (SURVEY §5 'No load/resume path'); ``load_results`` adds one
that round-trips both our files and files written by the reference.
"""
from __future__ import annotations

import numpy as np


def save_results(save_str: str, w, h, i, obj_history, experiment) -> str:
    """Save factorization results; returns the path written."""
    np.savez(save_str, w=np.asarray(w), h=np.asarray(h), i=i,
             obj_history=np.asarray(obj_history), experiment=experiment)
    path = save_str if str(save_str).endswith(".npz") else f"{save_str}.npz"
    print("Results saved in {}.".format(save_str))
    return path


def save_ntf_results(save_str: str, factors, i, obj_history, experiment) -> str:
    """Save an N-way CP factorization (keys ``factor0..factorN-1``).

    Same envelope as :func:`save_results` (i/obj_history/experiment), but
    the factor list replaces w/h — there is no reference format to match
    (the reference has no tensor path).
    """
    payload = {f"factor{d}": np.asarray(f) for d, f in enumerate(factors)}
    np.savez(save_str, i=i, obj_history=np.asarray(obj_history),
             experiment=experiment, n_modes=len(factors), **payload)
    path = save_str if str(save_str).endswith(".npz") else f"{save_str}.npz"
    print("Results saved in {}.".format(save_str))
    return path


def load_ntf_results(path: str) -> dict:
    """Load an N-way CP factorization saved by :func:`save_ntf_results`."""
    if not str(path).endswith(".npz"):
        path = f"{path}.npz"
    with np.load(path, allow_pickle=True) as f:
        n = int(f["n_modes"])
        out = {
            "factors": [f[f"factor{d}"] for d in range(n)],
            "i": int(f["i"]),
            "obj_history": list(f["obj_history"]),
            "experiment": f["experiment"].item() if f["experiment"].shape == () else f["experiment"],
        }
    return out


def load_results(path: str) -> dict:
    """Load a results .npz (ours or the reference's) into a plain dict."""
    if not str(path).endswith(".npz"):
        path = f"{path}.npz"
    with np.load(path, allow_pickle=True) as f:
        out = {
            "w": f["w"],
            "h": f["h"],
            "i": int(f["i"]),
            "obj_history": list(f["obj_history"]),
            "experiment": f["experiment"].item() if f["experiment"].shape == () else f["experiment"],
        }
    return out
