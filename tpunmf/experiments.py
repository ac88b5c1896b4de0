"""Experiment driver: parameter grid search over solver configurations.

Working replacement for the reference's broken legacy CLI
(reference: nmf/nmf_old.py — grid search over
``product(features, lambda_w, lambda_h)`` at nmf/nmf_old.py:52-54, data
loading at :28-42, parameter modules at :14-18).  Runs every combination,
optionally saves each result with the standard name grammar, and returns
the Results records.
"""
from __future__ import annotations

from itertools import product
from typing import Iterable, Sequence

from .api import NMF


def grid_search(
    data,
    *,
    method: str = "mur",
    features: Sequence[int] = (10,),
    lambda_w: Sequence[float] = (0.0,),
    lambda_h: Sequence[float] = (0.0,),
    save_dir: str | None = None,
    **fixed_params,
) -> list:
    """Run a factorization for every (k, lambda_w, lambda_h) combination.

    Mirrors the legacy CLI's loop (nmf/nmf_old.py:52-54) with the modern
    API; extra solver kwargs are passed through unchanged.  Returns a list
    of (params_dict, Results).
    """
    out = []
    for k, lw, lh in product(features, lambda_w, lambda_h):
        model = NMF(data, k)
        params = dict(lambda_w=lw, lambda_h=lh, **fixed_params)
        if method in ("admm", "ao_admm"):
            # map scalar lambdas onto the (value, type) reg tuples
            # fallback types match the solvers' own defaults
            # (admm/ao_admm: reg_w=(0,'nn'), reg_h=(0,'l2n'))
            reg_w = fixed_params.get("reg_w", (lw, "nn"))
            reg_h = fixed_params.get("reg_h", (lh, "l2n"))
            params = {k_: v for k_, v in fixed_params.items()
                      if k_ not in ("reg_w", "reg_h")}
            params.update(reg_w=(lw, reg_w[1]), reg_h=(lh, reg_h[1]))
        results = model.factorize(method=method, **params)
        if save_dir is not None:
            model.save_factorization(save_dir=save_dir)
        out.append((dict(k=k, lambda_w=lw, lambda_h=lh), results))
    return out


def run_param_file(data, factors: int, param_module: str, method: str = "mur"):
    """Factorize using a parameter module exposing ``method_params``
    (the reference's param_file mechanism, nmf/nmf.py:38-45, actually
    applied here)."""
    model = NMF(data, factors, param_file=param_module)
    return model.factorize(method=method)
