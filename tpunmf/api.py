"""Public facade: the ``NMF`` class.

API contract mirrors the reference class (reference: nmf/nmf.py:7-135):
``NMF(data, factors, saving=True, param_file=None)``, string-dispatched
``factorize`` over {mur, anls, admm, ao_admm}, and ``save_factorization``
with the identical parameter-encoded default file-name grammar
(nmf/nmf.py:95-126).

Deviations (documented contract fixes / additions):
  * ``.w`` / ``.h`` properties exist, honoring the documented contract the
    reference breaks (its docstring promises them at nmf/nmf.py:11-12 /
    README.md:22 but never sets them — factors only live on ``.results``).
  * A param file's ``method_params`` are actually applied by ``factorize``
    (the reference loads them at nmf/nmf.py:38-45 but never consults them).
  * ``load_factorization`` restores a saved run (no load path exists in the
    reference).
  * ``mesh=...`` forwards device-mesh sharding to the solvers.
"""
from __future__ import annotations

import os
from importlib import import_module

from .core.types import Results
from .io.npz import load_results, save_results


# the single source of truth for factorize()'s dispatch — validated up
# front and used to build the unknown-method error message, so it cannot
# drift from the real dispatch list (tests/test_api.py pins the set)
_METHODS = ("mur", "anls", "admm", "ao_admm", "hals", "semi_nmf", "onmf",
            "ntf", "robust")


class NMF:
    """Non-negative matrix factorization using MUR, ANLS, ADMM or AO-ADMM.

    Example:
        >>> from tpunmf import NMF
        >>> model = NMF(data, factors)
        >>> model.factorize(method="mur", **method_params)
        >>> print(model.w, model.h)
    """

    def __init__(self, data=None, factors=None, saving=True, param_file=None,
                 mesh=None):
        self.data = data
        self.factors = factors
        self.saving = saving
        self.results = None
        self.method_params = {}
        self.mesh = mesh
        if mesh is not None and data is not None:
            from .parallel import shard_problem

            self.data = shard_problem(mesh, data)

        if param_file is not None:
            try:
                parameters = import_module(param_file)
            except ImportError:
                print("No parameter file found.")
                return
            self.method_params = dict(parameters.method_params)

    # factors as documented attributes (contract fix vs reference);
    # getattr because N-way (ntf) results carry .factors instead of .w/.h
    @property
    def w(self):
        return None if self.results is None else getattr(self.results, "w", None)

    @property
    def h(self):
        return None if self.results is None else getattr(self.results, "h", None)

    # sklearn-style aliases (migration convenience)
    @property
    def components_(self):
        """sklearn alias: the (k, n) coefficient matrix H."""
        return self.h

    @property
    def reconstruction_err_(self):
        """sklearn alias: the final recorded objective value."""
        if self.results is None:
            return None
        return float(self.results.obj_history[-1])

    def factorize(self, method: str = "mur", saving: bool = False, **method_params):
        """Compute the factorization.

        Possible methods: mur, anls, admm, ao_admm.  Keyword parameters are
        forwarded to the solver (same names and defaults as the reference
        solvers); parameters from a ``param_file`` are applied first and
        overridden by explicit kwargs.
        """
        if method not in _METHODS:
            raise Exception("Method not known. Choose one from: "
                            + " ".join(_METHODS))
        params = {**self.method_params, **method_params}

        # multilevel warm start (arXiv:1009.0881) rides any mur/hals fit:
        # factorize(method='hals', multilevel={'levels': 2, 'factor': 4})
        ml = params.pop("multilevel", None)
        if ml is not None:
            if method not in ("mur", "hals"):
                raise ValueError("multilevel= supports methods mur and hals")
            from .solvers import multilevel as _multilevel

            ml = dict(ml) if not isinstance(ml, bool) else {}
            self.results = _multilevel(self.data, self.factors,
                                       method=method, **ml, **params)
            print("Factorization done.")
            if saving:
                self.save_factorization()
            return self.results

        if method == "mur":
            # routing extensions (each None-valued key is simply ignored):
            # schedule= -> explicit-collective layouts, beta= -> generalized
            # beta-divergence, mask= -> masked/weighted factorization
            schedule = params.pop("schedule", None)
            beta = params.pop("beta", None)
            mask = params.pop("mask", None)
            chosen = [n for n, v in (("schedule", schedule), ("beta", beta),
                                     ("mask", mask)) if v is not None]
            if len(chosen) > 1:
                raise ValueError(
                    f"{' and '.join(chosen)} are mutually exclusive")
            if schedule is not None:
                from .parallel import mur_sharded as _mur_sharded

                mesh = params.pop("mesh", self.mesh)
                if mesh is None:
                    raise ValueError(
                        "schedule= requires a mesh (NMF(..., mesh=...) or "
                        "factorize(..., mesh=...))")
                self.results = _mur_sharded(self.data, self.factors, mesh,
                                            schedule=schedule, **params)
            elif beta is not None:
                from .solvers import mur_beta as _mur_beta

                self.results = _mur_beta(self.data, self.factors, beta=beta,
                                         **params)
            elif mask is not None:
                from .solvers import mur_masked as _mur_masked

                self.results = _mur_masked(self.data, mask, self.factors,
                                           **params)
            else:
                from .solvers import mur as _mur

                self.results = _mur(self.data, self.factors, **params)
        elif method == "anls":
            from .solvers import anls as _anls

            self.results = _anls(self.data, self.factors, **params)
        elif method == "admm":
            from .solvers import admm as _admm

            self.results = _admm(self.data, self.factors, **params)
        elif method == "ao_admm":
            from .solvers import ao_admm as _ao_admm

            self.results = _ao_admm(self.data, self.factors, **params)
        elif method == "hals":
            # beyond-reference: accelerated hierarchical ALS (EU objective)
            from .solvers import hals as _hals

            self.results = _hals(self.data, self.factors, **params)
        elif method == "semi_nmf":
            # beyond-reference: mixed-sign data, W free / H >= 0
            from .solvers import semi_nmf as _semi_nmf

            self.results = _semi_nmf(self.data, self.factors, **params)
        elif method == "onmf":
            # beyond-reference: orthogonality-constrained clustering NMF
            from .solvers import onmf as _onmf

            self.results = _onmf(self.data, self.factors, **params)
        elif method == "robust":
            # beyond-reference: l2,1-norm objective, outlier-resistant
            from .solvers import robust_nmf as _robust

            self.results = _robust(self.data, self.factors, **params)
        else:
            # validated above, so this branch is ntf — beyond-reference
            # native CP/PARAFAC for N-way data (the legacy CLI instead
            # flattened 3-D stacks to 2-D, reference: nmf/nmf_old.py:40-42)
            from .solvers import ntf as _ntf

            self.results = _ntf(self.data, self.factors, **params)

        print("Factorization done.")
        if saving:
            self.save_factorization()
        return self.results

    def fit(self, method: str = "mur", **method_params) -> "NMF":
        """sklearn-style convenience: factorize and return self."""
        self.factorize(method=method, **method_params)
        return self

    def fit_transform(self, method: str = "mur", **method_params):
        """sklearn-style convenience: factorize and return W (the
        sample-by-component representation, matching sklearn's NMF).
        For ``method='ntf'`` this is the mode-0 factor."""
        self.factorize(method=method, **method_params)
        return self.w if self.w is not None else self.results.factors[0]

    def transform(self, data, **opts):
        """Encode new data against the trained basis W (k x n_new).

        EU: exact batched NNLS; KL: fixed-W MUR iterations.  Defaults to
        the distance the model was trained with.  (Inference step — not
        present in the reference.)
        """
        if self.results is None:
            raise RuntimeError("Nothing trained: call factorize() first.")
        if self.w is None:
            raise RuntimeError(
                "transform() needs a 2-D basis; the trained model is an "
                "N-way CP factorization (use its .factors directly).")
        from .solvers import transform as _transform

        # beta-divergence fits record tags like 'is'/'beta0.5' that the
        # encoder doesn't implement — fall back to the exact EU NNLS encode
        trained = getattr(self.results.experiment, "distance_type", "eu")
        opts.setdefault("distance_type",
                        trained if trained in ("eu", "kl") else "eu")
        return _transform(self.results.w, data, **opts)

    def inverse_transform(self, h):
        """Reconstruct data from coefficients: W @ h."""
        if self.results is None:
            raise RuntimeError("Nothing trained: call factorize() first.")
        if self.w is None:
            raise RuntimeError(
                "inverse_transform() needs a 2-D basis; the trained model "
                "is an N-way CP factorization (use cp_reconstruct on its "
                ".factors).")
        from .solvers import inverse_transform as _inv

        return _inv(self.results.w, h)

    def default_save_name(self) -> str:
        """Parameter-encoded save name, grammar-identical to nmf/nmf.py:95-126."""
        exp = self.results.experiment
        if exp.method == "ntf":
            # no reference grammar exists for tensors; keep it parameter-
            # encoding in the same spirit
            return (f"ntf_{exp.components}_{exp.distance_type}_{exp.update}"
                    + "_" + "x".join(str(len(f)) for f in self.results.factors))
        save_name = f"nmf_{exp.method}"
        save_name += f"_{self.factors}"
        save_name += f"_{exp.distance_type}"
        if exp.method == "admm":
            save_name += f"_{exp.rho}"

        save_name += f"_{exp.lambda_w}"
        if exp.method in {"admm", "ao_admm"}:
            save_name += f":{exp.prox_w}"

        save_name += f"_{exp.lambda_h}"
        if exp.method in {"admm", "ao_admm"}:
            save_name += f":{exp.prox_h}"

        if exp.nndsvd_init[0]:
            save_name += f"_nndsvd{exp.nndsvd_init[1][0]}"
        else:
            save_name += "_random"

        if exp.method == "anls" and exp.fcnnls:
            save_name += "_fcnnls"
        return save_name

    def save_factorization(self, save_dir: str = "./results", save_name=None) -> str:
        """Save factorization to file (reference-compatible .npz layout)."""
        if self.results is None:
            raise RuntimeError("Nothing to save: call factorize() first.")
        os.makedirs(save_dir, exist_ok=True)
        if save_name is None:
            save_name = self.default_save_name()
        save_str = os.path.join(save_dir, save_name)
        if getattr(self.results.experiment, "method", None) == "ntf":
            from .io.npz import save_ntf_results

            return save_ntf_results(
                save_str,
                factors=self.results.factors,
                i=self.results.i,
                obj_history=self.results.obj_history,
                experiment=self.results.experiment._asdict(),
            )
        return save_results(
            save_str,
            w=self.results.w,
            h=self.results.h,
            i=self.results.i,
            obj_history=self.results.obj_history,
            experiment=self.results.experiment._asdict(),
        )

    @classmethod
    def load_factorization(cls, path: str) -> "NMF":
        """Restore a saved factorization (new capability vs reference).

        The experiment record is rebuilt as a namedtuple (files store it as
        a dict), so ``save_factorization`` / ``default_save_name`` work on
        a loaded model too.
        """
        from collections import namedtuple

        import numpy as _np

        # sniff the archive kind: ntf files carry factor0..N-1/n_modes
        # instead of w/h (written by save_ntf_results)
        p = path if str(path).endswith(".npz") else f"{path}.npz"
        with _np.load(p, allow_pickle=True) as f:
            is_ntf = "n_modes" in f.files

        if is_ntf:
            from .io.npz import load_ntf_results
            from .solvers import NtfResults

            payload = load_ntf_results(path)
            experiment = payload["experiment"]
            if isinstance(experiment, dict):
                exp_cls = namedtuple("Experiment", list(experiment.keys()))
                experiment = exp_cls(**experiment)
            obj = cls(data=None, factors=payload["factors"][0].shape[1])
            obj.results = NtfResults(
                factors=payload["factors"],
                i=payload["i"],
                obj_history=payload["obj_history"],
                experiment=experiment,
            )
            return obj

        payload = load_results(path)
        experiment = payload["experiment"]
        if isinstance(experiment, dict):
            exp_cls = namedtuple("Experiment", list(experiment.keys()))
            experiment = exp_cls(**experiment)
        obj = cls(data=None, factors=payload["w"].shape[1])
        obj.results = Results(
            w=payload["w"],
            h=payload["h"],
            i=payload["i"],
            obj_history=payload["obj_history"],
            experiment=experiment,
        )
        return obj
