"""Solver-state checkpointing and resume.

The reference only has commented-out mid-run saving and no load path at
all (reference: nmf/mur.py:138-140, nmf/admm.py:336-338; SURVEY §5
'Checkpoint / resume').  Here the full solver loop state — factors, duals,
iteration counter, objective trace — is a pytree (`LoopCarry`) saved
atomically every ``checkpoint_every`` iterations and restorable into a
freshly-initialized solver of the same configuration.  Restart-after-crash
is the appropriate elasticity mechanism for an iterative batch solver.
"""
from __future__ import annotations

import os
import tempfile

import jax
import numpy as np


def save_state(path: str, carry, meta: dict | None = None) -> str:
    """Atomically save a solver carry (any pytree of arrays) to .npz."""
    leaves = jax.tree_util.tree_leaves(carry)
    payload = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    payload["n_leaves"] = np.asarray(len(leaves))
    if meta is not None:
        payload["meta"] = np.asarray(meta, dtype=object)
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **payload)
        final = path if path.endswith(".npz") else path + ".npz"
        os.replace(tmp, final)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return final


def load_state(path: str, template, expected_meta=None):
    """Restore a carry saved by :func:`save_state` into the structure of
    ``template`` (a carry produced by the same solver configuration).

    When ``expected_meta`` is given and the checkpoint stored a meta
    record, the two must match — this rejects checkpoints written by a
    different solver configuration even when the array shapes happen to
    coincide (e.g. same problem, different regularization)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    with np.load(path, allow_pickle=True) as f:
        if expected_meta is not None and "meta" in f:
            stored = f["meta"].item()
            if stored != expected_meta:
                raise ValueError(
                    "checkpoint configuration mismatch: saved by "
                    f"{stored!r}, resuming as {expected_meta!r}"
                )
        n = int(f["n_leaves"])
        if n != len(t_leaves):
            raise ValueError(
                f"checkpoint has {n} leaves but solver state has "
                f"{len(t_leaves)} — configuration mismatch"
            )
        leaves = []
        for i, t in enumerate(t_leaves):
            arr = f[f"leaf_{i}"]
            t_arr = np.asarray(t)
            if arr.shape != t_arr.shape:
                raise ValueError(
                    f"checkpoint leaf {i} shape {arr.shape} != expected "
                    f"{t_arr.shape} — configuration mismatch"
                )
            leaves.append(arr.astype(t_arr.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def checkpoint_exists(path: str) -> bool:
    return os.path.exists(path if path.endswith(".npz") else path + ".npz")


# ---------------------------------------------------------------------------
# Orbax backend (optional): same carry surface, directory-based storage.
# Orbax brings async writes and multi-host-coordinated checkpointing for
# free, which matters once solvers run on real multi-host slices; the
# npz backend above stays the default (single-file, dependency-light).
# ---------------------------------------------------------------------------


def _orbax_dir(path: str) -> str:
    return os.path.abspath(path if path.endswith(".orbax") else path + ".orbax")


def save_state_orbax(path: str, carry, meta=None) -> str:
    """Save a solver carry through orbax (directory ``path + '.orbax'``)."""
    import json

    import orbax.checkpoint as ocp

    leaves = jax.tree_util.tree_leaves(carry)
    tree = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    d = _orbax_dir(path)
    with ocp.StandardCheckpointer() as ck:
        ck.save(d, tree, force=True)
        ck.wait_until_finished()
    # meta lands atomically AFTER the checkpoint is finalized; existence
    # checks key on this file, so a crash in the save window never leaves
    # a checkpoint that "exists" but cannot be loaded
    meta_tmp = os.path.join(d, ".tpunmf_meta.json.tmp")
    with open(meta_tmp, "w") as f:
        json.dump({"n_leaves": len(leaves), "meta": meta}, f)
    os.replace(meta_tmp, os.path.join(d, "tpunmf_meta.json"))
    return d


def load_state_orbax(path: str, template, expected_meta=None):
    """Restore a carry saved by :func:`save_state_orbax` into the
    structure of ``template`` (same meta-verification semantics as
    :func:`load_state`)."""
    import json

    import orbax.checkpoint as ocp

    d = _orbax_dir(path)
    with open(os.path.join(d, "tpunmf_meta.json")) as f:
        info = json.load(f)
    if expected_meta is not None and info.get("meta") is not None:
        if info["meta"] != expected_meta:
            raise ValueError(
                "checkpoint configuration mismatch: saved by "
                f"{info['meta']!r}, resuming as {expected_meta!r}"
            )
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    if info["n_leaves"] != len(t_leaves):
        raise ValueError(
            f"checkpoint has {info['n_leaves']} leaves but solver state "
            f"has {len(t_leaves)} — configuration mismatch"
        )
    target = {f"leaf_{i}": np.asarray(t) for i, t in enumerate(t_leaves)}
    with ocp.StandardCheckpointer() as ck:
        out = ck.restore(d, target)
    leaves = [np.asarray(out[f"leaf_{i}"]).astype(np.asarray(t).dtype)
              for i, t in enumerate(t_leaves)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def checkpoint_exists_orbax(path: str) -> bool:
    # the meta file is written (atomically) only after orbax finalizes,
    # so its presence certifies a complete, loadable checkpoint
    return os.path.exists(os.path.join(_orbax_dir(path), "tpunmf_meta.json"))
