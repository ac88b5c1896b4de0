"""Explicit-collective building blocks (shard_map + psum/ppermute).

Under GSPMD the solvers' GEMMs contract over sharded axes and XLA inserts
the collectives automatically; these explicit versions exist (a) as the
tested specification of what GSPMD must produce, (b) as the substrate for
ring/panel schedules where we want manual control of the overlap.

NMF collective structure (SURVEY §2C):
  * ``H H^T``, ``W^T X``, ``X H^T`` contract over the column-sharded item
    axis -> per-shard partial products + psum over 'cols';
  * ``W^T W`` contracts over the row-sharded sample axis -> psum over 'rows';
  * ring panel rotation (ppermute) streams column panels of X/H around the
    mesh so n beyond per-chip HBM still yields full Gram/partial products.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def _axes(mesh: Mesh):
    rows = "rows" if "rows" in mesh.axis_names else None
    cols = "cols" if "cols" in mesh.axis_names else None
    return rows, cols


def gram_h(mesh: Mesh, h):
    """H H^T with H column-sharded: local Gram + psum over 'cols'."""
    rows, cols = _axes(mesh)
    if cols is None:
        return h @ h.T

    def f(h_loc):
        g = h_loc @ h_loc.T
        return jax.lax.psum(g, cols)

    return shard_map(
        f, mesh=mesh, in_specs=P(None, cols), out_specs=P(None, None),
        check_vma=False,
    )(h)


def gram_w(mesh: Mesh, w):
    """W^T W with W row-sharded: local Gram + psum over 'rows'."""
    rows, cols = _axes(mesh)
    if rows is None:
        return w.T @ w

    def f(w_loc):
        g = w_loc.T @ w_loc
        return jax.lax.psum(g, rows)

    return shard_map(
        f, mesh=mesh, in_specs=P(rows, None), out_specs=P(None, None),
        check_vma=False,
    )(w)


def xht_psum(mesh: Mesh, x, h):
    """X @ H^T with X P(rows, cols), H P(None, cols): psum over 'cols',
    result row-sharded like W."""
    rows, cols = _axes(mesh)
    if cols is None:
        return x @ h.T

    def f(x_loc, h_loc):
        part = x_loc @ h_loc.T
        return jax.lax.psum(part, cols)

    return shard_map(
        f, mesh=mesh, in_specs=(P(rows, cols), P(None, cols)),
        out_specs=P(rows, None), check_vma=False,
    )(x, h)


def wtx_psum(mesh: Mesh, w, x):
    """W^T @ X with W P(rows, None), X P(rows, cols): psum over 'rows',
    result column-sharded like H."""
    rows, cols = _axes(mesh)
    if rows is None:
        return w.T @ x

    def f(w_loc, x_loc):
        part = w_loc.T @ x_loc
        return jax.lax.psum(part, rows)

    return shard_map(
        f, mesh=mesh, in_specs=(P(rows, None), P(rows, cols)),
        out_specs=P(None, cols), check_vma=False,
    )(w, x)


def wh_psum_rank(mesh: Mesh, w, h):
    """W @ H with the k (component) axis sharded over 'rank' (EP analog):
    per-shard partial reconstructions summed with psum."""
    if "rank" not in mesh.axis_names:
        return w @ h

    def f(w_loc, h_loc):
        return jax.lax.psum(w_loc @ h_loc, "rank")

    return shard_map(
        f, mesh=mesh, in_specs=(P(None, "rank"), P("rank", None)),
        out_specs=P(None, None), check_vma=False,
    )(w, h)


def gram_h_rank(mesh: Mesh, h):
    """H H^T with H row(rank)-sharded: each shard computes its diagonal
    block's rows H_p H^T via all-gather of the small factor — yields the
    full (k, k) Gram, rank-rows sharded then gathered."""
    if "rank" not in mesh.axis_names:
        return h @ h.T

    def f(h_loc):
        h_full = jax.lax.all_gather(h_loc, "rank", axis=0, tiled=True)
        return h_loc @ h_full.T  # (k_local, k)

    return shard_map(
        f, mesh=mesh, in_specs=P("rank", None), out_specs=P("rank", None),
        check_vma=False,
    )(h)


def reshard_rows_to_cols(mesh: Mesh, x, axis: str = "cols"):
    """Flip x from row-sharded P(axis, None) to column-sharded
    P(None, axis) with a single ``all_to_all`` — the Ulysses-style layout
    switch (SURVEY §2C comm-backend row).

    Each device splits its (m/p, n) row panel into p column chunks and
    exchanges them; the received chunks stack into an (m, n/p) column
    panel.  Peak per-device memory stays at one panel (vs full
    replication via all_gather), which is the point for beyond-HBM V.
    """
    p = mesh.shape[axis]
    if p == 1:
        return x

    def f(x_loc):
        return jax.lax.all_to_all(x_loc, axis, split_axis=1, concat_axis=0,
                                  tiled=True)

    return shard_map(
        f, mesh=mesh, in_specs=P(axis, None), out_specs=P(None, axis),
        check_vma=False,
    )(x)


def reshard_cols_to_rows(mesh: Mesh, x, axis: str = "cols"):
    """Inverse of :func:`reshard_rows_to_cols`: P(None, axis) -> P(axis, None)."""
    p = mesh.shape[axis]
    if p == 1:
        return x

    def f(x_loc):
        return jax.lax.all_to_all(x_loc, axis, split_axis=0, concat_axis=1,
                                  tiled=True)

    return shard_map(
        f, mesh=mesh, in_specs=P(None, axis), out_specs=P(axis, None),
        check_vma=False,
    )(x)


def ring_xht_rotate_h(mesh: Mesh, x, h, axis: str = "cols"):
    """X @ H^T with X ROW-sharded and H column-sharded, computed by
    rotating only the small H panels around the ring — the genuine
    beyond-HBM schedule (the big X never moves; peak per-device factor
    memory is ONE (k, n/p) panel, never the full H).

    At step s device d multiplies the column slice of its local X row
    block that matches the visiting panel, accumulates into its numerator
    block, and passes the panel along; after p steps every device holds
    its complete X_rows @ H^T.  Each ppermute transfer overlaps the next
    step's GEMM (XLA schedules the send/recv concurrently with compute
    inside the fori_loop).  Output is row-sharded like W.
    """
    p = mesh.shape[axis]
    if p == 1:
        return x @ h.T

    def f(x_loc, h_loc):
        n_loc = h_loc.shape[1]
        idx = jax.lax.axis_index(axis)
        perm = [(d, (d - 1) % p) for d in range(p)]

        def body(s, carry):
            acc, hp = carry
            j = (idx + s) % p
            xs = jax.lax.dynamic_slice_in_dim(x_loc, j * n_loc, n_loc, axis=1)
            acc = acc + xs @ hp.T
            hp = jax.lax.ppermute(hp, axis, perm)
            return (acc, hp)

        acc0 = jnp.zeros((x_loc.shape[0], h_loc.shape[0]), dtype=x_loc.dtype)
        acc, _ = jax.lax.fori_loop(0, p, body, (acc0, h_loc))
        return acc

    return shard_map(
        f, mesh=mesh, in_specs=(P(axis, None), P(None, axis)),
        out_specs=P(axis, None), check_vma=False,
    )(x, h)


def ring_xht(mesh: Mesh, x, h):
    """X @ H^T as a ppermute ring over column panels.

    Equivalent to ``xht_psum`` but accumulates the per-shard partial
    products by rotating H panels around the 'cols' ring — the pattern that
    generalizes to beyond-HBM panel streaming (each step can overlap the
    next panel's transfer with the current panel's GEMM).

    Note the contraction is over each panel's own columns, so instead of
    rotating data we rotate nothing at all in the math — this ring
    demonstrates the schedule: at step s every device multiplies the panel
    it currently holds and passes it on; after num_devices steps each
    device has accumulated the full sum (identical to psum, reduction
    order permuted per device).
    """
    rows, cols = _axes(mesh)
    if cols is None:
        return x @ h.T
    n_cols = mesh.shape[cols]

    def f(x_loc, h_loc):
        # pair (x_panel, h_panel) travels the ring together
        def body(s, carry):
            acc, xp, hp = carry
            acc = acc + xp @ hp.T
            perm = [(d, (d + 1) % n_cols) for d in range(n_cols)]
            xp = jax.lax.ppermute(xp, cols, perm)
            hp = jax.lax.ppermute(hp, cols, perm)
            return (acc, xp, hp)

        k = h_loc.shape[0]
        acc0 = jnp.zeros((x_loc.shape[0], k), dtype=x_loc.dtype)
        acc, _, _ = jax.lax.fori_loop(0, n_cols, body, (acc0, x_loc, h_loc))
        return acc

    return shard_map(
        f, mesh=mesh, in_specs=(P(rows, cols), P(None, cols)),
        out_specs=P(rows, None), check_vma=False,
    )(x, h)
