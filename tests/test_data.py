"""Data generators and loaders."""
import numpy as np
import pytest

from tpunmf.data import (
    flatten_stack,
    load_matrix,
    lowrank_dense,
    movielens_like,
    sparse_csr,
    tfidf_like,
)


def test_lowrank_dense_properties():
    x = lowrank_dense(100, 60, 5, seed=1)
    assert x.shape == (100, 60) and x.min() >= 0
    s = np.linalg.svd(x.astype(np.float64), compute_uv=False)
    assert s[5] / s[0] < 0.05  # planted rank shows in the spectrum


def test_tfidf_like_properties():
    x = tfidf_like(200, 50, n_topics=5, seed=2)
    assert x.shape == (200, 50) and x.min() >= 0
    assert (x == 0).mean() > 0.3  # sparse-ish


def test_movielens_like_properties():
    x = movielens_like(80, 40, density=0.1, seed=3)
    assert x.shape == (80, 40)
    nz = x[x > 0]
    assert nz.min() >= 1 and nz.max() <= 5
    assert 0.02 < (x > 0).mean() < 0.3


def test_sparse_csr_properties():
    m = sparse_csr(100, 80, density=0.05, seed=4)
    assert m.shape == (100, 80)
    assert m.nnz <= int(100 * 80 * 0.05)
    assert m.data.min() >= 0


def test_flatten_stack_fortran_order(rng):
    a = rng.random((4, 3, 5))
    flat = flatten_stack(a)
    assert flat.shape == (12, 5)
    np.testing.assert_allclose(flat, a.reshape(12, 5, order="F"))


def test_load_matrix_roundtrip(tmp_path, rng):
    a = rng.random((10, 6)).astype(np.float32)
    np.save(tmp_path / "m.npy", a)
    np.savez(tmp_path / "m.npz", data=a)
    np.savetxt(tmp_path / "m.csv", a, delimiter=",")
    from scipy import io as sio

    sio.savemat(tmp_path / "m.mat", {"data": a})
    for name in ["m.npy", "m.npz", "m.csv", "m.mat"]:
        got = load_matrix(str(tmp_path / name))
        np.testing.assert_allclose(got, a, rtol=1e-6)


def test_load_matrix_mat_3d_flatten(tmp_path, rng):
    from scipy import io as sio

    a = rng.random((4, 3, 5)).astype(np.float32)
    sio.savemat(tmp_path / "stack.mat", {"msot": a})
    got = load_matrix(str(tmp_path / "stack.mat"), key="msot")
    assert got.shape == (12, 5)


def test_load_movielens_formats(tmp_path):
    """All three standard MovieLens ratings formats parse to the same
    user x item matrix."""
    import numpy as np

    from tpunmf.data import load_movielens

    triples = [(1, 10, 5.0), (1, 20, 3.0), (2, 10, 4.0), (7, 30, 1.0)]
    dat = tmp_path / "ratings.dat"
    dat.write_text("".join(f"{u}::{i}::{r}::978300760\n" for u, i, r in triples))
    udata = tmp_path / "u.data"
    udata.write_text("".join(f"{u}\t{i}\t{r}\t978300760\n" for u, i, r in triples))
    csv = tmp_path / "ratings.csv"
    csv.write_text("userId,movieId,rating,timestamp\n" + "".join(
        f"{u},{i},{r},978300760\n" for u, i, r in triples))

    mats = []
    for p in (dat, udata, csv):
        mat, users, items = load_movielens(str(p))
        assert mat.shape == (3, 3)  # 3 unique users, 3 unique items
        assert list(users) == [1, 2, 7]
        assert list(items) == [10, 20, 30]
        mats.append(mat.toarray())
    np.testing.assert_array_equal(mats[0], mats[1])
    np.testing.assert_array_equal(mats[0], mats[2])
    assert mats[0][0, 0] == 5.0 and mats[0][2, 2] == 1.0


def test_load_newsgroups_tfidf(tmp_path):
    import numpy as np

    from tpunmf.data import load_newsgroups_tfidf

    (tmp_path / "alt.atheism").mkdir()
    (tmp_path / "sci.space").mkdir()
    (tmp_path / "alt.atheism" / "0001").write_text(
        "The rocket engine burns fuel. Rocket science!")
    (tmp_path / "alt.atheism" / "0002").write_text(
        "Fuel and engine and rocket again, rocket rocket.")
    (tmp_path / "sci.space" / "0001").write_text(
        "Space rocket orbits the moon. Moon base fuel depot.")

    mat, vocab, docs = load_newsgroups_tfidf(str(tmp_path), min_df=2)
    assert len(docs) == 3
    assert mat.shape == (len(vocab), 3)
    # terms appearing in >=2 docs survive; 'moon' (1 doc) does not
    assert "rocket" in vocab and "fuel" in vocab
    assert "moon" not in vocab
    dense = mat.toarray()
    assert np.all(dense >= 0)
    # l2-normalized columns
    norms = np.sqrt((dense ** 2).sum(axis=0))
    np.testing.assert_allclose(norms, 1.0, rtol=1e-6)
    # and it factorizes through the normal pipeline
    from tpunmf.solvers import mur

    res = mur(dense, 2, distance_type="kl", min_iter=3, max_iter=10,
              tol1=0.0, tol2=0.0)
    assert np.all(np.isfinite(res.obj_history))
