"""MatrixMarket I/O: real fixture files through load_mtx (both parsers),
round-trips, and ops on loaded matrices vs scipy.

The reference has no matrix file reader (SURVEY.md §5); this is the new
capability BASELINE config 4 requires.  The FEM fixture is a genuine P1
stiffness assembly (sparsemat_tpu/matgen.py), stored in MatrixMarket
*symmetric* format to exercise the symmetry-expansion branch.
"""

import os

import numpy as np
import pytest
import scipy.io as sio
import scipy.sparse as sp

import sparsemat_tpu as smt
from sparsemat_tpu import io as smtio
from sparsemat_tpu import matgen

DATA = os.path.join(os.path.dirname(__file__), "data")


def _scipy_load(name):
    return sp.csr_matrix(sio.mmread(os.path.join(DATA, name)))


@pytest.mark.parametrize("name", ["fem_p1_8x8.mtx", "pattern_12x9.mtx",
                                  "skew_4x4.mtx"])
def test_load_mtx_matches_scipy(name):
    ref = _scipy_load(name)
    got = smtio.load_mtx(os.path.join(DATA, name), dtype=np.float64)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got.todense()), ref.toarray(),
                               atol=1e-14)


def test_load_mtx_numpy_parser_agrees():
    """The pure-numpy fallback must agree with the C++ fast path."""
    path = os.path.join(DATA, "fem_p1_8x8.mtx")
    a = smtio.load_mtx(path, dtype=np.float64)
    b = smtio._load_mtx_numpy(path, dtype=np.float64)
    np.testing.assert_allclose(np.asarray(a.todense()),
                               np.asarray(b.todense()), atol=0)


def test_fem_fixture_is_spd_and_solvable():
    """End-to-end: load the FEM matrix, CG-solve on it, check vs scipy."""
    A = smtio.load_mtx(os.path.join(DATA, "fem_p1_8x8.mtx"), dtype=np.float64)
    ref = _scipy_load("fem_p1_8x8.mtx").astype(np.float64)
    b = np.ones(A.shape[0])
    x, info = smt.solvers.cg(A, b, tol=1e-10)
    assert bool(info.converged)
    x_ref = sp.linalg.spsolve(ref.tocsc(), b)
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-6, atol=1e-9)


def test_spmm_spgemm_on_loaded_matrix():
    A = smtio.load_mtx(os.path.join(DATA, "fem_p1_8x8.mtx"), dtype=np.float64)
    ref = _scipy_load("fem_p1_8x8.mtx").astype(np.float64)
    B = np.random.default_rng(0).standard_normal((A.shape[1], 16))
    np.testing.assert_allclose(np.asarray(smt.spmm(A, B)), ref @ B,
                               rtol=1e-10, atol=1e-8)
    C = smt.spgemm(A, A)
    np.testing.assert_allclose(np.asarray(C.todense()), (ref @ ref).toarray(),
                               rtol=1e-10, atol=1e-6)


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    M = sp.random(30, 20, density=0.2, random_state=1, dtype=np.float64).tocsr()
    A = smt.CSR.from_scipy(M)
    path = str(tmp_path / "rt.mtx")
    smtio.save_mtx(A, path)
    back = smtio.load_mtx(path, dtype=np.float64)
    np.testing.assert_allclose(np.asarray(back.todense()), M.toarray(),
                               atol=1e-15)
    # and scipy can read what we write
    np.testing.assert_allclose(sp.csr_matrix(sio.mmread(path)).toarray(),
                               M.toarray(), atol=1e-15)


def test_surrogate_generators_deterministic():
    a = matgen.fem_block_band(n_nodes=500, seed=3)
    b = matgen.fem_block_band(n_nodes=500, seed=3)
    assert (a != b).nnz == 0
    c = matgen.circuit_scatter(n=2000, seed=4)
    d = matgen.circuit_scatter(n=2000, seed=4)
    assert (c != d).nnz == 0
    assert abs(a - a.T).max() == 0          # FEM surrogate is symmetric


def test_load_mtx_rejects_truncated_file(tmp_path):
    """A cleanly truncated entry list (partial write / disk-full) must
    raise, not silently load as a smaller matrix (r4 advisor)."""
    import scipy.sparse as sp

    m = sp.random(50, 50, 0.1, format="csr", dtype=np.float32,
                  random_state=np.random.default_rng(0))
    p = str(tmp_path / "t.mtx")
    smtio.save_mtx(smt.CSR.from_scipy(m), p)
    lines = open(p).read().splitlines(keepends=True)
    with open(p, "w") as fh:
        fh.writelines(lines[: len(lines) // 2])
    if smtio.last_mtx_parser != "native" and not _native_ok():
        pytest.skip("native parser unavailable")
    with pytest.raises(ValueError, match="truncated|entries"):
        smtio.load_mtx(p, dtype=np.float32)


def _native_ok():
    try:
        from sparsemat_tpu.native import mmio_available

        return mmio_available()
    except ImportError:
        return False
