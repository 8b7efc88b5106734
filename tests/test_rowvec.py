"""RowVec format — mirrors check_sparsemat_rowvec (reference: src/lib.rs:157-178):
same assembly/iteration/SpMV/density contract as the index-list format
(SpMV 34.544, density 6/9), plus the panic-on-out-of-range iter_row quirk
(src/sparsemat_rowvec.rs:59-65) and Sortable (:114-125)."""

import jax.numpy as jnp
import numpy as np
import pytest

import sparsemat_tpu as smt
from sparsemat_tpu.formats.rowvec import RowVec

X3 = jnp.array([2.0, 4.8, 1.2], jnp.float32)


def build_reference_rowvec() -> RowVec:
    """The src/lib.rs:55-66 assembly sequence."""
    m = RowVec()
    m.add_to(0, 1, 4.2)
    m.add_to(1, 2, 4.12)
    m.add_to(2, 2, 2.12)
    m.add_to(1, 1, 1.12)
    m.add_to(1, 1, 1.12)   # get_mut += path
    m.add_to(0, 2, 0.12)
    m.add_to(0, 0, 8.12)
    m.set(0, 0, 7.12)      # overwrite
    return m


def test_assembly_semantics():
    m = build_reference_rowvec()
    assert m.shape == (3, 3)
    assert m.nnz == 6
    assert m.get(0, 0) == pytest.approx(7.12, rel=1e-6)
    assert m.get(1, 1) == pytest.approx(2.24, rel=1e-6)
    assert m.get(2, 0) == 0.0


def test_insertion_order_iteration():
    # per-row insertion order is observable (src/lib.rs:67-71 contract)
    m = build_reference_rowvec()
    row0 = [j for j, _ in m.iter_row(0)]
    assert row0 == [1, 2, 0]  # insertion order, not sorted
    assert not m.is_sorted_row(0)
    m.sort_row(0)
    assert [j for j, _ in m.iter_row(0)] == [0, 1, 2]
    m.sort()
    assert m.is_sorted()


def test_iter_row_out_of_range_raises():
    # reference panics (src/sparsemat_rowvec.rs:59-65); we raise IndexError
    m = build_reference_rowvec()
    with pytest.raises(IndexError):
        m.iter_row(5)


def test_spmv_golden():
    # mvp.get(0) == 34.544 (src/lib.rs:173-175)
    m = build_reference_rowvec()
    y = m.mvp(X3)
    np.testing.assert_allclose(np.asarray(y), [34.544, 15.696, 2.544], rtol=1e-6)


def test_density_golden():
    # 6/9 (src/lib.rs:177)
    assert build_reference_rowvec().density() == pytest.approx(6 / 9)


def test_push_no_dedup():
    # push appends duplicates (src/sparsemat_rowvec.rs:35-48); freezing
    # canonicalizes by summing them
    m = RowVec()
    m.push(0, 0, 1.0)
    m.push(0, 0, 2.0)
    assert m.nnz == 2
    csr = m.to_csr()
    # CSR.from_host_coo is called without dedup from RowVec freeze, so both
    # slots survive; the dense render sums them
    np.testing.assert_allclose(np.asarray(csr.todense()), [[3.0]])


def test_freeze_roundtrip():
    m = build_reference_rowvec()
    dense = m.todense()
    np.testing.assert_allclose(np.asarray(m.to_csr().todense()), dense, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m.to_coo().todense()), dense, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m.to_ell().todense()), dense, rtol=1e-6)


def test_eye_and_scale():
    m = RowVec.eye(3)
    np.testing.assert_allclose(m.todense(), np.eye(3))
    m.scale(2.5)
    np.testing.assert_allclose(m.todense(), 2.5 * np.eye(3))


def test_get_row():
    m = build_reference_rowvec()
    sv = m.get_row(1)
    assert sorted(sv.iter_sparse()) == [(1, pytest.approx(2.24)),
                                        (2, pytest.approx(4.12))]


def test_with_capacity_empty_rows():
    m = RowVec.with_capacity(4)
    assert m.n_rows == 4
    assert list(m.iter_row(3)) == []
    m.push(1, 0, 1.0)
    assert m.shape == (4, 1)


def test_ops_is_sorted_on_frozen():
    # canonical frozen formats are sorted (sortedness checks,
    # src/sparsematrix.rs:249-269)
    m = build_reference_rowvec()
    csr = m.to_csr()
    assert bool(smt.is_sorted(csr))
    for i in range(3):
        assert bool(smt.is_sorted_row(csr, i))
    # an externally-built unsorted CSR is detected
    bad = smt.CSR.from_arrays(
        jnp.array([0, 2]), jnp.array([1, 0]), jnp.array([1.0, 2.0]), (1, 3))
    assert not bool(smt.is_sorted(bad))
    assert not bool(smt.is_sorted_row(bad, 0))
