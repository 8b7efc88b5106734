"""Assembly-phase semantics: the reference's builder-format tests replayed
against SparseBuilder / PartitionedBuilder (reference: src/lib.rs:55-112
check_sparsemat_indexlist, :157-178 check_sparsemat_rowvec, :181-202
check_sparsemat_par, :205-218 check_indexlist)."""

import numpy as np
import pytest

import sparsemat_tpu as smt


def assemble_reference_matrix(b):
    """The exact write sequence of check_sparsemat_indexlist (src/lib.rs:57-65)."""
    b.add_to(0, 1, 4.2)
    b.add_to(1, 2, 4.12)
    b.add_to(2, 2, 2.12)
    b.add_to(1, 1, 1.12)
    b.add_to(1, 1, 1.12)       # *get_mut(1,1) += 1.12
    b.add_to(0, 2, 0.12)       # *get_mut(0,2) += 0.12
    b.set(0, 0, 8.12)          # *get_mut(0,0) = 8.12
    b.set(0, 0, 7.12)
    return b


@pytest.fixture(params=["native", "python"])
def builder(request, monkeypatch):
    if request.param == "python":
        monkeypatch.setenv("SPARSEMAT_TPU_NO_NATIVE", "1")
        import sparsemat_tpu.native as native

        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_lib_error", "test-disabled")
    return smt.SparseBuilder(3)


def test_assembly_semantics(builder):
    sp = assemble_reference_matrix(builder)
    # get after set-overwrite (src/lib.rs:66)
    assert sp.get(0, 0) == pytest.approx(7.12, rel=1e-6)
    assert sp.get(0, 1) == pytest.approx(4.2, rel=1e-6)
    # one entry per coordinate; shape grows from touched coords
    assert sp.nnz == 6
    assert sp.shape == (3, 3)
    assert sp.density() == pytest.approx(6 / 9)


def test_iteration_order(builder):
    # whole-matrix iteration: row-major, insertion order within row
    # (src/lib.rs:67-71): (0,1),(0,2),(0,0),(1,2),...
    sp = assemble_reference_matrix(builder)
    it = iter(sp)
    assert next(it)[:2] == (0, 1)
    assert next(it)[:2] == (0, 2)
    assert next(it)[:2] == (0, 0)
    assert next(it)[:2] == (1, 2)
    # row iterator (src/lib.rs:72-73)
    row2 = list(sp.iter_row(2))
    assert row2[0][0] == 2
    assert row2[0][1] == pytest.approx(2.12, rel=1e-6)


def test_column_iterator_contract(builder):
    # iter_col requires assemble_column_info (src/lib.rs:86-91;
    # sparsemat_indexlist.rs:86-96) and yields insertion order
    sp = assemble_reference_matrix(builder)
    with pytest.raises(RuntimeError, match="assemble_column_info"):
        next(sp.iter_col(2))
    sp.assemble_column_info()
    col2 = list(sp.iter_col(2))
    assert [r for r, _ in col2] == [1, 2, 0]
    np.testing.assert_allclose([v for _, v in col2], [4.12, 2.12, 0.12], rtol=1e-6)
    # mutation invalidates
    sp.add_to(0, 1, 1.0)
    with pytest.raises(RuntimeError):
        next(sp.iter_col(2))


def test_freeze_and_mvp(builder):
    sp = assemble_reference_matrix(builder)
    y = np.asarray(sp.mvp([2.0, 4.8, 1.2]))
    np.testing.assert_allclose(y, [34.544, 15.696, 2.544], rtol=1e-6)
    csr = sp.to_csr()
    assert csr.shape == (3, 3)
    assert int(np.asarray(csr.n_non_zero_entries())) == 6


def test_freeze_padded(builder):
    sp = assemble_reference_matrix(builder)
    coo = sp.to_coo(pad_to=10)
    assert coo.nse == 10
    assert int(np.asarray(coo.n_non_zero_entries())) == 6
    y = np.asarray(coo.to_csr().mvp([2.0, 4.8, 1.2]))
    np.testing.assert_allclose(y, [34.544, 15.696, 2.544], rtol=1e-6)


def test_get_row_sparsevec(builder):
    sp = assemble_reference_matrix(builder)
    row0 = sp.get_row(0)
    assert row0.get(1) == pytest.approx(4.2, rel=1e-6)
    assert row0.get(0) == pytest.approx(7.12, rel=1e-6)
    assert row0.dim == 3


def test_batch_assembly_matches_scalar():
    rng = np.random.default_rng(42)
    n = 200
    rows = rng.integers(0, 50, n)
    cols = rng.integers(0, 50, n)
    vals = rng.standard_normal(n)
    b1 = smt.SparseBuilder(n)
    b1.add_batch(rows, cols, vals)
    b2 = smt.SparseBuilder(n)
    for i, j, v in zip(rows, cols, vals):
        b2.add_to(i, j, v)
    np.testing.assert_allclose(b1.todense(), b2.todense(), rtol=1e-6)
    # duplicates accumulated, not duplicated
    dense = np.zeros((50, 50))
    np.add.at(dense, (rows, cols), vals)
    np.testing.assert_allclose(np.asarray(b1.todense(), np.float64), dense, atol=1e-6)


def test_scale_and_eye():
    b = smt.SparseBuilder.eye(4)
    b.scale(2.0)
    np.testing.assert_allclose(b.todense(), 2 * np.eye(4))


def test_partitioned_builder_transparent():
    # check_sparsemat_par (src/lib.rs:181-202): partitioned behaves like flat
    mat = smt.PartitionedBuilder.with_sub_matrices(4, 16)
    assemble_reference_matrix(mat)
    assert mat.get(0, 0) == pytest.approx(7.12, rel=1e-6)
    assert mat.get(0, 1) == pytest.approx(4.2, rel=1e-6)
    it = iter(mat)
    assert next(it)[:2] == (0, 1)
    assert next(it)[:2] == (0, 2)
    assert next(it)[:2] == (0, 0)
    assert next(it)[:2] == (1, 2)
    y = np.asarray(mat.mvp([2.0, 4.8, 1.2]))
    np.testing.assert_allclose(y[0], 34.544, rtol=1e-6)
    assert mat.density() == pytest.approx(6 / 9)


def test_partitioned_routing_last_block():
    # rows beyond capacity route to the last block (fixes the reference's
    # off-by-one min(row/rows_per_block, n_blocks), sparsemat_par.rs:31-35)
    mat = smt.PartitionedBuilder(4, 16)
    mat.set(15, 0, 1.0)   # last row of capacity → block 3
    mat.set(20, 0, 2.0)   # beyond capacity → clamped to block 3
    assert mat.get(15, 0) == 1.0
    assert mat.get(20, 0) == 2.0


def test_builder_repr_backend(builder):
    assert "backend=" in repr(builder)


def test_scale_invalidates_iter_cache(builder):
    # regression (round-2 advisor, high): scale() after a cached iteration
    # must not serve stale pre-scale values
    builder.set(0, 1, 2.0)
    assert list(builder.iter_row(0)) == [(1, pytest.approx(2.0))]
    builder.scale(10.0)
    assert builder.get(0, 1) == pytest.approx(20.0)
    assert list(builder.iter_row(0)) == [(1, pytest.approx(20.0))]
    assert [v for _, _, v in builder] == [pytest.approx(20.0)]


def test_sort_row_and_sort(builder):
    # ≈ Sortable::sort_row (src/sparsemat_indexlist.rs:102-109): after
    # sorting, iteration order within the row is column-ascending; entries
    # inserted afterwards append behind the sorted prefix (chain semantics)
    builder.set(0, 5, 5.0)
    builder.set(0, 1, 1.0)
    builder.set(0, 3, 3.0)
    assert [c for c, _ in builder.iter_row(0)] == [5, 1, 3]
    builder.sort_row(0)
    assert [c for c, _ in builder.iter_row(0)] == [1, 3, 5]
    builder.set(0, 2, 2.0)          # post-sort insert lands at the tail
    assert [c for c, _ in builder.iter_row(0)] == [1, 3, 5, 2]
    builder.set(1, 9, 9.0)
    builder.set(1, 0, 0.5)
    builder.sort()                  # whole-matrix sort (src/sparsematrix.rs:362-366)
    assert [c for c, _ in builder.iter_row(0)] == [1, 2, 3, 5]
    assert [c for c, _ in builder.iter_row(1)] == [0, 9]
    assert [(i, j) for i, j, _ in builder] == [
        (0, 1), (0, 2), (0, 3), (0, 5), (1, 0), (1, 9)]


def test_frozen_format_whole_matrix_iter():
    # ≈ the trait's whole-matrix Iter skipping empty rows
    # (src/sparsematrix.rs:28-59); canonical column-sorted order here
    b = smt.SparseBuilder()
    b.set(0, 2, 1.0)
    b.set(3, 1, 2.0)   # rows 1, 2 are empty and must be skipped
    b.set(3, 0, 3.0)
    for frozen in (b.to_csr(), b.to_coo(), b.to_csr().to_ell()):
        entries = [(i, j, float(v)) for i, j, v in frozen]
        assert entries == [(0, 2, 1.0), (3, 0, 3.0), (3, 1, 2.0)]
