"""Explicitly-stored zeros must survive format round-trips.

The reference's single write primitive ``get_mut`` inserts a ZERO entry when
the coordinate is absent (contract at src/sparsematrix.rs:112-114), so
``set(i, j, 0.0)`` stores an entry that counts toward
``n_non_zero_entries``/density.  Every frozen format that can represent the
distinction (all except DIA, which — like scipy's dia_matrix — is
structure-by-offset only) must preserve it on round-trip.
"""

import numpy as np
import pytest

import sparsemat_tpu as smt
from sparsemat_tpu.builder import SparseBuilder


def _assembled():
    """4x4 matrix with 5 entries, one of which is an explicit zero."""
    b = SparseBuilder()
    b.set(0, 1, 2.5)
    b.set(1, 3, -1.0)
    b.set(2, 0, 4.0)
    b.set(2, 2, 0.0)      # explicit stored zero (get_mut zero-insert path)
    b.set(3, 3, 7.0)
    b.set(0, 3, 0.0)      # a second explicit zero, different row
    return b.to_csr()


def _pattern(mat):
    """Sorted (row, col) pairs of stored entries after compaction."""
    coo = mat.to_coo().prune(keep_zeros=True)
    r = np.asarray(coo.rows)
    c = np.asarray(coo.cols)
    return sorted(zip(r.tolist(), c.tolist()))


EXPECTED = [(0, 1), (0, 3), (1, 3), (2, 0), (2, 2), (3, 3)]


@pytest.mark.parametrize("convert", [
    lambda m: m,                       # CSR itself
    lambda m: m.to_coo(),
    lambda m: m.to_ell(),
    lambda m: m.to_sell(),
    lambda m: m.to_well(),
    lambda m: m.to_slab(rb=128),
    lambda m: __import__("sparsemat_tpu").formats.bsr.BSR.from_csr(m),
], ids=["csr", "coo", "ell", "sell", "well", "slab", "bsr"])
def test_stored_zero_roundtrip(convert):
    csr = _assembled()
    mat = convert(csr)
    assert _pattern(mat) == EXPECTED
    # count includes the two stored zeros (src/sparsematrix.rs:112-114)
    assert int(np.asarray(mat.n_non_zero_entries())) == 6
    # and values round-trip exactly
    back = mat.to_coo().prune(keep_zeros=True).to_csr()
    assert np.allclose(np.asarray(back.todense()), np.asarray(csr.todense()))
    assert _pattern(back) == EXPECTED


def test_density_counts_stored_zeros():
    csr = _assembled()
    assert float(csr.density()) == pytest.approx(6 / 16)
    well = csr.to_well()
    assert float(well.density()) == pytest.approx(6 / 16)
    slab = csr.to_slab(rb=128)
    assert float(slab.density()) == pytest.approx(6 / 16)


def test_dia_documented_zero_loss():
    # DIA genuinely cannot store the distinction (like scipy.sparse.dia_matrix)
    csr = _assembled()
    dia = csr.to_dia()
    assert int(np.asarray(dia.n_non_zero_entries())) == 4  # zeros dropped
