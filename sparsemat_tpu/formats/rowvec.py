"""RowVec — ragged per-row assembly format.

API-parity counterpart of the reference's ``SparseMatRowVec``
(reference: src/sparsemat_rowvec.rs:8-13 — a ``Vec<Vec<I>>`` of column ids
plus a ``Vec<Vec<T>>`` of values, one pair per row, with an explicit nnz
counter).  This is a *host-side* staging structure: per-row Python lists are
the idiomatic analogue of per-row Vecs, and compute happens after freezing
to a device format (``to_csr``/``to_coo``).

Semantics preserved from the reference:

* ``push`` appends to the row's arrays without dedup
  (src/sparsemat_rowvec.rs:35-48); ``get_mut``-style writes
  (``set``/``add_to``) dedup via linear ``find_index``
  (src/sparsemat_rowvec.rs:21-33);
* ``iter_row`` raises on an out-of-range row — the reference *panics* there
  (src/sparsemat_rowvec.rs:59-65), unlike CRS (empty iterator) and the
  index-list format;
* per-row insertion order is observable through iterators until
  ``sort_row``/``sort`` rewrites it (``Sortable``,
  src/sparsemat_rowvec.rs:114-125);
* no column iterator — the reference's RowVec format implements ``Sortable``
  but NOT ``ColumnIter`` (SURVEY.md §2 #7).
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import jax.numpy as jnp
import numpy as np

from ..types import DEFAULT_INDEX_DTYPE
from ..vectors import SparseVec


class RowVec:
    """Ragged per-row sparse matrix (host side, mutable)."""

    def __init__(self, capacity: int = 0, *, dtype=jnp.float32,
                 index_dtype=DEFAULT_INDEX_DTYPE):
        self._cols: List[List[int]] = [[] for _ in range(capacity)]
        self._vals: List[List[float]] = [[] for _ in range(capacity)]
        self._nnz = 0
        self._n_cols = 0
        self.dtype = jnp.dtype(dtype)
        self.index_dtype = jnp.dtype(index_dtype)

    # ≈ with_capacity (src/sparsematrix.rs:84): pre-sizes the row table
    @classmethod
    def with_capacity(cls, capacity: int, **kw) -> "RowVec":
        return cls(capacity, **kw)

    @classmethod
    def eye(cls, dim: int, **kw) -> "RowVec":
        m = cls(dim, **kw)
        for i in range(dim):
            m.push(i, i, 1.0)
        return m

    # -- shape ---------------------------------------------------------------
    @property
    def shape(self) -> Tuple[int, int]:
        return (len(self._cols), self._n_cols)

    @property
    def n_rows(self) -> int:
        return len(self._cols)

    @property
    def n_cols(self) -> int:
        return self._n_cols

    @property
    def nnz(self) -> int:
        return self._nnz

    def n_non_zero_entries(self) -> int:
        return self._nnz

    def _grow(self, i: int, j: int) -> None:
        while len(self._cols) <= i:
            self._cols.append([])
            self._vals.append([])
        if j >= self._n_cols:
            self._n_cols = j + 1

    # -- writes ---------------------------------------------------------------
    def find_index(self, i: int, j: int) -> int | None:
        """Linear scan of row i for column j
        (≈ find_index, src/sparsemat_rowvec.rs:21-33)."""
        if i >= len(self._cols):
            return None
        try:
            return self._cols[i].index(j)
        except ValueError:
            return None

    def push(self, i: int, j: int, v) -> None:
        """Append without dedup (≈ push, src/sparsemat_rowvec.rs:35-48)."""
        self._grow(int(i), int(j))
        self._cols[i].append(int(j))
        self._vals[i].append(float(v))
        self._nnz += 1

    def set(self, i: int, j: int, v) -> None:
        """Insert-or-overwrite (get_mut contract, src/sparsematrix.rs:112-114,226-228)."""
        p = self.find_index(int(i), int(j))
        if p is None:
            self.push(i, j, v)
        else:
            self._vals[i][p] = float(v)

    def add_to(self, i: int, j: int, v) -> None:
        """Insert-or-accumulate (≈ add_to, src/sparsematrix.rs:231-233)."""
        p = self.find_index(int(i), int(j))
        if p is None:
            self.push(i, j, v)
        else:
            self._vals[i][p] += float(v)

    def get(self, i: int, j: int):
        p = self.find_index(int(i), int(j))
        return self.dtype.type(self._vals[i][p] if p is not None else 0)

    def __setitem__(self, ij, v):
        self.set(ij[0], ij[1], v)

    def __getitem__(self, ij):
        return self.get(ij[0], ij[1])

    def scale(self, s) -> "RowVec":
        s = float(s)
        for row in self._vals:
            for p in range(len(row)):
                row[p] *= s
        return self

    # -- iteration -------------------------------------------------------------
    def iter_row(self, i: int) -> Iterator[Tuple[int, float]]:
        """(col, val) pairs of row i in insertion order.  Raises IndexError
        out of range — the reference panics there (src/sparsemat_rowvec.rs:59-65)."""
        if i >= len(self._cols):
            raise IndexError(
                f"iter_row: row {i} out of range for {len(self._cols)} rows")
        return zip(self._cols[i], (self.dtype.type(v) for v in self._vals[i]))

    def __iter__(self) -> Iterator[Tuple[int, int, float]]:
        """Row-major whole-matrix iteration, skipping empty rows
        (≈ Iter, src/sparsematrix.rs:28-59)."""
        for i in range(len(self._cols)):
            for j, v in zip(self._cols[i], self._vals[i]):
                yield i, j, self.dtype.type(v)

    def get_row(self, i: int) -> SparseVec:
        return SparseVec(np.array(self._cols[i], np.int64),
                         np.array(self._vals[i], self.dtype.type),
                         self._n_cols)

    # -- Sortable (src/sparsemat_rowvec.rs:114-125) -----------------------------
    def sort_row(self, i: int) -> None:
        order = np.argsort(self._cols[i], kind="stable")
        self._cols[i] = [self._cols[i][p] for p in order]
        self._vals[i] = [self._vals[i][p] for p in order]

    def sort(self) -> "RowVec":
        for i in range(len(self._cols)):
            self.sort_row(i)
        return self

    def is_sorted_row(self, i: int) -> bool:
        c = self._cols[i]
        return all(c[p] < c[p + 1] for p in range(len(c) - 1))

    def is_sorted(self) -> bool:
        return all(self.is_sorted_row(i) for i in range(len(self._cols)))

    # -- structure queries -------------------------------------------------------
    def density(self) -> float:
        nr, nc = self.shape
        return self._nnz / (nr * nc) if nr and nc else 0.0

    def sparsity(self) -> float:
        return 1.0 - self.density()

    # -- freeze to device formats -------------------------------------------------
    def to_coo(self):
        from .coo import COO

        rows = np.repeat(np.arange(len(self._cols), dtype=np.int64),
                         [len(c) for c in self._cols])
        cols = np.concatenate([np.asarray(c, np.int64) for c in self._cols]) \
            if self._nnz else np.array([], np.int64)
        vals = np.concatenate([np.asarray(v, np.float64) for v in self._vals]) \
            if self._nnz else np.array([], np.float64)
        order = np.lexsort((cols, rows))
        return COO(rows=jnp.asarray(rows[order].astype(self.index_dtype)),
                   cols=jnp.asarray(cols[order].astype(self.index_dtype)),
                   vals=jnp.asarray(vals[order].astype(self.dtype)),
                   shape=self.shape, canonical=True)

    def to_csr(self):
        from .csr import CSR

        rows = np.repeat(np.arange(len(self._cols), dtype=np.int64),
                         [len(c) for c in self._cols])
        cols = (np.concatenate([np.asarray(c, np.int64) for c in self._cols])
                if self._nnz else np.array([], np.int64))
        vals = (np.concatenate([np.asarray(v, np.float64) for v in self._vals])
                if self._nnz else np.array([], np.float64))
        return CSR.from_host_coo(rows, cols, vals, self.shape,
                                 dtype=self.dtype, index_dtype=self.index_dtype,
                                 sum_duplicates=False)

    def to_ell(self, n_cols_per_row: int | None = None):
        return self.to_csr().to_ell(n_cols_per_row=n_cols_per_row)

    def freeze(self, format: str = "csr"):
        return getattr(self, f"to_{format}")()

    # -- convenience compute --------------------------------------------------
    def mvp(self, x):
        from ..ops import spmv

        return spmv(self.to_csr(), jnp.asarray(x))

    def todense(self) -> np.ndarray:
        out = np.zeros(self.shape, self.dtype)
        for i, j, v in self:
            out[i, j] += v
        return out

    def __repr__(self):
        return f"RowVec(shape={self.shape}, nnz={self._nnz}, dtype={self.dtype})"
