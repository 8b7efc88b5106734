"""Mutable assembly phase: SparseBuilder and PartitionedBuilder.

``SparseBuilder`` is the TPU-native successor of the reference's assembly
format ``SparseMatIndexList`` (reference: src/sparsemat_indexlist.rs:14-21)
and of the per-row ``SparseMatRowVec`` (src/sparsemat_rowvec.rs).  Semantics
preserved (SURVEY.md §3.1):

* ``add_to``/``set``/``get_mut``-style writes: insert-if-absent with zero
  init (sparsematrix.rs:112-114,226-233);
* one entry per coordinate (insert-time dedup);
* ``n_rows``/``n_cols`` grow monotonically from touched coordinates
  (sparsemat_indexlist.rs:45-47);
* iteration order is row-major with *insertion order within a row*
  (pinned by the reference test src/lib.rs:67-71);
* ``iter_col`` requires an explicit ``assemble_column_info()`` and is
  invalidated by mutation (sparsemat_indexlist.rs:86-96).

Implementation: a C++ open-addressing hash accumulator (native/assembly.cc)
with O(1) amortized insert — strictly better than the reference's O(nnz_row)
chain walk (indexlist.rs:75-78) — with a pure-Python dict fallback.  Freezing
(``to_csr``/``to_coo``/``to_ell``) hands off to the immutable device formats.
"""

from __future__ import annotations

import ctypes
from typing import Iterator, Tuple

import jax.numpy as jnp
import numpy as np

from .types import DEFAULT_INDEX_DTYPE
from .vectors import SparseVec


class _NativeStore:
    """ctypes wrapper over the C++ builder."""

    def __init__(self, lib, capacity: int):
        self._lib = lib
        self._h = lib.smt_builder_new(capacity)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.smt_builder_free(self._h)
            self._h = None

    def add_to(self, i, j, v):
        self._lib.smt_builder_add_to(self._h, i, j, float(v))

    def set(self, i, j, v):
        self._lib.smt_builder_set(self._h, i, j, float(v))

    def get(self, i, j):
        return self._lib.smt_builder_get(self._h, i, j)

    def contains(self, i, j):
        return bool(self._lib.smt_builder_contains(self._h, i, j))

    def _batch(self, fn, rows, cols, vals):
        rows = np.ascontiguousarray(rows, np.int64)
        cols = np.ascontiguousarray(cols, np.int64)
        vals = np.ascontiguousarray(vals, np.float64)
        fn(self._h, rows.shape[0],
           rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
           cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
           vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))

    def add_batch(self, rows, cols, vals):
        self._batch(self._lib.smt_builder_add_batch, rows, cols, vals)

    def set_batch(self, rows, cols, vals):
        self._batch(self._lib.smt_builder_set_batch, rows, cols, vals)

    @property
    def nnz(self):
        return int(self._lib.smt_builder_nnz(self._h))

    @property
    def n_rows(self):
        return int(self._lib.smt_builder_n_rows(self._h))

    @property
    def n_cols(self):
        return int(self._lib.smt_builder_n_cols(self._h))

    def scale(self, s):
        self._lib.smt_builder_scale(self._h, float(s))

    def export_insertion(self):
        n = self.nnz
        rows = np.empty(n, np.int64)
        cols = np.empty(n, np.int64)
        vals = np.empty(n, np.float64)
        self._lib.smt_builder_export(
            self._h,
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return rows, cols, vals

    def export_csr(self):
        n = self.nnz
        nr = self.n_rows
        indptr = np.empty(nr + 1, np.int64)
        cols = np.empty(n, np.int64)
        vals = np.empty(n, np.float64)
        self._lib.smt_builder_export_csr(
            self._h,
            indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return indptr, cols, vals


class _PyStore:
    """Pure-Python fallback: dict keyed (i, j) — dict preserves insertion
    order, giving the chain-order semantics for free."""

    def __init__(self, capacity: int):
        self._d: dict[Tuple[int, int], float] = {}
        self.n_rows = 0
        self.n_cols = 0

    def _touch(self, i, j):
        if i >= self.n_rows:
            self.n_rows = i + 1
        if j >= self.n_cols:
            self.n_cols = j + 1

    def add_to(self, i, j, v):
        self._touch(i, j)
        self._d[(i, j)] = self._d.get((i, j), 0.0) + float(v)

    def set(self, i, j, v):
        self._touch(i, j)
        self._d[(i, j)] = float(v)

    def get(self, i, j):
        return self._d.get((i, j), 0.0)

    def contains(self, i, j):
        return (i, j) in self._d

    def add_batch(self, rows, cols, vals):
        for i, j, v in zip(np.asarray(rows).tolist(), np.asarray(cols).tolist(),
                           np.asarray(vals).tolist()):
            self.add_to(i, j, v)

    def set_batch(self, rows, cols, vals):
        for i, j, v in zip(np.asarray(rows).tolist(), np.asarray(cols).tolist(),
                           np.asarray(vals).tolist()):
            self.set(i, j, v)

    @property
    def nnz(self):
        return len(self._d)

    def scale(self, s):
        for k in self._d:
            self._d[k] *= s

    def export_insertion(self):
        if not self._d:
            return (np.array([], np.int64), np.array([], np.int64),
                    np.array([], np.float64))
        ks = np.array(list(self._d.keys()), np.int64)
        vs = np.array(list(self._d.values()), np.float64)
        return ks[:, 0], ks[:, 1], vs

    def export_csr(self):
        rows, cols, vals = self.export_insertion()
        order = np.argsort(rows, kind="stable")
        counts = np.bincount(rows, minlength=self.n_rows)
        indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        return indptr, cols[order], vals[order]


class SparseBuilder:
    """Incremental sparse-matrix assembly (host side)."""

    def __init__(self, capacity: int = 16, *, dtype=jnp.float32,
                 index_dtype=DEFAULT_INDEX_DTYPE, shape=None):
        from .native import get_lib

        lib = get_lib()
        self._store = _NativeStore(lib, capacity) if lib is not None else _PyStore(capacity)
        self.dtype = jnp.dtype(dtype)
        self.index_dtype = jnp.dtype(index_dtype)
        self._fixed_shape = tuple(shape) if shape is not None else None
        self._column_info_fresh = False
        self._iter_cache = None
        #: row → entry count at the time sort_row ran (entries inserted later
        #: appear after the sorted prefix, in insertion order — exactly the
        #: reference's chain-rewrite semantics, src/sparsemat_indexlist.rs:102-109)
        self._row_sorted_upto: dict[int, int] = {}

    # ≈ with_capacity (src/sparsematrix.rs:84)
    @classmethod
    def with_capacity(cls, capacity: int, **kw) -> "SparseBuilder":
        return cls(capacity, **kw)

    @classmethod
    def eye(cls, dim: int, **kw) -> "SparseBuilder":
        b = cls(dim, **kw)
        idx = np.arange(dim)
        b.set_batch(idx, idx, np.ones(dim))
        return b

    # -- shape --------------------------------------------------------------
    @property
    def shape(self) -> Tuple[int, int]:
        if self._fixed_shape is not None:
            return (max(self._fixed_shape[0], self._store.n_rows),
                    max(self._fixed_shape[1], self._store.n_cols))
        return (self._store.n_rows, self._store.n_cols)

    @property
    def n_rows(self) -> int:
        return self.shape[0]

    @property
    def n_cols(self) -> int:
        return self.shape[1]

    @property
    def nnz(self) -> int:
        return self._store.nnz

    def n_non_zero_entries(self) -> int:
        return self._store.nnz

    # -- writes (insert-if-absent, one entry per coordinate) -----------------
    def add_to(self, i: int, j: int, v) -> None:
        self._column_info_fresh = False
        self._iter_cache = None
        self._store.add_to(int(i), int(j), v)

    def set(self, i: int, j: int, v) -> None:
        self._column_info_fresh = False
        self._iter_cache = None
        self._store.set(int(i), int(j), v)

    def get(self, i: int, j: int):
        return self.dtype.type(self._store.get(int(i), int(j)))

    def __setitem__(self, ij, v):
        self.set(ij[0], ij[1], v)

    def __getitem__(self, ij):
        return self.get(ij[0], ij[1])

    def add_batch(self, rows, cols, vals) -> None:
        """Vectorized add_to — the recommended assembly path (amortizes the
        per-call overhead the reference pays per get_mut)."""
        self._column_info_fresh = False
        self._iter_cache = None
        self._store.add_batch(rows, cols, vals)

    def set_batch(self, rows, cols, vals) -> None:
        self._column_info_fresh = False
        self._iter_cache = None
        self._store.set_batch(rows, cols, vals)

    def scale(self, s) -> "SparseBuilder":
        # values change → the cached insertion view is stale (structure and
        # column-info freshness are unaffected: scale touches no coordinates)
        self._iter_cache = None
        self._store.scale(s)
        return self

    # -- sorting (≈ Sortable, src/sparsematrix.rs:355-366) --------------------
    def sort_row(self, i: int) -> None:
        """Make row i iterate column-sorted (≈ Sortable::sort_row,
        src/sparsemat_indexlist.rs:102-109 — there the chain positions are
        rewritten so chain order becomes sorted order; entries inserted
        *after* the sort append behind the sorted prefix, which this
        bookkeeping reproduces).  Freezes already canonicalize, so this only
        affects builder iteration order."""
        self._row_sorted_upto[int(i)] = sum(1 for _ in self.iter_row(int(i)))

    def sort(self) -> None:
        """Sort every row (≈ Sortable::sort, src/sparsematrix.rs:362-366)."""
        for i in range(self.n_rows):
            self.sort_row(i)

    # -- iteration (reference order semantics) -------------------------------
    def __iter__(self) -> Iterator[Tuple[int, int, float]]:
        """Row-major, insertion order within each row (src/lib.rs:67-71),
        respecting per-row ``sort_row`` rewrites."""
        for i in range(self.n_rows):
            for j, v in self.iter_row(i):
                yield i, j, v

    def _insertion_view(self):
        """Cached insertion-order export plus per-row/per-column position
        indexes (rebuilt only after mutations) — row/column iteration is
        O(entries in that row/column) per call instead of O(total nnz)
        (the reference walks a per-row chain, src/indexlist.rs:85-90; the
        round-1 implementation re-exported the whole store per call)."""
        if self._iter_cache is None:
            rows, cols, vals = self._store.export_insertion()
            nr, nc = self.shape
            ro = np.argsort(rows, kind="stable")   # keeps insertion order
            rptr = np.zeros(nr + 2, np.int64)
            np.add.at(rptr, rows + 1, 1)
            rptr = np.cumsum(rptr)
            co = np.argsort(cols, kind="stable")
            cptr = np.zeros(nc + 2, np.int64)
            np.add.at(cptr, cols + 1, 1)
            cptr = np.cumsum(cptr)
            self._iter_cache = (rows, cols, vals, ro, rptr, co, cptr)
        return self._iter_cache

    def iter_row(self, i: int) -> Iterator[Tuple[int, float]]:
        """(col, val) pairs of row i in insertion order
        (≈ iter_row, src/sparsemat_indexlist.rs:173-188)."""
        rows, cols, vals, ro, rptr, _, _ = self._insertion_view()
        if i < 0 or i + 1 >= len(rptr):
            return
        pos = ro[rptr[i]:rptr[i + 1]]
        k = self._row_sorted_upto.get(i, 0)
        if k:  # sorted prefix (entries present when sort_row ran), then tail
            head = sorted(pos[:k], key=lambda p: cols[p])
            pos = list(head) + list(pos[k:])
        for p in pos:
            yield int(cols[p]), self.dtype.type(vals[p])

    def assemble_column_info(self) -> None:
        """Mark column iteration valid (≈ assemble_column_info,
        src/sparsemat_indexlist.rs:71-84 — there it builds a second chain
        structure; here column views are derived on the fly, but the explicit
        staleness contract is preserved)."""
        self._column_info_fresh = True

    def iter_col(self, j: int) -> Iterator[Tuple[int, float]]:
        """(row, val) pairs of column j in insertion order.  Raises unless
        ``assemble_column_info`` ran since the last mutation
        (≈ src/sparsemat_indexlist.rs:86-96)."""
        if not self._column_info_fresh:
            raise RuntimeError(
                "column info is stale — call assemble_column_info() first")
        rows, cols, vals, _, _, co, cptr = self._insertion_view()
        if j < 0 or j + 1 >= len(cptr):
            return
        for p in co[cptr[j]:cptr[j + 1]]:
            yield int(rows[p]), self.dtype.type(vals[p])

    def get_row(self, i: int) -> SparseVec:
        """Row i as a SparseVec (≈ SparseMatrix::get_row, src/sparsematrix.rs:272-280)."""
        cols_vals = list(self.iter_row(i))
        if cols_vals:
            cols, vals = zip(*cols_vals)
        else:
            cols, vals = (), ()
        return SparseVec(np.array(cols, np.int64), np.array(vals, self.dtype.type),
                         self.n_cols)

    def density(self) -> float:
        nr, nc = self.shape
        return self.nnz / (nr * nc) if nr and nc else 0.0

    def sparsity(self) -> float:
        return 1.0 - self.density()

    # -- freeze to device formats -------------------------------------------
    def to_coo(self, *, pad_to: int | None = None):
        """Freeze to canonical device COO.  ``pad_to`` reserves extra slots."""
        from .formats.coo import COO

        indptr, cols, vals = self._store.export_csr()
        rows = np.repeat(np.arange(len(indptr) - 1, dtype=np.int64),
                         np.diff(indptr))
        # sort columns within rows for canonical order
        order = np.lexsort((cols, rows))
        nr, nc = self.shape
        rows, cols, vals = rows[order], cols[order], vals[order]
        if pad_to is not None and pad_to > rows.shape[0]:
            extra = pad_to - rows.shape[0]
            rows = np.concatenate([rows, np.full(extra, nr, np.int64)])
            cols = np.concatenate([cols, np.zeros(extra, np.int64)])
            vals = np.concatenate([vals, np.zeros(extra)])
        return COO(rows=jnp.asarray(rows.astype(self.index_dtype)),
                   cols=jnp.asarray(cols.astype(self.index_dtype)),
                   vals=jnp.asarray(vals.astype(self.dtype)),
                   shape=(nr, nc), canonical=True)

    def to_csr(self, *, pad_to: int | None = None):
        """≈ to_crs (src/sparsemat_indexlist.rs:61-63)."""
        if pad_to is not None:
            return self.to_coo(pad_to=pad_to).to_csr()
        from .formats.csr import CSR

        rows, cols, vals = self._store.export_insertion()
        return CSR.from_host_coo(rows, cols, vals, self.shape,
                                 dtype=self.dtype, index_dtype=self.index_dtype,
                                 sum_duplicates=False)

    def to_ell(self, n_cols_per_row: int | None = None):
        return self.to_csr().to_ell(n_cols_per_row=n_cols_per_row)

    def freeze(self, format: str = "csr"):
        return getattr(self, f"to_{format}")()

    # -- convenience compute (freeze + op) -----------------------------------
    def mvp(self, x):
        from .ops import spmv

        return spmv(self.to_csr(), jnp.asarray(x))

    def todense(self) -> np.ndarray:
        rows, cols, vals = self._store.export_insertion()
        out = np.zeros(self.shape, self.dtype)
        np.add.at(out, (rows, cols), vals.astype(out.dtype))
        return out

    def __repr__(self):
        native = isinstance(self._store, _NativeStore)
        return (f"SparseBuilder(shape={self.shape}, nnz={self.nnz}, "
                f"dtype={self.dtype}, backend={'native' if native else 'python'})")


class PartitionedBuilder:
    """Block-row partitioned assembly — successor of ``SparseMatPar``
    (reference: src/sparsemat_par.rs:12-35).

    ``n_blocks`` sub-builders each own ``max_n_rows / n_blocks`` contiguous
    rows; writes route by ``row // rows_per_block`` (clamped to the last
    block — fixing the reference's off-by-one ``min(.., n_blocks)`` routing,
    sparsemat_par.rs:31-35).  Freezing produces the per-block CSRs consumed
    by the distributed layer (parallel/), whose shard_map SpMV realizes the
    thread-parallel kernel the reference left commented out
    (sparsemat_par.rs:37-68).
    """

    def __init__(self, n_blocks: int, max_n_rows: int, **kw):
        if n_blocks < 1 or max_n_rows < n_blocks:
            raise ValueError("need n_blocks >= 1 and max_n_rows >= n_blocks")
        self.n_blocks = n_blocks
        self.rows_per_block = max_n_rows // n_blocks
        self.max_n_rows = max_n_rows
        self.blocks = [SparseBuilder(**kw) for _ in range(n_blocks)]

    @classmethod
    def with_sub_matrices(cls, n_blocks: int, max_n_rows: int, **kw):
        return cls(n_blocks, max_n_rows, **kw)

    def _route(self, i: int) -> Tuple[int, int]:
        b = min(i // self.rows_per_block, self.n_blocks - 1)
        return b, i - b * self.rows_per_block

    def add_to(self, i, j, v):
        b, r = self._route(int(i))
        self.blocks[b].add_to(r, j, v)

    def set(self, i, j, v):
        b, r = self._route(int(i))
        self.blocks[b].set(r, j, v)

    def get(self, i, j):
        b, r = self._route(int(i))
        return self.blocks[b].get(r, j)

    def __setitem__(self, ij, v):
        self.set(ij[0], ij[1], v)

    def __getitem__(self, ij):
        return self.get(ij[0], ij[1])

    @property
    def nnz(self) -> int:
        return sum(b.nnz for b in self.blocks)

    @property
    def shape(self) -> Tuple[int, int]:
        n_rows = 0
        n_cols = 0
        for k, b in enumerate(self.blocks):
            if b.nnz:
                n_rows = max(n_rows, k * self.rows_per_block + b.n_rows)
            n_cols = max(n_cols, b.n_cols)
        return (n_rows, n_cols)

    @property
    def n_rows(self) -> int:
        return self.shape[0]

    @property
    def n_cols(self) -> int:
        return self.shape[1]

    def density(self) -> float:
        nr, nc = self.shape
        return self.nnz / (nr * nc) if nr and nc else 0.0

    def __iter__(self):
        for k, blk in enumerate(self.blocks):
            off = k * self.rows_per_block
            for i, j, v in blk:
                yield i + off, j, v

    def iter_row(self, i: int):
        b, r = self._route(int(i))
        return self.blocks[b].iter_row(r)

    def to_coo(self):
        """Freeze the union of blocks into one canonical COO."""
        from .formats.coo import COO

        rows_all, cols_all, vals_all = [], [], []
        for k, blk in enumerate(self.blocks):
            r, c, v = blk._store.export_insertion()
            rows_all.append(r + k * self.rows_per_block)
            cols_all.append(c)
            vals_all.append(v)
        rows = np.concatenate(rows_all) if rows_all else np.array([], np.int64)
        cols = np.concatenate(cols_all) if cols_all else np.array([], np.int64)
        vals = np.concatenate(vals_all) if vals_all else np.array([], np.float64)
        order = np.lexsort((cols, rows))
        nr, nc = self.shape
        b0 = self.blocks[0]
        return COO(rows=jnp.asarray(rows[order].astype(b0.index_dtype)),
                   cols=jnp.asarray(cols[order].astype(b0.index_dtype)),
                   vals=jnp.asarray(vals[order].astype(b0.dtype)),
                   shape=(nr, nc), canonical=True)

    def to_csr(self):
        return self.to_coo().to_csr()

    def mvp(self, x):
        from .ops import spmv

        return spmv(self.to_csr(), jnp.asarray(x))
