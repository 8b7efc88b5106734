"""SlabELL — slab-windowed, window-bucketed ELL: the Pallas format for
*scattered* rows with bounded column span (the SuiteSparse/FEM regime —
BASELINE.md pwtk/cant).

Motivation.  WELL (well.py) keys tiles by (8-row block, single 128-column
window); on matrices whose rows scatter ~50 entries across a wide band, each
tile holds 1-2 entries, the tile count explodes into the millions, and the
kernel drowns in per-grid-step overhead.  A first SlabELL cut kept the CSR
row-major ELL layout and swept all S windows of the block's slab with masked
gathers — measured compute-bound at ~6 ops × S per stored entry (the mask
sweep, not the gather, dominates), with the misaligned (rows, K) trailing
dim halving DMA bandwidth on top.

This layout removes both costs:

* **window buckets** — each block's entries are regrouped by the 128-column
  window they fall in.  The kernel loops the S buckets and processes each
  with ONE unmasked 128-lane gather + FMA per sublane group: no window
  masking at all.  Bucket heights are static (global max per window,
  rounded to the 8-sublane granule), so padding replaces masking.
* **transposed tiles** — ``vals``/``lidx`` are (n_rb, C, RB) with the
  row-block on the 128-lane axis (RB a multiple of 128), so every DMA is
  lane-aligned.
* **x resident in VMEM** — the operand vector is reshaped to (n_win, 128)
  windows and passed as a whole-array block; each bucket reads its window
  by one dynamic sublane slice (``win_lo[block] + w``), so there is no
  per-step manual DMA or semaphore traffic.

Traffic per SpMV ≈ C/K × ELL bytes (the bucket-padding inflation, typically
1.5-3× for banded scatter) but the kernel does ~4 vector ops per stored
slot instead of ~6 × S — on pwtk-like matrices this is the difference
between compute-bound at 7% of the HBM roofline and bandwidth-bound.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import SparseFormat, array_field, register_format, static_field

SLAB_ROW_BLOCK = 256
WINDOW = 128
SUBLANE = 8


@register_format
@dataclasses.dataclass(frozen=True)
class SlabELL(SparseFormat):
    """Frozen slab-windowed matrix (host-built).

    ``vals``/``lidx``: (n_rb, C, RB) transposed tiles — the C axis is the
    concatenation of S window buckets whose static (offset, height) ranges
    are ``buckets``; ``lidx`` is the column within the bucket's window
    (0..127, padding slots 0 with val 0); ``win_lo``: (n_rb,) first window
    of each block's slab; ``bucket_cnt``: (n_rb, S, RB) stored-entry count
    per (block, window, lane-row) — entries fill a bucket's ranks
    consecutively, so rank < count ⟺ stored.  Preserves explicitly-stored
    zeros on round-trip (≈ ``get_mut`` zero-insert contract,
    src/sparsematrix.rs:112-114); may be None for ad-hoc constructions
    (e.g. DistSlab shards — falls back to ``val != 0``).
    """

    _spmv_read_fields = ("vals", "lidx", "win_lo")  # bucket_cnt: round-trip only

    vals: jax.Array = array_field()
    lidx: jax.Array = array_field()
    win_lo: jax.Array = array_field()
    bucket_cnt: jax.Array | None = array_field()
    shape: Tuple[int, int] = static_field()
    #: ((offset, height), ...) per slab window — offsets into the C axis
    buckets: Tuple[Tuple[int, int], ...] = static_field()

    @classmethod
    def from_csr(cls, csr, rb: int = SLAB_ROW_BLOCK) -> "SlabELL":
        """Host-side freeze.  ``rb`` must be a multiple of 128 (the tile
        lane width).  Columns within each row must be (and are, for
        canonical CSR) sorted, so a row's slots per window are consecutive."""
        if rb % WINDOW:
            raise ValueError(f"rb must be a multiple of {WINDOW}, got {rb}")
        n_rows, n_cols = csr.shape
        indptr = csr.host("indptr").astype(np.int64)
        indices = csr.host("indices").astype(np.int64)
        data = csr.host("data")
        nnz = int(indptr[-1])
        n_rb = max(-(-n_rows // rb), 1)

        if nnz == 0:
            return cls(vals=jnp.zeros((n_rb, SUBLANE, rb), data.dtype),
                       lidx=jnp.zeros((n_rb, SUBLANE, rb), jnp.int32),
                       win_lo=jnp.zeros((n_rb,), jnp.int32),
                       bucket_cnt=jnp.zeros((n_rb, 1, rb), jnp.int32),
                       shape=(n_rows, n_cols),
                       buckets=((0, SUBLANE),))

        counts = np.diff(indptr)
        rows = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
        blk = rows // rb
        lrow = (rows % rb).astype(np.int64)
        win = indices // WINDOW

        # slab base per block over REAL entries
        lo = np.full(n_rb, np.iinfo(np.int64).max)
        np.minimum.at(lo, blk, win)
        hi = np.zeros(n_rb, np.int64)
        np.maximum.at(hi, blk, win)
        lo[lo == np.iinfo(np.int64).max] = 0
        s = int((hi - lo).max(initial=0)) + 1

        w_rel = win - lo[blk]                      # slab window ∈ [0, S)
        # rank of each entry within its (row, window) group: rows are
        # column-sorted, so groups are consecutive runs
        boundary = np.empty(nnz, bool)
        boundary[0] = True
        boundary[1:] = (rows[1:] != rows[:-1]) | (w_rel[1:] != w_rel[:-1])
        idx = np.arange(nnz, dtype=np.int64)
        run_start = idx[boundary]
        rank = idx - run_start[np.cumsum(boundary) - 1]

        # static bucket heights: global max rank per slab window, 8-rounded
        heights = np.zeros(s, np.int64)
        np.maximum.at(heights, w_rel, rank + 1)
        heights = -(-heights // SUBLANE) * SUBLANE
        heights = np.maximum(heights, SUBLANE)
        offs = np.concatenate([[0], np.cumsum(heights)])
        c_total = int(offs[-1])

        vals_t = np.zeros((n_rb, c_total, rb), data.dtype)
        lidx_t = np.zeros((n_rb, c_total, rb), np.int32)
        cpos = offs[w_rel] + rank
        vals_t[blk, cpos, lrow] = data[:nnz]
        lidx_t[blk, cpos, lrow] = (indices % WINDOW).astype(np.int32)
        cnt = np.zeros((n_rb, s, rb), np.int32)
        np.add.at(cnt, (blk, w_rel, lrow), 1)
        buckets = tuple((int(offs[w]), int(heights[w])) for w in range(s))
        return cls(vals=jnp.asarray(vals_t), lidx=jnp.asarray(lidx_t),
                   win_lo=jnp.asarray(lo.astype(np.int32)),
                   bucket_cnt=jnp.asarray(cnt),
                   shape=(n_rows, n_cols), buckets=buckets)

    # -- canonical views ------------------------------------------------------
    def _window_of_cpos(self) -> np.ndarray:
        """Static (C,) slab-window id per C-axis position."""
        w_of = np.zeros(self.c_total, np.int32)
        for w, (o, h) in enumerate(self.buckets):
            w_of[o : o + h] = w
        return w_of

    def to_coo(self):
        from .coo import COO

        n_rb, c, rb = self.vals.shape
        n_rows = self.shape[0]
        w_of = jnp.asarray(self._window_of_cpos())
        cols = (self.lidx.astype(jnp.int32)
                + (self.win_lo[:, None, None] + w_of[None, :, None]) * WINDOW)
        rows = (jnp.arange(n_rb, dtype=jnp.int32)[:, None, None] * rb
                + jnp.arange(rb, dtype=jnp.int32)[None, None, :])
        rows = jnp.broadcast_to(rows, self.vals.shape).reshape(-1)
        cols = cols.reshape(-1)
        vals = self.vals.reshape(-1)
        stored = self._stored_mask().reshape(-1)
        return COO(rows=jnp.where(stored, rows, n_rows),
                   cols=jnp.where(stored, cols, 0),
                   vals=jnp.where(stored, vals, 0),
                   shape=self.shape, canonical=False)

    def _stored_mask(self) -> jax.Array:
        """(n_rb, C, RB) bool: slot holds a stored entry (incl. explicit
        zeros) vs bucket padding."""
        if self.bucket_cnt is None:
            return self.vals != 0
        w_of = self._window_of_cpos()                      # (C,) static
        offs = np.array([o for o, _ in self.buckets], np.int32)
        rank_c = jnp.asarray(np.arange(self.c_total, dtype=np.int32)
                             - offs[w_of])                 # rank within bucket
        cnt_c = self.bucket_cnt[:, jnp.asarray(w_of), :]   # (n_rb, C, RB)
        return rank_c[None, :, None] < cnt_c

    def to_csr(self):
        return self.to_coo().to_csr()

    # -- structure --------------------------------------------------------------
    @property
    def nse(self) -> int:
        return int(np.prod(self.vals.shape))

    @property
    def row_block(self) -> int:
        return int(self.vals.shape[2])

    @property
    def n_row_blocks(self) -> int:
        return int(self.vals.shape[0])

    @property
    def c_total(self) -> int:
        return int(self.vals.shape[1])

    @property
    def slab_windows(self) -> int:
        return len(self.buckets)

    @property
    def index_dtype(self):
        return jnp.dtype(jnp.int32)

    @property
    def data(self):
        return self.vals

    def n_non_zero_entries(self):
        if self.bucket_cnt is not None:
            return jnp.sum(self.bucket_cnt).astype(jnp.int32)
        return jnp.sum(self.vals != 0).astype(jnp.int32)

    def scale(self, scalar) -> "SlabELL":
        return dataclasses.replace(
            self, vals=self.vals * jnp.asarray(scalar, self.vals.dtype))

    def fill_ratio(self) -> float:
        n = int(np.asarray(self.n_non_zero_entries()))
        return n / max(self.nse, 1)

    def x_windows(self) -> int:
        """Windows of the operand vector incl. slab overrun slack."""
        return -(-self.shape[1] // WINDOW) + self.slab_windows

    def x_bytes(self, itemsize: int = 4) -> int:
        """VMEM footprint of the resident operand vector (dispatch guard)."""
        return self.x_windows() * WINDOW * itemsize
