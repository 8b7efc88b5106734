"""SlabELL — slab-windowed ELL: the Pallas format for *scattered* rows with
bounded column span (the SuiteSparse/FEM regime — BASELINE.md pwtk/cant).

Motivation.  WELL (well.py) keys tiles by (8-row block, single 128-column
window); on matrices whose rows scatter ~50 entries across a wide band, each
tile holds 1-2 entries, the tile count explodes into the millions, and the
kernel drowns in per-grid-step overhead (measured 0.036 Gnnz/s).  SlabELL
inverts the layout: one grid step per *row block* (RB = 32 rows), which DMAs
a single contiguous **x slab** — the (S × 128)-window range covering every
column the block touches — and loops the S windows in-kernel, doing one
(RB × 128) ``take_along_axis`` gather per window (Mosaic's vector gather is
exactly 128 lanes wide — wider shapes fail to compile; probed empirically).
Per-slot partial products accumulate in registers and reduce once at the end.

Layout (ELL within the block):
* ``vals``/``lidx``: (n_rb, RB, K) — K = max nnz/row, ``lidx`` = column
  − 128·win_lo[rb] (slab-local), padding slots (val 0, lidx 0);
* ``win_lo``: (n_rb,) first 128-column window of each block's span;
* ``slab_windows`` (static S): max window span over blocks — matrices with a
  bounded bandwidth keep S small; a single full-width row blows S up, so
  ``from_csr`` reports the span for dispatch decisions.

Traffic per SpMV ≈ ELL bytes (n·K·8) + one slab per block (bandwidth-bound
re-read factor = S·128·RB⁻¹ per row) — for a ±2048-band matrix at RB=32
that is ~2 slabs of x per 32 rows, a ~150× win over the serialized XLA
gather stream.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import SparseFormat, array_field, register_format, static_field

SLAB_ROW_BLOCK = 32
WINDOW = 128


@register_format
@dataclasses.dataclass(frozen=True)
class SlabELL(SparseFormat):
    """Frozen slab-windowed ELL matrix (host-built)."""

    vals: jax.Array = array_field()
    lidx: jax.Array = array_field()
    win_lo: jax.Array = array_field()
    shape: Tuple[int, int] = static_field()
    slab_windows: int = static_field()

    @classmethod
    def from_csr(cls, csr, rb: int = SLAB_ROW_BLOCK) -> "SlabELL":
        """Host-side freeze.  Columns within each row must be (and are, for
        canonical CSR) sorted; the slab is the window range of the block."""
        n_rows, n_cols = csr.shape
        indptr = csr.host("indptr").astype(np.int64)
        indices = csr.host("indices").astype(np.int64)
        data = csr.host("data")
        nnz = int(indptr[-1])
        counts = np.diff(indptr)
        k = max(int(counts.max(initial=0)), 1)
        n_rb = max(-(-n_rows // rb), 1)

        vals = np.zeros((n_rb * rb, k), data.dtype)
        cols = np.zeros((n_rb * rb, k), np.int64)
        valid = np.zeros((n_rb * rb, k), bool)
        if nnz:
            rows = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
            slot = np.arange(nnz) - np.repeat(indptr[:-1], counts)
            vals[rows, slot] = data[:nnz]
            cols[rows, slot] = indices[:nnz]
            valid[rows, slot] = True
        bvals = vals.reshape(n_rb, rb, k)
        bcols = cols.reshape(n_rb, rb, k)
        bvalid = valid.reshape(n_rb, rb, k)
        # slab range over REAL entries only (padding slots/rows excluded)
        big = np.iinfo(np.int64).max
        cmin = np.where(bvalid, bcols, big).min(axis=(1, 2))
        cmax = np.where(bvalid, bcols, -1).max(axis=(1, 2))
        any_valid = bvalid.any(axis=(1, 2))
        lo = np.where(any_valid, cmin // WINDOW, 0).astype(np.int64)
        hi = np.where(any_valid, cmax // WINDOW, 0)
        s = int((hi - lo).max(initial=0)) + 1
        # padding slots point at the slab base (lidx 0) so they stay in range
        bcols = np.where(bvalid, bcols, (lo * WINDOW)[:, None, None])
        lidx = (bcols - (lo * WINDOW)[:, None, None]).astype(np.int32)
        return cls(vals=jnp.asarray(bvals), lidx=jnp.asarray(lidx),
                   win_lo=jnp.asarray(lo.astype(np.int32)),
                   shape=(n_rows, n_cols), slab_windows=s)

    # -- canonical views ------------------------------------------------------
    def to_coo(self):
        from .coo import COO

        n_rb, rb, k = self.vals.shape
        n_rows = self.shape[0]
        rows = (jnp.arange(n_rb * rb, dtype=jnp.int32)
                .reshape(n_rb, rb)[:, :, None])
        cols = self.lidx.astype(jnp.int32) + (
            self.win_lo[:, None, None].astype(jnp.int32) * WINDOW)
        rows = jnp.broadcast_to(rows, self.vals.shape).reshape(-1)
        cols = cols.reshape(-1)
        vals = self.vals.reshape(-1)
        stored = vals != 0
        return COO(rows=jnp.where(stored, rows, n_rows),
                   cols=jnp.where(stored, cols, 0),
                   vals=vals, shape=self.shape, canonical=False)

    def to_csr(self):
        return self.to_coo().to_csr()

    # -- structure --------------------------------------------------------------
    @property
    def nse(self) -> int:
        return int(np.prod(self.vals.shape))

    @property
    def row_block(self) -> int:
        return int(self.vals.shape[1])

    @property
    def n_row_blocks(self) -> int:
        return int(self.vals.shape[0])

    @property
    def k(self) -> int:
        return int(self.vals.shape[2])

    @property
    def index_dtype(self):
        return jnp.dtype(jnp.int32)

    @property
    def data(self):
        return self.vals

    def n_non_zero_entries(self):
        return jnp.sum(self.vals != 0).astype(jnp.int32)

    def scale(self, scalar) -> "SlabELL":
        return dataclasses.replace(
            self, vals=self.vals * jnp.asarray(scalar, self.vals.dtype))

    def fill_ratio(self) -> float:
        n = int(np.asarray(self.n_non_zero_entries()))
        return n / max(self.nse, 1)

    def slab_bytes(self) -> int:
        """VMEM footprint of one x slab (dispatch guard)."""
        return self.slab_windows * WINDOW * 4
