"""Structural algebra: add/sub, transpose, SpGEMM, bilinear forms, symmetry.

Reference counterparts are the SparseMatrix trait-default algorithms
(reference: src/sparsematrix.rs:124-223): ``add``/``sub`` via per-entry
add_to (:124-143), ``transpose`` via re-insertion (:174-183), ``prod``
SpGEMM via a dense column sweep with a sorted-row merge (:186-210),
``inner_prod`` bilinear form (:161-171), ``is_symmetric`` (:213-223).

TPU-native redesign: every structural op is a batch sort/segment-scan over
flat entry streams with *static* output capacities (XLA requires static
shapes).  Outputs are canonical COO with tail padding; ``prune()`` compacts
host-side.  SpGEMM expands A's entries against B's rows in ELL form —
bounded fan-out nse_A × K_B — then canonicalizes; this is the
capacity-bounded strategy for unpredictable output nnz (SURVEY.md §7a).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.base import dedup_sorted_coo, sort_coo
from ..formats.coo import COO
from ..types import accum_dtype, compute_index_dtype
from .matvec import spmv


class DimensionError(ValueError):
    """≈ SparseMatError::DimensionMismatch (src/sparsematrix.rs:10-26), but an
    exception at the Python API edge instead of a Result type."""


def _same_format_as(template, coo: COO):
    """Convert a canonical COO result back to the input's format class."""
    from ..formats.csr import CSR
    from ..formats.ell import ELL

    if isinstance(template, CSR):
        return coo.to_csr()
    if isinstance(template, ELL):
        return coo.to_csr().to_ell()
    return coo


def add(a, b):
    """A + B — union of patterns, values summed (≈ src/sparsematrix.rs:124-136).

    Output capacity = nse_A + nse_B with tail padding for coordinates that
    coincided.  Shapes must be broadcast-compatible the way the reference's
    add_to loop implies: result shape = elementwise max.
    """
    ca, cb = a.to_coo(), b.to_coo()
    shape = (max(ca.shape[0], cb.shape[0]), max(ca.shape[1], cb.shape[1]))
    # re-tag padding of each operand to the merged shape's pad row
    def retag(c):
        valid = c.rows.astype(jnp.int32) < c.shape[0]
        return (jnp.where(valid, c.rows.astype(jnp.int32), shape[0]),
                jnp.where(valid, c.cols.astype(jnp.int32), 0),
                jnp.where(valid, c.vals, 0))

    ra, cca, va = retag(ca)
    rb, ccb, vb = retag(cb)
    dt = jnp.result_type(va.dtype, vb.dtype)
    rows = jnp.concatenate([ra, rb])
    cols = jnp.concatenate([cca, ccb])
    vals = jnp.concatenate([va.astype(dt), vb.astype(dt)])
    r, c, v = sort_coo(rows, cols, vals, shape)
    r, c, v, _ = dedup_sorted_coo(r, c, v, shape)
    idt = ca.index_dtype
    out = COO(rows=r.astype(idt), cols=c.astype(idt), vals=v, shape=shape,
              canonical=True)
    return _same_format_as(a, out)


def sub(a, b):
    """A − B (≈ src/sparsematrix.rs:139-143)."""
    return add(a, b.scale(-1))


def transpose(a):
    """Aᵀ (≈ src/sparsematrix.rs:174-183, which re-inserts entry-by-entry;
    here: swap coordinate arrays and re-sort — one device sort)."""
    coo = a.to_coo()
    n_rows, n_cols = coo.shape
    valid = coo.rows.astype(jnp.int32) < n_rows
    new_rows = jnp.where(valid, coo.cols.astype(jnp.int32), n_cols)
    new_cols = jnp.where(valid, coo.rows.astype(jnp.int32), 0)
    new_vals = jnp.where(valid, coo.vals, 0)
    shape = (n_cols, n_rows)
    r, c, v = sort_coo(new_rows, new_cols, new_vals, shape)
    idt = coo.index_dtype
    out = COO(rows=r.astype(idt), cols=c.astype(idt), vals=v, shape=shape,
              canonical=True)
    return _same_format_as(a, out)


#: cap on the materialized B-ELL operand of SpGEMM — a zipf-tailed operand
#: (scircuit-class: one near-dense row) would otherwise inflate the (n, K)
#: rectangle to gigabytes.  Above this the chunked path windows B's slots.
_SPGEMM_ELL_BUDGET = 1 << 28  # 256 MB


def spgemm(a, b, *, n_cols_per_row_b: int | None = None,
           max_fanout_slots: int = 1 << 25, out_capacity: int | None = None):
    """C = A @ B for two sparse operands (≈ ``prod``,
    src/sparsematrix.rs:186-210).

    The reference demands a pre-assembled column view on ``b`` and sweeps all
    n_cols columns per row; here B is frozen to ELL so each A-entry
    (i, k, a_ik) fans out against row k of B in a static (nse_A × K_B)
    expansion, then one sort + segment-sum canonicalizes.  Output stores sums
    for every structurally-reached coordinate; use ``.prune(keep_zeros=False)``
    to match the reference's nonzero-only storage (src/sparsematrix.rs:204-206).

    Large products (fan-out above ``max_fanout_slots``) run the DEVICE-SIDE
    partitioned ESC (expand–sort–compress) path, ``_spgemm_device_esc``:
    exact per-candidate offsets, row-aligned fixed-capacity parts, one
    sort + segment-sum dedup per part, results concatenated (disjoint row
    ranges — no cross-part merging).  Host involvement is O(small) scalar
    readbacks (the fan-out plan and one unique-count per part).  The ESC
    path requires concrete (non-traced) operands; under jit the one-shot
    expansion is used regardless.  ``out_capacity`` is accepted for
    backwards compatibility (the ESC path sizes itself exactly).

    Dimension guard: standard inner-dimension match (A.n_cols == B.n_rows).
    [The reference instead checks n_rows==rhs.n_cols && n_cols==rhs.n_rows
    (src/sparsematrix.rs:188) — equivalent for the square matrices its tests
    use; the textbook rule is intended.]
    """
    if a.shape[1] != b.shape[0]:
        raise DimensionError(
            f"spgemm: inner dimensions differ — {a.shape} @ {b.shape}")
    ca = a.to_coo()
    shape = (a.shape[0], b.shape[1])
    adt = accum_dtype(jnp.result_type(ca.vals.dtype, b.dtype))

    traced = isinstance(ca.vals, jax.core.Tracer)
    if not traced:
        bcsr = b.to_csr()
        kb = (n_cols_per_row_b if n_cols_per_row_b is not None
              else max(bcsr.max_row_nnz(), 1))
        slot_bytes = 4 + jnp.dtype(adt).itemsize  # int32 col + accum value
        ell_bytes = bcsr.shape[0] * kb * slot_bytes
        if ca.nse * kb > max_fanout_slots or ell_bytes > _SPGEMM_ELL_BUDGET:
            return _same_format_as(a, _spgemm_device_esc(ca, bcsr, shape, adt))

    bell = b.to_ell(n_cols_per_row=n_cols_per_row_b)
    kb = bell.n_cols_per_row
    return _same_format_as(a, _spgemm_oneshot(ca, bell, shape, kb, adt))


#: candidate slots per ESC part (each part = one sort + dedup dispatch)
_SPGEMM_PART_SLOTS = 1 << 25
#: candidate slots per expansion dispatch (bounds temporary gather size)
_SPGEMM_CHUNK_SLOTS = 1 << 24


def _spgemm_device_esc(ca, bcsr, shape, adt, *,
                       part_slots: int = _SPGEMM_PART_SLOTS):
    """Partitioned ESC (expand–sort–compress) SpGEMM — the round-3 rebuild
    of the device path (replaces the per-chunk accumulator re-sort that ran
    3-4 orders of magnitude below useful throughput).

    Plan (one jitted program + small readbacks):
      * exact per-A-entry fan-out ``cnt`` (the degree of its B row) and
        exclusive-cumsum offsets — every candidate product has a unique,
        known position in the virtual fan-out stream of length F;
      * per-entry *level* = ceil(log2(cnt)): entries are processed grouped
        by level so each is padded at most 2×, killing both failure modes
        of the old dual-stream split (per-window re-expansion of heavy
        entries, and global padding by the max degree);
      * row-aligned *parts*: the fan-out stream is cut at row boundaries
        into parts of ≤ ``part_slots`` candidates.  Output rows of distinct
        parts are disjoint, so per-part results concatenate with NO merge.

    Per part: level-grouped expansion chunks gather B slots straight from
    CSR (`indices[indptr[k] + slot]` — no materialized B-ELL rectangle) and
    scatter candidates to their exact offsets in a fixed-size part buffer;
    then ONE canonical sort + segment-sum dedup compacts the part.  All
    dispatch shapes are quantized (fixed part size, fixed per-level chunk
    shapes), so the whole run compiles O(levels) programs regardless of
    matrix size.  Matches the output semantics of the reference's ``prod``
    (src/sparsematrix.rs:186-210) with structural sums retained.
    """
    n_rows, n_cols = shape
    nse = ca.nse
    nnz_b = int(bcsr.indices.shape[0])
    _blk = 4096

    @jax.jit
    def _plan(rows, cols, indptr, row_entry_ptr):
        valid = rows.astype(jnp.int32) < n_rows
        bcnt = (indptr[1:] - indptr[:-1]).astype(jnp.int32)
        cnt = jnp.where(valid, bcnt.at[cols.astype(jnp.int32)].get(
            mode="fill", fill_value=0), 0)
        off = jnp.cumsum(cnt) - cnt                       # exclusive, int32
        # ceil(log2(cnt)) for cnt>=1; empty fan-outs get the sentinel level
        lvl = jnp.where(cnt >= 2,
                        32 - jax.lax.clz(jnp.maximum(cnt, 2) - 1), 0)
        lvl = jnp.where(cnt == 0, 31, lvl).astype(jnp.int32)
        # fan-out summed in int32-safe blocks (int64 truncates without x64)
        padded = jnp.pad(cnt, (0, -cnt.shape[0] % _blk))
        fan_blocks = jnp.sum(padded.reshape(-1, _blk), axis=1)
        # cumulative fan-out at each row boundary (for row-aligned parts)
        row_fan = (off.at[jnp.minimum(row_entry_ptr, nse - 1)]
                   .get(mode="clip"))
        total = off[-1] + cnt[-1]
        row_fan = jnp.where(row_entry_ptr >= nse, total, row_fan)
        return cnt, off, lvl, fan_blocks, row_fan

    idt = compute_index_dtype(ca.index_dtype)
    if nse == 0:
        return COO(rows=jnp.full((1,), n_rows, idt),
                   cols=jnp.zeros((1,), idt),
                   vals=jnp.zeros((1,), adt), shape=shape, canonical=True)

    # entry index of each row start (ca is canonical → rows ascending)
    from ..formats.base import rows_to_indptr

    row_entry_ptr = rows_to_indptr(ca.rows, n_rows, jnp.int32)
    cnt, off, lvl, fan_blocks, row_fan = _plan(
        ca.rows, ca.cols, bcsr.indptr, row_entry_ptr)
    fanout = int(np.asarray(fan_blocks, np.int64).sum())
    if fanout >= (1 << 31) - (1 << 26):
        raise NotImplementedError(
            f"spgemm fan-out {fanout:,} overflows int32 offsets — split the "
            "left operand by rows and concatenate the products")
    if fanout == 0:
        return COO(rows=jnp.full((1,), n_rows, idt),
                   cols=jnp.zeros((1,), idt),
                   vals=jnp.zeros((1,), adt), shape=shape, canonical=True)

    # ---- part boundaries: greedy row-aligned cuts (device searchsorted,
    # one scalar readback per part) — each part holds whole rows and at most
    # ``part_slots`` candidates.  A part must hold its worst row whole, so
    # grow part_slots if one row's fan-out exceeds it (row alignment is what
    # lets per-part results concatenate with no merge).
    max_row_fan = int(jnp.max(row_fan[1:] - row_fan[:-1]))
    part_slots = max(part_slots, 1 << (max(max_row_fan, 1) - 1).bit_length())
    part_slots = min(part_slots, 1 << (max(fanout, 1) - 1).bit_length())
    part_row_bounds = [0]
    part_off_bounds = [0]
    while part_off_bounds[-1] < fanout:
        nxt = int(jnp.searchsorted(
            row_fan, jnp.asarray(part_off_bounds[-1] + part_slots, jnp.int32),
            side="right")) - 1
        nxt = max(nxt, part_row_bounds[-1] + 1)   # progress (≥1 row fits)
        if part_off_bounds[-1] + part_slots >= fanout:
            nxt = n_rows
        part_row_bounds.append(min(nxt, n_rows))
        part_off_bounds.append(
            fanout if nxt >= n_rows else int(row_fan[nxt]))
    part_row_bounds = np.asarray(part_row_bounds)
    part_off_bounds = np.asarray(part_off_bounds)
    part_entry_bounds = np.array(
        row_entry_ptr.at[jnp.asarray(part_row_bounds)].get(mode="clip"))
    part_entry_bounds[-1] = nse

    # ---- level-grouped entry order (device) -------------------------------
    # per (part, level) counts: key = part * 32 + lvl
    n_parts = len(part_row_bounds) - 1
    part_of_entry = jnp.searchsorted(
        jnp.asarray(part_entry_bounds[1:-1], jnp.int32),
        jnp.arange(nse, dtype=jnp.int32), side="right")
    key = part_of_entry * 32 + lvl
    order = jnp.argsort(key, stable=True)
    pl_hist = np.asarray(jnp.zeros((n_parts * 32,), jnp.int32).at[key].add(1))
    pl_starts = np.concatenate([[0], np.cumsum(pl_hist)])
    # chunk sizes are quantized powers of two, bounded by the entry count —
    # shapes repeat across parts/levels so compiles stay O(levels)
    c_cap = min(_SPGEMM_CHUNK_SLOTS, 1 << (max(nse, 1) - 1).bit_length())
    order_pad = jnp.concatenate(
        [order.astype(jnp.int32), jnp.full((c_cap,), nse, jnp.int32)])

    a_rows = jnp.where(ca.rows.astype(jnp.int32) < n_rows,
                       ca.rows.astype(jnp.int32), n_rows)
    a_cols = ca.cols.astype(jnp.int32)
    a_vals = ca.vals.astype(adt)
    b_start = bcsr.indptr[:-1].astype(jnp.int32)

    out_r, out_c, out_v = [], [], []
    for p in range(n_parts):
        base = int(part_off_bounds[p])
        psize = int(part_off_bounds[p + 1]) - base
        buf_r = jnp.full((part_slots,), n_rows, jnp.int32)
        buf_c = jnp.zeros((part_slots,), jnp.int32)
        buf_v = jnp.zeros((part_slots,), jnp.dtype(adt))
        for l in range(31):                       # level 31 = empty fan-out
            n_pl = int(pl_hist[p * 32 + l])
            if n_pl == 0:
                continue
            kw = 1 << l
            # chunk width: the dispatch slot budget, or a fixed mini-chunk
            # for sparse levels — otherwise a 200-entry level at kw=4096
            # would pay a full 2^24-slot dispatch of gather/scatter work.
            # Exactly TWO shape choices per level keep the remote-compile
            # count bounded (each cold compile costs ~25 s on this platform).
            full = max(min(_SPGEMM_CHUNK_SLOTS // kw, c_cap), 1)
            mini = max(min(4096, full), 1)
            c_chunk = mini if n_pl <= mini else full
            s0 = int(pl_starts[p * 32 + l])
            for s in range(s0, s0 + n_pl, c_chunk):
                buf_r, buf_c, buf_v = _esc_expand_chunk(
                    buf_r, buf_c, buf_v, order_pad, jnp.asarray(s, jnp.int32),
                    a_rows, a_cols, a_vals, cnt, off,
                    jnp.asarray(base, jnp.int32),
                    jnp.asarray(psize, jnp.int32),
                    b_start, bcsr.indices, bcsr.data,
                    kw=kw, c=c_chunk, part_slots=part_slots,
                    n_rows=n_rows, adt=jnp.dtype(adt))
        r, c, v, nu = _esc_finalize(buf_r, buf_c, buf_v, shape=shape,
                                    adt=jnp.dtype(adt))
        nu = int(nu)                               # one scalar readback/part
        out_r.append(r[:max(nu, 1)])
        out_c.append(c[:max(nu, 1)])
        out_v.append(v[:max(nu, 1)])

    if n_parts == 1:
        rows, cols, vals = out_r[0], out_c[0], out_v[0]
    else:
        rows = jnp.concatenate(out_r)
        cols = jnp.concatenate(out_c)
        vals = jnp.concatenate(out_v)
    idt = compute_index_dtype(ca.index_dtype)
    return COO(rows=rows.astype(idt), cols=cols.astype(idt), vals=vals,
               shape=shape, canonical=True)


@partial(jax.jit, donate_argnums=(0, 1, 2),
         static_argnames=("kw", "c", "part_slots", "n_rows", "adt"))
def _esc_expand_chunk(buf_r, buf_c, buf_v, order_pad, s,
                      a_rows, a_cols, a_vals, cnt, off, base, psize,
                      b_start, b_indices, b_data, *,
                      kw, c, part_slots, n_rows, adt):
    """Expand one level-chunk of A entries (each with fan-out ≤ kw) against
    B rows gathered straight from CSR, scattering the candidates to their
    exact offsets in the donated part buffers.  A chunk may overrun into the
    next (part, level) group's entries: same-part overruns re-write identical
    values at identical positions (idempotent), other-part candidates are
    masked out by the ``psize`` bound."""
    e = jax.lax.dynamic_slice(order_pad, (s,), (c,))       # entry ids (pad=nse)
    ar = a_rows.at[e].get(mode="fill", fill_value=n_rows)  # (c,)
    ak = a_cols.at[e].get(mode="fill", fill_value=0)
    av = a_vals.at[e].get(mode="fill", fill_value=0)
    ce = cnt.at[e].get(mode="fill", fill_value=0)
    oe = off.at[e].get(mode="fill", fill_value=0)
    slot = jnp.arange(kw, dtype=jnp.int32)[None, :]        # (1, kw)
    valid = (slot < ce[:, None]) & (ar[:, None] < n_rows)
    src = b_start.at[ak].get(mode="fill", fill_value=0)[:, None] + slot
    bc = b_indices.at[jnp.where(valid, src, 0)].get(mode="fill", fill_value=0)
    bv = b_data.at[jnp.where(valid, src, 0)].get(mode="fill", fill_value=0)
    rel = oe[:, None] - base + slot
    valid = valid & (rel >= 0) & (rel < psize)
    pos = jnp.where(valid, rel, part_slots).reshape(-1)
    rows = jnp.broadcast_to(ar[:, None], (c, kw)).reshape(-1)
    cols = bc.astype(jnp.int32).reshape(-1)
    vals = (av[:, None] * bv.astype(adt)).reshape(-1)
    # positions are exact and disjoint; out-of-part positions drop
    buf_r = buf_r.at[pos].set(rows, mode="drop")
    buf_c = buf_c.at[pos].set(cols, mode="drop")
    buf_v = buf_v.at[pos].set(vals, mode="drop")
    return buf_r, buf_c, buf_v


@partial(jax.jit, donate_argnums=(0, 1, 2), static_argnames=("shape", "adt"))
def _esc_finalize(buf_r, buf_c, buf_v, *, shape, adt):
    """Canonical sort + segment-sum dedup of one expanded part."""
    r, c, v = sort_coo(buf_r, buf_c, buf_v.astype(adt), shape)
    return dedup_sorted_coo(r, c, v, shape)


def _spgemm_oneshot(ca, bell, shape, kb, adt):
    a_valid = ca.rows.astype(jnp.int32) < ca.shape[0]
    a_rows = jnp.where(a_valid, ca.rows.astype(jnp.int32), shape[0])
    a_k = jnp.where(a_valid, ca.cols.astype(jnp.int32), 0)

    # fan out: candidate (i, j, a_ik * b_kj) for each B-slot of row k
    b_cols = bell.cols.at[a_k].get(mode="fill", fill_value=0)      # (nse_A, K_B)
    b_vals = bell.vals.at[a_k].get(mode="fill", fill_value=0)
    b_nnz = bell.row_nnz.at[a_k].get(mode="fill", fill_value=0)
    slot_valid = (jnp.arange(kb, dtype=jnp.int32)[None, :]
                  < b_nnz[:, None].astype(jnp.int32)) & a_valid[:, None]
    rows = jnp.where(slot_valid, a_rows[:, None], shape[0]).reshape(-1)
    cols = jnp.where(slot_valid, b_cols.astype(jnp.int32), 0).reshape(-1)
    vals = jnp.where(
        slot_valid, ca.vals.astype(adt)[:, None] * b_vals.astype(adt), 0
    ).reshape(-1)

    r, c, v = sort_coo(rows, cols, vals, shape)
    r, c, v, _ = dedup_sorted_coo(r, c, v, shape)
    idt = ca.index_dtype
    return COO(rows=r.astype(compute_index_dtype(idt)),
               cols=c.astype(compute_index_dtype(idt)),
               vals=v, shape=shape, canonical=True)


def inner_prod(mat, l, r):
    """lᵀ A r bilinear form (≈ src/sparsematrix.rs:161-171)."""
    l = jnp.asarray(l)
    return jnp.dot(l, spmv(mat, r), preferred_element_type=accum_dtype(l.dtype))


def is_symmetric(a, *, rtol=0.0, atol=0.0) -> jax.Array:
    """Structural+value symmetry test (≈ src/sparsematrix.rs:213-223).

    The reference walks entries and compares get(j,i) exactly; here we
    canonicalize A and Aᵀ and compare the streams (exact by default,
    tolerances available for float round-trip).
    """
    if a.shape[0] != a.shape[1]:
        return jnp.asarray(False)
    ca = a.to_coo().sort()
    cat = transpose(a).to_coo().sort()
    if ca.nse != cat.nse:
        # capacities can differ after conversions; compare via dense fallback
        d = ca.todense()
        return jnp.all(jnp.abs(d - d.T) <= atol + rtol * jnp.abs(d))
    same_struct = jnp.all((ca.rows == cat.rows) & (ca.cols == cat.cols))
    close = jnp.all(jnp.abs(ca.vals - cat.vals) <= atol + rtol * jnp.abs(ca.vals))
    return same_struct & close


def extract_row(mat, i):
    """Row i as a SparseVec (≈ SparseMatrix::get_row, src/sparsematrix.rs:272-280)."""
    return mat.to_csr().get_row(i)


def is_sorted_row(mat, i) -> jax.Array:
    """Columns of row i strictly ascending (≈ SparseMatrix::is_sorted_row,
    src/sparsematrix.rs:249-258)."""
    csr = mat.to_csr()
    k = jnp.arange(csr.nse)
    start, end = csr.indptr[i], csr.indptr[i + 1]
    interior = (k >= start) & (k + 1 < end)
    cols = csr.indices.astype(jnp.int32)
    ascending = cols < jnp.roll(cols, -1)
    return jnp.all(jnp.where(interior, ascending, True))


def is_sorted(mat) -> jax.Array:
    """All rows column-sorted (≈ SparseMatrix::is_sorted,
    src/sparsematrix.rs:261-269).  Frozen formats produced by this library
    are canonically sorted; this verifies externally-constructed arrays."""
    csr = mat.to_csr()
    nse = csr.nse
    if nse <= 1:
        return jnp.asarray(True)
    cols = csr.indices.astype(jnp.int32)
    rows = csr.row_ids.astype(jnp.int32)
    k = jnp.arange(nse)
    same_row = (rows == jnp.roll(rows, -1)) & (k + 1 < nse) & (
        k + 1 < csr.indptr[-1])
    ascending = cols < jnp.roll(cols, -1)
    return jnp.all(jnp.where(same_row, ascending, True))
