"""General-matrix SpMV kernels over the WELL (windowed ELL) format.

Design (see formats/well.py): the matrix is tiles of (8 rows × ≤K entries)
confined to 128-wide column windows.  The kernel walks tiles (sorted by row
block); for each tile it loads the 128-lane x window, gathers by
column-within-window with ``take_along_axis`` (an in-register Mosaic
dynamic gather — the ONLY vectorized gather form TPU supports), FMAs
against the tile values, and accumulates into the 8-row output block.
Output blocks are revisited consecutively, so partial sums stay in VMEM
until the row block changes (standard Pallas revisiting pattern).

Replaces the serial row loop of the reference (src/sparsematrix.rs:146-158)
for matrices with no exploitable diagonal/band structure.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.well import ROW_BLOCK, WELL, WINDOW
from ..types import accum_dtype


def _pad_x_windows(well: WELL, x: jax.Array):
    n_cols = well.shape[1]
    n_win = max(-(-n_cols // WINDOW), 1)
    xp = jnp.pad(x, (0, n_win * WINDOW - n_cols))
    return xp.reshape(n_win, WINDOW), n_win


def well_spmv_xla(well: WELL, x: jax.Array) -> jax.Array:
    """XLA reference implementation (CPU fallback / correctness oracle)."""
    n_rows = well.shape[0]
    xw, _ = _pad_x_windows(well, x)
    adt = accum_dtype(jnp.result_type(well.vals.dtype, x.dtype))
    tiles_x = xw[well.tile_wins]                              # (T, 128)
    g = jnp.take_along_axis(
        jnp.broadcast_to(tiles_x[:, None, :],
                         (well.n_tiles, ROW_BLOCK, WINDOW)),
        well.lidx, axis=2)                                    # (T, 8, K)
    partial = jnp.sum(well.vals.astype(adt) * g.astype(adt), axis=2)  # (T, 8)
    n_rb = -(-n_rows // ROW_BLOCK)
    y = jnp.zeros((n_rb, ROW_BLOCK), adt)
    y = y.at[well.tile_rows].add(partial, mode="drop")
    return y.reshape(-1)[:n_rows]


def well_spmv_pallas(well: WELL, x: jax.Array, *, interpret: bool = False) -> jax.Array:
    """Pallas TPU kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows = well.shape[0]
    n_rb = -(-n_rows // ROW_BLOCK)
    adt = accum_dtype(jnp.result_type(well.vals.dtype, x.dtype))
    if well.n_tiles == 0:
        return jnp.zeros((n_rows,), adt)
    xw, _ = _pad_x_windows(well, x.astype(adt))
    k = well.k_tile
    n_tiles = well.n_tiles
    vals = well.vals.astype(adt)

    def kernel(rb_ref, w_ref, vals_ref, lidx_ref, x_ref, o_ref):
        i = pl.program_id(0)
        prev = rb_ref[jnp.maximum(i - 1, 0)]
        first = jnp.logical_or(i == 0, rb_ref[i] != prev)

        @pl.when(first)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        xb = jnp.broadcast_to(x_ref[0], (ROW_BLOCK, WINDOW))   # (8, 128)
        # Mosaic's dynamic gather requires idx.shape == operand.shape, so pad
        # the K-wide tile to 128 lanes in-register (padding lanes carry
        # val=0, killing their gathered garbage); storage stays K-wide.
        idx = lidx_ref[0]
        v = vals_ref[0]
        if k < WINDOW:
            idx = jnp.pad(idx, ((0, 0), (0, WINDOW - k)))
            v = jnp.pad(v, ((0, 0), (0, WINDOW - k)))
        g = jnp.take_along_axis(xb, idx, axis=1)               # (8, 128)
        o_ref[0, 0] += jnp.sum(v * g, axis=1)

    # x windows carried as (n_win, 1, 128) and output as (n_rb, 1, 8) so the
    # per-step blocks (1,1,128)/(1,1,8) satisfy Mosaic's trailing-dims rule
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, ROW_BLOCK, k), lambda i, rb, w: (i, 0, 0)),
            pl.BlockSpec((1, ROW_BLOCK, k), lambda i, rb, w: (i, 0, 0)),
            pl.BlockSpec((1, 1, WINDOW), lambda i, rb, w: (w[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, ROW_BLOCK), lambda i, rb, w: (rb[i], 0, 0)),
    )
    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rb, 1, ROW_BLOCK), adt),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * ROW_BLOCK * k,
            bytes_accessed=int(vals.nbytes + well.lidx.nbytes
                               + n_tiles * WINDOW * 4 + n_rb * ROW_BLOCK * 4),
            transcendentals=0),
    )(well.tile_rows, well.tile_wins, vals, well.lidx, xw[:, None, :])
    return y.reshape(-1)[:n_rows]


def spmv_pallas(mat, x: jax.Array) -> jax.Array:
    """Dispatch entry for ops.spmv(method='pallas')."""
    well = mat if isinstance(mat, WELL) else WELL.from_csr(mat.to_csr())
    return well_spmv_pallas(well, x)
