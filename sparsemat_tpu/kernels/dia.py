"""Pallas DIA SpMV — single-pass banded matvec at HBM speed-of-light.

The XLA padded-slice formulation (formats/dia.py) re-materializes shifted
copies of x per diagonal; measured at ~42% of the streaming roofline on a
16M-row band.  This kernel restores the ideal traffic model: per grid step
it streams one C-row chunk of every diagonal (auto-pipelined BlockSpec) and
DMAs the matching x window (C + 2H halo) ONCE into VMEM scratch; all
diagonal FMAs then read VMEM.  Traffic = diagonals + x + y, each exactly
once.

f32 only (Mosaic has no f64 vector path); the dispatch falls back to the
XLA formulation for other dtypes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.dia import DIA

LANE = 128
DEFAULT_CHUNK = 1 << 17  # rows per grid step (512 KB of x in f32)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("offsets", "n_rows", "chunk"))
def _dia_spmv_pallas_impl(data, x, *, offsets, n_rows, chunk):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_d = data.shape[0]
    h = max((abs(o) for o in offsets), default=0)
    # 1-D VMEM/HBM slices must align to the (1024,) tiling: round the halo
    # and chunk to 1024 so every DMA offset/length is tile-aligned
    ALIGN = 1024
    H = _round_up(max(h, 1), ALIGN)
    C = min(chunk, _round_up(n_rows, ALIGN))
    n_chunks = -(-n_rows // C)
    n_pad = n_chunks * C

    # x laid out so chunk i's window is xp[i*C : i*C + C + 2H]:
    # xp = [H zeros | x | pad to n_pad | H zeros]
    xp = jnp.pad(x, (H, n_pad - n_rows + H))
    datap = jnp.pad(data, ((0, 0), (0, n_pad - data.shape[1])))

    def kernel(data_ref, x_hbm, o_ref, scratch, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * C, C + 2 * H)], scratch, sem)
        cp.start()
        cp.wait()
        acc = jnp.zeros((C,), jnp.float32)
        for d, off in enumerate(offsets):
            acc = acc + data_ref[d] * scratch[off + H : off + H + C]
        o_ref[0, 0] = acc

    y = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((n_d, C), lambda i: (0, i)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_chunks, 1, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C + 2 * H,), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_d * n_pad,
            bytes_accessed=int(datap.nbytes + xp.nbytes + n_pad * 4),
            transcendentals=0),
    )(datap, xp)
    return y.reshape(-1)[:n_rows]


def dia_spmv_pallas(dia: DIA, x: jax.Array, chunk: int = DEFAULT_CHUNK):
    """y = A @ x for a DIA matrix via the Pallas chunked kernel (f32)."""
    if dia.data.dtype != jnp.float32 or x.dtype != jnp.float32:
        from ..formats.dia import dia_spmv

        return dia_spmv(dia, x)
    return _dia_spmv_pallas_impl(
        dia.data, x, offsets=tuple(dia.offsets),
        n_rows=int(dia.shape[0]), chunk=int(chunk))
