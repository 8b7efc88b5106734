"""Kernel timing + roofline accounting.

Timing on the tunneled TPU platform has two traps (discovered empirically,
see bench.py): ``block_until_ready`` returns before execution completes (a
host readback is the only real fence), and per-dispatch latency is ~40 ms —
so all kernel timing chains K data-dependent applications inside ONE jitted
program and divides.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp


def sync(arr) -> float:
    """Fence: force completion of everything `arr` depends on (host readback
    of a scalar derived from it)."""
    return float(jnp.sum(jnp.ravel(arr)[:1]))


_rtt_cache: dict = {}


def dispatch_rtt() -> float:
    """Round-trip latency of a trivial dispatch + readback (subtract from
    wall-clock timings)."""
    if "rtt" not in _rtt_cache:
        z = jnp.zeros((8,), jnp.float32)
        f = jax.jit(lambda v: v + 1)
        sync(f(z))
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            sync(f(z))
            samples.append(time.perf_counter() - t0)
        _rtt_cache["rtt"] = min(samples)
    return _rtt_cache["rtt"]


def time_chained_op(step_fn: Callable, x0, captures: Sequence = (),
                    inner: int = 200, reps: int = 2) -> float:
    """Seconds per application of ``step_fn(v, *captures)``, measured as
    ``inner`` chained applications inside one jit.  ``captures`` must be
    passed explicitly (closure constants inline into the HLO payload)."""
    rtt = dispatch_rtt()

    @jax.jit
    def run(x, caps):
        return jax.lax.fori_loop(0, inner, lambda i, v: step_fn(v, *caps), x)

    sync(run(x0, tuple(captures)))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(run(x0, tuple(captures)))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt, 1e-9) / inner


@dataclasses.dataclass
class KernelReport:
    """Roofline report for one kernel invocation profile."""

    name: str
    seconds: float
    nnz: int
    bytes_model: int
    flops: int
    hbm_bw: float  # bytes/s the hardware can stream (measured)

    @property
    def gnnz_per_s(self) -> float:
        return self.nnz / self.seconds / 1e9

    @property
    def gb_per_s(self) -> float:
        return self.bytes_model / self.seconds / 1e9

    @property
    def roofline_seconds(self) -> float:
        return self.bytes_model / self.hbm_bw

    @property
    def roofline_fraction(self) -> float:
        return self.roofline_seconds / self.seconds

    def __str__(self):
        return (f"{self.name}: {self.seconds*1e6:.1f} us  "
                f"{self.gnnz_per_s:.2f} Gnnz/s  {self.gb_per_s:.0f} GB/s  "
                f"{100*self.roofline_fraction:.1f}% of roofline")


def spmv_bytes_model(fmt) -> int:
    """Minimal HBM traffic model for one SpMV on a frozen format."""
    n_rows, n_cols = fmt.shape
    name = type(fmt).__name__
    nnz = int(np.asarray(fmt.n_non_zero_entries()))
    vec = 4 * (n_rows + n_cols)
    if name == "DIA":
        return int(fmt.data.nbytes) + vec
    if name == "ELL":
        return int(fmt.vals.nbytes + fmt.cols.nbytes) + vec
    if name == "WELL":
        return int(fmt.vals.nbytes + fmt.lidx.nbytes
                   + fmt.n_tiles * 128 * 4) + vec
    # CSR / COO stream
    return nnz * 8 + vec


def roofline_spmv(fmt, x, hbm_bw: float, name: str | None = None,
                  inner: int = 200) -> KernelReport:
    """Measure an SpMV path against its traffic roofline."""
    from ..ops import spmv

    dt = time_chained_op(lambda v, m: spmv(m, v) * 5e-4, jnp.asarray(x),
                         captures=(fmt,), inner=inner)
    nnz = int(np.asarray(fmt.n_non_zero_entries()))
    return KernelReport(
        name=name or type(fmt).__name__, seconds=dt, nnz=nnz,
        bytes_model=spmv_bytes_model(fmt), flops=2 * nnz, hbm_bw=hbm_bw)


@contextlib.contextmanager
def trace_to(path: str):
    """jax.profiler trace context (view with tensorboard / xprof)."""
    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
