"""Observability utilities: roofline accounting, kernel timing, profiling.

The reference has no tracing/profiling at all (SURVEY.md §5 — its only perf
artifact is an #[inline] hint, src/types.rs:30-32); BASELINE.json demands
per-kernel roofline reporting (nnz/s, GB/s), which lives here.
"""

from .profiling import (
    KernelReport,
    roofline_spmv,
    sync,
    time_chained_op,
    trace_to,
)

__all__ = ["KernelReport", "roofline_spmv", "time_chained_op", "sync",
           "trace_to"]
