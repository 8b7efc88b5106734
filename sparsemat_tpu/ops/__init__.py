"""Functional ops over sparse formats — the trait-default algorithm layer
(≈ reference src/sparsematrix.rs:124-338 defaults, redesigned as batch
device ops; see individual modules)."""

from .algebra import (
    DimensionError,
    add,
    extract_row,
    inner_prod,
    is_sorted,
    is_sorted_row,
    is_symmetric,
    spgemm,
    sub,
    transpose,
)
from .matvec import rmatvec, spmm, spmv, spmv_chain, spmv_dot

__all__ = [
    "DimensionError",
    "add",
    "sub",
    "transpose",
    "spgemm",
    "inner_prod",
    "is_symmetric",
    "is_sorted",
    "is_sorted_row",
    "extract_row",
    "spmv",
    "spmm",
    "rmatvec",
    "spmv_chain",
    "spmv_dot",
]
