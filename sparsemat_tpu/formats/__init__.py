"""Frozen sparse formats (immutable pytrees).

Format map vs the reference (see SURVEY.md §2):

* ``COO``  ≈ the frozen snapshot of ``SparseMatIndexList``
  (src/sparsemat_indexlist.rs) — flat triplets, assembly output.
* ``CSR``  ≈ ``SparseMatCRS`` (src/sparsemat_crs.rs) — canonical compute.
* ``ELL``  — TPU-regular padded layout (no reference counterpart; replaces
  the serial row loop with vectorizable rectangles).
* ``SELL`` — sliced ELL for skewed nnz/row distributions.
* ``BSR``  — blocked rows for MXU matmuls (SpMM path).

The ragged ``SparseMatRowVec`` (src/sparsemat_rowvec.rs) has no device
equivalent — ragged per-row Vecs cannot be a static-shape device layout; its
capability (per-row access during assembly) lives in the host-side builder.
"""

from .base import SparseFormat
from .coo import COO
from .csr import CSR
from .ell import ELL
from .sell import SELL

__all__ = ["SparseFormat", "COO", "CSR", "ELL", "SELL"]
