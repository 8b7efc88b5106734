"""Pallas TPU kernels — the tuned compute path.

The generic ops in sparsemat_tpu.ops are pure XLA; these kernels replace
them where XLA's lowering is weak on TPU (arbitrary gathers/scatters are
serialized).  Each kernel has an XLA reference implementation used for
interpret-mode tests and as a CPU fallback.
"""

from .spmm import bsr_spmm_pallas, bsr_spmm_xla, spmm_pallas
from .spmv import (
    slab_pack_spmv_pallas,
    slab_pack_spmv_xla,
    slab_spmv_pallas,
    slab_spmv_xla,
    spmv_pallas,
    well_spmv_pallas,
    well_spmv_xla,
)

__all__ = ["spmv_pallas", "well_spmv_pallas", "well_spmv_xla",
           "slab_spmv_pallas", "slab_spmv_xla",
           "spmm_pallas", "bsr_spmm_pallas", "bsr_spmm_xla"]
