"""spmv_chain: fused k-step SpMV (kernels/dia.py chain kernel + fallback).

The chain is the hot loop of the reference's solver usage of mvp
(reference: src/linearsolver.rs:41-49 runs one mvp per iteration).
"""
import numpy as np
import pytest
import scipy.sparse as sp
import jax.numpy as jnp

import sparsemat_tpu as smt
from sparsemat_tpu.kernels.dia import dia_chain_plan, dia_spmv_chain_pallas


def _banded(n, offsets, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)
    diags = [rng.standard_normal(n - abs(o)).astype(np.float32) * scale
             for o in offsets]
    return sp.diags(diags, offsets, shape=(n, n), format="csr")


@pytest.mark.parametrize("k", [1, 2, 5])
def test_chain_kernel_interpret(k):
    ms = _banded(300, [-3, -1, 0, 1, 3])
    dia = smt.CSR.from_scipy(ms).to_dia()
    assert dia_chain_plan(dia) is not None
    x = np.random.default_rng(1).standard_normal(300).astype(np.float32)
    y = np.asarray(dia_spmv_chain_pallas(dia, jnp.asarray(x), k,
                                         interpret=True))
    ref = x.copy()
    for _ in range(k):
        ref = (ms @ ref).astype(np.float32)
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-6)


def test_chain_dispatch_fallback():
    """On CPU the dispatch takes the lax.fori_loop-of-spmv path."""
    ms = _banded(200, [-2, 0, 2], seed=3)
    csr = smt.CSR.from_scipy(ms)
    x = np.random.default_rng(2).standard_normal(200).astype(np.float32)
    y = np.asarray(smt.spmv_chain(csr, x, 3))
    ref = x.copy()
    for _ in range(3):
        ref = (ms @ ref).astype(np.float32)
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-6)


def test_chain_requires_square():
    rect = smt.CSR.from_scipy(sp.csr_matrix(np.ones((2, 3), np.float32)))
    with pytest.raises(ValueError):
        smt.spmv_chain(rect, np.zeros(3, np.float32), 2)


def test_chain_low_precision_carry():
    """bf16 operands: the fori_loop carry must be dtype-stable (spmv returns
    the f32 accumulation dtype — regression for the round-2 advisor note)."""
    ms = _banded(64, [-1, 0, 1], seed=5)
    csr = smt.CSR.from_scipy(ms).astype(jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(7).standard_normal(64), jnp.bfloat16)
    y = np.asarray(smt.spmv_chain(csr, x, 3), np.float32)
    ref = np.asarray(x, np.float32)
    for _ in range(3):
        ref = ms.astype(np.float32) @ ref
    np.testing.assert_allclose(y, ref, rtol=0.15, atol=0.1)
