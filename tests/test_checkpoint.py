"""Checkpoint/resume (new capability — the reference has none, SURVEY.md §5)."""

import numpy as np
import pytest
import scipy.sparse as sp
import jax.numpy as jnp

import sparsemat_tpu as smt
from sparsemat_tpu import checkpoint, solvers


def random_csr(n=48, density=0.15, seed=0):
    rng = np.random.default_rng(seed)
    dense = rng.standard_normal((n, n)).astype(np.float32)
    dense[rng.random((n, n)) >= density] = 0
    return smt.CSR.from_scipy(sp.csr_matrix(dense)), dense


@pytest.mark.parametrize("fmt", ["coo", "csr", "ell", "sell", "dia", "well",
                                 "gell", "slab", "slab_pack", "slab_stream",
                                 "route", "strip"])
def test_matrix_roundtrip(fmt, tmp_path):
    """Round-trip EVERY frozen format, including the nested ones
    (SlabPack.parts / GELL.levels are tuples of format dataclasses)."""
    csr, dense = random_csr()
    mat = getattr(csr, f"to_{fmt}")() if fmt != "csr" else csr
    p = str(tmp_path / f"m_{fmt}.npz")
    checkpoint.save_matrix(p, mat)
    back = checkpoint.load_matrix(p)
    assert type(back) is type(mat)
    assert back.shape == mat.shape
    np.testing.assert_allclose(np.asarray(back.todense()), dense, rtol=1e-6)


def test_slab_pack_overflow_roundtrip(tmp_path):
    """SlabPack with a non-None recursive ``overflow`` (spilled entries)
    must survive the round trip — the r3 formats the bench wins with."""
    from sparsemat_tpu.formats.slab import SlabPack

    rng = np.random.default_rng(7)
    n = 512
    # one deep-occupancy row per block forces bucket-height spilling
    dense = np.zeros((n, n), np.float32)
    mask = rng.random((n, n)) < 0.01
    dense[mask] = rng.standard_normal(int(mask.sum())).astype(np.float32)
    dense[5, :200] = 1.5  # deep row → spill candidates
    csr = smt.CSR.from_scipy(sp.csr_matrix(dense))
    pack = SlabPack.from_csr(csr, rb=128, n_classes=2, spill_frac=0.3)
    assert pack.overflow is not None, "fixture no longer exercises overflow"
    p = str(tmp_path / "m_spill.npz")
    checkpoint.save_matrix(p, pack)
    back = checkpoint.load_matrix(p)
    assert type(back) is SlabPack and back.overflow is not None
    np.testing.assert_allclose(np.asarray(back.todense()), dense, rtol=1e-6)


def test_bsr_roundtrip(tmp_path):
    csr, dense = random_csr(n=40, seed=1)
    bsr = smt.BSR.from_csr(csr)
    p = str(tmp_path / "m_bsr.npz")
    checkpoint.save_matrix(p, bsr)
    back = checkpoint.load_matrix(p)
    np.testing.assert_allclose(np.asarray(back.todense()), dense, rtol=1e-6)


def test_builder_rejected(tmp_path):
    b = smt.SparseBuilder()
    b.add_to(0, 0, 1.0)
    with pytest.raises(TypeError):
        checkpoint.save_matrix(str(tmp_path / "b.npz"), b)


def test_cg_checkpoint_resume(tmp_path):
    n = 128
    lap = sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                   [0, 1, -1], format="csr")
    A = smt.CSR.from_scipy(lap)
    b = jnp.ones((n,), jnp.float64)

    # full solve (oracle)
    x_full, info_full = solvers.cg(A, b, tol=1e-10)

    # partial solve → checkpoint → resume
    x_half, info_half = solvers.cg(A, b, tol=0.0, maxiter=40)
    p = str(tmp_path / "state.npz")
    checkpoint.save_solve_state(p, x_half, info_half)
    state = checkpoint.load_solve_state(p)
    assert state.iterations == 40
    x_res, info_res = checkpoint.resume(solvers.cg, A, b, state, tol=1e-10)
    assert bool(info_res.converged)
    assert int(info_res.iterations) >= 40  # offset applied
    np.testing.assert_allclose(np.asarray(x_res), np.asarray(x_full),
                               rtol=1e-6)


def test_solve_state_defaults(tmp_path):
    p = str(tmp_path / "s.npz")
    checkpoint.save_solve_state(p, np.zeros(4))
    s = checkpoint.load_solve_state(p)
    assert s.iterations == 0 and np.isinf(s.residual_norm)
