"""GMRES and Chebyshev solvers (capability extensions over the reference's
CG-only LinearSolver trait, src/linearsolver.rs:12)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

import sparsemat_tpu as smt
from sparsemat_tpu import solvers


def nonsym_system(n=60, seed=0):
    rng = np.random.default_rng(seed)
    dense = rng.standard_normal((n, n)) * 0.3
    dense[rng.random((n, n)) > 0.15] = 0
    np.fill_diagonal(dense, np.abs(dense).sum(1) + 1.0)  # diag dominant
    b = rng.standard_normal(n)
    return dense, b


def test_gmres_nonsymmetric_vs_direct():
    dense, b = nonsym_system()
    A = smt.from_dense(dense)
    x, info = solvers.gmres(A, jnp.asarray(b), tol=1e-10, restart=30,
                            maxiter=600)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b),
                               rtol=1e-6, atol=1e-8)


def test_gmres_restart_cycles():
    # restart window smaller than the Krylov dimension forces outer cycles
    dense, b = nonsym_system(n=80, seed=1)
    A = smt.from_dense(dense)
    x, info = solvers.gmres(A, jnp.asarray(b), tol=1e-9, restart=8,
                            maxiter=800)
    assert bool(info.converged)
    assert int(info.iterations) > 8  # needed more than one cycle
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b),
                               rtol=1e-5, atol=1e-7)


def test_gmres_early_convergence_within_window():
    # identity-ish system converges in 1-2 steps << restart: frozen Arnoldi
    # steps must not corrupt the correction
    n = 32
    dense = np.eye(n) * 3.0
    b = np.arange(1.0, n + 1.0)
    A = smt.from_dense(dense)
    x, info = solvers.gmres(A, jnp.asarray(b), tol=1e-12, restart=20,
                            maxiter=100)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(x), b / 3.0, rtol=1e-10)


def test_gmres_matches_cg_on_spd():
    lap = sp.diags([2.0 * np.ones(100), -np.ones(99), -np.ones(99)],
                   [0, 1, -1], format="csr")
    A = smt.CSR.from_scipy(lap)
    b = jnp.ones((100,), jnp.float64)
    xg, ig = solvers.gmres(A, b, tol=1e-10, restart=40, maxiter=2000)
    xc, ic = solvers.cg(A, b, tol=1e-10, maxiter=2000)
    assert bool(ig.converged) and bool(ic.converged)
    np.testing.assert_allclose(np.asarray(xg), np.asarray(xc), rtol=1e-6)


def test_gmres_with_callable_operator():
    dense, b = nonsym_system(n=40, seed=2)
    dj = jnp.asarray(dense)
    x, info = solvers.gmres(lambda v: dj @ v, jnp.asarray(b), tol=1e-9,
                            restart=40, maxiter=400)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b),
                               rtol=1e-6, atol=1e-8)


def test_gmres_preconditioned():
    dense, b = nonsym_system(n=60, seed=3)
    A = smt.from_dense(dense)
    M = smt.JacobiPreconditioner.from_matrix(A)
    x, info = solvers.gmres(A, jnp.asarray(b), tol=1e-9, restart=20,
                            maxiter=400, M=M)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b),
                               rtol=1e-5, atol=1e-7)


def test_gmres_class_wrapper():
    dense, b = nonsym_system(n=30, seed=4)
    x, info = smt.GMRES(tol=1e-9, restart=30, iter_max=300).solve(
        smt.from_dense(dense), b)
    assert bool(info.converged)


def test_chebyshev_poisson():
    n = 64
    lap = sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                   [0, 1, -1], format="csr")
    A = smt.CSR.from_scipy(lap)
    b = jnp.ones((n,), jnp.float64)
    # exact spectrum of the 1D Laplacian: 2 - 2 cos(k pi / (n+1))
    lmin = 2 - 2 * np.cos(np.pi / (n + 1))
    lmax = 2 - 2 * np.cos(n * np.pi / (n + 1))
    x, info = solvers.chebyshev(A, b, lambda_min=lmin, lambda_max=lmax,
                                tol=1e-8, maxiter=5000)
    assert bool(info.converged)
    ref = np.linalg.solve(lap.toarray(), np.ones(n))
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-5)


def test_chebyshev_no_collectives_structure():
    # smoke: runs with a pure callable (no .shape), as the distributed layer
    # uses it
    n = 32
    d = jnp.asarray(np.diag(np.linspace(1.0, 4.0, n)))
    x, info = solvers.chebyshev(lambda v: d @ v, jnp.ones((n,), jnp.float64),
                                lambda_min=1.0, lambda_max=4.0,
                                tol=1e-10, maxiter=500)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(x), 1.0 / np.linspace(1.0, 4.0, n),
                               rtol=1e-8)
