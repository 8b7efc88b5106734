"""Randomized property tests: every format × every op against scipy/numpy
oracles (the systematic replacement for the reference's hand-built 3×3
cases — SURVEY.md §4 'property tests vs dense reference')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

import sparsemat_tpu as smt

FORMATS = ["coo", "csr", "ell", "sell", "dia", "well", "slab", "slab_pack",
           "slab_stream", "gell", "bsr"]


def rand_sparse(n_rows, n_cols, density, seed, dtype=np.float32):
    m = sp.random(n_rows, n_cols, density=density, format="csr",
                  random_state=np.random.default_rng(seed), dtype=np.float64)
    m.data = np.round(m.data * 8 - 4, 3)  # exactly-representable values
    return m.astype(dtype)


def to_format(csr_scipy, fmt):
    A = smt.CSR.from_scipy(csr_scipy)
    return {
        "coo": A.to_coo, "csr": lambda: A, "ell": A.to_ell,
        "sell": A.to_sell, "dia": A.to_dia, "well": A.to_well,
        "slab": A.to_slab,
        "slab_pack": lambda: A.to_slab_pack(n_classes=4),
        "slab_stream": A.to_slab_stream,
        "gell": A.to_gell,
        "bsr": lambda: smt.BSR.from_csr(A),
    }[fmt]()


@pytest.mark.parametrize("fmt", FORMATS)
@pytest.mark.parametrize("seed,shape,density", [
    (0, (57, 57), 0.08),
    (1, (130, 130), 0.02),
    (2, (33, 129), 0.15),     # non-square
    (3, (260, 64), 0.05),
])
def test_spmv_matches_scipy(fmt, seed, shape, density):
    if fmt in ("dia",) and shape[0] != shape[1]:
        pytest.skip("DIA requires square-ish band extraction")
    m = rand_sparse(*shape, density, seed)
    A = to_format(m, fmt)
    x = np.random.default_rng(seed + 100).standard_normal(
        shape[1]).astype(np.float32)
    y = np.asarray(smt.spmv(A, jnp.asarray(x)))
    np.testing.assert_allclose(y, m @ x, atol=1e-4,
                               err_msg=f"{fmt} {shape} d={density}")


@pytest.mark.parametrize("fmt", FORMATS)
def test_roundtrip_and_structure(fmt):
    m = rand_sparse(90, 90, 0.07, seed=7)
    A = to_format(m, fmt)
    np.testing.assert_allclose(np.asarray(A.todense()), m.toarray(),
                               atol=1e-6)
    assert int(np.asarray(A.n_non_zero_entries())) == m.nnz
    assert abs(float(np.asarray(A.density())) - m.nnz / 90 / 90) < 1e-9
    # scale is value-uniform across formats
    np.testing.assert_allclose(np.asarray(A.scale(2.5).todense()),
                               2.5 * m.toarray(), atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_algebra_matches_scipy(seed):
    a = rand_sparse(48, 48, 0.1, seed)
    b = rand_sparse(48, 48, 0.1, seed + 50)
    A = smt.CSR.from_scipy(a)
    B = smt.CSR.from_scipy(b)
    np.testing.assert_allclose(np.asarray((A + B).todense()),
                               (a + b).toarray(), atol=1e-5)
    np.testing.assert_allclose(np.asarray((A - B).todense()),
                               (a - b).toarray(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(smt.transpose(A).todense()),
                               a.T.toarray(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(smt.spgemm(A, B).todense()),
                               (a @ b).toarray(), atol=1e-4)
    x = np.random.default_rng(seed).standard_normal(48).astype(np.float32)
    ell = A.to_ell()
    np.testing.assert_allclose(np.asarray(smt.spmm(A, jnp.stack([x, 2 * x], 1))),
                               a @ np.stack([x, 2 * x], 1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(smt.rmatvec(A, jnp.asarray(x))),
                               a.T @ x, atol=1e-4)
    l = np.random.default_rng(seed + 1).standard_normal(48).astype(np.float32)
    assert abs(float(smt.inner_prod(A, jnp.asarray(l), jnp.asarray(x)))
               - l @ (a @ x)) < 1e-3
    del ell


def test_vmapped_multi_rhs_cg():
    # multi-RHS solves batch through vmap (lax.while_loop converts to a
    # masked batched loop) — one compiled program for all right-hand sides
    lap = sp.diags([4.0 * np.ones(100), -np.ones(99), -np.ones(99)],
                   [0, 1, -1], format="csr").astype(np.float32)
    A = smt.CSR.from_scipy(lap)
    rng = np.random.default_rng(0)
    Bs = rng.standard_normal((5, 100)).astype(np.float32)
    xs, infos = jax.vmap(
        lambda bb: smt.solvers.cg(A, bb, tol=1e-6, maxiter=400))(
            jnp.asarray(Bs))
    assert bool(jnp.all(infos.converged))
    ref = np.linalg.solve(lap.toarray().astype(np.float64), Bs.T).T
    np.testing.assert_allclose(np.asarray(xs), ref, atol=1e-3)


def test_spgemm_chunked_matches_oneshot():
    a = rand_sparse(120, 120, 0.08, seed=9)
    b = rand_sparse(120, 120, 0.08, seed=10)
    A = smt.CSR.from_scipy(a)
    B = smt.CSR.from_scipy(b)
    one = smt.spgemm(A, B)
    # force the chunked host-merge path (tiny fan-out budget -> many chunks)
    chunked = smt.spgemm(A, B, max_fanout_slots=512)
    np.testing.assert_allclose(np.asarray(chunked.todense()),
                               (a @ b).toarray(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(chunked.todense()),
                               np.asarray(one.todense()), atol=1e-5)
    assert type(chunked) is type(one)


def test_bf16_storage_f32_accumulation():
    # mixed precision: bfloat16 storage must accumulate in float32
    m = rand_sparse(64, 64, 0.1, seed=20)
    A16 = smt.CSR.from_arrays(
        np.asarray(m.indptr), np.asarray(m.indices),
        jnp.asarray(m.data, jnp.bfloat16), m.shape)
    x = np.random.default_rng(21).standard_normal(64).astype(np.float32)
    y = smt.spmv(A16, jnp.asarray(x))
    assert y.dtype == jnp.float32  # accum_dtype promotes bf16 -> f32
    np.testing.assert_allclose(np.asarray(y), m @ x, atol=0.15)


def test_spmm_slab_and_well_route():
    m = rand_sparse(96, 96, 0.1, seed=22)
    B = np.random.default_rng(23).standard_normal((96, 3)).astype(np.float32)
    for conv in ("to_slab", "to_well"):
        A = getattr(smt.CSR.from_scipy(m), conv)()
        Y = np.asarray(smt.spmm(A, jnp.asarray(B)))
        np.testing.assert_allclose(Y, m @ B, atol=1e-3, err_msg=conv)


def test_spgemm_device_chunked_vs_scipy():
    """The device-side chunked accumulator path (SURVEY §7a capacity-bounded
    buffers + overflow retry) against scipy, including forced retries."""
    import scipy.sparse as sp

    rng = np.random.default_rng(3)
    n = 400
    A = sp.random(n, n, density=0.02, random_state=1, format="csr",
                  dtype=np.float64)
    B = sp.random(n, n, density=0.02, random_state=2, format="csr",
                  dtype=np.float64)
    ref = (A @ B).toarray()
    a = smt.CSR.from_scipy(A)
    b = smt.CSR.from_scipy(B)
    # tiny chunks → many merge steps; tiny initial capacity → several
    # overflow-retry doublings
    out = smt.spgemm(a, b, max_fanout_slots=1024, out_capacity=64)
    np.testing.assert_allclose(np.asarray(out.todense()), ref, atol=1e-12)
    # sanity: the one-shot path agrees too
    out2 = smt.spgemm(a, b)
    np.testing.assert_allclose(np.asarray(out2.todense()), ref, atol=1e-12)


def test_spgemm_slot_windowed_chunked(monkeypatch):
    """Zipf-tailed B (one near-dense row) must not materialize a full
    (n, K_max) ELL — the chunked path windows B's slots and carries the
    device accumulator across windows."""
    from sparsemat_tpu.ops import algebra

    rng = np.random.default_rng(7)
    n = 300
    m = sp.random(n, n, density=0.01, format="lil", random_state=1,
                  dtype=np.float64)
    m[5, :200] = rng.standard_normal(200)     # near-dense row → K_max big
    m = m.tocsr()
    m.sum_duplicates()
    A = smt.CSR.from_scipy(m)
    # force both the fan-out chunking and the slot windowing
    monkeypatch.setattr(algebra, "_SPGEMM_ELL_BUDGET", 64 * 8)
    C = smt.spgemm(A, A, max_fanout_slots=1 << 10)
    ref = (m @ m).toarray()
    np.testing.assert_allclose(np.asarray(C.todense()), ref, atol=1e-9)


def test_spgemm_chunked_overflow_retry(monkeypatch):
    from sparsemat_tpu.ops import algebra

    m = sp.random(120, 120, density=0.05, format="csr", random_state=3,
                  dtype=np.float64)
    A = smt.CSR.from_scipy(m)
    monkeypatch.setattr(algebra, "_SPGEMM_ELL_BUDGET", 64 * 8)
    # tiny initial capacity: force at least one overflow → retry doubling
    C = smt.spgemm(A, A, max_fanout_slots=1 << 9, out_capacity=16)
    np.testing.assert_allclose(np.asarray(C.todense()), (m @ m).toarray(),
                               atol=1e-9)


def test_spgemm_esc_multipart():
    """Force several row-aligned ESC parts (part_slots far below the
    fan-out) — per-part results must concatenate into the exact product
    with no cross-part duplicates."""
    from sparsemat_tpu.ops import algebra
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    n = 500
    m = sp.random(n, n, density=0.03, format="csr", random_state=4,
                  dtype=np.float64)
    m.sum_duplicates()
    A = smt.CSR.from_scipy(m)
    ca, bcsr = A.to_coo(), A.to_csr()
    out = algebra._spgemm_device_esc(ca, bcsr, (n, n), jnp.dtype(np.float64),
                                     part_slots=1 << 10)
    ref = (m @ m).toarray()
    np.testing.assert_allclose(np.asarray(out.todense()), ref, atol=1e-12)
    # canonical invariants: rows ascending, (row, col) strictly increasing
    r = np.asarray(out.rows); c = np.asarray(out.cols)
    valid = r < n
    rv, cv = r[valid], c[valid]
    key = rv.astype(np.int64) * n + cv
    assert np.all(np.diff(key) > 0), "duplicate or unsorted coordinates"


def test_spgemm_esc_heavy_row():
    """A single near-dense row whose fan-out exceeds the requested
    part_slots: the part size must grow to keep parts row-aligned."""
    from sparsemat_tpu.ops import algebra
    import jax.numpy as jnp

    rng = np.random.default_rng(13)
    n = 300
    m = sp.random(n, n, density=0.01, format="lil", random_state=5,
                  dtype=np.float64)
    m[7, :250] = rng.standard_normal(250)
    m = m.tocsr(); m.sum_duplicates()
    A = smt.CSR.from_scipy(m)
    ca, bcsr = A.to_coo(), A.to_csr()
    out = algebra._spgemm_device_esc(ca, bcsr, (n, n), jnp.dtype(np.float64),
                                     part_slots=64)
    np.testing.assert_allclose(np.asarray(out.todense()), (m @ m).toarray(),
                               atol=1e-12)
