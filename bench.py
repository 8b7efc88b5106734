#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` reports
the fraction of the *measured* HBM-bandwidth roofline achieved by the best
SpMV path (BASELINE.json north-star target: >= 0.70 of roofline nnz/s per
chip).  Detailed per-config results go to stderr.

Methodology: per-dispatch overhead through the TPU tunnel is ~1 ms, far
larger than the kernels — so every timing runs K chained iterations *inside
one jitted program* (x_{k+1} = f(x_k)) and divides, the same way the CG loop
amortizes.  Bandwidth roofline is measured the same way on a big copy.

Configs (BASELINE.json):
 1. banded CSR, 1e4 rows, ~5 nnz/row, f32      (the stated config 1)
 2. large banded, 2^20 rows, 5 diagonals, f32  (bandwidth-saturating size)
 3. CG on 2D 5-point Poisson 512², f32         (iterations/second)
"""

import functools
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# persistent compile cache: repeat bench runs skip the (slow, occasionally
# flaky) remote-compile round trips
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


_RTT = None


def _sync_scalar(arr):
    """Force real completion.  On the tunneled TPU platform
    ``block_until_ready`` returns before execution finishes, so the only
    reliable fence is a host readback of a value derived from the result."""
    return float(jnp.sum(arr[..., :1]))


def tunnel_rtt():
    global _RTT
    if _RTT is None:
        z = jnp.zeros((8,), jnp.float32)
        f = jax.jit(lambda v: v + 1)
        _sync_scalar(f(z))
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            _sync_scalar(f(z))
            samples.append(time.perf_counter() - t0)
        _RTT = min(samples)
        log(f"tunnel round-trip latency: {_RTT*1e3:.1f} ms (subtracted from timings)")
    return _RTT


def time_chained(step_fn, x0, captures=(), reps=2, target_secs=1.0,
                 max_inner=100_000, inner=None):
    """Time data-dependent applications of ``step_fn(v, *captures)`` inside
    ONE jitted program (per-dispatch tunnel overhead ~40 ms would otherwise
    dominate); sync via host readback; subtract the tunnel RTT.  The chain
    length is auto-scaled so each timed run is ~``target_secs`` long — large
    vs the ~±5 ms RTT jitter.

    ``captures`` (e.g. the matrix) MUST be passed here, not closed over —
    closure constants are inlined into the HLO and a 400 MB matrix blows the
    remote-compile payload limit."""
    rtt = tunnel_rtt()

    def make_run(inner):
        @jax.jit
        def run(x, caps):
            return jax.lax.fori_loop(
                0, inner, lambda i, v: step_fn(v, *caps), x)

        return run

    if inner is None:
        probe_inner = 10
        run = make_run(probe_inner)
        _sync_scalar(run(x0, captures))  # compile + warm
        t0 = time.perf_counter()
        _sync_scalar(run(x0, captures))
        est = max((time.perf_counter() - t0 - rtt) / probe_inner, 1e-7)
        inner = int(np.clip(target_secs / est, probe_inner, max_inner))
        if inner > 1.5 * probe_inner:
            run = make_run(inner)
            _sync_scalar(run(x0, captures))
        else:
            inner = probe_inner
    else:
        run = make_run(inner)
        _sync_scalar(run(x0, captures))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync_scalar(run(x0, captures))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt, 1e-9) / inner


#: Spec HBM bandwidth per chip (bytes/s) — roofline denominator.  The
#: stream probe below under-measures (roll/concat overhead), so the roofline
#: uses the spec number for the known chip generation and falls back to the
#: measured value otherwise.
HBM_SPEC = {"v5e": 819e9, "v5p": 2765e9, "v4": 1228e9, "v6e": 1640e9}


def measure_hbm_bw():
    """Achieved HBM bandwidth: chained v ← roll(v) + a over 256 MB buffers.
    The roll + second operand defeat both elementwise-chain fusion and
    algebraic collapse, so each iteration really moves 2 reads + 1 write."""
    n = 1 << 26
    x = jnp.ones((n,), jnp.float32)
    a = jnp.full((n,), 1e-9, jnp.float32)
    dt = time_chained(lambda v, aa: jnp.roll(v, 12 * 1024) + aa, x,
                      captures=(a,), inner=300)
    measured = 3 * n * 4 / dt
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "")
    spec = HBM_SPEC.get(gen)
    bw = spec or measured
    log(f"HBM bandwidth: measured stream {measured/1e9:.0f} GB/s; roofline uses "
        f"{'spec ' + gen + ' ' if spec else 'measured '}{bw/1e9:.0f} GB/s")
    return bw


def banded_csr(n_rows, offsets, dtype=np.float32, seed=0):
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    diags = [rng.standard_normal(n_rows - abs(o)).astype(dtype) for o in offsets]
    return sp.diags(diags, offsets, shape=(n_rows, n_rows), format="csr").astype(dtype)


def banded_dia_device(n, offsets, seed=0):
    """Build a random banded DIA matrix directly ON DEVICE — transferring an
    84M-nnz matrix through the TPU tunnel takes minutes; generating it with
    the device PRNG takes milliseconds.  One jitted program (eager op-by-op
    dispatch of 16M-row builds costs minutes through the tunnel)."""
    from sparsemat_tpu.formats.dia import DIA

    @functools.partial(jax.jit, static_argnames=("nn",))
    def build(key, nn):
        idx = jnp.arange(nn, dtype=jnp.int32)
        rows = []
        for k, off in enumerate(offsets):
            vals = jax.random.normal(jax.random.fold_in(key, k), (nn,), jnp.float32)
            valid = (idx + off >= 0) & (idx + off < nn)
            rows.append(jnp.where(valid, vals, 0))
        return jnp.stack(rows)

    data = build(jax.random.PRNGKey(seed), n)
    return DIA(data=data, offsets=tuple(offsets), shape=(n, n))


def poisson2d_dia_device(n):
    """2D 5-point Poisson (n² rows) as device-built DIA: zero host transfer."""
    from sparsemat_tpu.formats.dia import DIA

    @functools.partial(jax.jit, static_argnames=("nn",))
    def build(nn):
        m = nn * nn
        i = jnp.arange(m, dtype=jnp.int32)
        return jnp.stack([
            jnp.where(i >= nn, -1.0, 0.0),            # off = -n
            jnp.where(i % nn != 0, -1.0, 0.0),        # off = -1
            jnp.full((m,), 4.0, jnp.float32),
            jnp.where(i % nn != nn - 1, -1.0, 0.0),   # off = +1
            jnp.where(i < m - nn, -1.0, 0.0),         # off = +n
        ])

    m = n * n
    return DIA(data=build(n), offsets=(-n, -1, 0, 1, n), shape=(m, m))


def check_dia_sampled(dia, x, y, n_check=2048):
    """Verify a device SpMV result on a sampled row window (host pulls only
    the window, not the whole matrix)."""
    n = dia.shape[0]
    lo = n // 3
    hi = lo + n_check
    max_off = max(abs(o) for o in dia.offsets)
    xs = np.asarray(x[max(0, lo - max_off): min(n, hi + max_off)])
    x0 = max(0, lo - max_off)
    ys = np.asarray(y[lo:hi])
    ref = np.zeros(hi - lo, np.float64)
    for d, off in enumerate(dia.offsets):
        dd = np.asarray(dia.data[d, lo:hi], np.float64)
        src = np.arange(lo, hi) + off
        ok = (src >= 0) & (src < n)
        ref[ok] += dd[ok] * xs[src[ok] - x0]
    return np.abs(ys - ref).max() / max(np.abs(ref).max(), 1e-30)


def bench_spmv(name, mat_scipy, hbm_bw, variant_names=("csr_stream", "ell", "dia")):
    import sparsemat_tpu as smt

    nnz = mat_scipy.nnz
    n = mat_scipy.shape[0]
    x = jnp.asarray(np.random.default_rng(1).standard_normal(n).astype(np.float32))
    # damping folded into the matrix values so the timed chain is PURE spmv
    # (an out-of-kernel damping multiply would add a full read+write pass)
    mat_scipy = mat_scipy * 5e-4
    csr = smt.CSR.from_scipy(mat_scipy)
    y_ref = mat_scipy @ np.asarray(x)
    nrm = np.abs(y_ref).max()

    results = {}
    all_variants = {
        "csr_stream": lambda: csr,
        "ell": csr.to_ell,
        "dia": csr.to_dia,
        "auto": lambda: smt.auto_format(csr),
    }
    variants = {k: all_variants[k]() for k in variant_names}
    for vname, mat in variants.items():
        try:
            y = jax.jit(smt.spmv)(mat, x)
            err = np.abs(np.asarray(y) - y_ref).max() / max(nrm, 1e-30)
            if err > 1e-4:
                log(f"  {name}/{vname}: WRONG RESULT (rel err {err:.1e}) — skipped")
                continue
            # chain y -> x (square matrix); the in-matrix damping bounds
            # growth (values decay toward 0 — timing is unaffected)
            dt = time_chained(lambda v, m: smt.spmv(m, v), x,
                              captures=(mat,))
            results[vname] = nnz / dt
            log(f"  {name}/{vname:12s}: {dt*1e6:9.1f} us/spmv  {nnz/dt/1e9:7.3f} Gnnz/s")
        except Exception as e:  # pragma: no cover - defensive bench path
            log(f"  {name}/{vname}: failed — {str(e)[:120]}")

    best = max(results, key=results.get)
    # roofline: DIA-style per-nnz traffic — 4B value + 4B x read per nnz,
    # plus 4B y write per row (the normalize pass adds ~2 more passes over
    # n*4B, charged below so the fraction is honest)
    bytes_per_spmv = nnz * 8.0 + 2 * n * 4.0
    roofline = hbm_bw / bytes_per_spmv * nnz
    frac = results[best] / roofline
    log(f"  {name}: best={best} {results[best]/1e9:.3f} Gnnz/s, roofline "
        f"{roofline/1e9:.3f} Gnnz/s → {100*frac:.1f}% of speed-of-light")
    return results[best], frac


def bench_cg(hbm_bw, n=512):
    from sparsemat_tpu import solvers

    m = n * n
    A = poisson2d_dia_device(n)
    nnz = int(np.asarray(A.n_non_zero_entries()))
    b = jnp.ones((m,), jnp.float32)
    iters = 2000 if m < 10**6 else 300

    f = jax.jit(lambda mat, rhs: solvers.cg(mat, rhs, tol=0.0, maxiter=iters)[0])
    rtt = tunnel_rtt()
    _sync_scalar(f(A, b))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        _sync_scalar(f(A, b))
        best = min(best, (time.perf_counter() - t0 - rtt) / iters)
    ips = 1.0 / best
    # one CG iter ≈ 1 spmv (diag data nnz*4B + 3 vector passes) + ~5 more
    # vector passes for axpys/dots; XLA fuses several of these, so >100%
    # means the model overestimates traffic, not that the chip beat physics
    iter_bytes = nnz * 4.0 + 8 * m * 4.0
    frac = iter_bytes / best / hbm_bw
    note = " (>100% ⇒ traffic model conservative / VMEM-resident)" if frac > 1 else ""
    log(f"  CG Poisson {m} rows f32: {ips:,.0f} iterations/s "
        f"({best*1e6:.0f} us/iter, ~{100*frac:.1f}% of HBM roofline{note})")
    return ips, frac


def main():
    log(f"devices: {jax.devices()}")
    hbm_bw = measure_hbm_bw()

    # config 1 (BASELINE.json): 1e4 rows ~5 nnz/row — small enough to be
    # VMEM-resident across solver iterations (fractions >1 are real: the
    # HBM roofline doesn't bind in that regime)
    small = banded_csr(10_000, [-100, -1, 0, 1, 100])
    small_nnz_s, _ = bench_spmv("banded_1e4", small, hbm_bw,
                                variant_names=("csr_stream", "ell", "dia"))

    # HBM-bound headline: 2^24 rows × 5 diagonals = 84M nnz, ~400 MB/pass
    import sparsemat_tpu as smt

    n_big = 1 << 24
    big = banded_dia_device(n_big, [-4096, -1, 0, 1, 4096]).scale(5e-4)
    x_big = jax.random.normal(jax.random.PRNGKey(99), (n_big,), jnp.float32)
    y_big = jax.jit(smt.spmv)(big, x_big)
    err = check_dia_sampled(big, x_big, y_big)
    if err > 1e-4:
        log(f"  banded_16M: WRONG RESULT rel err {err:.1e}")
    nnz_big = int(np.asarray(big.n_non_zero_entries()))
    dt = time_chained(lambda v, m: smt.spmv(m, v), x_big,
                      captures=(big,), inner=400)
    big_nnz_s = nnz_big / dt
    bytes_per = nnz_big * 8.0 + 2 * n_big * 4.0
    big_frac = (bytes_per / dt) / hbm_bw
    log(f"  banded_16M/dia: {dt*1e6:.1f} us/spmv  {big_nnz_s/1e9:.3f} Gnnz/s "
        f"→ {100*big_frac:.1f}% of HBM roofline (sampled check err {err:.1e})")

    # scattered bounded-span regime (SuiteSparse/FEM stand-in, BASELINE
    # configs 4-5): 218k rows × ~55 random entries in a ±200 band →
    # SlabELL window buckets
    rng = np.random.default_rng(0)
    n_sc, k_sc, band = 217_918, 55, 200
    rr = np.repeat(np.arange(n_sc), k_sc)
    cc = rr + rng.integers(-band, band + 1, size=rr.shape)
    ok = (cc >= 0) & (cc < n_sc)
    import scipy.sparse as sp

    scat = sp.coo_matrix(
        (rng.standard_normal(int(ok.sum())).astype(np.float32),
         (rr[ok], cc[ok])), shape=(n_sc, n_sc)).tocsr()
    scat.sum_duplicates()
    scat = scat * 2e-2  # in-matrix damping (see bench_spmv)
    slab = smt.CSR.from_scipy(scat).to_slab()
    x_sc = jnp.asarray(rng.standard_normal(n_sc).astype(np.float32))
    y_sc = jax.jit(smt.spmv)(slab, x_sc)
    err_sc = np.abs(np.asarray(y_sc) - scat @ np.asarray(x_sc)).max()
    dt_sc = time_chained(lambda v, m: smt.spmv(m, v), x_sc,
                         captures=(slab,))
    scat_nnz_s = scat.nnz / dt_sc
    log(f"  scattered_218k/slab: {dt_sc*1e6:.1f} us/spmv  "
        f"{scat_nnz_s/1e9:.3f} Gnnz/s (S={slab.slab_windows}, "
        f"pad x{slab.nse/scat.nnz:.2f}, abs err {err_sc:.1e})")

    # assembly path (BASELINE config 2): random add_to inserts through the
    # C++ hash store, then freeze to CSR + one SpMV validated vs scipy
    n_ins = 2_000_000
    rng2 = np.random.default_rng(5)
    ir = rng2.integers(0, 100_000, n_ins)
    ic = rng2.integers(0, 100_000, n_ins)
    iv = rng2.standard_normal(n_ins)
    b = smt.SparseBuilder()
    t0 = time.perf_counter()
    b.add_batch(ir, ic, iv)
    t_ins = time.perf_counter() - t0
    t0 = time.perf_counter()
    frozen = b.to_csr()
    t_freeze = time.perf_counter() - t0
    xa = rng2.standard_normal(frozen.shape[1]).astype(np.float32)
    ya = np.asarray(smt.spmv(frozen, jnp.asarray(xa)))
    ref_m = sp.coo_matrix((iv, (ir, ic))).tocsr()
    err_a = np.abs(ya[: ref_m.shape[0]]
                   - (ref_m @ xa[: ref_m.shape[1]]).astype(np.float32)).max()
    ins_per_s = n_ins / t_ins
    log(f"  assembly: {ins_per_s/1e6:.1f}M inserts/s (batch add_to via C++ "
        f"store), freeze {t_freeze*1e3:.0f} ms, spmv err {err_a:.1e}")

    cg_small_ips, _ = bench_cg(hbm_bw, n=512)        # VMEM regime
    cg_big_ips, cg_big_frac = bench_cg(hbm_bw, n=2048)  # HBM regime, 4.2M rows

    print(json.dumps({
        "metric": "spmv_fraction_of_hbm_roofline_banded_16M",
        "value": round(big_frac, 4),
        "unit": "fraction",
        "vs_baseline": round(big_frac / 0.70, 4),  # target: ≥70% of roofline
        "detail": {
            "spmv_banded_16M_gnnz_per_s": round(big_nnz_s / 1e9, 3),
            "spmv_banded_1e4_gnnz_per_s": round(small_nnz_s / 1e9, 3),
            "spmv_scattered_218k_gnnz_per_s": round(scat_nnz_s / 1e9, 3),
            "assembly_minserts_per_s": round(ins_per_s / 1e6, 1),
            "cg_poisson_262k_iters_per_s": round(cg_small_ips, 1),
            "cg_poisson_4M_iters_per_s": round(cg_big_ips, 1),
            "cg_poisson_4M_roofline_frac": round(cg_big_frac, 4),
            "hbm_bw_gb_s": round(hbm_bw / 1e9, 1),
        },
    }))


if __name__ == "__main__":
    main()
