#!/usr/bin/env python
"""On-chip smoke suite: every major path on the real TPU.

pytest runs interpret-mode on CPU (tests/conftest.py); this script drives
the same flows on the actual chip.  Run with:

    env PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/tpu_smoke.py

Expected runtime ~5-8 min (first-compile dominated).
"""

import sys
import time

import numpy as np


def check(name, fn):
    t0 = time.time()
    try:
        fn()
        print(f"  PASS  {name} ({time.time()-t0:.0f}s)", flush=True)
        return True
    except Exception as e:
        print(f"  FAIL  {name}: {type(e).__name__}: {e}", flush=True)
        return False


def main() -> int:
    import jax
    print("device:", jax.devices()[0], flush=True)
    from sparsetpu import SparseMatrix, spmv_gold, verification
    from sparsetpu.formats import random_csr
    from sparsetpu.formats.gold import spmm_gold
    from sparsetpu.utils.config import SpmvConfig

    rng = np.random.default_rng(0)
    m = random_csr(30_000, 40_000, density=0.001, seed=42,
                   dtype=np.float32)
    x = rng.standard_normal(m.nr_cols)
    ok = []

    def spmv_f32():
        sm = SparseMatrix(m)
        y = np.asarray(sm.spmv(x))
        assert verification(spmv_gold(m, x), y, 1e-3, 1e-3) == 0
    ok.append(check("spmv f32", spmv_f32))

    def spmv_df64():
        m64 = random_csr(5000, 6000, density=0.005, seed=1)
        g = m64.to_scipy().astype(np.float64) @ x[:6000]
        y = SparseMatrix(m64).spmv(x[:6000])
        assert np.abs(y - g).max() < 1e-9
    ok.append(check("spmv df64 (accuracy < 1e-9)", spmv_df64))

    def spmv_powerlaw():
        mp = random_csr(50_000, 50_000, density=0.0004, seed=6,
                        dtype=np.float32, powerlaw=True)
        sm = SparseMatrix(mp)
        xp = rng.standard_normal(mp.nr_cols)
        y = np.asarray(sm.spmv(xp))
        assert len(sm._device.finish) >= 1     # heavy-row F levels active
        assert verification(spmv_gold(mp, xp), y, 1e-2, 1e-3) == 0
    ok.append(check("spmv power-law (F levels)", spmv_powerlaw))

    def spmm_k8():
        sm = SparseMatrix(m)
        X = rng.standard_normal((m.nr_cols, 8)).astype(np.float32)
        Y = np.asarray(sm.spmm(X))
        assert np.abs(Y - spmm_gold(m, X)).max() < 1e-2
    ok.append(check("spmm k=8 (fused finish)", spmm_k8))

    def spgemm_dev():
        from sparsetpu.kernels.spgemm import spgemm
        a = random_csr(1000, 800, density=0.01, seed=3, dtype=np.float32)
        b = random_csr(800, 900, density=0.01, seed=4, dtype=np.float32)
        c = spgemm(a, b)
        g = (a.to_scipy() @ b.to_scipy()).tocsr()
        g.sum_duplicates(); g.sort_indices()
        np.testing.assert_allclose(c.values, g.data, rtol=1e-3, atol=1e-3)
    ok.append(check("spgemm numeric phase", spgemm_dev))

    def dist_paths():
        from sparsetpu.dist import make_mesh, ring_shard_spmv, shard_spmv
        mesh = make_mesh(1)
        for f in (shard_spmv, ring_shard_spmv):
            sh = f(m, mesh, interpret=False)
            y = np.asarray(sh.spmv(x))
            assert verification(spmv_gold(m, x), y, 1e-3, 1e-3) == 0
    ok.append(check("dist all-gather + ring schedules", dist_paths))

    def checkpoint():
        import tempfile, os
        from sparsetpu.pack.serialize import load_device, save_device
        sm = SparseMatrix(m, SpmvConfig(dtype=np.float32))
        with tempfile.TemporaryDirectory() as td:
            pth = os.path.join(td, "d.npz")
            save_device(pth, sm._device)
            d2 = load_device(pth)
            y = np.asarray(d2.spmv(d2.prepare_x(x), x_is_packed=True))
        assert verification(spmv_gold(m, x), y, 1e-3, 1e-3) == 0
    ok.append(check("device checkpoint roundtrip", checkpoint))

    def solver():
        from sparsetpu.formats.random import laplace_2d
        from sparsetpu.solvers.cg import cg, jacobi_preconditioner, pcg
        L = laplace_2d(48)
        L.values = L.values.astype(np.float32)
        A = SparseMatrix(L, SpmvConfig(dtype=np.float32))
        b = np.ones(L.nr_rows, np.float32)
        r = pcg(A.spmv, b, jacobi_preconditioner(L), tol=1e-5)
        assert float(r.residual_norm) < 1e-3 * np.linalg.norm(b)
    ok.append(check("preconditioned CG on chip", solver))

    def solver_df64():
        import jax
        from sparsetpu import DF64
        from sparsetpu.formats.random import laplace_2d
        from sparsetpu.solvers.cg import cg_df64
        L = laplace_2d(32)
        A = SparseMatrix(L)                      # DOUBLE (df64) device
        b = np.ones(L.nr_rows, np.float64)
        r = jax.jit(lambda A, b: cg_df64(A.spmv, b, maxiter=600))(
            A, DF64.from_f64(b))
        resid = np.linalg.norm(
            L.to_scipy().astype(np.float64) @ r.x.to_f64() - b)
        assert resid < 1e-6 * np.linalg.norm(b), resid
    ok.append(check("df64 CG under jit on chip", solver_df64))

    def solver_gmres():
        from sparsetpu.solvers.cg import gmres
        from sparsetpu.formats.random import laplace_2d
        L = laplace_2d(32)
        L.values = L.values.astype(np.float32)
        A = SparseMatrix(L, SpmvConfig(dtype=np.float32))
        b = np.ones(L.nr_rows, np.float32)
        r = gmres(A.spmv, b, restart=25, tol=1e-5, maxiter=400)
        assert float(r.residual_norm) < 1e-3 * np.linalg.norm(b)
    ok.append(check("restarted GMRES on chip", solver_gmres))

    print(f"{sum(ok)}/{len(ok)} passed", flush=True)
    return 0 if all(ok) else 1


if __name__ == "__main__":
    sys.exit(main())
