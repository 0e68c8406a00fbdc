"""Solvers on top of SpMV (CG / BiCGSTAB / power iteration)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sparsetpu import SparseMatrix
from sparsetpu.formats import laplace_2d, random_csr
from sparsetpu.solvers.cg import bicgstab, cg, power_iteration


def _xla_spmv(m):
    sm = SparseMatrix(m, backend="xla")
    return sm.spmv, sm


def test_cg_laplace():
    m = laplace_2d(12)
    spmv, _ = _xla_spmv(m)
    b = jnp.ones((m.nr_rows,), jnp.float32)
    res = cg(spmv, b, tol=1e-5, maxiter=2000)
    x = np.asarray(res.x)
    assert np.allclose(m.to_dense() @ x, np.ones(m.nr_rows), atol=1e-2)
    assert int(res.iterations) < 2000


def test_bicgstab_nonsymmetric():
    rng = np.random.default_rng(0)
    m = random_csr(80, 80, density=0.2, seed=30)
    # diagonally dominate to guarantee convergence
    d = np.abs(m.to_dense()).sum(axis=1) + 1.0
    dense = m.to_dense() + np.diag(d)
    from sparsetpu.formats import CSRMatrix
    coo = np.nonzero(dense)
    m2 = CSRMatrix.from_coo(coo[0], coo[1], dense[coo], 80, 80)
    spmv, _ = _xla_spmv(m2)
    b = jnp.asarray(rng.standard_normal(80).astype(np.float32))
    res = bicgstab(spmv, b, tol=1e-6, maxiter=500)
    x = np.asarray(res.x)
    assert np.allclose(dense @ x, np.asarray(b), atol=1e-3)


def test_power_iteration():
    m = laplace_2d(8)
    spmv, _ = _xla_spmv(m)
    lam, v = power_iteration(spmv, m.nr_rows, iters=200)
    w = np.linalg.eigvalsh(m.to_dense())
    assert abs(float(lam) - w[-1]) < 1e-2 * abs(w[-1])
