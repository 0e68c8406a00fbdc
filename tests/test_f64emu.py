"""f64-emulated (double-float) SpMV: precision beyond f32."""

import numpy as np

from sparsetpu.formats import CSRMatrix, random_csr, spmv_gold, verification
from sparsetpu.kernels.f64emu import (join_f64, spmv_f64_emulated, split_f64)
from sparsetpu.kernels.spmv_xla import spmv_coo_xla
import jax.numpy as jnp


def _cancellation_matrix(n=64):
    """Rows of large same-magnitude opposite-sign values: f32 products lose
    ~1e-3 absolute, far beyond the reference's 1e-5 tolerance."""
    rows, cols, vals = [], [], []
    rng = np.random.default_rng(7)
    for r in range(n):
        big = rng.uniform(1e4, 2e4)
        frac = rng.uniform(0.1, 0.9)
        c = rng.choice(n, size=4, replace=False)
        rows += [r] * 4
        cols += list(c)
        vals += [big, -big + frac, big * 0.5, -big * 0.5 + frac]
    return CSRMatrix.from_coo(np.array(rows), np.array(cols),
                              np.array(vals, np.float64), n, n)


def test_split_join_exact():
    x = np.random.default_rng(0).uniform(-1e6, 1e6, 1000)
    hi, lo = split_f64(x)
    err = np.abs(join_f64(hi, lo) - x) / np.abs(x)
    assert err.max() < 2 ** -45


def test_df64_beats_f32_on_cancellation():
    m = _cancellation_matrix()
    x = np.random.default_rng(1).uniform(0.5, 1.5, m.nr_cols)
    y64 = spmv_gold(m, x)

    # plain f32 fails the reference tolerance here
    coo = m.to_coo()
    y32 = np.asarray(spmv_coo_xla(
        jnp.asarray(coo.row_ind), jnp.asarray(coo.col_ind),
        jnp.asarray(coo.values.astype(np.float32)),
        jnp.asarray(x.astype(np.float32)), m.nr_rows))
    assert verification(y64, y32, diff_thres=1e-5) > 0

    # df64 emulation passes it
    yd = spmv_f64_emulated(m, x)
    assert verification(y64, yd, diff_thres=1e-5) == 0


def test_df64_random():
    m = random_csr(300, 400, density=0.05, seed=50, dtype=np.float64)
    x = np.random.default_rng(2).standard_normal(400)
    yd = spmv_f64_emulated(m, x)
    assert verification(spmv_gold(m, x), yd, diff_thres=1e-5) == 0


def test_df64_gstream_device_accuracy():
    """The packed df64 device (TwoProd + df64-tree kernels) reaches ~2^-48
    relative accuracy where plain f32 sits at 2^-24."""
    from sparsetpu.formats.random import random_csr
    from sparsetpu.kernels.f64emu import DF64GStreamDevice

    m = random_csr(1500, 2000, density=0.01, seed=7)  # float64 values
    x = np.random.default_rng(1).standard_normal(2000)
    gold = m.to_scipy().astype(np.float64) @ x
    d = DF64GStreamDevice(m, interpret=True)
    y = d.spmv_f64(x)
    assert np.abs(y - gold).max() < 1e-11


def test_api_f64_dtype_routes_to_df64():
    """SparseMatrix honors a float64 matrix dtype: results are float64 and
    beyond f32 accuracy (the reference's DOUBLE=1 default, util.h:18-26)."""
    from sparsetpu.api.api import SparseMatrix
    from sparsetpu.formats.random import random_csr

    m = random_csr(800, 1200, density=0.02, seed=8)
    x = np.random.default_rng(2).standard_normal(1200)
    gold = m.to_scipy().astype(np.float64) @ x
    sm = SparseMatrix(m, interpret=True)
    y = sm.spmv(x)
    assert y.dtype == np.float64
    assert np.abs(y - gold).max() < 1e-11
