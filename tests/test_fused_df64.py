"""df64 on the fused resident-x layout (VERDICT r3 item 7).

The reference's default build is DOUBLE=1 (Makefile:18, util.h:18-26);
the TPU equivalent is two-float emulation, and it must ride the flagship
fused layout, not just the classic windowed one.  Accuracy contract: the
standard double-double bound O(cond * 2^-48) — identical to the classic
DF64GStreamDevice — which on well-conditioned sums is ~1e-13 relative
and on cancelling sums keeps the ABSOLUTE error at the f64-oracle scale
where plain f32 loses ~7 digits.
"""

import numpy as np
import pytest

from sparsetpu.api.api import SparseMatrix
from sparsetpu.formats.csr import CSRMatrix
from sparsetpu.formats.gold import spmv_gold
from sparsetpu.formats.random import random_csr
from sparsetpu.kernels.spmv_fused import DF64FusedDevice, pack_fused_df64


@pytest.fixture(scope="module")
def matrix():
    return random_csr(900, 4000, density=0.01, seed=7)  # float64 values


def test_api_double_selects_fused_device(matrix):
    sm = SparseMatrix(matrix, interpret=True)
    assert isinstance(sm._device, DF64FusedDevice)


def test_fused_df64_well_conditioned_accuracy(matrix):
    """Positive values + positive x: no cancellation, so the relative
    error must sit at the df64 bound (~2^-48), far below f32."""
    m = CSRMatrix(matrix.row_ptr, matrix.col_ind,
                  np.abs(matrix.values) + 0.1, matrix.nr_rows,
                  matrix.nr_cols)
    x = np.random.default_rng(0).uniform(0.5, 1.5, m.nr_cols)
    dev = pack_fused_df64(m, interpret=True)
    assert dev is not None
    y = dev.spmv_f64(x)
    yg = spmv_gold(m, x)
    rel = np.max(np.abs(y - yg) / np.maximum(np.abs(yg), 1e-30))
    assert rel < 1e-12, rel


def test_fused_df64_matches_classic_bound(matrix):
    """General (cancelling) sums: the fused device must match the
    classic df64 device's error scale against the f64 oracle — same
    compensated arithmetic, different schedule."""
    from sparsetpu.kernels.f64emu import DF64GStreamDevice
    x = np.random.default_rng(3).standard_normal(matrix.nr_cols)
    yg = spmv_gold(matrix, x)
    dev = pack_fused_df64(matrix, interpret=True)
    yf = dev.spmv_f64(x)
    yc = DF64GStreamDevice(matrix, interpret=True).spmv_f64(x)
    scale = np.abs(yg) + np.median(np.abs(yg))
    ef = np.max(np.abs(yf - yg) / scale)
    ec = np.max(np.abs(yc - yg) / scale)
    assert ef < max(10 * ec, 1e-12), (ef, ec)


def test_fused_df64_ill_conditioned_beats_f32():
    """1e8 + 1 - 1e8 + 1/3 rows: f32 loses the +1 entirely; df64 keeps
    ~13 digits (the spmv_gold oracle is exact f64 here)."""
    n = 256
    vals = np.tile([1e8, 1.0, -1e8, 1.0 / 3], n).astype(np.float64)
    rp = np.arange(0, 4 * n + 1, 4).astype(np.int64)
    ci = (np.arange(4 * n) * 7 % 3000).astype(np.int64)
    m = CSRMatrix(rp, ci, vals, n, 3000)
    x = np.ones(3000)
    dev = pack_fused_df64(m, interpret=True)
    assert dev is not None
    y = dev.spmv_f64(x)
    yg = spmv_gold(m, x)
    assert np.max(np.abs(y - yg)) < 1e-6
    # f32 reference point: the same rows in f32 are off by O(1)
    y32 = np.asarray(
        SparseMatrix(CSRMatrix(rp, ci, vals.astype(np.float32), n, 3000),
                     interpret=True).spmv(x.astype(np.float32)))
    assert np.max(np.abs(y32 - yg)) > 0.1


def test_fused_df64_spmm_matches_per_column(matrix):
    sm = SparseMatrix(matrix, interpret=True)
    assert isinstance(sm._device, DF64FusedDevice)
    X = np.random.default_rng(1).standard_normal((matrix.nr_cols, 3))
    Y = sm.spmm(X)
    G = np.stack([spmv_gold(matrix, X[:, k]) for k in range(3)], axis=1)
    scale = np.abs(G) + np.median(np.abs(G))
    assert np.max(np.abs(Y - G) / scale) < 1e-10


def test_fused_df64_composes_with_jit(matrix):
    """DF64 in, DF64 out under jit (the cg_df64 composition contract)."""
    import jax
    from sparsetpu.kernels.f64emu import DF64
    sm = SparseMatrix(matrix, interpret=True)
    xd = DF64.from_f64(np.random.default_rng(2).standard_normal(
        matrix.nr_cols))

    @jax.jit
    def step(s, xv):
        y = s.spmv(xv)
        return y

    y = step(sm, xd)
    assert isinstance(y, DF64)
    yg = spmv_gold(matrix, xd.to_f64())
    scale = np.abs(yg) + np.median(np.abs(yg))
    assert np.max(np.abs(y.to_f64() - yg) / scale) < 1e-10


def test_fused_df64_pytree_roundtrip(matrix):
    import jax
    dev = pack_fused_df64(matrix, interpret=True)
    leaves, treedef = jax.tree_util.tree_flatten(dev)
    dev2 = jax.tree_util.tree_unflatten(treedef, leaves)
    x = np.random.default_rng(5).standard_normal(matrix.nr_cols)
    np.testing.assert_array_equal(dev.spmv_f64(x), dev2.spmv_f64(x))
