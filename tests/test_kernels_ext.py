"""Extension kernels: fused SpMM, BSR SpMV (interpret mode)."""

import numpy as np
import pytest

from sparsetpu import SparseMatrix
from sparsetpu.formats import (banded_csr, csr_to_bsr, random_csr,
                               spmm_gold, spmv_gold, verification)
from sparsetpu.kernels.bsr import bsr_spmv


@pytest.mark.parametrize("k", [1, 3, 8])
def test_spmm_fused(k):
    m = random_csr(200, 1500, density=0.02, seed=70)
    x = np.random.default_rng(1).standard_normal((m.nr_cols, k))
    sm = SparseMatrix(m, backend="pallas", interpret=True)
    y = np.asarray(sm.spmm(x))
    yg = spmm_gold(m, x)
    assert y.shape == (m.nr_rows, k)
    for kk in range(k):
        assert verification(yg[:, kk], y[:, kk], diff_thres=1e-3,
                            rel_thres=1e-3) == 0


def test_spmm_operator():
    m = random_csr(50, 60, density=0.1, seed=71)
    sm = SparseMatrix(m, backend="pallas", interpret=True)
    x = np.random.default_rng(2).standard_normal((60, 2))
    y = np.asarray(sm @ x)
    assert np.allclose(y, m.to_dense() @ x, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("shape,bandwidth", [((300, 300), 10),
                                             ((1000, 700), 40)])
def test_bsr_spmv(shape, bandwidth):
    m = banded_csr(*shape, bandwidth=bandwidth)
    b = csr_to_bsr(m, block_shape=(8, 128))
    x = np.random.default_rng(3).standard_normal(m.nr_cols)
    y = np.asarray(bsr_spmv(b, x, interpret=True))
    assert verification(spmv_gold(m, x), y, diff_thres=1e-3,
                        rel_thres=1e-3) == 0


def test_bsr_spmv_random():
    m = random_csr(200, 500, density=0.05, seed=72)
    b = csr_to_bsr(m, block_shape=(8, 128))
    x = np.random.default_rng(4).standard_normal(m.nr_cols)
    y = np.asarray(bsr_spmv(b, x, interpret=True))
    assert verification(spmv_gold(m, x), y, diff_thres=1e-3,
                        rel_thres=1e-3) == 0
