"""SpMV correctness: XLA path and Pallas kernel (interpret mode) vs gold."""

import numpy as np
import pytest

from sparsetpu import SparseMatrix, SpmvConfig
from sparsetpu.formats import (banded_csr, default_tolerance, laplace_2d,
                               random_csr, spmv_gold, verification)


def _check(m, backend, interpret=True, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(m.nr_cols)
    y_gold = spmv_gold(m, x)
    sm = SparseMatrix(m, backend=backend, interpret=interpret)
    y = np.asarray(sm.spmv(x))
    atol, rtol = default_tolerance(np.float32,
                                   m.nr_nzeros / max(m.nr_rows, 1))
    assert verification(y_gold, y, diff_thres=max(atol, 1e-4),
                        rel_thres=max(rtol, 1e-4)) == 0


@pytest.mark.parametrize("backend", ["xla", "pallas"])
@pytest.mark.parametrize("shape,density,kwargs", [
    ((64, 64), 0.1, {}),
    ((200, 300), 0.05, {"empty_row_frac": 0.3}),
    ((100, 3000), 0.02, {}),
    ((50, 40000), 0.004, {}),        # multi column-block
    ((500, 100), 0.08, {"powerlaw": True}),
])
def test_spmv_backends(backend, shape, density, kwargs):
    m = random_csr(*shape, density=density, seed=11, **kwargs)
    _check(m, backend)


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_spmv_structured(backend):
    _check(banded_csr(300, 300, bandwidth=5), backend)
    _check(laplace_2d(17), backend)


def test_spmm():
    m = random_csr(60, 80, density=0.1, seed=12)
    x = np.random.default_rng(2).standard_normal((80, 3))
    sm = SparseMatrix(m, backend="xla")
    y = np.asarray(sm.spmm(x))
    assert np.allclose(y, m.to_dense() @ x, atol=1e-4, rtol=1e-4)


def test_matmul_operator():
    m = random_csr(30, 30, density=0.2, seed=13)
    sm = SparseMatrix(m, backend="xla")
    x = np.ones(30)
    assert np.allclose(np.asarray(sm @ x), m.to_dense() @ x,
                       atol=1e-5, rtol=1e-5)


def test_reference_shaped_api():
    """The README.md:34-46 call sequence, reference-style."""
    from sparsetpu.api import (create_csr_hw_matrix, create_csr_hw_x_vector,
                               delete_csr_hw_matrix, delete_csr_hw_x_vector,
                               spmv_hw)
    m = random_csr(40, 50, density=0.1, seed=14)
    hw = create_csr_hw_matrix(m)  # interpret auto-detected off-TPU
    x = np.random.default_rng(4).standard_normal(50)
    hw_x = create_csr_hw_x_vector(hw, x)
    y = np.asarray(spmv_hw(hw, hw_x))
    assert verification(spmv_gold(m, x), y, diff_thres=1e-4,
                        rel_thres=1e-4) == 0
    delete_csr_hw_x_vector(hw_x)
    delete_csr_hw_matrix(hw)


def test_finish_final_level_active():
    """A moderate matrix is reduced entirely by the fixed-position final
    level: no F levels, no XLA fallback, few spills."""
    from sparsetpu.formats import random_csr, spmv_gold, verification
    m = random_csr(1500, 1500, density=0.03, seed=60,
                   dtype=np.float32)  # ~45 nnz/row
    # classic windowed path explicitly (the auto path picks the fused
    # layout, which has no separate final level)
    from sparsetpu.kernels.spmv_pallas import GStreamDevice
    from sparsetpu.pack.gather_stream import pack_gstream
    dev = GStreamDevice(pack_gstream(m), interpret=True)
    assert dev.final is not None, "expected the final reduction level"
    assert not dev.finish, "no heavy rows -> no F levels expected"
    assert dev.final.n_spills <= m.nr_nzeros // 100
    x = np.random.default_rng(3).standard_normal(m.nr_cols)
    y = np.asarray(dev.spmv(x))
    assert verification(spmv_gold(m, x), y, diff_thres=1e-3,
                        rel_thres=1e-3) == 0


def test_finish_heavy_rows_f_levels():
    """Rows with > HEAVY_CAP partials engage the F pre-reduction and stay
    correct (power-law row lengths)."""
    from sparsetpu.formats import spmv_gold, verification
    from sparsetpu.formats.csr import CSRMatrix
    rng = np.random.default_rng(7)
    r, c = 300, 20000
    nnz_per_row = np.minimum((rng.pareto(1.0, r) * 30).astype(int) + 1, c)
    rows = np.repeat(np.arange(r), nnz_per_row)
    cols = np.concatenate(
        [rng.choice(c, k, replace=False) for k in nnz_per_row])
    vals = rng.standard_normal(rows.shape[0]).astype(np.float32)
    m = CSRMatrix.from_coo(rows, cols, vals, r, c)
    # classic device explicitly (the auto path splits heavy rows into
    # the hybrid fused+classic pair)
    from sparsetpu.kernels.spmv_pallas import GStreamDevice
    from sparsetpu.pack.gather_stream import pack_gstream
    dev = GStreamDevice(pack_gstream(m), interpret=True)
    assert len(dev.finish) >= 1, "expected heavy-row F levels"
    x = rng.standard_normal(c)
    y = np.asarray(dev.spmv(x))
    assert verification(spmv_gold(m, x), y, diff_thres=1e-3,
                        rel_thres=1e-3) == 0


def test_transpose_spmv():
    """A.T @ x matches the transposed gold (lazy packed transpose)."""
    from sparsetpu.formats import random_csr, spmv_gold, verification
    m = random_csr(300, 500, density=0.05, seed=70, dtype=np.float32)
    sm = SparseMatrix(m, backend="pallas", interpret=True)
    x = np.random.default_rng(8).standard_normal(m.nr_rows)
    y = np.asarray(sm.T.spmv(x))
    assert verification(spmv_gold(m.T, x), y, 1e-3, 1e-3) == 0
    assert sm.T is sm.T          # cached


@pytest.mark.parametrize("seed", range(6))
def test_spmv_fuzz_shapes(seed):
    """Randomized shapes/densities through the full pallas path."""
    rng = np.random.default_rng(1000 + seed)
    r = int(rng.integers(1, 3000))
    c = int(rng.integers(1, 60000))
    density = float(10 ** rng.uniform(-4, -0.5))
    density = min(density, 4000 / max(r * c, 1) + density * 0.1)
    m = random_csr(r, c, density=density, seed=seed, dtype=np.float32,
                   empty_row_frac=float(rng.uniform(0, 0.4)))
    x = rng.standard_normal(c)
    sm = SparseMatrix(m, backend="pallas", interpret=True)
    y = np.asarray(sm.spmv(x))
    assert verification(spmv_gold(m, x), y, diff_thres=1e-3,
                        rel_thres=1e-3) == 0


def test_bf16_value_mode():
    """bfloat16 value plane: half the value stream, ~8-bit-mantissa
    accuracy (the "ML precision" speed mode; no reference analogue)."""
    import ml_dtypes
    from sparsetpu.formats import default_tolerance
    m = random_csr(1000, 2000, density=0.02, seed=71, dtype=np.float32)
    cfg = SpmvConfig(dtype=np.dtype(ml_dtypes.bfloat16))
    sm = SparseMatrix(m, cfg, interpret=True)
    x = np.random.default_rng(6).standard_normal(m.nr_cols)
    y = np.asarray(sm.spmv(x))
    assert y.dtype == np.float32
    atol, rtol = default_tolerance(cfg.dtype, m.nr_nzeros / m.nr_rows)
    assert verification(spmv_gold(m, x), y, atol, rtol) == 0
