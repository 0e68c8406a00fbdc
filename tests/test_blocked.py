"""Reference-parity packed format: bit layout, round-trip, emulated SpMV."""

import numpy as np
import pytest

from sparsetpu.formats import random_csr, spmv_gold, verification
from sparsetpu.pack.blocked import (pack_blocked, print_wide,
                                    spmv_blocked_emulated, unpack_stream,
                                    write_hw_x_vector, _ratio_col_val)
from sparsetpu.pack.serialize import load_gstream, save_gstream
from sparsetpu.pack import pack_gstream, unpack_gstream
from sparsetpu.utils import SpmvConfig


@pytest.mark.parametrize("dtype,period", [(np.float64, 5), (np.float32, 3)])
def test_stream_period(dtype, period):
    # RATIO_col_val: 5 for f64, 3 for f32 (util.h:67)
    assert _ratio_col_val(dtype) == period


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize("partitions,vf", [(1, 1), (2, 4), (4, 8), (12, 8)])
def test_blocked_pack_emulated_spmv(dtype, partitions, vf):
    m = random_csr(300, 40000, density=0.003, seed=40, dtype=dtype,
                   empty_row_frac=0.2)  # 2 column blocks at 32768
    cfg = SpmvConfig(dtype=dtype, vf=vf, num_partitions=partitions)
    hw = pack_blocked(m, cfg)
    assert hw.nr_blocks == 2
    assert hw.num_partitions == partitions
    x = np.random.default_rng(1).standard_normal(m.nr_cols).astype(dtype)
    y = spmv_blocked_emulated(hw, x)
    tol = 1e-5 if dtype == np.float64 else 1e-3
    assert verification(spmv_gold(m, x), y, diff_thres=tol,
                        rel_thres=tol) == 0


def test_blocked_bit_layout():
    """15-bit local col + end-of-row flag in bit 15 (csr_hw.cpp:288-292)."""
    from sparsetpu.formats import CSRMatrix
    rows = np.array([0, 0, 1])
    cols = np.array([5, 700, 32768 + 9])  # block 0 and block 1
    vals = np.array([1.0, 2.0, 3.0])
    m = CSRMatrix.from_coo(rows, cols, vals, 2, 40000)
    hw = pack_blocked(m, SpmvConfig(dtype=np.float64, vf=1))
    sub0 = hw.submatrices[0][0]
    local, eor, v = unpack_stream(sub0, np.dtype(np.float64))
    assert local[0] == 5 and not eor[0]
    assert local[1] == 700 and eor[1]       # row 0 ends
    sub1 = hw.submatrices[0][1]
    local, eor, v = unpack_stream(sub1, np.dtype(np.float64))
    assert local[0] == 9 and eor[0]         # rebased col (thres_l = 32768)
    assert v[0] == 3.0
    # empty-rows bitmap: row 1 empty in block 0, row 0 empty in block 1
    assert hw.empty_rows_bitmap[0][1] and not hw.empty_rows_bitmap[0][0]
    assert hw.empty_rows_bitmap[1][0] and not hw.empty_rows_bitmap[1][1]
    assert "*" in print_wide(sub0, np.dtype(np.float64))


def test_write_hw_x_vector_pads():
    x = np.arange(5, dtype=np.float64)
    hx = write_hw_x_vector(x, 2, 4, np.float64)
    assert hx.shape == (2, 4)
    assert np.allclose(hx.reshape(-1)[:5], x)
    assert (hx.reshape(-1)[5:] == 0).all()  # csr_hw.cpp:1480-1481


def test_storage_overhead_reported():
    m = random_csr(200, 1000, density=0.05, seed=41)
    hw = pack_blocked(m, SpmvConfig(dtype=np.float64, vf=1))
    assert 0.5 < hw.storage_overhead() < 3.0


def test_gstream_serialize_roundtrip(tmp_path):
    m = random_csr(100, 2000, density=0.02, seed=42)
    p = pack_gstream(m)
    f = str(tmp_path / "packed.npz")
    save_gstream(f, p)
    p2 = load_gstream(f)
    m2 = unpack_gstream(p2)
    assert np.allclose(m.to_dense(), m2.to_dense())


def test_gstream_serialize_keeps_finish_quality(tmp_path):
    """r2 VERDICT weak #6: a reloaded pack must keep `sections`/`ordered`
    so the rebuilt device picks the same (fast) final level as the
    original, not a silent legacy-finish downgrade."""
    from sparsetpu.kernels.spmv_pallas import GStreamDevice

    m = random_csr(400, 3000, density=0.01, seed=7)
    p = pack_gstream(m)
    f = str(tmp_path / "packed.npz")
    save_gstream(f, p)
    p2 = load_gstream(f)
    assert p2.ordered == p.ordered
    assert (p2.sections is None) == (p.sections is None)
    if p.sections is not None:
        assert np.array_equal(np.asarray(p2.sections),
                              np.asarray(p.sections))
    d1 = GStreamDevice(p, interpret=True)
    d2 = GStreamDevice(p2, interpret=True)
    assert type(d2.final).__name__ == type(d1.final).__name__
