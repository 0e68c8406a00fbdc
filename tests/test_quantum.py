"""Row-pad quantum (Q = the reference's VF knob, util.h:31-39) tests:
pack/unpack round trips, kernel correctness and fill-factor gains at
every quantum, plus the config.vf wiring."""

import numpy as np
import pytest

from sparsetpu.formats.gold import spmv_gold, verification
from sparsetpu.formats.random import random_csr
from sparsetpu.pack.gather_stream import (VALID_Q, _choose_layout,
                                          pack_gstream, unpack_gstream)


@pytest.mark.parametrize("q", VALID_Q)
def test_pack_unpack_roundtrip_quantum(q):
    m = random_csr(600, 5000, density=0.004, seed=3, dtype=np.float32)
    p = pack_gstream(m, Q=q, G=2)
    assert p.Q == q and p.planes == 8 // q
    assert p.chunk_row.shape == (p.n_tiles * p.planes, 128)
    m2 = unpack_gstream(p)
    a, b = m.to_scipy(), m2.to_scipy()
    assert (a != b).nnz == 0


@pytest.mark.parametrize("q", VALID_Q)
@pytest.mark.parametrize("use_native", [True, False])
def test_spmv_quantum(q, use_native, rng):
    from sparsetpu.kernels.spmv_pallas import GStreamDevice
    m = random_csr(800, 6000, density=0.003, seed=7, dtype=np.float32)
    p = pack_gstream(m, Q=q, use_native=use_native)
    dev = GStreamDevice(p, interpret=True)
    x = rng.standard_normal(m.nr_cols)
    y = np.asarray(dev.spmv(x))
    assert verification(spmv_gold(m, x), y, 1e-3, 1e-3) == 0


def test_small_quantum_raises_fill():
    # scattered wide rows: ~3 nnz per (row, window) run at G=4 — the
    # VERDICT round-1 weakness case.  Q=2 must beat Q=8 fill by >= 1.8x
    # (this tiny matrix is dominated by per-block step padding, so the
    # absolute fill stays small; the RATIO is what the quantum buys)
    m = random_csr(2000, 40_000, density=0.0002, seed=1, dtype=np.float32)
    p8 = pack_gstream(m, Q=8, G=4)
    p2 = pack_gstream(m, Q=2, G=4)
    assert p2.fill_factor > 1.8 * p8.fill_factor


def test_choose_layout_reacts_to_structure():
    # scattered wide rows: the model must reach for a wider window
    # and/or a smaller quantum than the dense default (small quanta
    # also multiply finish children, so Q=8 + large G can win)
    m = random_csr(2000, 40_000, density=0.0002, seed=1, dtype=np.float32)
    g, q = _choose_layout(m)
    assert q in VALID_Q and (g >= 8 or q <= 4)
    # dense short rows should keep a large quantum
    md = random_csr(3000, 600, density=0.1, seed=2, dtype=np.float32)
    g2, q2 = _choose_layout(md)
    assert q2 >= 4


def test_config_vf_sets_quantum():
    from sparsetpu.api.api import SparseMatrix
    from sparsetpu.utils.config import SpmvConfig
    m = random_csr(500, 3000, density=0.01, seed=5, dtype=np.float32)
    sm = SparseMatrix(m, SpmvConfig(dtype=np.float32, vf=2))
    assert sm.packed.Q == 2
    x = np.random.default_rng(0).standard_normal(m.nr_cols)
    y = np.asarray(sm.spmv(x))
    assert verification(spmv_gold(m, x), y, 1e-3, 1e-3) == 0


def test_native_numpy_pack_agree_on_spmv(rng):
    """Native (C++) and NumPy packs may place chunks differently but must
    compute the same product at every quantum."""
    from sparsetpu.native.packer import available
    if not available():
        pytest.skip("native packer not built")
    from sparsetpu.kernels.spmv_pallas import GStreamDevice
    m = random_csr(400, 2500, density=0.01, seed=11, dtype=np.float32)
    x = rng.standard_normal(m.nr_cols)
    g = spmv_gold(m, x)
    for q in (2, 4, 8):
        for un in (True, False):
            p = pack_gstream(m, Q=q, use_native=un)
            y = np.asarray(GStreamDevice(p, interpret=True).spmv(x))
            assert verification(g, y, 1e-3, 1e-3) == 0, (q, un)


def test_config_interpret_knob_reaches_device():
    """Every SpmvConfig knob must reach the engine (VERDICT r1 item 10):
    interpret (TARGET=emu) selects the interpreter when the SparseMatrix
    interpret argument is left unset."""
    from sparsetpu.api.api import SparseMatrix
    from sparsetpu.utils.config import SpmvConfig
    m = random_csr(200, 300, density=0.02, seed=13, dtype=np.float32)
    sm = SparseMatrix(m, SpmvConfig(dtype=np.float32, interpret=True))
    assert sm._device.interpret is True
    sm2 = SparseMatrix(m, SpmvConfig(dtype=np.float32, interpret=True),
                       interpret=False)   # explicit argument wins
    assert sm2._device.interpret is False
