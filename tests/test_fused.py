"""Fused resident-x layout (pack/fused.py + kernels/spmv_fused.py).

The round-3 path: whole SpMV in one kernel pass for matrices whose x
fits VMEM.  Tests run both the native (C++) and NumPy pack engines in
interpret mode against the CPU gold (SURVEY.md section 4 mechanism 1).
"""

import numpy as np
import pytest

from sparsetpu.api.api import SparseMatrix
from sparsetpu.formats.gold import spmv_gold
from sparsetpu.formats.random import random_csr
from sparsetpu.kernels.spmv_fused import FusedDevice
from sparsetpu.pack.fused import pack_fused
from sparsetpu.utils.config import SpmvConfig

SHAPES = [(500, 3000, 0.01, 0), (2000, 20000, 0.002, 1),
          (300, 900, 0.05, 2), (1000, 50000, 0.001, 4),
          (4000, 4000, 0.004, 5)]


def _check(m, p):
    dev = FusedDevice(p, interpret=True)
    x = np.random.default_rng(9).standard_normal(m.nr_cols)
    y = np.asarray(dev.spmv(x))
    g = spmv_gold(m, x)
    err = np.abs(y - g).max() / max(np.abs(g).max(), 1)
    assert err < 1e-5, err


@pytest.mark.parametrize("nr,nc,d,seed", SHAPES)
def test_fused_native_matches_gold(nr, nc, d, seed):
    m = random_csr(nr, nc, density=d, seed=seed)
    p = pack_fused(m)
    assert p is not None
    _check(m, p)


@pytest.mark.parametrize("nr,nc,d,seed", SHAPES[:3])
def test_fused_numpy_fallback_matches_gold(nr, nc, d, seed):
    m = random_csr(nr, nc, density=d, seed=seed)
    p = pack_fused(m, use_native=False)
    assert p is not None
    _check(m, p)


def test_fused_q4():
    m = random_csr(800, 5000, density=0.01, seed=7)
    p = pack_fused(m, Q=4)
    assert p is not None and p.Q == 4 and p.planes == 2
    _check(m, p)


def test_fused_no_native_spills():
    m = random_csr(2000, 20000, density=0.002, seed=1)
    p = pack_fused(m)
    assert p.spill_row.size == 0  # augmenting matching never spills


def test_fused_oversized_cols_falls_back():
    from sparsetpu.pack.fused import MAX_RESIDENT_COLS
    m = random_csr(10, MAX_RESIDENT_COLS + 1024, density=1e-5, seed=0)
    assert pack_fused(m) is None


def test_api_auto_selects_fused():
    m = random_csr(600, 4000, density=0.01, seed=3)
    sm = SparseMatrix(m, SpmvConfig(dtype=np.float32), interpret=True)
    assert isinstance(sm._device, FusedDevice)
    x = np.random.default_rng(0).standard_normal(m.nr_cols)
    np.testing.assert_allclose(np.asarray(sm.spmv(x)), spmv_gold(m, x),
                               rtol=1e-4, atol=1e-4)


def test_api_fused_spmm_matches_gold():
    """Multi-RHS on the fused resident-x layout itself (VERDICT r3
    item 5): one metadata decode serves all k planes in-step."""
    m = random_csr(400, 3000, density=0.01, seed=3)
    sm = SparseMatrix(m, SpmvConfig(dtype=np.float32), interpret=True)
    assert isinstance(sm._device, FusedDevice)
    assert sm._device.spmm_applicable(3)
    X = np.random.default_rng(0).standard_normal((m.nr_cols, 3))
    Y = np.asarray(sm.spmm(X))
    G = np.stack([spmv_gold(m, X[:, k]) for k in range(3)], axis=1)
    np.testing.assert_allclose(Y, G, rtol=1e-4, atol=1e-4)


def test_fused_spmm_device_direct_and_gate():
    """FusedDevice.spmm matches per-column spmv for several k; an
    absurd k fails the VMEM gate."""
    m = random_csr(900, 4000, density=0.008, seed=11)
    p = pack_fused(m)
    assert p is not None
    dev = FusedDevice(p, interpret=True)
    rng = np.random.default_rng(2)
    for k in (1, 4, 8):
        X = rng.standard_normal((m.nr_cols, k))
        Y = np.asarray(dev.spmm(X))
        G = np.stack([np.asarray(dev.spmv(X[:, i]))
                      for i in range(k)], axis=1)
        np.testing.assert_allclose(Y, G, rtol=1e-5, atol=1e-5)
    assert not dev.spmm_applicable(100_000)


def test_fused_device_serialize_roundtrip(tmp_path):
    from sparsetpu.pack.serialize import load_device, save_device
    m = random_csr(500, 3000, density=0.01, seed=0)
    dev = FusedDevice(pack_fused(m), interpret=True)
    f = str(tmp_path / "fused.npz")
    save_device(f, dev)
    dev2 = load_device(f, interpret=True)
    assert isinstance(dev2, FusedDevice)
    x = np.random.default_rng(1).standard_normal(m.nr_cols)
    np.testing.assert_allclose(np.asarray(dev2.spmv(x)),
                               np.asarray(dev.spmv(x)), rtol=1e-6)


def test_fused_through_jit_as_pytree():
    import jax
    m = random_csr(400, 2000, density=0.01, seed=2)
    dev = FusedDevice(pack_fused(m), interpret=True)
    x = np.random.default_rng(3).standard_normal(m.nr_cols)

    @jax.jit
    def f(d, xi):
        return d.spmv(xi)

    y = np.asarray(f(dev, x))
    np.testing.assert_allclose(y, spmv_gold(m, x), rtol=1e-4, atol=1e-4)


def test_fem_fixture_file_roundtrip():
    """A real structured PDE matrix (27-point 3D Poisson FEM fixture)
    through the file reader and the fused device (r2 VERDICT missing #2:
    at least one benchmarked pattern with genuine structure)."""
    import os
    from sparsetpu.formats.io import read_matrix
    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "fem_poisson8.mtx")
    m = read_matrix(path, dtype=np.float32)
    assert m.nr_rows == 512 and m.nr_nzeros > 8000
    p = pack_fused(m)
    assert p is not None and p.fill_factor > 0.4
    _check(m, p)


def test_fem_generator_structure():
    from sparsetpu.formats.random import fem_poisson_3d
    m = fem_poisson_3d(6)
    assert m.nr_rows == 216
    d = m.to_dense()
    assert np.allclose(d, d.T)              # symmetric
    assert (np.linalg.eigvalsh(d) > 0).all()  # SPD


def test_hybrid_heavy_row_split():
    """Powerlaw-ish matrices split heavy rows (> threshold nnz) into a
    classic device; y = y_light + y_heavy matches gold."""
    from sparsetpu.formats.csr import CSRMatrix
    rng = np.random.default_rng(0)
    nr = nc = 30000
    rows_l, cols_l, vals_l = [], [], []
    for r in range(nr):
        k = 3 if r % 1000 else 5000
        c = rng.choice(nc, k, replace=False)
        rows_l.append(np.full(c.size, r))
        cols_l.append(c)
        vals_l.append(rng.standard_normal(c.size))
    m = CSRMatrix.from_coo(np.concatenate(rows_l), np.concatenate(cols_l),
                           np.concatenate(vals_l).astype(np.float32),
                           nr, nc)
    sm = SparseMatrix(m, SpmvConfig(dtype=np.float32), interpret=True)
    assert isinstance(sm._device, FusedDevice)
    assert sm._heavy_dev is not None
    x = rng.standard_normal(nc)
    y = np.asarray(sm.spmv(x))
    g = spmv_gold(m, x)
    assert np.abs(y - g).max() / np.abs(g).max() < 1e-4


def test_scatter_profile_chooser():
    """Scattered matrices pick the min-slot-cost candidate: Q < 8 (the
    compact per-element stream) and never worse than the Q=8 pack."""
    m = random_csr(60_000, 60_000, density=2.2 / 60_000, seed=5)
    p = pack_fused(m)

    def cost(pk):
        return (pk.n_slots
                + (pk.fin1_i1.shape[0] + pk.fin2_i1.shape[0]) * 128)

    assert p.Q < 8
    p8 = pack_fused(m, Q=8)
    assert cost(p) <= cost(p8)
    _check(m, p)


def test_scatter_multiplicity_one_direct():
    """~1 chunk/row rows go through the direct stage-2 finish (stage 1
    would compress nothing)."""
    m = random_csr(30_000, 120_000, density=1.05 / 120_000, seed=6)
    p = pack_fused(m, Q=1)
    assert p.fin_direct == 1
    _check(m, p)


def test_scatter_step_exact_bands():
    """The banded two-stage pack keeps each step's stage-1 tile count
    near its floor (rows-touched/128) with little max-vs-mean jitter —
    the property the step-exact row bands exist for."""
    m = random_csr(20_000, 90_000, density=5.6 / 90_000, seed=3)
    p = pack_fused(m, Q=1)
    assert p.fin_direct == 0 and p.Q == 1
    # floor: one stage-1 partial per row, <=128 partials per tile
    rows_per_step = m.nr_rows / p.n_steps
    assert p.F1_max <= 2.0 * (rows_per_step / 128 + 2)
    assert p.F1_max <= 1.4 * max(p.fin1_cnt.mean(), 1)
    _check(m, p)


def test_fused_save_load_roundtrip_q1():
    """Checkpoint round-trip of a banded Q=1 pack preserves every
    layout scalar (the round-2 serialize regression was exactly a
    dropped scalar silently rebuilding a slower finish) and the spmv
    result bitwise."""
    import os
    import tempfile

    from sparsetpu.pack.serialize import load_fused, save_fused

    m = random_csr(8_000, 60_000, density=5.6 / 60_000, seed=3)
    p = pack_fused(m)
    assert p.Q == 1 and p.fin_direct == 0
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "p.npz")
        save_fused(path, p)
        p2 = load_fused(path)
    for k in ("Q", "GLW", "T", "GX", "OBp", "F1_max", "F2_max", "F1S",
              "n_slabs", "fin_direct"):
        assert getattr(p, k) == getattr(p2, k), k
    x = np.random.default_rng(0).standard_normal(m.nr_cols)
    y1 = np.asarray(FusedDevice(p, interpret=True).spmv(x))
    y2 = np.asarray(FusedDevice(p2, interpret=True).spmv(x))
    assert np.array_equal(y1, y2)


def test_scatter_wide_columns_no_starvation():
    """Column ranges beyond one step's window positions (webbase-class)
    must NOT grind through near-empty step-exact bands: the gate sends
    them to the direct finish and the pack stays compact."""
    m = random_csr(12_000, 600_000, density=2.6 / 600_000, seed=5)
    p = pack_fused(m, Q=1)
    assert p is not None and p.fin_direct == 1
    # compactness: a starved banded pack measured ~990 slots/nnz
    assert p.n_slots <= 8 * m.nr_nzeros
    _check(m, p)


@pytest.mark.parametrize("q", [1, 2, 4])
@pytest.mark.parametrize("seed", [0, 1])
def test_fused_forced_q_fuzz(q, seed):
    """Forced small quanta over random scattered shapes: exercises the
    C++ row-keyed lane modes, band cursor and both finish shapes."""
    rng = np.random.default_rng(800 + seed)
    r = int(rng.integers(500, 6000))
    c = int(rng.integers(5000, 150000))
    per_row = float(rng.uniform(1.0, 9.0))
    m = random_csr(r, c, density=per_row / c, seed=seed,
                   empty_row_frac=float(rng.uniform(0, 0.3)))
    if m.nr_nzeros == 0:
        return
    p = pack_fused(m, Q=q)
    if p is None:
        return
    _check(m, p)


@pytest.mark.parametrize("seed", range(8))
def test_fused_fuzz_shapes(seed):
    """Randomized shapes/densities/empty-rows through the auto (fused or
    classic) path — the fused layout must never be silently wrong."""
    rng = np.random.default_rng(7000 + seed)
    r = int(rng.integers(2, 5000))
    c = int(rng.integers(16, 80000))
    density = float(10 ** rng.uniform(-4, -0.7))
    density = min(density, 6000 / max(r * c, 1) + density * 0.1)
    m = random_csr(r, c, density=density, seed=seed,
                   empty_row_frac=float(rng.uniform(0, 0.5)))
    if m.nr_nzeros == 0:
        return
    sm = SparseMatrix(m, SpmvConfig(dtype=np.float32), interpret=True)
    x = rng.standard_normal(c)
    y = np.asarray(sm.spmv(x))
    g = spmv_gold(m, x)
    scale = max(np.abs(g).max(), 1e-6)
    assert np.abs(y - g).max() / scale < 1e-4


def test_empty_trailing_slabs_get_zeroing_step():
    """ADVICE r3 (high): a slab whose row range holds no nnz must still
    get a grid step with step_first=1 — otherwise its out block is
    never zeroed and y slices read uninitialized HBM on hardware
    (interpret mode hides it by zero-filling)."""
    rng = np.random.default_rng(3)
    nr, nc = 35_000, 4000
    rows = np.repeat(np.arange(1000), 5)
    cols = rng.integers(0, nc, rows.size)
    vals = rng.standard_normal(rows.size)
    order = np.lexsort((cols, rows))
    from sparsetpu.formats.csr import CSRMatrix
    ptr = np.zeros(nr + 1, np.int64)
    np.add.at(ptr, rows + 1, 1)
    m = CSRMatrix(np.cumsum(ptr), cols[order], vals[order], nr, nc)
    p = pack_fused(m)
    assert p is not None and p.n_slabs >= 2
    # every slab must own at least one step, and that slab's first step
    # must carry the zeroing flag
    for s in range(p.n_slabs):
        steps = np.flatnonzero(p.step_slab == s)
        assert steps.size >= 1, f"slab {s} has no grid step"
        assert p.step_first[steps[0]] == 1
    _check(m, p)


def test_glw_validation():
    """ADVICE r3 (low): non-power-of-two or oversized GLW must raise,
    not silently overflow the int8 stripe meta / break _tree_merge."""
    m = random_csr(200, 2000, density=0.01, seed=0)
    for bad in (3, 24, 32, 0):
        with pytest.raises(ValueError):
            pack_fused(m, GLW=bad)


def test_pytree_reconstructed_unpack_raises():
    """ADVICE r3 (low): a jit-boundary-reconstructed fused handle lost
    its host CSR; unpack()/_classic_device must raise a clear error,
    not AttributeError."""
    import jax
    m = random_csr(300, 3000, density=0.01, seed=1)
    sm = SparseMatrix(m, SpmvConfig(dtype=np.float32), interpret=True)
    assert isinstance(sm._device, FusedDevice)
    leaves, treedef = jax.tree_util.tree_flatten(sm)
    sm2 = jax.tree_util.tree_unflatten(treedef, leaves)
    with pytest.raises(ValueError, match="source CSR"):
        sm2.unpack()


def test_band_exact_matches_gold():
    """Step-exact row bands for the dense (Q=8) regime: same kernel,
    tighter per-step finish (rows touched per step collapse to the
    band).  Must be bit-compatible with the layout contract."""
    m = random_csr(12_000, 10_000, density=0.002, seed=11)
    p = pack_fused(m, band_exact=True)
    assert p is not None and p.Q == 8
    _check(m, p)


def test_band_chooser_picks_cheaper_policy():
    """band_exact=None costs both band policies and keeps the cheaper
    one (kernel cost = n_steps * (T + F1 + F2) tiles)."""
    from sparsetpu.pack.fused import _layout_cost
    m = random_csr(12_000, 10_000, density=0.002, seed=11)
    auto = pack_fused(m)
    a = pack_fused(m, band_exact=False)
    b = pack_fused(m, band_exact=True)
    costs = [_layout_cost(c) for c in (a, b) if c is not None]
    assert auto is not None
    assert _layout_cost(auto) <= min(costs) + 1e-9


def test_band_exact_wide_columns_falls_back():
    """Wide-column few-row matrices starve band packing (every band
    pays ~GX/GLW near-empty window tiles); the auto chooser must fall
    back to the unbanded pack instead of failing."""
    m = random_csr(3000, 150_000, density=0.0008, seed=5)
    auto = pack_fused(m)
    assert auto is not None
    _check(m, auto)


def test_sgrp_grouped_steps_bitwise():
    """Folding S sub-steps into one grid step (SGRP) is a pure grid
    re-grouping: the same packed tiles produce the SAME y bitwise, the
    only difference being slab-end dummy padding steps (which add exact
    zeros)."""
    m = random_csr(20_000, 90_000, density=5.6 / 90_000, seed=3)
    ys = []
    for s in (1, 2, 4):
        p = pack_fused(m, Q=1, sgrp=s)
        assert p.SGRP == s
        assert p.n_steps % s == 0
        d = FusedDevice(p, interpret=True)
        x = np.random.default_rng(5).standard_normal(m.nr_cols)
        ys.append(np.asarray(d.spmv(x)))
    assert np.array_equal(ys[0], ys[1])
    assert np.array_equal(ys[0], ys[2])


def test_sgrp_chooser_scattered():
    """Small-T scattered packs are per-grid-step-overhead-bound: the
    SGRP chooser must fold sub-steps (measured on chip: scircuit-class
    12.8 -> 16.7 Gnnz/s at S=4)."""
    m = random_csr(20_000, 90_000, density=5.6 / 90_000, seed=3)
    p = pack_fused(m, Q=1)
    assert p.T <= 32
    assert p.SGRP >= 2
    _check(m, p)
