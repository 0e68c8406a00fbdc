"""Distributed SpMV on a simulated 8-device CPU mesh (the reference's
emulation-style testing, SURVEY.md section 4, lifted to multi-chip)."""

import jax
import numpy as np
import pytest

from sparsetpu.dist.spmv_dist import make_mesh, shard_spmv
from sparsetpu.formats import laplace_2d, random_csr, spmv_gold, verification


requires_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 simulated devices")


@requires_devices
@pytest.mark.parametrize("interpret", ["xla", True])
@pytest.mark.parametrize("shape,density", [
    ((512, 1024), 0.02),
    ((1000, 3000), 0.01),
])
def test_sharded_spmv_matches_gold(shape, density, interpret):
    m = random_csr(*shape, density=density, seed=20)
    mesh = make_mesh(8)
    sh = shard_spmv(m, mesh, interpret=interpret)
    x = np.random.default_rng(5).standard_normal(m.nr_cols)
    y = np.asarray(sh.spmv(x))
    assert verification(spmv_gold(m, x), y, diff_thres=1e-3,
                        rel_thres=1e-3) == 0
    if interpret is True:
        # the per-shard Pallas finish must be active (not the XLA
        # segment-sum fallback)
        assert sh.fin_static is not None


@requires_devices
def test_sharded_spmv_empty_partitions():
    # matrix so small that some partitions get (almost) no rows
    m = random_csr(16, 200, density=0.2, seed=21)
    mesh = make_mesh(8)
    sh = shard_spmv(m, mesh, interpret="xla")
    x = np.random.default_rng(6).standard_normal(m.nr_cols)
    y = np.asarray(sh.spmv(x))
    assert verification(spmv_gold(m, x), y, diff_thres=1e-3,
                        rel_thres=1e-3) == 0


@requires_devices
def test_dryrun_multichip():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_entry_compiles():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    y = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(y)).all()


@requires_devices
@pytest.mark.parametrize("interpret", ["xla", True])
def test_ring_overlapped_spmv(interpret):
    """Ring schedule: x segments rotate via ppermute while each shard
    multiplies its matching column block (BASELINE's overlap north star)."""
    from sparsetpu.dist.ring import ring_shard_spmv
    m = random_csr(1200, 4000, density=0.01, seed=22, dtype=np.float32)
    mesh = make_mesh(8)
    sh = ring_shard_spmv(m, mesh, interpret=interpret)
    x = np.random.default_rng(9).standard_normal(m.nr_cols)
    y = np.asarray(sh.spmv(x))
    assert verification(spmv_gold(m, x), y, diff_thres=1e-3,
                        rel_thres=1e-3) == 0


@requires_devices
def test_ring_matches_allgather_schedule():
    from sparsetpu.dist.ring import ring_shard_spmv
    m = random_csr(600, 2000, density=0.02, seed=23, dtype=np.float32)
    mesh = make_mesh(8)
    x = np.random.default_rng(3).standard_normal(m.nr_cols)
    y1 = np.asarray(shard_spmv(m, mesh, interpret="xla").spmv(x))
    y2 = np.asarray(ring_shard_spmv(m, mesh, interpret="xla").spmv(x))
    np.testing.assert_allclose(y1, y2, rtol=1e-5, atol=1e-5)
