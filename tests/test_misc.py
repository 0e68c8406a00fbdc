"""Coverage for autotune, debug dumps and the scaling-report plumbing."""

import numpy as np

from sparsetpu.formats import random_csr, spmv_gold, verification


def test_autotune_pack_single_candidate():
    from sparsetpu.api import autotune_pack
    m = random_csr(500, 2000, density=0.02, seed=3, dtype=np.float32)
    sm = autotune_pack(m, candidates=[4], interpret=True)
    x = np.random.default_rng(1).standard_normal(m.nr_cols)
    assert verification(spmv_gold(m, x), np.asarray(sm.spmv(x)),
                        1e-3, 1e-3) == 0


def test_dump_tiles_and_stats(capsys):
    from sparsetpu.pack.gather_stream import pack_gstream
    from sparsetpu.utils.debug import dump_tiles, format_stats
    m = random_csr(40, 60, density=0.2, seed=4, dtype=np.float32)
    p = pack_gstream(m)
    text = dump_tiles(p, 0, 1, lanes=4)
    assert "tile 0" in text and "slot 0" in text
    s = format_stats(p)
    assert "fill=" in s and "overhead=" in s


def test_scaling_report_single_device():
    import jax
    from sparsetpu.bench.scaling import scaling_report
    rep = scaling_report(rows_per_dev=2000, nnz_per_row=8,
                         max_devices=1, verbose=False)
    row = rep["weak_scaling"][0]
    assert row["verify_errors"] == 0
    assert row["weak_scaling_eff"] == 1.0


def test_refresh_rates_interpret(tmp_path, monkeypatch):
    """refresh_rates runs end-to-end in interpreter mode (functional
    check; real-rate caching is chip-only)."""
    monkeypatch.setenv("SPARSETPU_CACHE", str(tmp_path))
    from sparsetpu.pack.rates import refresh_rates, slot_rate
    t = refresh_rates(combos=[(2, 8)], interpret=True, n_tiles=16)
    assert (2, 8) in t and t[(2, 8)] > 0
    assert slot_rate(1, 8) > 0 and slot_rate(7, 4) > 0
