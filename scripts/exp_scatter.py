"""Scattered-regime measurement harness (compact Q=1 path).

Two modes:

  python scripts/exp_scatter.py model   # CPU: pack slot models only
  python scripts/exp_scatter.py chip    # TPU: end-to-end Gnnz/s

The stand-ins mirror BENCH_SUITE rows (scircuit / mac_econ / webbase
profiles).  ``model`` prints the slot decomposition that predicts chip
throughput at the measured ~90-97 Gslot/s fused rates; ``chip`` times
the real kernel with the chained differential loop (single-output
chains overreport ~15% — PERF_NOTES).  Run ``chip`` as soon as a TPU
session is available: the round-3 scattered rewrite landed during a
tunnel outage and BENCH_SUITE_r03's scattered rows predate it.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from sparsetpu.formats.random import random_csr          # noqa: E402
from sparsetpu.formats.gold import spmv_gold             # noqa: E402
from sparsetpu.pack.fused import pack_fused              # noqa: E402

CASES = [
    # (name, rows, cols, nnz_per_row, seed)
    ("scircuit-class", 170_000, 170_000, 5.6, 3),
    ("maceco-class", 206_000, 206_000, 6.2, 4),
    ("webbase-class", 1_000_000, 1_000_000, 2.6, 5),
    ("mult1-class", 120_000, 120_000, 1.05, 9),
]


def build(name, r, c, per_row, seed, scale=1.0):
    r, c = int(r * scale), int(c * scale)
    return name, random_csr(r, c, density=per_row / c, seed=seed)


def model(scale):
    for case in CASES:
        name, m = build(*case, scale=scale)
        t0 = time.time()
        p = pack_fused(m)
        dt = time.time() - t0
        if p is None:
            print(f"{name:16s}: pack -> None (classic fallback)")
            continue
        slots = p.n_slots
        f1 = p.fin1_i1.shape[0] * 128
        f2 = p.fin2_i1.shape[0] * 128
        tot = (slots + f1 + f2) / m.nr_nzeros
        print(f"{name:16s}: Q={p.Q} direct={p.fin_direct} "
              f"fill={p.fill_factor:.3f} steps={p.n_steps} "
              f"fwd={slots/m.nr_nzeros:.2f} f1={f1/m.nr_nzeros:.2f} "
              f"f2={f2/m.nr_nzeros:.2f} TOT={tot:.2f} "
              f"est={90/tot:.1f}-{97/tot:.1f} Gnnz/s pack={dt:.1f}s",
              flush=True)


def chip(scale):
    import jax

    from sparsetpu.bench.micro import timeit_chained
    from sparsetpu.kernels.spmv_fused import FusedDevice

    print("device:", jax.devices()[0])
    for case in CASES:
        name, m = build(*case, scale=scale)
        p = pack_fused(m)
        if p is None:
            print(f"{name:16s}: pack -> None")
            continue
        dev = FusedDevice(p)
        x = np.random.default_rng(0).standard_normal(
            m.nr_cols).astype(np.float32)
        x2 = dev.prepare_x(x)
        y = np.asarray(dev.spmv(x2, x_is_packed=True))
        g = spmv_gold(m, x)
        err = np.abs(y - g).max() / max(np.abs(g).max(), 1e-9)
        t = timeit_chained(
            lambda xi: dev.spmv(xi, x_is_packed=True), x2, 96, 8)
        print(f"{name:16s}: {m.nr_nzeros/t/1e9:6.2f} Gnnz/s  "
              f"({t*1e6:.0f} us, fill {p.fill_factor:.3f}, Q={p.Q}, "
              f"err {err:.1e} {'PASS' if err < 1e-4 else 'FAIL'})",
              flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "model"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    (chip if mode == "chip" else model)(scale)
