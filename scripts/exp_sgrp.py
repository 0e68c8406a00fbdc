"""On-chip SGRP sweep: forced S vs the full fused spmv time."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

from sparsetpu.bench.micro import timeit_chained
from sparsetpu.formats.random import random_csr
from sparsetpu.pack.fused import pack_fused
from sparsetpu.kernels.spmv_fused import FusedDevice

name = sys.argv[1] if len(sys.argv) > 1 else "headline"
svals = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2
                          else ["1", "2", "4"])]
if name == "headline":
    m = random_csr(200_000, 100_000, density=0.0005, seed=1)
    q = None
else:
    from sparsetpu.formats.suitesparse import fetch
    m, _ = fetch(name, allow_synthetic=True)
    m.values = m.values.astype(np.float32)
    q = None

for s in svals:
    p = pack_fused(m, Q=q, sgrp=s)
    if p is None:
        print(f"S={s}: pack None")
        continue
    dev = FusedDevice(p)
    x2 = dev.prepare_x(np.random.default_rng(0).standard_normal(m.nr_cols))
    t = timeit_chained(
        lambda xw: dev.spmv(xw, x_is_packed=True).reshape(1, -1),
        x2, 192, 8)
    print(f"S={s}: steps={p.n_steps} F1={p.F1_max} {t*1e6:8.1f} us  "
          f"{m.nr_nzeros/t/1e9:6.2f} Gnnz/s", flush=True)
