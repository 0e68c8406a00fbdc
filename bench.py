"""Driver benchmark: prints ONE JSON line with the headline metric.

Headline: SpMV throughput in Gnnz/s on a SuiteSparse-like random matrix
(~10M nnz), single chip, f32, per-call device timing.  vs_baseline is the
speedup over the reference hardware's theoretical ceiling: the ZCU102's
HP-port bandwidth bound (~10 GB/s over 10 B/nnz for the f32 packed stream,
util.h:61, README.md:61) => 1.0 Gnnz/s.  The reference publishes no
measured numbers (BASELINE.md), so its bandwidth roofline is the fairest
stand-in.
"""

import json
import sys
import time

import numpy as np

REFERENCE_CEILING_GNNZ_S = 1.0  # ZCU102 HP ports ~10 GB/s / ~10 B per nnz


def main():
    import jax
    from sparsetpu.formats.random import random_csr
    from sparsetpu.api.api import SparseMatrix

    on_tpu = jax.default_backend() == "tpu"
    m = random_csr(200_000, 100_000, density=0.0005, seed=1,
                   dtype=np.float32)
    sm = SparseMatrix(m, backend="pallas", interpret=not on_tpu)
    x = np.random.default_rng(0).standard_normal(m.nr_cols)
    xp = sm.prepare_x(x)

    # chained in-jit timing (per-dispatch timing lies through the tunnel)
    import jax.numpy as jnp

    n_iter = 10

    @jax.jit
    def loop(xp):
        def body(i, carry):
            xp_i, acc = carry
            y = sm.spmv_packed_x(xp_i)
            return (xp_i + y[0] * 1e-30, acc + y[0])
        return jax.lax.fori_loop(0, n_iter, body,
                                 (xp, jnp.float32(0)))[1]

    jax.block_until_ready(loop(xp))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(xp))
        ts.append(time.perf_counter() - t0)
    per_call = min(ts) / n_iter
    gnnz = m.nr_nzeros / per_call / 1e9

    # correctness gate: a fast wrong kernel scores zero
    from sparsetpu.formats.gold import spmv_gold, verification
    y = np.asarray(sm.spmv(x))
    errors = verification(spmv_gold(m, x), y, diff_thres=1e-2,
                          rel_thres=1e-3)
    if errors:
        gnnz = 0.0

    print(json.dumps({
        "metric": "spmv_throughput",
        "value": round(gnnz, 3),
        "unit": "Gnnz/s",
        "vs_baseline": round(gnnz / REFERENCE_CEILING_GNNZ_S, 2),
    }))


if __name__ == "__main__":
    main()
