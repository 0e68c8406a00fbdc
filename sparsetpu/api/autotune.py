"""On-device autotuning of the pack configuration.

The pack already picks the column-window size G from a measured cost
model (`pack/gather_stream._choose_G`); this module goes one step
further and *measures* candidate packs on the actual device, returning
the fastest — the production pattern for matrices that will be
multiplied thousands of times (each candidate costs one pack + one
kernel compile, amortized away by reuse).
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import numpy as np


def autotune_pack(matrix, candidates: Optional[Sequence[int]] = None,
                  interpret: Optional[bool] = None, verbose: bool = False):
    """Pack ``matrix`` at several window sizes G, measure the SpMV on
    device, return the fastest SparseMatrix.

    candidates defaults to {model choice, half, double} clipped to the
    valid range."""
    import jax
    import jax.numpy as jnp
    from ..pack.gather_stream import MAX_G, _choose_G, pack_gstream
    from ..kernels.spmv_pallas import GStreamDevice
    from .api import SparseMatrix

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    g0 = _choose_G(matrix)
    if candidates is None:
        candidates = sorted({max(1, g0 // 2), g0, min(MAX_G, g0 * 2)})

    x = np.random.default_rng(0).standard_normal(matrix.nr_cols)
    best = None
    for g in candidates:
        packed = pack_gstream(matrix, G=int(g))
        dev = GStreamDevice(packed, interpret=interpret)
        x2 = dev.prepare_x(x)

        def call(d, xi):
            return d.spmv(xi, x_is_packed=True)

        f = jax.jit(call)
        jax.block_until_ready(np.asarray(f(dev, x2)))   # compile + warm
        # chained differential timing (device tunnel; see bench/micro)
        n_hi, n_lo = (128, 8) if not interpret else (3, 1)

        def loop(k):
            @jax.jit
            def run(d, xi):
                def body(i, carry):
                    xc, acc = carry
                    y = call(d, xc)
                    return (xc + y[0] * 1e-30, acc + y[0])
                return jax.lax.fori_loop(
                    0, k, body, (xi, jnp.float32(0)))[1]
            return run

        ln, lb = loop(n_hi), loop(n_lo)
        float(ln(dev, x2)), float(lb(dev, x2))
        t0 = time.perf_counter()
        float(lb(dev, x2))
        tb = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(ln(dev, x2))
        tn = time.perf_counter() - t0
        per_call = max((tn - tb) / (n_hi - n_lo), 1e-9)
        if verbose:
            print(f"autotune G={g}: {per_call*1e3:.3f} ms "
                  f"(fill {packed.fill_factor:.3f})")
        if best is None or per_call < best[0]:
            best = (per_call, g, packed, dev)

    _, g, packed, dev = best
    sm = SparseMatrix.__new__(SparseMatrix)
    from ..utils.config import SpmvConfig
    sm.config = SpmvConfig(dtype=np.dtype(np.float32))
    sm.nr_rows, sm.nr_cols = matrix.nr_rows, matrix.nr_cols
    sm.nr_nzeros = matrix.nr_nzeros
    sm.dtype = np.dtype(np.float32)
    sm._backend = "pallas"
    sm._packed = packed
    sm._device = dev
    return sm
