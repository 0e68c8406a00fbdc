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


def autotune_pack(matrix, candidates: Optional[Sequence] = None,
                  interpret: Optional[bool] = None, verbose: bool = False):
    """Pack ``matrix`` at several (G window, Q quantum) layouts, measure
    the SpMV on device, return the fastest SparseMatrix.

    candidates defaults to the model choice plus neighboring G (half /
    double) and Q (half / double) layouts."""
    import jax
    import jax.numpy as jnp
    from ..pack.gather_stream import (MAX_G, VALID_Q, _choose_layout,
                                      pack_gstream)
    from ..kernels.spmv_pallas import GStreamDevice
    from .api import SparseMatrix

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    g0, q0 = _choose_layout(matrix)
    if candidates is None:
        gs = sorted({max(1, g0 // 2), g0, min(MAX_G, g0 * 2)})
        qs = sorted({max(1, q0 // 2), q0, min(8, q0 * 2)} & set(VALID_Q))
        candidates = sorted({(g, q0) for g in gs} | {(g0, q) for q in qs}
                            # diagonal neighbors: half the window with
                            # double the quantum and vice versa (the
                            # finish-vs-fill tradeoff the static model
                            # gets wrong on small scattered matrices)
                            | {(max(1, g0 // 2), min(8, q0 * 2)),
                               (min(MAX_G, g0 * 2), min(8, q0 * 2))})
    else:
        # bare ints are window sizes (the pre-Q calling convention)
        candidates = [(c, q0) if isinstance(c, (int, np.integer))
                      else tuple(c) for c in candidates]

    x = np.random.default_rng(0).standard_normal(matrix.nr_cols)
    best = None
    for g, q in candidates:
        packed = pack_gstream(matrix, G=int(g), Q=int(q))
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
            print(f"autotune G={g} Q={q}: {per_call*1e3:.3f} ms "
                  f"(fill {packed.fill_factor:.3f})")
        if best is None or per_call < best[0]:
            best = (per_call, packed, dev)

    _, packed, dev = best
    sm = SparseMatrix.__new__(SparseMatrix)
    from ..utils.config import SpmvConfig
    sm.config = SpmvConfig(dtype=np.dtype(np.float32))
    sm.nr_rows, sm.nr_cols = matrix.nr_rows, matrix.nr_cols
    sm.nr_nzeros = matrix.nr_nzeros
    sm.dtype = np.dtype(np.float32)
    sm._backend = "pallas"
    sm._packed = packed
    sm._device = dev
    sm._parts = None
    sm._part_bounds = None
    sm._source = matrix
    return sm
