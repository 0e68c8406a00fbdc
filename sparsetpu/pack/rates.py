"""Device-keyed kernel rate tables for the pack-time layout model.

The pack chooses (G window groups, Q row-pad quantum) by predicted
time = slots / rate + finish, so it needs the dual-gather kernel's slot
throughput per (G, Q).  Rates are *measured* (scripts/exp_q.py runs the
production-shaped kernel at every combination on the real chip); the
table below is TPU v5e (measured 2026-08, tiles_per_step=128, fused
int16 meta stream).  Other device kinds fall back to the v5e shape
scaled by their HBM-bandwidth ratio (the kernel is bandwidth/VPU bound
and both scale roughly with the memory system across TPU generations);
``refresh_rates()`` replaces the guess with an on-device measurement,
cached per device kind in ``~/.cache/sparsetpu/rates_<kind>.json``.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Optional, Tuple

# HBM GB/s per chip by device kind (public specs) — used both for the
# roofline report (bench.harness) and for scaling the rate table to
# unmeasured device kinds.
HBM_GBPS = {
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,   # v5e
    "TPU v5": 2765.0,       # v5p
    "TPU v6 lite": 1640.0,  # v6e (Trillium)
    "TPU v6e": 1640.0,
    "TPU v7": 7400.0,       # Ironwood
}
_V5E_GBPS = 819.0

# Measured on TPU v5e: Gslot/s of the production dual-gather kernel,
# keyed (G, Q).  Q=8 -> 1 output plane, Q=4 -> 2, Q=2 -> 4, Q=1 -> 8.
# (scripts/exp_q.py; the G select chain costs ~linearly, extra output
# planes cost ~5-10% each.)
_V5E_RATES: Dict[Tuple[int, int], float] = {
    (1, 8): 119.6, (1, 4): 111.2, (1, 2): 100.1, (1, 1): 85.0,
    (2, 8): 115.0, (2, 4): 105.0, (2, 2): 90.4, (2, 1): 77.0,
    (4, 8): 109.9, (4, 4): 97.6, (4, 2): 84.6, (4, 1): 72.0,
    (8, 8): 95.5, (8, 4): 86.3, (8, 2): 74.8, (8, 1): 64.0,
    (16, 8): 88.0, (16, 4): 67.4, (16, 2): 57.5, (16, 1): 49.0,
    (32, 8): 46.5, (32, 4): 43.0, (32, 2): 39.9, (32, 1): 34.0,
}

# Residue matching gets harder as the quantum shrinks (fewer candidate
# slots per chunk): empirical slot inflation of real packs vs the
# padding-only model, measured on the 10M-nnz headline matrix at the
# per-Q first-fit windows of native.packer.DEFAULT_MAX_OPEN.
MATCH_INFLATION = {8: 1.03, 4: 1.12, 2: 1.10, 1: 1.25}

# Per reduction child (chunk partial sum) cost of the finish levels,
# in the same unit as slots/rate above (slots per Gslot/s = ns):
# measured V2 final on the 10M-nnz headline: 0.111 ms for 1.88M
# children (G=16 forward, 2 sub-windows per block) ~= 0.06 ns/child.
# More chunks = a more expensive finish, which is what rules out tiny
# quanta on dense rows.
FINISH_NS_PER_CHILD = 0.06


def _device_kind() -> str:
    try:
        import jax
        return jax.devices()[0].device_kind
    except Exception:
        return "cpu"


def _cache_path(kind: str) -> str:
    safe = re.sub(r"[^A-Za-z0-9_.-]", "_", kind)
    base = os.environ.get("SPARSETPU_CACHE",
                          os.path.expanduser("~/.cache/sparsetpu"))
    return os.path.join(base, f"rates_{safe}.json")


_loaded: Dict[str, Dict[Tuple[int, int], float]] = {}


def _rates_for(kind: str) -> Dict[Tuple[int, int], float]:
    if kind in _loaded:
        return _loaded[kind]
    table = None
    try:
        with open(_cache_path(kind)) as f:
            raw = json.load(f)
        table = {tuple(map(int, k.split(","))): float(v)
                 for k, v in raw.items()}
    except Exception:
        pass
    if table is None:
        if kind.startswith("TPU v5 lite") or kind == "cpu":
            scale = 1.0
        else:
            gbps = next((v for k, v in HBM_GBPS.items()
                         if kind.startswith(k)), _V5E_GBPS)
            scale = gbps / _V5E_GBPS
        table = {k: v * scale for k, v in _V5E_RATES.items()}
    _loaded[kind] = table
    return table


def slot_rate(G: int, Q: int, kind: Optional[str] = None) -> float:
    """Gslot/s of the dual-gather kernel at window groups G, quantum Q."""
    table = _rates_for(kind or _device_kind())
    if (G, Q) in table:
        return table[(G, Q)]
    # nearest measured G at same Q (G off-grid only via explicit G= pins)
    gs = sorted({g for g, q in table if q == Q})
    gn = min(gs, key=lambda g: abs(g - G)) if gs else 8
    return table.get((gn, Q), 80.0)


def refresh_rates(verbose: bool = False, combos=None,
                  interpret: bool = False,
                  n_tiles: int = 4096) -> Dict[Tuple[int, int], float]:
    """Measure the kernel rate at every (G, Q) on the current device and
    cache the table for this device kind.  Costs ~2-4 min of compiles on
    first run; subsequent sessions read the cache.  ``combos`` restricts
    the sweep; ``interpret`` runs the interpreter (functional test only
    — do not cache interpreter timings as real rates)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    from ..bench.micro import timeit_chained
    from ..kernels.spmv_pallas import _spmv_kernel
    from ..utils.config import LANES, SUBLANES

    kind = _device_kind()
    rng = np.random.default_rng(0)
    T = min(128, n_tiles)
    rows = n_tiles * SUBLANES
    val = jax.device_put(
        rng.standard_normal((rows, LANES)).astype(np.float32))
    route = rng.integers(0, LANES, size=(rows, LANES)).astype(np.int32)
    xw0 = jax.device_put(
        rng.standard_normal((SUBLANES * 32, LANES)).astype(np.float32))
    table = {}
    if combos is None:
        combos = [(g, q) for g in (1, 2, 4, 8, 16, 32)
                  for q in (1, 2, 4, 8)]
    metas = {}
    for G, Q in combos:
        if True:
            if G not in metas:
                cells = rng.integers(0, SUBLANES * G, size=(rows, LANES))
                metas[G] = jax.device_put(
                    ((cells << 7) | route).astype(np.int16))
            meta = metas[G]
            P = SUBLANES // Q

            def kern(xw, v, m, o, G=G, P=P):
                _spmv_kernel(None, xw, v, m, o, tiles_per_step=T, G=G,
                             P=P)
            f = pl.pallas_call(
                kern,
                grid_spec=pl.GridSpec(
                    grid=(n_tiles // T,),
                    in_specs=[
                        pl.BlockSpec((SUBLANES * 32, LANES),
                                     lambda i: (0, 0)),
                        pl.BlockSpec((T * SUBLANES, LANES),
                                     lambda i: (i, 0)),
                        pl.BlockSpec((T * SUBLANES, LANES),
                                     lambda i: (i, 0)),
                    ],
                    out_specs=pl.BlockSpec((T * P, LANES),
                                           lambda i: (i, 0))),
                out_shape=jax.ShapeDtypeStruct((n_tiles * P, LANES),
                                               jnp.float32),
                interpret=interpret)

            def call(xw, f=f, meta=meta):
                return f(xw, val, meta)

            t = timeit_chained(call, xw0, *((256, 16) if not interpret
                                            else (2, 1)))
            table[(G, Q)] = n_tiles * 1024 / t / 1e9
            if verbose:
                print(f"  G={G:2d} Q={Q}: {table[(G, Q)]:6.1f} Gslot/s",
                      flush=True)
    path = _cache_path(kind)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if not interpret:
        with open(path, "w") as f:
            json.dump({f"{g},{q}": v for (g, q), v in table.items()}, f)
        _loaded[kind] = table
    return table
