"""GLW ladder for the fused forward kernel + tile span distributions.

Sizes the two-class (narrow/wide window) forward idea: if most packed
tiles span <= 8 groups, running them through a GLW=8 body saves half the
select-tree ops on most slots.
"""
import sys, functools
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparsetpu.bench.micro import timeit_chained
from sparsetpu.formats.random import random_csr
from sparsetpu.kernels.spmv_fused import _tree_merge
from sparsetpu.utils.config import LANES
CHUNK = 8

T = 128
N_STEPS = 96
GX = 104            # ~100k cols


def fwd_kernel(tb_ref, xw_ref, val_ref, i1r_ref, rt_ref, o_ref, *, T, GLW):
    i = pl.program_id(0)
    for t in range(T):
        sl = slice(t * CHUNK, (t + 1) * CHUNK)
        b = tb_ref[i, t]
        i1 = i1r_ref[sl, :].astype(jnp.int32)
        j = rt_ref[sl, :].astype(jnp.int32)
        sub = jnp.bitwise_and(i1, CHUNK - 1)
        grp = jnp.right_shift(i1, 3)
        xwin = xw_ref[pl.ds(b * CHUNK, CHUNK * GLW), :]
        parts = [jnp.take_along_axis(
            xwin[g * CHUNK:(g + 1) * CHUNK, :], sub, axis=0)
            for g in range(GLW)]
        g1 = parts[0] if GLW == 1 else _tree_merge(parts, grp)
        g2 = jnp.take_along_axis(g1, j, axis=1)
        o_ref[t, :] = jnp.sum(val_ref[sl, :] * g2, axis=0)


def run(GLW):
    rng = np.random.default_rng(GLW)
    x2 = jnp.asarray(rng.standard_normal((GX * CHUNK, LANES)),
                     dtype=jnp.float32)
    vals = jnp.asarray(rng.standard_normal((N_STEPS * T * CHUNK, LANES)),
                       dtype=jnp.float32)
    i1 = jnp.asarray(rng.integers(0, 8 * GLW,
                                  (N_STEPS * T * CHUNK, LANES)),
                     dtype=jnp.int8)
    rt = jnp.asarray(rng.integers(0, LANES, (N_STEPS * T * CHUNK, LANES)),
                     dtype=jnp.int8)
    tb = jnp.asarray(rng.integers(0, GX - GLW, (N_STEPS, T)),
                     dtype=jnp.int32)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(N_STEPS,),
        in_specs=[
            pl.BlockSpec((GX * CHUNK, LANES), lambda i, tbp: (0, 0)),
            pl.BlockSpec((T * CHUNK, LANES), lambda i, tbp: (i, 0)),
            pl.BlockSpec((T * CHUNK, LANES), lambda i, tbp: (i, 0)),
            pl.BlockSpec((T * CHUNK, LANES), lambda i, tbp: (i, 0)),
        ],
        out_specs=pl.BlockSpec((T, LANES), lambda i, tbp: (i, 0)))
    f = pl.pallas_call(
        functools.partial(fwd_kernel, T=T, GLW=GLW), grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((N_STEPS * T, LANES), jnp.float32))
    t = timeit_chained(lambda xw: f(tb, xw, vals, i1, rt), x2, 192, 8)
    slots = N_STEPS * T * CHUNK * LANES
    print(f"GLW={GLW:3d}: {t*1e6:8.1f} us  {slots/t/1e9:6.1f} Gslot/s",
          flush=True)


def spans():
    """Tile span distribution of real packs (headline + suite shapes)."""
    from sparsetpu.pack.fused import pack_fused
    cases = [("headline", random_csr(200_000, 100_000, density=0.0005,
                                     seed=1))]
    try:
        from sparsetpu.formats.suitesparse import fetch
        for n in ("pdb1HYS", "cant", "shipsec1", "scircuit"):
            m, _ = fetch(n, allow_synthetic=True)
            m.values = m.values.astype(np.float32)
            cases.append((n, m))
    except Exception as e:
        print("suite fetch failed:", e)
    for name, m in cases:
        p = pack_fused(m)
        if p is None:
            print(f"{name:10s}: pack_fused -> None")
            continue
        # reconstruct spans: per tile, max used relative stripe // 8
        i1 = p.meta_i1.reshape(-1, CHUNK, LANES).astype(np.int32)
        v = p.values.reshape(-1, CHUNK, LANES)
        used = v != 0
        rel = np.where(used, i1, 0)
        span = (rel.max(axis=(1, 2)) >> 3) + 1
        hist = [(span <= k).mean() for k in (2, 4, 8, 12, 16)]
        print(f"{name:10s}: tiles={span.shape[0]:6d} fill={p.fill_factor:.3f} "
              f"span<=2/4/8/12/16: "
              + " ".join(f"{h:.2f}" for h in hist), flush=True)


if __name__ == "__main__":
    if "spans" in sys.argv:
        spans()
    else:
        for GLW in (1, 2, 4, 8, 12, 16):
            run(GLW)
