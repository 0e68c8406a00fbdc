"""Round-5 on-chip decomposition of the fused headline kernel.

Phases: forward-only, forward+stage1, full blocks, full spmv.  The gap
between the measured full kernel and the tile-cost model
(n_steps*(T + F1 + F2) at the forward rate) is the per-step overhead
being hunted.  Run on the real chip.
"""
import functools
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparsetpu.bench.micro import timeit_chained
from sparsetpu.formats.random import random_csr
from sparsetpu.pack.fused import pack_fused
from sparsetpu.kernels.spmv_fused import (FusedDevice, _tree_merge,
                                          _fused_spmv_blocks)
from sparsetpu.utils.config import LANES, SUBLANES as CHUNK

if len(sys.argv) > 1 and sys.argv[1] != "headline":
    from sparsetpu.formats.suitesparse import fetch
    m, _ = fetch(sys.argv[1], allow_synthetic=True)
    m.values = m.values.astype(np.float32)
else:
    m = random_csr(200_000, 100_000, density=0.0005, seed=1)
p = pack_fused(m)
dev = FusedDevice(p)
x2 = dev.prepare_x(np.random.default_rng(0).standard_normal(m.nr_cols))
T, GLW, P = p.T, p.GLW, p.planes
F1, F2, F1S, OBp = p.F1_max, p.F2_max, p.F1S, p.OBp
n_steps, n_slabs = p.n_steps, p.n_slabs
print(f"steps={n_steps} T={T} F1={F1} F2={F2} F1S={F1S} OBp={OBp} "
      f"fill={p.fill_factor:.3f} slabs={n_slabs}", flush=True)


def report(name, t, tiles):
    cyc = t * 0.94e9 / max(tiles, 1)
    print(f"  {name:14s} {t*1e6:8.1f} us  ({cyc:5.2f} cyc/tile over "
          f"{tiles} tiles)  {m.nr_nzeros/t/1e9:5.1f} Gnnz/s-equiv",
          flush=True)


def fwd_kernel(tb_ref, xw_ref, val_ref, i1r_ref, rt_ref, o_ref, *,
               T, GLW):
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
        g1 = _tree_merge(parts, grp)
        g2 = jnp.take_along_axis(g1, j, axis=1)
        o_ref[t, :] = jnp.sum(val_ref[sl, :] * g2, axis=0)


gs = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(n_steps,),
    in_specs=[
        pl.BlockSpec((x2.shape[0], LANES), lambda i, tb: (0, 0)),
        pl.BlockSpec((T * CHUNK, LANES), lambda i, tb: (i, 0)),
        pl.BlockSpec((T * CHUNK, LANES), lambda i, tb: (i, 0)),
        pl.BlockSpec((T * CHUNK, LANES), lambda i, tb: (i, 0)),
    ],
    out_specs=pl.BlockSpec((T, LANES), lambda i, tb: (i, 0)))
fA = pl.pallas_call(
    functools.partial(fwd_kernel, T=T, GLW=GLW), grid_spec=gs,
    out_shape=jax.ShapeDtypeStruct((n_steps * T, LANES), jnp.float32))
report("fwd-only", timeit_chained(
    lambda xw: fA(dev.tile_base, xw, dev.values, dev.meta_i1,
                  dev.meta_rt), x2, 192, 8), n_steps * T)


def call_full(xw):
    return _fused_spmv_blocks(
        dev.tile_base, dev.fin1_cnt, dev.fin2_cnt, dev.fin2_group,
        dev.step_slab, dev.step_first, xw, dev.values, dev.meta_i1,
        dev.meta_rt, dev.fin1_i1, dev.fin1_rt, dev.fin2_i1, dev.fin2_rt,
        T=T, GLW=GLW, P=P, F1_max=F1, F2_max=F2, F1S=F1S, OBp=OBp,
        n_steps=n_steps, n_slabs=n_slabs, fin_direct=p.fin_direct)


report("full-blocks", timeit_chained(call_full, x2, 192, 8),
       n_steps * (T + F1 + F2))


def call_spmv(xw):
    return dev.spmv(xw, x_is_packed=True).reshape(1, -1)


report("full+asm", timeit_chained(call_spmv, x2, 192, 8),
       n_steps * (T + F1 + F2))
