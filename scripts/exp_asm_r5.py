"""Where do the ~10 us of y reassembly go?  (blocks -> 1-D y slice)"""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from sparsetpu.bench.micro import timeit_chained
from sparsetpu.formats.random import random_csr
from sparsetpu.pack.fused import pack_fused
from sparsetpu.kernels.spmv_fused import FusedDevice, _fused_spmv_blocks

m = random_csr(200_000, 100_000, density=0.0005, seed=1)
p = pack_fused(m)
dev = FusedDevice(p)
x2 = dev.prepare_x(np.random.default_rng(0).standard_normal(m.nr_cols))
n = int(p.slab_bounds[-1])
print(f"uniform={dev._uniform_slabs} n={n} blocks_rows={p.n_slabs*p.OBp}",
      flush=True)


def blocks(xw):
    pm = dev.meta
    return _fused_spmv_blocks(
        dev.tile_base, dev.fin1_cnt, dev.fin2_cnt, dev.fin2_group,
        dev.step_slab, dev.step_first, xw, dev.values, dev.meta_i1,
        dev.meta_rt, dev.fin1_i1, dev.fin1_rt, dev.fin2_i1, dev.fin2_rt,
        T=pm.T, GLW=pm.GLW, P=pm.planes, F1_max=pm.F1_max,
        F2_max=pm.F2_max, F1S=pm.F1S, OBp=pm.OBp,
        n_steps=pm.n_steps, n_slabs=pm.n_slabs, fin_direct=pm.fin_direct)


def report(name, call):
    t = timeit_chained(call, x2, 192, 8)
    print(f"  {name:22s} {t*1e6:8.1f} us", flush=True)


sel = sys.argv[1].split(",") if len(sys.argv) > 1 else None


def want(name):
    return sel is None or any(k in name for k in sel)


if want("blocks-only"):
    report("blocks-only", blocks)
if want("blocks+flat "):
    report("blocks+flat", lambda xw: blocks(xw).reshape(1, -1))
if want("flat+slice"):
    report("blocks+flat+slice", lambda xw: blocks(xw).reshape(-1)[:n]
       .reshape(1, -1))
if want("2dslice"):
    report("blocks+2dslice+flat", lambda xw: blocks(xw)[:n // 128]
       .reshape(1, -1))
if want("dev.spmv"):
    report("dev.spmv", lambda xw: dev.spmv(xw, x_is_packed=True)
       .reshape(1, -1))


def fwd_with(tb_arr, tag):
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from sparsetpu.kernels.spmv_fused import _tree_merge
    CHUNK, LANES = 8, 128
    pm = dev.meta
    T, GLW, n_steps = pm.T, pm.GLW, pm.n_steps

    def fwd_kernel(tb_ref, xw_ref, val_ref, i1r_ref, rt_ref, o_ref):
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
    f = pl.pallas_call(
        fwd_kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((n_steps * T, LANES), jnp.float32))
    t = timeit_chained(
        lambda xw: f(tb_arr, xw, dev.values, dev.meta_i1, dev.meta_rt),
        x2, 192, 8)
    cyc = t * 0.94e9 / (n_steps * T)
    print(f"  fwd[{tag:10s}] {t*1e6:8.1f} us  {cyc:5.2f} cyc/tile",
          flush=True)


if want("fwdtb"):
    rng = np.random.default_rng(0)
    pm = dev.meta
    tb_rand = jnp.asarray(rng.integers(
        0, max(pm.GX - pm.GLW, 1), (pm.n_steps, pm.T)), jnp.int32)
    fwd_with(dev.tile_base, "real")
    fwd_with(tb_rand, "random")
    i1_rand = jnp.asarray(rng.integers(
        0, 128, dev.meta_i1.shape), jnp.int8)
    rt_rand = jnp.asarray(rng.integers(
        0, 128, dev.meta_rt.shape), jnp.int8)
    dev.meta_i1, dev.meta_rt = i1_rand, rt_rand
    fwd_with(dev.tile_base, "randmeta")


if want("fwdshuf"):
    rng = np.random.default_rng(1)
    tb_np = np.asarray(dev.tile_base)
    tb_shuf = np.stack([rng.permutation(r) for r in tb_np])
    fwd_with(jnp.asarray(tb_shuf), "shuffled")
    # interleave: even/odd split reordered so neighbors come from the
    # two halves of the step's base range
    T = tb_np.shape[1]
    order = np.empty(T, np.int64)
    order[0::2] = np.arange(T // 2)
    order[1::2] = np.arange(T // 2, T)
    fwd_with(jnp.asarray(tb_np[:, order]), "interleave")


if want("fwdstride"):
    tb_np = np.asarray(dev.tile_base)
    T = tb_np.shape[1]
    s = 37 if np.gcd(37, T) == 1 else 41
    order = (np.arange(T) * s) % T
    fwd_with(jnp.asarray(tb_np[:, order]), "stride37")
