"""Where do the ~9.7 cycles per forward tile go?  Component ladder.

Variants drop one piece at a time (results are garbage for the dropped
piece — rate only).  Run on chip: python scripts/exp_tile_ladder.py
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK, LANES = 8, 128
T = 128


def _tree_merge(parts, grp):
    level = 0
    while len(parts) > 1:
        bit = jnp.bitwise_and(grp, 1 << level) != 0
        parts = [jnp.where(bit, parts[i + 1], parts[i])
                 for i in range(0, len(parts), 2)]
        level += 1
    return parts[0]


def make_kernel(glw, route, tree, gathers, sum_mode):
    def kern(tb_ref, xw_ref, val_ref, i1_ref, rt_ref, out_ref,
             scratch_ref):
        i = pl.program_id(0)
        for t in range(T):
            sl = slice(t * CHUNK, (t + 1) * CHUNK)
            b = tb_ref[i, t]
            i1 = i1_ref[sl, :].astype(jnp.int32)
            sub = jnp.bitwise_and(i1, CHUNK - 1)
            grp = jnp.right_shift(i1, 3)
            xwin = xw_ref[pl.ds(b * CHUNK, CHUNK * glw), :]
            if gathers:
                parts = [jnp.take_along_axis(
                    xwin[g * CHUNK:(g + 1) * CHUNK, :], sub, axis=0)
                    for g in range(glw)]
            else:
                parts = [xwin[g * CHUNK:(g + 1) * CHUNK, :]
                         for g in range(glw)]
            g1 = _tree_merge(parts, grp) if tree else parts[0]
            if route:
                j = rt_ref[sl, :].astype(jnp.int32)
                g1 = jnp.take_along_axis(g1, j, axis=1)
            prod = val_ref[sl, :] * g1
            if sum_mode:
                scratch_ref[t, :] = jnp.sum(prod, axis=0)
            else:
                scratch_ref[t, :] = prod[0]
        out_ref[...] = scratch_ref[...]
    return kern


def build(kernel, n_steps, gx8):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((gx8, LANES), lambda i, *p: (0, 0)),
            pl.BlockSpec((T * CHUNK, LANES), lambda i, *p: (i, 0)),
            pl.BlockSpec((T * CHUNK, LANES), lambda i, *p: (i, 0)),
            pl.BlockSpec((T * CHUNK, LANES), lambda i, *p: (i, 0)),
        ],
        out_specs=pl.BlockSpec((T, LANES), lambda i, tb: (i, 0)),
        scratch_shapes=[pltpu.VMEM((T, LANES), jnp.float32)],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_steps * T, LANES), jnp.float32))


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    gx8 = 800
    rng = np.random.default_rng(0)
    xw = jnp.asarray(rng.standard_normal((gx8, LANES)), jnp.float32)
    vals = jnp.asarray(
        rng.standard_normal((n_steps * T * CHUNK, LANES)), jnp.float32)
    i1 = jnp.asarray(rng.integers(0, 128, (n_steps * T * CHUNK, LANES)),
                     jnp.int8)
    rt = jnp.asarray(rng.integers(0, 128, (n_steps * T * CHUNK, LANES)),
                     jnp.int8)
    tb = jnp.asarray(rng.integers(0, gx8 // CHUNK - 16, (n_steps, T)),
                     jnp.int32)

    from sparsetpu.bench.micro import timeit_chained

    cases = [
        ("full glw16", dict(glw=16, route=True, tree=True, gathers=True,
                            sum_mode=True)),
        ("full glw8", dict(glw=8, route=True, tree=True, gathers=True,
                           sum_mode=True)),
        ("full glw4", dict(glw=4, route=True, tree=True, gathers=True,
                           sum_mode=True)),
        ("no-route", dict(glw=16, route=False, tree=True, gathers=True,
                          sum_mode=True)),
        ("no-tree", dict(glw=16, route=True, tree=False, gathers=True,
                         sum_mode=True)),
        ("no-gathers", dict(glw=16, route=True, tree=True, gathers=False,
                            sum_mode=True)),
        ("no-sum", dict(glw=16, route=True, tree=True, gathers=True,
                        sum_mode=False)),
        ("bare glw1", dict(glw=1, route=False, tree=False, gathers=True,
                           sum_mode=True)),
    ]
    sel = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    for name, kw in cases:
        if sel and not any(s in name for s in sel):
            continue
        f = build(make_kernel(**kw), n_steps, gx8)

        def run(x):
            return f(tb, x, vals, i1, rt)

        t = timeit_chained(run, xw, 192, 8)
        cyc = t * 0.94e9 / (n_steps * T)
        print(f"{name:12s} {t*1e6:8.1f} us  {cyc:5.2f} cyc/tile")


if __name__ == "__main__":
    main()
