"""Experiment: selects-first forward tile (round 5).

The fused forward tile resolves a 7-bit window-row index with 16
sublane gathers (8-row Mosaic reach) merged by a 15-select tree, then
one lane-route gather.  Hypothesis: merging STATIC window views with
the same select tree first (zero gathers) and gathering ONCE by stripe
afterwards computes the same thing ~30% cheaper — at the price of a
pack-time constraint (the group metadata must live at stripe-indexed
cells, so a tile may not hold two elements equal mod 1024 with
different groups).

This micro measures ONLY the kernel-rate question with synthetic
metadata (both variants compute garbage of identical shape/op mix):
is variant B materially faster per tile?  Run on the real chip.

Usage: python scripts/exp_selfirst.py [n_steps]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK, LANES = 8, 128
GLW = 16
T = 128


def _tree_merge(parts, grp):
    level = 0
    while len(parts) > 1:
        bit = jnp.bitwise_and(grp, 1 << level) != 0
        parts = [jnp.where(bit, parts[i + 1], parts[i])
                 for i in range(0, len(parts), 2)]
        level += 1
    return parts[0]


def _fwd_kernel_a(tb_ref, xw_ref, val_ref, i1_ref, rt_ref, out_ref,
                  scratch_ref):
    """Current forward: 16 sublane gathers + tree + lane route."""
    i = pl.program_id(0)
    for t in range(T):
        sl = slice(t * CHUNK, (t + 1) * CHUNK)
        b = tb_ref[i, t]
        i1 = i1_ref[sl, :].astype(jnp.int32)
        j = rt_ref[sl, :].astype(jnp.int32)
        sub = jnp.bitwise_and(i1, CHUNK - 1)
        grp = jnp.right_shift(i1, 3)
        xwin = xw_ref[pl.ds(b * CHUNK, CHUNK * GLW), :]
        parts = [jnp.take_along_axis(
            xwin[g * CHUNK:(g + 1) * CHUNK, :], sub, axis=0)
            for g in range(GLW)]
        g1 = _tree_merge(parts, grp)
        g2 = jnp.take_along_axis(g1, j, axis=1)
        prod = val_ref[sl, :] * g2
        scratch_ref[t, :] = jnp.sum(prod, axis=0)
    out_ref[...] = scratch_ref[...]


def _fwd_kernel_b(tb_ref, xw_ref, val_ref, i1_ref, rt_ref, out_ref,
                  scratch_ref):
    """Selects-first: tree over STATIC window views (no gathers), one
    stripe gather, one lane route.  i1's high nibble = the stripe-cell
    group G', low 3 bits = the element stripe S (dual-use byte)."""
    i = pl.program_id(0)
    for t in range(T):
        sl = slice(t * CHUNK, (t + 1) * CHUNK)
        b = tb_ref[i, t]
        i1 = i1_ref[sl, :].astype(jnp.int32)
        j = rt_ref[sl, :].astype(jnp.int32)
        sub = jnp.bitwise_and(i1, CHUNK - 1)
        grp = jnp.right_shift(i1, 3)
        xwin = xw_ref[pl.ds(b * CHUNK, CHUNK * GLW), :]
        parts = [xwin[g * CHUNK:(g + 1) * CHUNK, :] for g in range(GLW)]
        m = _tree_merge(parts, grp)          # selects on static views
        g1 = jnp.take_along_axis(m, sub, axis=0)   # ONE stripe gather
        g2 = jnp.take_along_axis(g1, j, axis=1)
        prod = val_ref[sl, :] * g2
        scratch_ref[t, :] = jnp.sum(prod, axis=0)
    out_ref[...] = scratch_ref[...]


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
        out_shape=jax.ShapeDtypeStruct((n_steps * T, LANES), jnp.float32),
    )


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    gx8 = 800                       # ~100k cols resident
    rng = np.random.default_rng(0)
    xw = jnp.asarray(rng.standard_normal((gx8, LANES)), jnp.float32)
    vals = jnp.asarray(
        rng.standard_normal((n_steps * T * CHUNK, LANES)), jnp.float32)
    i1 = jnp.asarray(rng.integers(0, 128, (n_steps * T * CHUNK, LANES)),
                     jnp.int8)
    rt = jnp.asarray(rng.integers(0, 128, (n_steps * T * CHUNK, LANES)),
                     jnp.int8)
    tb = jnp.asarray(rng.integers(0, gx8 // CHUNK - GLW, (n_steps, T)),
                     jnp.int32)

    from sparsetpu.bench.micro import timeit_chained

    for name, kern in (("A current", _fwd_kernel_a),
                       ("B selects-first", _fwd_kernel_b)):
        f = build(kern, n_steps, gx8)

        def run(x):
            return f(tb, x, vals, i1, rt)

        t = timeit_chained(run, xw, 192, 8)
        tiles = n_steps * T
        cyc = t * 0.94e9 / tiles     # v5e ~940 MHz
        print(f"{name}: {t*1e6:9.1f} us  {cyc:5.2f} cyc/tile  "
              f"{n_steps*T*CHUNK*LANES/t/1e9:6.1f} Gslot/s")


if __name__ == "__main__":
    main()
