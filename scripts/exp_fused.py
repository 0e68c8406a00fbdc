#!/usr/bin/env python
"""Prototype: fused single-kernel SpMV (x VMEM-resident, slab-major).

Per grid step (one row slab): forward dual-gather over ST super-tiles
(8 tiles each) with per-super-tile dynamic x bases, chunk sums kept in
VMEM scratch, then the final gather (V2-final style, chain over the
small scratch) producing the slab's y directly — no separate finish
kernel, no chunk-sum HBM round trip.

Measures the throughput of the full fused shape with synthetic data.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from sparsetpu.bench.micro import timeit_chained

C, L = 8, 128


def make_fused(n_slabs, ST, GL, SG, OT, x_rows):
    """ST super-tiles (of 8 tiles) per slab; GL groups per super-tile
    x-window; scratch = ST stripes -> SG = ceil(ST/8) groups; OT out
    tiles per slab (slab rows = OT*128)."""

    def kernel(tb_ref, xw_ref, val_ref, meta_ref, fcell_ref, froute_ref,
               out_ref, scratch):
        i = pl.program_id(0)

        def fwd_super(s, _):
            # 8 forward tiles -> one (8, 128) scratch stripe row; all
            # dynamic slices hoisted to one per super-tile
            base = tb_ref[i, s]
            xwin = xw_ref[pl.ds(base * C, C * GL), :]
            mblk = meta_ref[pl.ds(s * 64, 64), :]
            vblk = val_ref[pl.ds(s * 64, 64), :]
            rows = []
            for tt in range(8):
                mrow = mblk[tt * C:(tt + 1) * C, :]
                m32 = jnp.bitwise_and(mrow.astype(jnp.int32), 0x7FFF)
                i1 = jnp.right_shift(m32, 7)
                j = jnp.bitwise_and(m32, 0x7F)
                sub = jnp.bitwise_and(i1, C - 1)
                grp = jnp.right_shift(i1, 3)
                g1 = jnp.zeros((C, L), jnp.float32)
                for g in range(GL):
                    part = jnp.take_along_axis(
                        xwin[g * C:(g + 1) * C, :], sub, axis=0)
                    g1 = jnp.where(grp == g, part, g1)
                g2 = jnp.take_along_axis(g1, j, axis=1)
                v = vblk[tt * C:(tt + 1) * C, :]
                rows.append(jnp.sum(v * g2, axis=0))
            scratch[pl.ds(s * 8, 8), :] = jnp.stack(rows, axis=0)
            return 0

        jax.lax.fori_loop(0, ST, fwd_super, 0)

        # fused final: per out tile, gather its children from scratch
        for ot in range(OT):
            i1 = fcell_ref[ot * C:(ot + 1) * C, :].astype(jnp.int32)
            j = froute_ref[ot * C:(ot + 1) * C, :].astype(jnp.int32)
            sub = jnp.bitwise_and(i1, C - 1)
            grp = jnp.right_shift(i1, 3)
            g1 = jnp.zeros((C, L), jnp.float32)
            for g in range(SG):
                part = jnp.take_along_axis(
                    scratch[g * C:(g + 1) * C, :], sub, axis=0)
                g1 = jnp.where(grp == g, part, g1)
            g2 = jnp.take_along_axis(g1, j, axis=1)
            out_ref[ot, :] = jnp.sum(g2, axis=0)

    rows_per_step = ST * 8 * C
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_slabs,),
        in_specs=[
            pl.BlockSpec((x_rows, L), lambda i, tb: (0, 0)),   # resident x
            pl.BlockSpec((rows_per_step, L), lambda i, tb: (i, 0)),
            pl.BlockSpec((rows_per_step, L), lambda i, tb: (i, 0)),
            pl.BlockSpec((OT * C, L), lambda i, tb: (i, 0)),
            pl.BlockSpec((OT * C, L), lambda i, tb: (i, 0)),
        ],
        out_specs=pl.BlockSpec((OT, L), lambda i, tb: (i, 0)),
        scratch_shapes=[pltpu.VMEM((-(-ST // 8) * 8 * 8, L),
                                   jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(kernel),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_slabs * OT, L), jnp.float32))


def main():
    rng = np.random.default_rng(0)
    # headline-like scale: 24 slabs x 450 tiles = 11M slots; x 784 stripes
    n_slabs, ST_tiles, GL, OT = 24, 448, 16, 64
    ST = ST_tiles // 8
    SG = -(-ST // 8)
    x_rows = 784
    x_rows = -(-x_rows // (C * GL)) * (C * GL)   # pad for slicing
    n_tiles = n_slabs * ST_tiles
    rowsv = n_tiles * C
    val = jax.device_put(rng.standard_normal((rowsv, L)).astype(np.float32))
    cells = rng.integers(0, C * GL, size=(rowsv, L))
    route = rng.integers(0, L, size=(rowsv, L))
    meta = jax.device_put(((cells << 7) | route).astype(np.int16))
    fcell = jax.device_put(
        rng.integers(0, ST, size=(n_slabs * OT * C, L)).astype(np.int16))
    froute = jax.device_put(
        rng.integers(0, L, size=(n_slabs * OT * C, L)).astype(np.int8))
    tb = jax.device_put(rng.integers(
        0, max(1, x_rows // C - GL), size=(n_slabs, ST)).astype(np.int32))
    xw0 = jax.device_put(
        rng.standard_normal((x_rows, L)).astype(np.float32))

    f = make_fused(n_slabs, ST, GL, SG, OT, x_rows)

    def call(xw):
        return f(tb, xw, val, meta, fcell, froute)

    t0 = time.time()
    y = call(xw0)
    jax.block_until_ready(y)
    print(f"compile+run {time.time()-t0:.1f}s out {y.shape}", flush=True)
    t = timeit_chained(call, xw0, 256, 16)
    slots = n_tiles * 1024
    print(f"fused: {t*1e3:.3f} ms  {slots/t/1e9:.1f} Gslot/s  "
          f"(equiv {slots*0.89/t/1e9:.1f} Gnnz/s at fill 0.89)",
          flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    main()
