"""Fused resident-x SpMV kernel (round-3 layout, see pack/fused.py).

One Pallas kernel does the whole SpMV:
  * x resident in VMEM for the entire grid (the BlockSpec index map is
    constant) — no per-step window staging, no column blocking.
  * forward: per tile, a dual gather over a GLW-group window at a
    per-tile scalar-prefetched base; the group select runs as a binary
    TREE (measured ~9% faster than the linear chain on v5e).  Chunk
    sums land in a VMEM scratch.
  * finish: the same dual-gather mechanics over the scratch — finish
    tiles accumulate per-row sums into the step's resident output block
    (``out_ref[target_tile] +=``), replacing the separate final kernel
    AND the chunk-sum HBM round trip of the classic path (the
    accum_results analogue, csr_hw.cpp:1531-1565, now fully in-step).

Metadata ships as two int8 streams (stripe index + lane route, 2 B/slot
total): measured +5%% over the fused int16 stream (no widen+mask+shift
per tile).  y reassembles from the per-slab blocks with slices; rare
pack-time matcher losers are fixed up with a tiny COO scatter-add.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..pack.fused import FusedMatrix
from ..pack.gather_stream import CHUNK, LANES, STRIPE


def _tree_merge(parts, grp):
    """Binary-tree select merge of ``parts[g]`` by the group index
    ``grp`` (bit-tested per level; len(parts) must be a power of two)."""
    level = 0
    while len(parts) > 1:
        bit = jnp.bitwise_and(grp, 1 << level) != 0
        parts = [jnp.where(bit, parts[i + 1], parts[i])
                 for i in range(0, len(parts), 2)]
        level += 1
    return parts[0]


def _fused_kernel(tb_ref, f1cnt_ref, f2cnt_ref, f2grp_ref, sslab_ref,
                  sfirst_ref, xw_ref, val_ref, i1_ref, rt_ref,
                  f1i1_ref, f1rt_ref, f2i1_ref, f2rt_ref,
                  out_ref, scratch_ref, scratch2_ref, *,
                  T: int, GLW: int, P: int, F1_max: int, F2_max: int,
                  F1S: int, OBp: int, fin_direct: int = 0):
    i = pl.program_id(0)
    Q = CHUNK // P

    # ---- forward: T tiles -> per-chunk partial sums in VMEM scratch
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
        if P == 1:
            scratch_ref[t, :] = jnp.sum(prod, axis=0)
        else:
            for p in range(P):
                scratch_ref[t * P + p, :] = jnp.sum(
                    prod[p * Q:(p + 1) * Q, :], axis=0)

    # ---- finish stage 1: collapse each row's chunk partials to ONE
    # partial in scratch2 (same dual-gather mechanics over the scratch)
    # (no pl.when predication anywhere below: a branch costs ~80 ns on
    # v5e — measured, 36 of them tripled the kernel — while a drained
    # tile's unconditional work is ~10 ns and adds exact zeros)
    SR = T * P                    # scratch rows; SR == drain cell value
    SG = SR // CHUNK
    for f in range(0 if fin_direct else F1_max):
        sl = slice(f * CHUNK, (f + 1) * CHUNK)
        i1 = f1i1_ref[sl, :].astype(jnp.int32)     # drain = -1
        j = f1rt_ref[sl, :].astype(jnp.int32)
        sub = jnp.bitwise_and(i1, CHUNK - 1)
        grp = jnp.bitwise_and(jnp.right_shift(i1, 3), SG - 1)
        parts = [jnp.take_along_axis(
            scratch_ref[g * CHUNK:(g + 1) * CHUNK, :], sub, axis=0)
            for g in range(SG)]
        g1 = _tree_merge(parts, grp)
        g1 = jnp.where(i1 < 0, jnp.float32(0), g1)
        g2 = jnp.take_along_axis(g1, j, axis=1)
        scratch2_ref[f, :] = jnp.sum(g2, axis=0)

    # ---- finish stage 2: aligned out groups — position (s, l) IS out
    # row (8*group+s)*128 + l, so each tile lands with ONE (8, 128)
    # dynamic-offset accumulate into the slab's resident out block
    # (first step zeroes it; accumulation is csr_hw.cpp:1555's `+=`)
    @pl.when(sfirst_ref[i] == 1)
    def _():
        out_ref[...] = jnp.zeros((OBp, LANES), dtype=out_ref.dtype)
    # stage-2 source: the row partials in scratch2, or (when stage 1 is
    # skipped — the scattered regime) the chunk sums in scratch directly
    s2_src, s2_rows = ((scratch_ref, SR) if fin_direct
                       else (scratch2_ref, F1S))
    S2G = s2_rows // CHUNK
    for f in range(F2_max):
        sl = slice(f * CHUNK, (f + 1) * CHUNK)
        i1 = f2i1_ref[sl, :].astype(jnp.int32)     # drain = -1
        j = f2rt_ref[sl, :].astype(jnp.int32)
        sub = jnp.bitwise_and(i1, CHUNK - 1)
        grp = jnp.bitwise_and(jnp.right_shift(i1, 3), S2G - 1)
        parts = [jnp.take_along_axis(
            s2_src[g * CHUNK:(g + 1) * CHUNK, :], sub, axis=0)
            for g in range(S2G)]
        g1 = parts[0] if S2G == 1 else _tree_merge(parts, grp)
        g1 = jnp.where(i1 < 0, jnp.float32(0), g1)
        g2 = jnp.take_along_axis(g1, j, axis=1)
        g = f2grp_ref[i, f]
        out_ref[pl.ds(g * CHUNK, CHUNK), :] = (
            out_ref[pl.ds(g * CHUNK, CHUNK), :] + g2)


@functools.partial(jax.jit, static_argnames=("T", "GLW", "P", "F1_max",
                                             "F2_max", "F1S", "OBp",
                                             "n_steps", "n_slabs",
                                             "fin_direct", "interpret"))
def _fused_spmv_blocks(tile_base, fin1_cnt, fin2_cnt, fin2_group,
                       step_slab, step_first, x2, values, meta_i1,
                       meta_rt, fin1_i1, fin1_rt, fin2_i1, fin2_rt, *,
                       T: int, GLW: int,
                       P: int, F1_max: int, F2_max: int, F1S: int,
                       OBp: int, n_steps: int, n_slabs: int,
                       fin_direct: int = 0,
                       interpret: bool = False):
    rows_per_step = T * CHUNK
    gx8 = x2.shape[0]

    def step_spec():
        return pl.BlockSpec((rows_per_step, LANES), lambda i, *p: (i, 0))

    def fin_spec(fm):
        return pl.BlockSpec((fm * CHUNK, LANES), lambda i, *p: (i, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((gx8, LANES), lambda i, *p: (0, 0)),
            step_spec(), step_spec(), step_spec(),
            fin_spec(F1_max), fin_spec(F1_max),
            fin_spec(F2_max), fin_spec(F2_max),
        ],
        out_specs=pl.BlockSpec((OBp, LANES),
                               lambda i, tb, f1, f2, fg, ss, sf:
                               (ss[i], 0)),
        scratch_shapes=[pltpu.VMEM((T * P, LANES), jnp.float32),
                        pltpu.VMEM((F1S, LANES), jnp.float32)],
    )
    kernel = functools.partial(_fused_kernel, T=T, GLW=GLW, P=P,
                               F1_max=F1_max, F2_max=F2_max, F1S=F1S,
                               OBp=OBp, fin_direct=fin_direct)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_slabs * OBp, LANES),
                                       jnp.float32),
        interpret=interpret,
    )(tile_base, fin1_cnt, fin2_cnt, fin2_group, step_slab, step_first,
      x2, values, meta_i1, meta_rt, fin1_i1, fin1_rt, fin2_i1, fin2_rt)


class FusedDevice:
    """Device-resident fused-layout matrix (spmv in ONE kernel pass)."""

    def __init__(self, packed: FusedMatrix, interpret: bool = False):
        self.meta = packed
        self.interpret = interpret
        self.values = jnp.asarray(packed.values)
        self.meta_i1 = jnp.asarray(packed.meta_i1)
        self.meta_rt = jnp.asarray(packed.meta_rt)
        self.fin1_i1 = jnp.asarray(packed.fin1_i1)
        self.fin1_rt = jnp.asarray(packed.fin1_rt)
        self.fin2_i1 = jnp.asarray(packed.fin2_i1)
        self.fin2_rt = jnp.asarray(packed.fin2_rt)
        self.tile_base = jnp.asarray(packed.tile_base)
        self.fin1_cnt = jnp.asarray(packed.fin1_cnt)
        self.fin2_cnt = jnp.asarray(packed.fin2_cnt)
        self.fin2_group = jnp.asarray(packed.fin2_group)
        self.step_slab = jnp.asarray(packed.step_slab)
        self.step_first = jnp.asarray(packed.step_first)
        self.n_spills = int(packed.spill_row.shape[0])
        if self.n_spills:
            self.spill_row = jnp.asarray(packed.spill_row)
            self.spill_col = jnp.asarray(packed.spill_col)
            self.spill_val = jnp.asarray(packed.spill_val)

    @property
    def dtype(self):
        return self.values.dtype

    def prepare_x(self, x) -> jax.Array:
        x = jnp.asarray(x, dtype=jnp.float32)
        if x.shape != (self.meta.nr_cols,):
            raise ValueError(
                f"x has shape {x.shape}, expected ({self.meta.nr_cols},)")
        pad = self.meta.padded_cols - self.meta.nr_cols
        if pad:
            x = jnp.pad(x, (0, pad))
        return x.reshape(-1, STRIPE)

    def spmv(self, x, x_is_packed: bool = False) -> jax.Array:
        x2 = x if x_is_packed else self.prepare_x(x)
        m = self.meta
        blocks = _fused_spmv_blocks(
            self.tile_base, self.fin1_cnt, self.fin2_cnt,
            self.fin2_group, self.step_slab, self.step_first, x2,
            self.values, self.meta_i1, self.meta_rt,
            self.fin1_i1, self.fin1_rt, self.fin2_i1, self.fin2_rt,
            T=m.T, GLW=m.GLW, P=m.planes, F1_max=m.F1_max,
            F2_max=m.F2_max, F1S=m.F1S, OBp=m.OBp,
            n_steps=m.n_steps, n_slabs=m.n_slabs,
            fin_direct=m.fin_direct,
            interpret=self.interpret)
        # per-slab contiguous slices (NOT an element gather: a 200k
        # jnp.take costs ~1.7 ms on TPU — measured — vs ~free DMA slices)
        flat = blocks.reshape(-1)
        sb = m.slab_bounds
        parts = [jax.lax.dynamic_slice(
            flat, (s * m.OBp * LANES,), (int(sb[s + 1] - sb[s]),))
            for s in range(m.n_slabs)]
        y = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
        if self.n_spills:
            xs = x2.reshape(-1)
            y = y.at[self.spill_row].add(
                self.spill_val * jnp.take(xs, self.spill_col))
        return y


def _fused_flatten(d):
    spills = ((d.spill_row, d.spill_col, d.spill_val)
              if d.n_spills else (None, None, None))
    return ((d.values, d.meta_i1, d.meta_rt, d.fin1_i1, d.fin1_rt,
             d.fin2_i1, d.fin2_rt,
             d.tile_base, d.fin1_cnt, d.fin2_cnt, d.fin2_group,
             d.step_slab, d.step_first) + spills,
            (d.meta, d.interpret, d.n_spills))


def _fused_unflatten(aux, children):
    d = object.__new__(FusedDevice)
    d.meta, d.interpret, d.n_spills = aux
    (d.values, d.meta_i1, d.meta_rt, d.fin1_i1, d.fin1_rt,
     d.fin2_i1, d.fin2_rt,
     d.tile_base, d.fin1_cnt, d.fin2_cnt, d.fin2_group,
     d.step_slab, d.step_first, sr, sc, sv) = children
    if d.n_spills:
        d.spill_row, d.spill_col, d.spill_val = sr, sc, sv
    return d


jax.tree_util.register_pytree_node(FusedDevice, _fused_flatten,
                                   _fused_unflatten)
