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
                  F1S: int, OBp: int, S: int = 1, F1A: int = 0,
                  F2A: int = 0, fin_direct: int = 0):
    """One grid step runs S packed sub-steps back to back: each grid
    iteration pays ~180 ns of fixed cost (DMA issue + grid machinery,
    measured), so small-T regimes fold several sub-steps into one
    iteration.  All S sub-steps share the slab's resident out block
    (the pack pads every slab's step count to a multiple of S).
    F1A/F2A are the ALLOCATED per-sub-step finish tile strides (padded
    to 4-tile int8 alignment); the loops run the true F1_max/F2_max."""
    gidx = pl.program_id(0)
    Q = CHUNK // P
    F1A = F1A or F1_max
    F2A = F2A or F2_max

    for s in range(S):
        i = gidx * S + s if S > 1 else gidx

        # ---- forward: T tiles -> per-chunk partial sums in VMEM scratch
        for t in range(T):
            sl = slice((s * T + t) * CHUNK, (s * T + t + 1) * CHUNK)
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
        # partial in scratch2 (same dual-gather mechanics over scratch)
        # (no pl.when predication anywhere below: a branch costs ~80 ns
        # on v5e — measured, 36 of them tripled the kernel — while a
        # drained tile's unconditional work is ~10 ns, adding exact
        # zeros)
        SR = T * P                # scratch rows; SR == drain cell value
        SG = SR // CHUNK
        for f in range(0 if fin_direct else F1_max):
            sl = slice((s * F1A + f) * CHUNK, (s * F1A + f + 1) * CHUNK)
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

        # ---- finish stage 2: aligned out groups — position (s, l) IS
        # out row (8*group+s)*128 + l, so each tile lands with ONE
        # (8, 128) dynamic-offset accumulate into the slab's resident
        # out block (first step zeroes it; accumulation is
        # csr_hw.cpp:1555's `+=`)
        @pl.when(sfirst_ref[i] == 1)
        def _():
            out_ref[...] = jnp.zeros((OBp, LANES), dtype=out_ref.dtype)
        # stage-2 source: the row partials in scratch2, or (when stage 1
        # is skipped — the scattered regime) the chunk sums in scratch
        s2_src, s2_rows = ((scratch_ref, SR) if fin_direct
                           else (scratch2_ref, F1S))
        S2G = s2_rows // CHUNK
        for f in range(F2_max):
            sl = slice((s * F2A + f) * CHUNK, (s * F2A + f + 1) * CHUNK)
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


def _fused_spmm_kernel(tb_ref, f1cnt_ref, f2cnt_ref, f2grp_ref, sslab_ref,
                       sfirst_ref, xw_ref, val_ref, i1_ref, rt_ref,
                       f1i1_ref, f1rt_ref, f2i1_ref, f2rt_ref,
                       out_ref, scratch_ref, scratch2_ref, *,
                       T: int, GLW: int, P: int, F1_max: int, F2_max: int,
                       F1S: int, OBp: int, k: int, fin_direct: int = 0):
    """Multi-RHS variant of ``_fused_kernel``: xw/scratch/out carry a
    leading k plane axis; every tile decodes its metadata ONCE and the
    gather/route/multiply runs per plane — the resident-x design's
    amortization payoff (metadata bytes /k per rhs).  Structure matches
    the SpMV kernel line for line; see its comments for the whys."""
    i = pl.program_id(0)
    Q = CHUNK // P

    for t in range(T):
        sl = slice(t * CHUNK, (t + 1) * CHUNK)
        b = tb_ref[i, t]
        i1 = i1_ref[sl, :].astype(jnp.int32)
        j = rt_ref[sl, :].astype(jnp.int32)
        sub = jnp.bitwise_and(i1, CHUNK - 1)
        grp = jnp.right_shift(i1, 3)
        v = val_ref[sl, :]
        for kk in range(k):
            xwin = xw_ref[kk, pl.ds(b * CHUNK, CHUNK * GLW), :]
            parts = [jnp.take_along_axis(
                xwin[g * CHUNK:(g + 1) * CHUNK, :], sub, axis=0)
                for g in range(GLW)]
            g1 = _tree_merge(parts, grp)
            g2 = jnp.take_along_axis(g1, j, axis=1)
            prod = v * g2
            if P == 1:
                scratch_ref[kk, t, :] = jnp.sum(prod, axis=0)
            else:
                for p in range(P):
                    scratch_ref[kk, t * P + p, :] = jnp.sum(
                        prod[p * Q:(p + 1) * Q, :], axis=0)

    SR = T * P
    SG = SR // CHUNK
    for f in range(0 if fin_direct else F1_max):
        sl = slice(f * CHUNK, (f + 1) * CHUNK)
        i1 = f1i1_ref[sl, :].astype(jnp.int32)     # drain = -1
        j = f1rt_ref[sl, :].astype(jnp.int32)
        sub = jnp.bitwise_and(i1, CHUNK - 1)
        grp = jnp.bitwise_and(jnp.right_shift(i1, 3), SG - 1)
        drain = i1 < 0
        for kk in range(k):
            parts = [jnp.take_along_axis(
                scratch_ref[kk, g * CHUNK:(g + 1) * CHUNK, :], sub,
                axis=0) for g in range(SG)]
            g1 = _tree_merge(parts, grp)
            g1 = jnp.where(drain, jnp.float32(0), g1)
            g2 = jnp.take_along_axis(g1, j, axis=1)
            scratch2_ref[kk, f, :] = jnp.sum(g2, axis=0)

    @pl.when(sfirst_ref[i] == 1)
    def _():
        out_ref[...] = jnp.zeros((k, OBp, LANES), dtype=out_ref.dtype)
    s2_src, s2_rows = ((scratch_ref, SR) if fin_direct
                       else (scratch2_ref, F1S))
    S2G = s2_rows // CHUNK
    for f in range(F2_max):
        sl = slice(f * CHUNK, (f + 1) * CHUNK)
        i1 = f2i1_ref[sl, :].astype(jnp.int32)     # drain = -1
        j = f2rt_ref[sl, :].astype(jnp.int32)
        sub = jnp.bitwise_and(i1, CHUNK - 1)
        grp = jnp.bitwise_and(jnp.right_shift(i1, 3), S2G - 1)
        drain = i1 < 0
        g = f2grp_ref[i, f]
        for kk in range(k):
            parts = [jnp.take_along_axis(
                s2_src[kk, gg * CHUNK:(gg + 1) * CHUNK, :], sub, axis=0)
                for gg in range(S2G)]
            g1 = parts[0] if S2G == 1 else _tree_merge(parts, grp)
            g1 = jnp.where(drain, jnp.float32(0), g1)
            g2 = jnp.take_along_axis(g1, j, axis=1)
            out_ref[kk, pl.ds(g * CHUNK, CHUNK), :] = (
                out_ref[kk, pl.ds(g * CHUNK, CHUNK), :] + g2)


@functools.partial(jax.jit, static_argnames=("T", "GLW", "P", "F1_max",
                                             "F2_max", "F1S", "OBp",
                                             "n_steps", "n_slabs", "k",
                                             "fin_direct", "interpret"))
def _fused_spmm_blocks(tile_base, fin1_cnt, fin2_cnt, fin2_group,
                       step_slab, step_first, x3, values, meta_i1,
                       meta_rt, fin1_i1, fin1_rt, fin2_i1, fin2_rt, *,
                       T: int, GLW: int,
                       P: int, F1_max: int, F2_max: int, F1S: int,
                       OBp: int, n_steps: int, n_slabs: int, k: int,
                       fin_direct: int = 0,
                       interpret: bool = False):
    rows_per_step = T * CHUNK
    gx8 = x3.shape[1]
    f1a = fin1_i1.shape[0] // (n_steps * CHUNK)
    f2a = fin2_i1.shape[0] // (n_steps * CHUNK)

    def step_spec():
        return pl.BlockSpec((rows_per_step, LANES), lambda i, *p: (i, 0))

    def fin_spec(fm):
        return pl.BlockSpec((fm * CHUNK, LANES), lambda i, *p: (i, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((k, gx8, LANES), lambda i, *p: (0, 0, 0)),
            step_spec(), step_spec(), step_spec(),
            fin_spec(f1a), fin_spec(f1a),
            fin_spec(f2a), fin_spec(f2a),
        ],
        out_specs=pl.BlockSpec((k, OBp, LANES),
                               lambda i, tb, f1, f2, fg, ss, sf:
                               (0, ss[i], 0)),
        scratch_shapes=[pltpu.VMEM((k, T * P, LANES), jnp.float32),
                        pltpu.VMEM((k, F1S, LANES), jnp.float32)],
    )
    kernel = functools.partial(_fused_spmm_kernel, T=T, GLW=GLW, P=P,
                               F1_max=F1_max, F2_max=F2_max, F1S=F1S,
                               OBp=OBp, k=k, fin_direct=fin_direct)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, n_slabs * OBp, LANES),
                                       jnp.float32),
        interpret=interpret,
    )(tile_base, fin1_cnt, fin2_cnt, fin2_group, step_slab, step_first,
      x3, values, meta_i1, meta_rt, fin1_i1, fin1_rt, fin2_i1, fin2_rt)


# VMEM ceiling for the SpMM planes: k·(x + step scratch + stage-1
# scratch + out block) must coexist with the double-buffered streams.
# Budgeted against the spmv path's single-plane working set (x capped
# at MAX_RESIDENT_COLS ≈ 6 MB); ~12 MB of planes leaves the v5e VMEM
# comfortable.
SPMM_PLANE_BYTES_MAX = 12 << 20
def _fused_spmv_blocks(tile_base, fin1_cnt, fin2_cnt, fin2_group,
                       step_slab, step_first, x2, values, meta_i1,
                       meta_rt, fin1_i1, fin1_rt, fin2_i1, fin2_rt, *,
                       T: int, GLW: int,
                       P: int, F1_max: int, F2_max: int, F1S: int,
                       OBp: int, n_steps: int, n_slabs: int,
                       S: int = 1,
                       fin_direct: int = 0,
                       interpret: bool = False):
    rows_per_step = T * CHUNK
    gx8 = x2.shape[0]
    # allocated per-step finish tile counts (>= F1_max/F2_max, padded to
    # 4-tile multiples at pack time so each step's int8 block is Mosaic
    # (32, 128)-tile aligned; older checkpoints may be unpadded)
    f1a = fin1_i1.shape[0] // (n_steps * CHUNK)
    f2a = fin2_i1.shape[0] // (n_steps * CHUNK)
    # S sub-steps fold into one grid iteration (pack pads every slab's
    # step count to a multiple of S; S=1 for pre-SGRP checkpoints)
    if n_steps % S:
        S = 1

    def step_spec():
        return pl.BlockSpec((S * rows_per_step, LANES),
                            lambda i, *p: (i, 0))

    def fin_spec(fm):
        return pl.BlockSpec((S * fm * CHUNK, LANES),
                            lambda i, *p: (i, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_steps // S,),
        in_specs=[
            pl.BlockSpec((gx8, LANES), lambda i, *p: (0, 0)),
            step_spec(), step_spec(), step_spec(),
            fin_spec(f1a), fin_spec(f1a),
            fin_spec(f2a), fin_spec(f2a),
        ],
        out_specs=pl.BlockSpec((OBp, LANES),
                               lambda i, tb, f1, f2, fg, ss, sf:
                               (ss[i * S], 0)),
        scratch_shapes=[pltpu.VMEM((T * P, LANES), jnp.float32),
                        pltpu.VMEM((F1S, LANES), jnp.float32)],
    )
    kernel = functools.partial(_fused_kernel, T=T, GLW=GLW, P=P,
                               F1_max=F1_max, F2_max=F2_max, F1S=F1S,
                               OBp=OBp, S=S, F1A=f1a, F2A=f2a,
                               fin_direct=fin_direct)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_slabs * OBp, LANES),
                                       jnp.float32),
        interpret=interpret,
    )(tile_base, fin1_cnt, fin2_cnt, fin2_group, step_slab, step_first,
      x2, values, meta_i1, meta_rt, fin1_i1, fin1_rt, fin2_i1, fin2_rt)


def _slabs_uniform(m: FusedMatrix) -> bool:
    """True when every slab except the last spans exactly OBp*LANES
    rows starting at 0 — the packed blocks are then contiguous in row
    order and y reassembles as ONE slice of the flat output (the pack
    cuts slab bounds at OBp*LANES multiples; splits on pack failure
    break this, and the device falls back to per-slab slices)."""
    sb = m.slab_bounds
    ob = m.OBp * LANES
    if int(sb[0]) != 0:
        return False
    deltas = np.diff(sb)
    return bool(np.all(deltas[:-1] == ob) and deltas[-1] <= ob)


class FusedDevice:
    """Device-resident fused-layout matrix (spmv in ONE kernel pass)."""

    def __init__(self, packed: FusedMatrix, interpret: bool = False):
        self.meta = packed
        self.interpret = interpret
        self.values = jnp.asarray(packed.values)
        self._uniform_slabs = _slabs_uniform(packed)
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
            S=getattr(m, "SGRP", 1),
            fin_direct=m.fin_direct,
            interpret=self.interpret)
        # per-slab contiguous slices (NOT an element gather: a 200k
        # jnp.take costs ~1.7 ms on TPU — measured — vs ~free DMA slices)
        flat = blocks.reshape(-1)
        sb = m.slab_bounds
        if self._uniform_slabs:
            # aligned slabs: blocks ARE y in row order — one slice
            y = flat[:int(sb[-1])]
        else:
            parts = [jax.lax.dynamic_slice(
                flat, (s * m.OBp * LANES,), (int(sb[s + 1] - sb[s]),))
                for s in range(m.n_slabs)]
            y = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
        if self.n_spills:
            xs = x2.reshape(-1)
            y = y.at[self.spill_row].add(
                self.spill_val * jnp.take(xs, self.spill_col))
        return y

    def spmm_applicable(self, k: int) -> bool:
        """True when k resident x planes + scratch fit the VMEM budget
        (callers fall back to the classic windowed SpMM otherwise)."""
        m = self.meta
        plane = (m.padded_cols + (m.T * m.planes + m.F1S + m.OBp) * LANES)
        return k >= 1 and k * plane * 4 <= SPMM_PLANE_BYTES_MAX

    def prepare_x_multi(self, X) -> jax.Array:
        """(nr_cols, k) -> (k, padded_cols/128, 128) resident planes."""
        X = jnp.asarray(X, dtype=jnp.float32)
        if X.ndim != 2 or X.shape[0] != self.meta.nr_cols:
            raise ValueError(
                f"X has shape {X.shape}, expected ({self.meta.nr_cols}, k)")
        pad = self.meta.padded_cols - self.meta.nr_cols
        if pad:
            X = jnp.pad(X, ((0, pad), (0, 0)))
        return X.T.reshape(X.shape[1], -1, STRIPE)

    def spmm(self, X, x_is_packed: bool = False) -> jax.Array:
        """Y = A @ X on the fused resident-x layout: the k planes share
        one pass over values + metadata (the classic multi-plane finish
        pattern lifted in-step; VERDICT r3 item 5).  Returns
        (nr_rows, k)."""
        x3 = X if x_is_packed else self.prepare_x_multi(X)
        k = int(x3.shape[0])
        m = self.meta
        blocks = _fused_spmm_blocks(
            self.tile_base, self.fin1_cnt, self.fin2_cnt,
            self.fin2_group, self.step_slab, self.step_first, x3,
            self.values, self.meta_i1, self.meta_rt,
            self.fin1_i1, self.fin1_rt, self.fin2_i1, self.fin2_rt,
            T=m.T, GLW=m.GLW, P=m.planes, F1_max=m.F1_max,
            F2_max=m.F2_max, F1S=m.F1S, OBp=m.OBp,
            n_steps=m.n_steps, n_slabs=m.n_slabs, k=k,
            fin_direct=m.fin_direct,
            interpret=self.interpret)
        flat = blocks.reshape(k, -1)
        sb = m.slab_bounds
        if self._uniform_slabs:
            y = flat[:, :int(sb[-1])]
        else:
            parts = [jax.lax.dynamic_slice(
                flat, (0, s * m.OBp * LANES), (k, int(sb[s + 1] - sb[s])))
                for s in range(m.n_slabs)]
            y = (jnp.concatenate(parts, axis=1) if len(parts) > 1
                 else parts[0])
        if self.n_spills:
            xs = x3.reshape(k, -1)
            adds = self.spill_val[None, :] * jnp.take(
                xs, self.spill_col, axis=1)
            y = y.at[:, self.spill_row].add(adds)
        return y.T


# ---------------------------------------------------------------------------
# df64 on the fused layout: the reference's default DOUBLE=1 build
# (Makefile:18, util.h:18-26) riding the flagship resident-x path —
# two f32 value planes share ONE metadata set; every reduction in the
# in-step finish renormalizes with df64 adds (VERDICT r3 item 7).
# ---------------------------------------------------------------------------

# x lives resident TWICE (hi + lo planes): halve the column budget
MAX_RESIDENT_COLS_DF64 = 700_000


def _df64_tree8(h, l):
    """(8, LANES) df64 pairs -> (LANES,) df64 pairwise-compensated sum."""
    from .f64emu import df64_add
    for width in (4, 2, 1):
        h, l = df64_add(h[:width], l[:width],
                        h[width:2 * width], l[width:2 * width])
    return h[0], l[0]


def _df64_treeQ(h, l, Q):
    """(Q, LANES) df64 pairs -> (LANES,) (Q a power of two <= 8)."""
    from .f64emu import df64_add
    w = Q // 2
    while w >= 1:
        h, l = df64_add(h[:w], l[:w], h[w:2 * w], l[w:2 * w])
        w //= 2
    return h[0], l[0]


def _fused_df64_kernel(tb_ref, f1cnt_ref, f2cnt_ref, f2grp_ref, sslab_ref,
                       sfirst_ref, xwh_ref, xwl_ref, vh_ref, vl_ref,
                       i1_ref, rt_ref, f1i1_ref, f1rt_ref, f2i1_ref,
                       f2rt_ref, outh_ref, outl_ref,
                       sch_ref, scl_ref, s2h_ref, s2l_ref, *,
                       T: int, GLW: int, P: int, F1_max: int, F2_max: int,
                       F1S: int, OBp: int, fin_direct: int = 0):
    """df64 twin of ``_fused_kernel``: metadata decoded once per tile,
    hi/lo x planes gathered with the same indices, error-free TwoProd,
    compensated pairwise chunk sums, and df64-renormalizing finish
    stages (the accurate add of f64emu.df64_add at every level)."""
    from .f64emu import _two_prod, df64_add
    i = pl.program_id(0)
    Q = CHUNK // P

    for t in range(T):
        sl = slice(t * CHUNK, (t + 1) * CHUNK)
        b = tb_ref[i, t]
        i1 = i1_ref[sl, :].astype(jnp.int32)
        j = rt_ref[sl, :].astype(jnp.int32)
        sub = jnp.bitwise_and(i1, CHUNK - 1)
        grp = jnp.right_shift(i1, 3)
        xwh = xwh_ref[pl.ds(b * CHUNK, CHUNK * GLW), :]
        xwl = xwl_ref[pl.ds(b * CHUNK, CHUNK * GLW), :]
        ph = [jnp.take_along_axis(
            xwh[g * CHUNK:(g + 1) * CHUNK, :], sub, axis=0)
            for g in range(GLW)]
        pl_ = [jnp.take_along_axis(
            xwl[g * CHUNK:(g + 1) * CHUNK, :], sub, axis=0)
            for g in range(GLW)]
        g1h = _tree_merge(ph, grp)
        g1l = _tree_merge(pl_, grp)
        g2h = jnp.take_along_axis(g1h, j, axis=1)
        g2l = jnp.take_along_axis(g1l, j, axis=1)
        ah, al = vh_ref[sl, :], vl_ref[sl, :]
        p, e = _two_prod(ah, g2h)
        e = e + (ah * g2l + al * g2h)   # al*g2l is a 2^-48 term: dropped
        if P == 1:
            hh, ll = _df64_tree8(p, e)
            sch_ref[t, :] = hh
            scl_ref[t, :] = ll
        else:
            for pp in range(P):
                hh, ll = _df64_treeQ(p[pp * Q:(pp + 1) * Q, :],
                                     e[pp * Q:(pp + 1) * Q, :], Q)
                sch_ref[t * P + pp, :] = hh
                scl_ref[t * P + pp, :] = ll

    SR = T * P
    SG = SR // CHUNK
    for f in range(0 if fin_direct else F1_max):
        sl = slice(f * CHUNK, (f + 1) * CHUNK)
        i1 = f1i1_ref[sl, :].astype(jnp.int32)     # drain = -1
        j = f1rt_ref[sl, :].astype(jnp.int32)
        sub = jnp.bitwise_and(i1, CHUNK - 1)
        grp = jnp.bitwise_and(jnp.right_shift(i1, 3), SG - 1)
        drain = i1 < 0
        ph = [jnp.take_along_axis(
            sch_ref[g * CHUNK:(g + 1) * CHUNK, :], sub, axis=0)
            for g in range(SG)]
        pl2 = [jnp.take_along_axis(
            scl_ref[g * CHUNK:(g + 1) * CHUNK, :], sub, axis=0)
            for g in range(SG)]
        g1h = _tree_merge(ph, grp)
        g1l = _tree_merge(pl2, grp)
        g1h = jnp.where(drain, jnp.float32(0), g1h)
        g1l = jnp.where(drain, jnp.float32(0), g1l)
        g2h = jnp.take_along_axis(g1h, j, axis=1)
        g2l = jnp.take_along_axis(g1l, j, axis=1)
        hh, ll = _df64_tree8(g2h, g2l)
        s2h_ref[f, :] = hh
        s2l_ref[f, :] = ll

    @pl.when(sfirst_ref[i] == 1)
    def _():
        outh_ref[...] = jnp.zeros((OBp, LANES), dtype=outh_ref.dtype)
        outl_ref[...] = jnp.zeros((OBp, LANES), dtype=outl_ref.dtype)
    sh_src, sl_src, s2_rows = ((sch_ref, scl_ref, SR) if fin_direct
                               else (s2h_ref, s2l_ref, F1S))
    S2G = s2_rows // CHUNK
    for f in range(F2_max):
        sl = slice(f * CHUNK, (f + 1) * CHUNK)
        i1 = f2i1_ref[sl, :].astype(jnp.int32)     # drain = -1
        j = f2rt_ref[sl, :].astype(jnp.int32)
        sub = jnp.bitwise_and(i1, CHUNK - 1)
        grp = jnp.bitwise_and(jnp.right_shift(i1, 3), S2G - 1)
        drain = i1 < 0
        ph = [jnp.take_along_axis(
            sh_src[g * CHUNK:(g + 1) * CHUNK, :], sub, axis=0)
            for g in range(S2G)]
        pl2 = [jnp.take_along_axis(
            sl_src[g * CHUNK:(g + 1) * CHUNK, :], sub, axis=0)
            for g in range(S2G)]
        g1h = ph[0] if S2G == 1 else _tree_merge(ph, grp)
        g1l = pl2[0] if S2G == 1 else _tree_merge(pl2, grp)
        g1h = jnp.where(drain, jnp.float32(0), g1h)
        g1l = jnp.where(drain, jnp.float32(0), g1l)
        g2h = jnp.take_along_axis(g1h, j, axis=1)
        g2l = jnp.take_along_axis(g1l, j, axis=1)
        g = f2grp_ref[i, f]
        oh = outh_ref[pl.ds(g * CHUNK, CHUNK), :]
        ol = outl_ref[pl.ds(g * CHUNK, CHUNK), :]
        nh, nl = df64_add(oh, ol, g2h, g2l)
        outh_ref[pl.ds(g * CHUNK, CHUNK), :] = nh
        outl_ref[pl.ds(g * CHUNK, CHUNK), :] = nl


@functools.partial(jax.jit, static_argnames=("T", "GLW", "P", "F1_max",
                                             "F2_max", "F1S", "OBp",
                                             "n_steps", "n_slabs",
                                             "fin_direct", "interpret"))
def _fused_df64_blocks(tile_base, fin1_cnt, fin2_cnt, fin2_group,
                       step_slab, step_first, x2h, x2l, vhi, vlo,
                       meta_i1, meta_rt, fin1_i1, fin1_rt, fin2_i1,
                       fin2_rt, *, T: int, GLW: int,
                       P: int, F1_max: int, F2_max: int, F1S: int,
                       OBp: int, n_steps: int, n_slabs: int,
                       fin_direct: int = 0,
                       interpret: bool = False):
    rows_per_step = T * CHUNK
    gx8 = x2h.shape[0]
    f1a = fin1_i1.shape[0] // (n_steps * CHUNK)
    f2a = fin2_i1.shape[0] // (n_steps * CHUNK)

    def step_spec():
        return pl.BlockSpec((rows_per_step, LANES), lambda i, *p: (i, 0))

    def fin_spec(fm):
        return pl.BlockSpec((fm * CHUNK, LANES), lambda i, *p: (i, 0))

    def out_spec():
        return pl.BlockSpec((OBp, LANES),
                            lambda i, tb, f1, f2, fg, ss, sf: (ss[i], 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((gx8, LANES), lambda i, *p: (0, 0)),
            pl.BlockSpec((gx8, LANES), lambda i, *p: (0, 0)),
            step_spec(), step_spec(), step_spec(), step_spec(),
            fin_spec(f1a), fin_spec(f1a),
            fin_spec(f2a), fin_spec(f2a),
        ],
        out_specs=[out_spec(), out_spec()],
        scratch_shapes=[pltpu.VMEM((T * P, LANES), jnp.float32),
                        pltpu.VMEM((T * P, LANES), jnp.float32),
                        pltpu.VMEM((F1S, LANES), jnp.float32),
                        pltpu.VMEM((F1S, LANES), jnp.float32)],
    )
    kernel = functools.partial(_fused_df64_kernel, T=T, GLW=GLW, P=P,
                               F1_max=F1_max, F2_max=F2_max, F1S=F1S,
                               OBp=OBp, fin_direct=fin_direct)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_slabs * OBp, LANES),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((n_slabs * OBp, LANES),
                                        jnp.float32)],
        interpret=interpret,
    )(tile_base, fin1_cnt, fin2_cnt, fin2_group, step_slab, step_first,
      x2h, x2l, vhi, vlo, meta_i1, meta_rt, fin1_i1, fin1_rt,
      fin2_i1, fin2_rt)


class DF64FusedDevice:
    """f64-emulated SpMV on the fused resident-x layout: hi/lo value
    planes packed into IDENTICAL layouts (the pack engine is value-
    agnostic), one metadata set, df64-renormalizing in-step finish.
    Same (yh, yl) surface as DF64GStreamDevice so solvers and the API
    compose unchanged."""

    def __init__(self, packed_hi: FusedMatrix, packed_lo: FusedMatrix,
                 interpret: bool = False):
        self._uniform_slabs = _slabs_uniform(packed_hi)
        if not (np.array_equal(packed_hi.meta_i1, packed_lo.meta_i1)
                and np.array_equal(packed_hi.tile_base,
                                   packed_lo.tile_base)):
            raise ValueError("hi/lo fused packs diverged (pack engine "
                             "must be value-agnostic)")
        self.meta = packed_hi
        self.interpret = interpret
        self.vhi = jnp.asarray(packed_hi.values)
        self.vlo = jnp.asarray(packed_lo.values)
        self.meta_i1 = jnp.asarray(packed_hi.meta_i1)
        self.meta_rt = jnp.asarray(packed_hi.meta_rt)
        self.fin1_i1 = jnp.asarray(packed_hi.fin1_i1)
        self.fin1_rt = jnp.asarray(packed_hi.fin1_rt)
        self.fin2_i1 = jnp.asarray(packed_hi.fin2_i1)
        self.fin2_rt = jnp.asarray(packed_hi.fin2_rt)
        self.tile_base = jnp.asarray(packed_hi.tile_base)
        self.fin1_cnt = jnp.asarray(packed_hi.fin1_cnt)
        self.fin2_cnt = jnp.asarray(packed_hi.fin2_cnt)
        self.fin2_group = jnp.asarray(packed_hi.fin2_group)
        self.step_slab = jnp.asarray(packed_hi.step_slab)
        self.step_first = jnp.asarray(packed_hi.step_first)
        self.n_spills = int(packed_hi.spill_row.shape[0])
        if self.n_spills:
            self.spill_row = jnp.asarray(packed_hi.spill_row)
            self.spill_col = jnp.asarray(packed_hi.spill_col)
            self.spill_vh = jnp.asarray(packed_hi.spill_val)
            self.spill_vl = jnp.asarray(packed_lo.spill_val)

    @property
    def dtype(self):
        return np.dtype(np.float64)

    def prepare_x(self, x):
        from .f64emu import DF64, split_f64
        pad = self.meta.padded_cols - self.meta.nr_cols
        if isinstance(x, DF64):
            xh, xl = x.hi, x.lo
            if pad:
                xh = jnp.pad(xh, (0, pad))
                xl = jnp.pad(xl, (0, pad))
            return (xh.reshape(-1, STRIPE), xl.reshape(-1, STRIPE))
        if isinstance(x, jax.core.Tracer) or (isinstance(x, jax.Array)
                                              and not isinstance(
                                                  x, np.ndarray)):
            return self.prepare_x(DF64(jnp.asarray(x, jnp.float32)))
        xhi, xlo = split_f64(np.asarray(x, np.float64))
        if pad:
            xhi = np.pad(xhi, (0, pad))
            xlo = np.pad(xlo, (0, pad))
        return (jnp.asarray(xhi.reshape(-1, STRIPE)),
                jnp.asarray(xlo.reshape(-1, STRIPE)))

    def spmv(self, x, x_is_packed: bool = False):
        """Returns (y_hi, y_lo) f32 device arrays; join with join_f64."""
        from .f64emu import df64_add, df64_mul
        x2h, x2l = x if x_is_packed else self.prepare_x(x)
        m = self.meta
        bh, bl = _fused_df64_blocks(
            self.tile_base, self.fin1_cnt, self.fin2_cnt,
            self.fin2_group, self.step_slab, self.step_first,
            x2h, x2l, self.vhi, self.vlo, self.meta_i1, self.meta_rt,
            self.fin1_i1, self.fin1_rt, self.fin2_i1, self.fin2_rt,
            T=m.T, GLW=m.GLW, P=m.planes, F1_max=m.F1_max,
            F2_max=m.F2_max, F1S=m.F1S, OBp=m.OBp,
            n_steps=m.n_steps, n_slabs=m.n_slabs,
            fin_direct=m.fin_direct, interpret=self.interpret)
        fh, fl = bh.reshape(-1), bl.reshape(-1)
        sb = m.slab_bounds
        if self._uniform_slabs:
            yh = fh[:int(sb[-1])]
            yl = fl[:int(sb[-1])]
        else:
            ph = [jax.lax.dynamic_slice(
                fh, (s * m.OBp * LANES,), (int(sb[s + 1] - sb[s]),))
                for s in range(m.n_slabs)]
            pl2 = [jax.lax.dynamic_slice(
                fl, (s * m.OBp * LANES,), (int(sb[s + 1] - sb[s]),))
                for s in range(m.n_slabs)]
            yh = jnp.concatenate(ph) if len(ph) > 1 else ph[0]
            yl = jnp.concatenate(pl2) if len(pl2) > 1 else pl2[0]
        if self.n_spills:
            xsh = x2h.reshape(-1)
            xsl = x2l.reshape(-1)
            gh = jnp.take(xsh, self.spill_col)
            gl = jnp.take(xsl, self.spill_col)
            ah, al = df64_mul(self.spill_vh, self.spill_vl, gh, gl)
            uh = jnp.take(yh, self.spill_row)
            ul = jnp.take(yl, self.spill_row)
            nh, nl = df64_add(uh, ul, ah, al)
            yh = yh.at[self.spill_row].set(nh)
            yl = yl.at[self.spill_row].set(nl)
        return yh, yl

    def spmv_f64(self, x) -> np.ndarray:
        from .f64emu import join_f64
        yh, yl = self.spmv(x)
        return join_f64(np.asarray(yh), np.asarray(yl))


def pack_fused_df64(matrix, interpret: bool = False,
                    **kw) -> "DF64FusedDevice | None":
    """Build a DF64FusedDevice for an f64 CSR matrix, or None when the
    fused layout does not apply (x too wide for TWO resident planes,
    pathological structure) — callers fall back to DF64GStreamDevice."""
    from ..formats.csr import CSRMatrix
    from ..pack.fused import pack_fused
    from .f64emu import split_f64
    if matrix.nr_cols > MAX_RESIDENT_COLS_DF64:
        return None
    vhi, vlo = split_f64(matrix.values.astype(np.float64))
    m_hi = CSRMatrix(matrix.row_ptr, matrix.col_ind, vhi,
                     matrix.nr_rows, matrix.nr_cols)
    m_lo = CSRMatrix(matrix.row_ptr, matrix.col_ind, vlo,
                     matrix.nr_rows, matrix.nr_cols)
    ph = pack_fused(m_hi, **kw)
    if ph is None:
        return None
    pl_ = pack_fused(m_lo, Q=ph.Q, GLW=ph.GLW, T=ph.T, **{
        k: v for k, v in kw.items() if k not in ("Q", "GLW", "T")})
    if pl_ is None:
        return None
    return DF64FusedDevice(ph, pl_, interpret=interpret)


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
    d._uniform_slabs = _slabs_uniform(d.meta)
    (d.values, d.meta_i1, d.meta_rt, d.fin1_i1, d.fin1_rt,
     d.fin2_i1, d.fin2_rt,
     d.tile_base, d.fin1_cnt, d.fin2_cnt, d.fin2_group,
     d.step_slab, d.step_first, sr, sc, sv) = children
    if d.n_spills:
        d.spill_row, d.spill_col, d.spill_val = sr, sc, sv
    return d


jax.tree_util.register_pytree_node(FusedDevice, _fused_flatten,
                                   _fused_unflatten)


def _df64f_flatten(d):
    spills = ((d.spill_row, d.spill_col, d.spill_vh, d.spill_vl)
              if d.n_spills else (None, None, None, None))
    return ((d.vhi, d.vlo, d.meta_i1, d.meta_rt, d.fin1_i1, d.fin1_rt,
             d.fin2_i1, d.fin2_rt, d.tile_base, d.fin1_cnt, d.fin2_cnt,
             d.fin2_group, d.step_slab, d.step_first) + spills,
            (d.meta, d.interpret, d.n_spills))


def _df64f_unflatten(aux, children):
    d = object.__new__(DF64FusedDevice)
    d.meta, d.interpret, d.n_spills = aux
    d._uniform_slabs = _slabs_uniform(d.meta)
    (d.vhi, d.vlo, d.meta_i1, d.meta_rt, d.fin1_i1, d.fin1_rt,
     d.fin2_i1, d.fin2_rt, d.tile_base, d.fin1_cnt, d.fin2_cnt,
     d.fin2_group, d.step_slab, d.step_first, sr, sc, svh, svl) = children
    if d.n_spills:
        d.spill_row, d.spill_col = sr, sc
        d.spill_vh, d.spill_vl = svh, svl
    return d


jax.tree_util.register_pytree_node(DF64FusedDevice, _df64f_flatten,
                                   _df64f_unflatten)
