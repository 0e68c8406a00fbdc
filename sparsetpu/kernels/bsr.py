"""BSR SpMV: dense (8, 128) blocks, the VPU-natural sparse format.

Extension scoped by BASELINE.json ("BSR SpMV").  For matrices with
clustered structure, dense blocks remove all per-element metadata: the
kernel streams (8, 128) value blocks, fetches the matching x segment with
a scalar-prefetched dynamic slice (the block-column index plays the role
of the reference's per-block x transfer, csr_hw_wrapper.cpp:202-271), does
a broadcast multiply + lane reduction, and packs 16 block-row-sum vectors
per (8, 128) output tile (6% output traffic).  Block partials reduce by
block-row in one segment sum (blocks are row-major => sorted indices).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.csr import BSRMatrix
from ..utils.config import LANES, SUBLANES

BH, BW = SUBLANES, LANES     # native block shape (8, 128)
GROUP = 16                   # block row-sums packed per output tile


def _bsr_kernel(bcol_ref, x2_ref, blocks_ref, out_ref, *,
                blocks_per_step: int):
    step = pl.program_id(0)
    for g in range(blocks_per_step // GROUP):
        cols = []
        for b_in in range(GROUP):
            b = g * GROUP + b_in
            bc = bcol_ref[step * blocks_per_step + b]
            xseg = x2_ref[pl.ds(bc, 1), :]                     # (1, 128)
            prod = blocks_ref[b * BH:(b + 1) * BH, :] * xseg   # (8, 128)
            cols.append(jnp.sum(prod, axis=1, keepdims=True))  # (8, 1)
        tile = jnp.concatenate(
            cols + [jnp.zeros((BH, LANES - GROUP), dtype=out_ref.dtype)],
            axis=1)
        out_ref[g * BH:(g + 1) * BH, :] = tile


@functools.partial(jax.jit, static_argnames=("blocks_per_step", "n_steps",
                                             "interpret"))
def _bsr_partials(bcol, x2, blocks, *, blocks_per_step: int, n_steps: int,
                  interpret: bool):
    out_rows = n_steps * (blocks_per_step // GROUP) * BH
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((x2.shape[0], LANES), lambda i, bc: (0, 0)),
            pl.BlockSpec((blocks_per_step * BH, LANES),
                         lambda i, bc: (i, 0)),
        ],
        out_specs=pl.BlockSpec(((blocks_per_step // GROUP) * BH, LANES),
                               lambda i, bc: (i, 0)),
    )
    kernel = functools.partial(_bsr_kernel,
                               blocks_per_step=blocks_per_step)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, LANES), x2.dtype),
        interpret=interpret)(bcol, x2, blocks)


class BSRDevice:
    """Device-resident BSR matrix with a Pallas SpMV."""

    BLOCKS_PER_STEP = 64

    def __init__(self, m: BSRMatrix, interpret: bool = False):
        if m.block_shape != (BH, BW):
            raise ValueError(f"device BSR requires {(BH, BW)} blocks")
        self.interpret = interpret
        self.nr_rows, self.nr_cols = m.shape
        self.nr_block_rows = m.nr_block_rows
        nb = m.values.shape[0]
        bps = self.BLOCKS_PER_STEP
        pad = (-nb) % bps
        vals = np.concatenate(
            [m.values.astype(np.float32),
             np.zeros((pad, BH, BW), np.float32)], axis=0)
        bcol = np.concatenate([m.col_ind.astype(np.int32),
                               np.zeros(pad, np.int32)])
        brow = np.repeat(np.arange(m.nr_block_rows, dtype=np.int32),
                         np.diff(m.row_ptr))
        brow = np.concatenate(
            [brow, np.full(pad, m.nr_block_rows, np.int32)])
        self.n_blocks = nb + pad
        self.n_steps = self.n_blocks // bps
        self.blocks = jnp.asarray(vals.reshape(-1, BW))
        self.bcol = jnp.asarray(bcol)
        self.brow = jnp.asarray(brow)
        self.padded_cols = -(-self.nr_cols // BW) * BW
        # block-row reduction as a fixed-position final level: child
        # (block b, local row i) at position b*8+i belongs to y row
        # brow[b]*8+i (XLA segment-sum costs ~8 ns/element — it would
        # dominate the whole BSR SpMV)
        from .spmv_pallas import _FinalLevel
        rows_pad = self.nr_block_rows * BH
        child_row = (np.asarray(brow)[:, None].astype(np.int64) * BH
                     + np.arange(BH)[None, :]).reshape(-1)
        child_row[child_row >= rows_pad] = rows_pad
        self.final = _FinalLevel.build(child_row, rows_pad,
                                       interpret)
        self._rows_pad = rows_pad

    def spmv(self, x) -> jax.Array:
        x = jnp.asarray(x, jnp.float32)
        pad = self.padded_cols - self.nr_cols
        if pad:
            x = jnp.pad(x, (0, pad))
        x2 = x.reshape(-1, BW)
        parts = _bsr_partials(self.bcol, x2, self.blocks,
                              blocks_per_step=self.BLOCKS_PER_STEP,
                              n_steps=self.n_steps,
                              interpret=self.interpret)
        # parts: per 16-block group an (8, 128) tile whose lane b holds the
        # row-sums of block g*16+b => reshape to (n_blocks, 8)
        tiles = parts.reshape(self.n_blocks // GROUP, BH, LANES)
        parts8 = tiles[:, :, :GROUP].transpose(0, 2, 1).reshape(
            self.n_blocks, BH)
        if self.final is not None:
            y = self.final.apply(parts8.reshape(-1), self._rows_pad)
            return y[:self.nr_rows]
        ysum = jax.ops.segment_sum(parts8, self.brow,
                                   num_segments=self.nr_block_rows + 1,
                                   indices_are_sorted=True)
        return ysum[:self.nr_block_rows].reshape(-1)[:self.nr_rows]


def bsr_spmv(m: BSRMatrix, x, interpret: bool = False) -> jax.Array:
    return BSRDevice(m, interpret=interpret).spmv(x)
