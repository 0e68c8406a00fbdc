"""Pallas TPU SpMV kernel over the GStream packed format.

Re-design of the reference's device pipeline (spmv.cpp):
  * ``read_data_submatrix`` + ``stream_data_*`` (spmv.cpp:6-64) — the DRAM
    streaming/unpacking stages — become the Pallas grid pipeline: the
    BlockSpecs below stream value/index tiles HBM->VMEM, double-buffered by
    the compiler (the reference's DATAFLOW FIFOs, spmv.cpp:137-164).
  * the per-CU BRAM x copy (spmv.cpp:180-192) becomes the x-window BlockSpec
    indexed by the scalar-prefetched per-step window id (2D column blocking,
    csr_hw_wrapper.cpp:202-271, fused into one kernel launch).
  * ``compute_results`` (spmv.cpp:66-104) — the VF-wide MAC with row-end
    flag scan — becomes: dual gather (sublane gather over the x window +
    lane gather to route values to stream positions), a vector multiply,
    and a free sublane-axis reduction into per-chunk partial sums (chunks
    are single-row by construction, so no flag scan is needed).
  * ``write_back_results`` + host ``accum_results`` (spmv.cpp:106-120,
    csr_hw.cpp:1531-1565) become the chunk->row segment sum, fused on
    device via jax.ops.segment_sum (XLA finish).

The kernel processes ``tiles_per_step`` (8,128)-element tiles per grid step
and emits one partial sum per chunk; the grid is sequential on a TensorCore,
so steps pipeline DMA against compute exactly like the reference's dataflow
stages.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..pack.gather_stream import CHUNK, GStreamMatrix, LANES, STRIPE
from .spmv_xla import spmv_chunked_xla


def _spmv_kernel(step_window_ref, xw_ref, val_ref, cell_ref, route_ref,
                 out_ref, *, tiles_per_step: int, G: int):
    """One grid step: tiles_per_step tiles -> per-chunk partial sums.

    xw_ref:   (8G, 128) x window (VMEM, staged by BlockSpec)
    val_ref:  (tiles_per_step*8, 128) values, stream layout
    cell_ref: (tiles_per_step*8, 128) int16 per-cell local stripe index
    route_ref:(tiles_per_step*8, 128) int16 residue route
    out_ref:  (tiles_per_step, 128) f32 chunk sums
    """
    for t in range(tiles_per_step):
        sl = slice(t * CHUNK, (t + 1) * CHUNK)
        i1 = cell_ref[sl, :].astype(jnp.int32)
        j = route_ref[sl, :].astype(jnp.int32)
        if G == 1:
            g1 = jnp.take_along_axis(xw_ref[:, :], i1, axis=0)
        else:
            # chained sublane gathers over the G groups of the window
            sub = jnp.bitwise_and(i1, CHUNK - 1)
            grp = jnp.right_shift(i1, 3)
            g1 = jnp.zeros((CHUNK, LANES), dtype=xw_ref.dtype)
            for g in range(G):
                part = jnp.take_along_axis(
                    xw_ref[g * CHUNK:(g + 1) * CHUNK, :], sub, axis=0)
                g1 = jnp.where(grp == g, part, g1)
        g2 = jnp.take_along_axis(g1, j, axis=1)
        prod = val_ref[sl, :] * g2
        out_ref[t, :] = jnp.sum(prod, axis=0)


@functools.partial(jax.jit,
                   static_argnames=("tiles_per_step", "G", "n_steps",
                                    "interpret"))
def _gstream_chunk_sums(step_window, x2, values, cell_idx, route,
                        *, tiles_per_step: int, G: int, n_steps: int,
                        interpret: bool = False):
    """Run the Pallas kernel over all steps; returns (n_tiles, 128) chunk
    partial sums."""
    n_tiles = n_steps * tiles_per_step
    rows_per_step = tiles_per_step * CHUNK

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((CHUNK * G, LANES),
                         lambda i, sw: (sw[i], 0)),           # x window
            pl.BlockSpec((rows_per_step, LANES), lambda i, sw: (i, 0)),
            pl.BlockSpec((rows_per_step, LANES), lambda i, sw: (i, 0)),
            pl.BlockSpec((rows_per_step, LANES), lambda i, sw: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tiles_per_step, LANES),
                               lambda i, sw: (i, 0)),
    )
    kernel = functools.partial(_spmv_kernel, tiles_per_step=tiles_per_step,
                               G=G)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, LANES), x2.dtype),
        interpret=interpret,
    )(step_window, x2, values, cell_idx, route)


class GStreamDevice:
    """Device-resident packed matrix (the hw_matrix handed to spmv_hw,
    csr_hw_wrapper.cpp:193-288).  Holds the packed arrays as jax.Arrays so
    repeated spmv calls pay no host->device transfer.

    The row-reduction finish ("accum_results", csr_hw.cpp:1531-1565) is
    expressed as a second, much smaller SpMV: y = F @ chunk_sums where F is
    the 0/1 chunk->row incidence matrix (contiguous runs).  F is packed in
    the same GStream format and run through the same kernel, shrinking the
    XLA scatter by ~8x per level.  Levels are added while they pay off;
    the remainder is one small segment-sum."""

    # add an F level while chunks-per-row of the remainder exceeds this
    FINISH_LEVEL_MIN_RATIO = 3.0
    FINISH_MAX_LEVELS = 2

    def __init__(self, packed: GStreamMatrix, interpret: bool = False,
                 finish_levels: Optional[int] = None):
        self.meta = packed
        self.interpret = interpret
        self.values = jnp.asarray(packed.values)
        self.cell_idx = jnp.asarray(packed.cell_idx)
        self.route = jnp.asarray(packed.route)
        self.step_window = jnp.asarray(packed.step_window)
        self._build_finish(packed, finish_levels)

    def _build_finish(self, packed: GStreamMatrix,
                      finish_levels: Optional[int]):
        from ..formats.csr import CSRMatrix
        from ..pack.gather_stream import pack_gstream

        max_levels = (self.FINISH_MAX_LEVELS if finish_levels is None
                      else finish_levels)
        self.finish = []           # list of GStreamDevice-lite F levels
        chunk_row = packed.chunk_row.reshape(-1)
        trap = packed.nr_rows
        n_chunks = chunk_row.shape[0]
        level = 0
        while level < max_levels:
            valid = chunk_row != trap
            n_valid = int(valid.sum())
            rows_touched = np.unique(chunk_row[valid]).shape[0]
            if (n_valid < 4096 or rows_touched == 0
                    or n_valid / rows_touched < self.FINISH_LEVEL_MIN_RATIO):
                break
            cols = np.flatnonzero(valid).astype(np.int32)
            # chunk_row is only block-locally sorted; from_coo regroups
            f = CSRMatrix.from_coo(chunk_row[valid], cols,
                                   np.ones(n_valid, np.float32),
                                   trap, n_chunks, sum_duplicates=False)
            fp = pack_gstream(f)
            fdev = _FLevel(fp, self.interpret)
            self.finish.append(fdev)
            chunk_row = fp.chunk_row.reshape(-1)
            trap = fp.nr_rows
            n_chunks = chunk_row.shape[0]
            level += 1
        self.chunk_row = jnp.asarray(chunk_row)
        self._final_trap = trap

    @property
    def dtype(self):
        return self.values.dtype

    def prepare_x(self, x) -> jax.Array:
        """Pack the x vector into the (S, 128) stripe matrix — the
        write_csr_hw_vector analogue (csr_hw.cpp:1470-1488), zero-padding
        past nr_cols (csr_hw.cpp:1480-1481)."""
        x = jnp.asarray(x, dtype=self.dtype)
        pad = self.meta.padded_cols - self.meta.nr_cols
        if pad:
            x = jnp.pad(x, (0, pad))
        return x.reshape(-1, STRIPE)

    def spmv(self, x, x_is_packed: bool = False) -> jax.Array:
        x2 = x if x_is_packed else self.prepare_x(x)
        chunk_sums = _gstream_chunk_sums(
            self.step_window, x2, self.values, self.cell_idx, self.route,
            tiles_per_step=self.meta.tiles_per_step, G=self.meta.G,
            n_steps=self.meta.n_steps, interpret=self.interpret)
        for f in self.finish:
            chunk_sums = f.apply(chunk_sums)
        return spmv_chunked_xla(chunk_sums.reshape(-1), self.chunk_row,
                                self.meta.nr_rows)


class _FLevel:
    """One packed finish level: chunk_sums -> coarser partial sums."""

    def __init__(self, fp: GStreamMatrix, interpret: bool):
        self.meta = fp
        self.interpret = interpret
        self.values = jnp.asarray(fp.values)
        self.cell_idx = jnp.asarray(fp.cell_idx)
        self.route = jnp.asarray(fp.route)
        self.step_window = jnp.asarray(fp.step_window)

    def apply(self, chunk_sums: jax.Array) -> jax.Array:
        flat = chunk_sums.reshape(-1)
        pad = self.meta.padded_cols - flat.shape[0]
        if pad > 0:
            flat = jnp.pad(flat, (0, pad))
        x2 = flat[:self.meta.padded_cols].reshape(-1, STRIPE)
        return _gstream_chunk_sums(
            self.step_window, x2, self.values, self.cell_idx, self.route,
            tiles_per_step=self.meta.tiles_per_step, G=self.meta.G,
            n_steps=self.meta.n_steps, interpret=self.interpret)


def spmv_gstream(packed: GStreamMatrix, x, interpret: bool = False):
    """One-shot convenience wrapper (pack fresh device arrays each call)."""
    return GStreamDevice(packed, interpret=interpret).spmv(x)
