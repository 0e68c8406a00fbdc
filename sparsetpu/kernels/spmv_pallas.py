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


def _spmv_kernel_mw(step_win_ref, *refs, tiles_per_step: int, G: int,
                    nw: int):
    """Multi-window variant: ``nw`` independently positioned x windows per
    step (used by the final reduction level, whose children live in the
    previous level's per-section row-sorted ranges).  Cell values encode
    (window, local stripe) as win * 8G + stripe."""
    xw_refs = refs[:nw]
    val_ref, cell_ref, route_ref, out_ref = refs[nw:]
    for t in range(tiles_per_step):
        sl = slice(t * CHUNK, (t + 1) * CHUNK)
        i1 = cell_ref[sl, :].astype(jnp.int32)
        j = route_ref[sl, :].astype(jnp.int32)
        sub = jnp.bitwise_and(i1, CHUNK - 1)
        grp = jnp.right_shift(i1, 3)          # (window * G + group)
        g1 = jnp.zeros((CHUNK, LANES), dtype=val_ref.dtype)
        for w in range(nw):
            for g in range(G):
                part = jnp.take_along_axis(
                    xw_refs[w][g * CHUNK:(g + 1) * CHUNK, :], sub, axis=0)
                g1 = jnp.where(grp == w * G + g, part, g1)
        g2 = jnp.take_along_axis(g1, j, axis=1)
        out_ref[t, :] = jnp.sum(val_ref[sl, :] * g2, axis=0)


@functools.partial(jax.jit,
                   static_argnames=("tiles_per_step", "G", "n_steps", "nw",
                                    "interpret"))
def _gstream_chunk_sums_mw(step_windows, x2, values, cell_idx, route, *,
                           tiles_per_step: int, G: int, n_steps: int,
                           nw: int, interpret: bool = False):
    """step_windows: (n_steps, nw) int32 block-row indices (units of 8G)."""
    n_tiles = n_steps * tiles_per_step
    rows_per_step = tiles_per_step * CHUNK

    def win_spec(b):
        return pl.BlockSpec((CHUNK * G, LANES),
                            lambda i, sw, b=b: (sw[i, b], 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[win_spec(b) for b in range(nw)] + [
            pl.BlockSpec((rows_per_step, LANES), lambda i, sw: (i, 0)),
            pl.BlockSpec((rows_per_step, LANES), lambda i, sw: (i, 0)),
            pl.BlockSpec((rows_per_step, LANES), lambda i, sw: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tiles_per_step, LANES),
                               lambda i, sw: (i, 0)),
    )
    kernel = functools.partial(_spmv_kernel_mw,
                               tiles_per_step=tiles_per_step, G=G, nw=nw)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, LANES), x2.dtype),
        interpret=interpret,
    )(step_windows, *([x2] * nw), values, cell_idx, route)


class GStreamDevice:
    """Device-resident packed matrix (the hw_matrix handed to spmv_hw,
    csr_hw_wrapper.cpp:193-288).  Holds the packed arrays as jax.Arrays so
    repeated spmv calls pay no host->device transfer.

    The row-reduction finish ("accum_results", csr_hw.cpp:1531-1565) runs
    entirely on device: XLA scatter/gather cost ~7-9 ns *per element* on
    TPU (measured), so the reduction is expressed as further SpMVs in the
    same GStream kernel.  F levels (0/1 chunk->row incidence matrices,
    free placement) reduce to <= FINAL_FANIN row-localized partials per
    row; a final fixed-position level then writes the y vector directly:
    its output grid cell (r // 128, r %% 128) IS y[r].  Only pack-time
    spill leftovers (rare residue-cell conflicts in the final level) take
    the slow XLA scatter path."""

    FINAL_FANIN = 8      # final level gathers at most 8 partials per row

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

        self.finish = []           # generic F reduction levels
        self.final = None          # fixed-position level writing y
        chunk_row = packed.chunk_row.reshape(-1)
        trap = packed.nr_rows
        n_chunks = chunk_row.shape[0]
        sections = packed.sections
        guard = 0
        while True:
            guard += 1
            valid = chunk_row != trap
            counts = np.bincount(chunk_row[valid], minlength=trap)
            max_per_row = int(counts.max()) if counts.size else 0
            localized = len(self.finish) > 0
            few_sections = (sections is not None
                            and sections.shape[0] <= _FinalLevel.MAX_NW)
            if (localized and few_sections
                    and max_per_row <= self.FINAL_FANIN) or guard > 8:
                break
            cols = np.flatnonzero(valid).astype(np.int32)
            f = CSRMatrix.from_coo(chunk_row[valid], cols,
                                   np.ones(int(valid.sum()), np.float32),
                                   trap, n_chunks, sum_duplicates=False)
            fp = pack_gstream(f, shuffle_lanes=False)
            self.finish.append(_FLevel(fp, self.interpret))
            chunk_row = fp.chunk_row.reshape(-1)
            n_chunks = chunk_row.shape[0]
            sections = fp.sections
        self.final = _FinalLevel.build(chunk_row, trap, n_chunks,
                                       sections, self.interpret)
        if self.final is None:
            # pathological locality: keep the XLA segment-sum fallback
            self.chunk_row = jnp.asarray(chunk_row)

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
        if self.final is not None:
            return self.final.apply(chunk_sums, self.meta.nr_rows)
        return spmv_chunked_xla(chunk_sums.reshape(-1), self.chunk_row,
                                self.meta.nr_rows)


class _FinalLevel:
    """Fixed-position reduction level: output grid cell (r//128, r%128)
    holds y[r], so the whole SpMV finishes on device with no XLA scatter.

    Children are the <= FINAL_FANIN per-row partials of the last F level.
    That level's output is row-sorted *within each of its column-block
    sections*, so one scalar-indexed x window per section (multi-window
    kernel, nw <= MAX_NW) covers every child of a step.  Rows whose
    children miss their step's aligned windows, plus residue-cell
    conflicts, spill to a small XLA scatter."""

    MAX_NW = 8

    def __init__(self, step_windows, values, cell_idx, route, n_steps,
                 tiles_per_step, G, nw, x_pad_rows, spill_pos, spill_row,
                 interpret):
        self.step_windows = jnp.asarray(step_windows)
        self.values = jnp.asarray(values)
        self.cell_idx = jnp.asarray(cell_idx)
        self.route = jnp.asarray(route)
        self.n_steps = n_steps
        self.tiles_per_step = tiles_per_step
        self.G = G
        self.nw = nw
        self.x_pad_rows = x_pad_rows
        self.spill_pos = jnp.asarray(spill_pos) if spill_pos.size else None
        self.spill_row = jnp.asarray(spill_row) if spill_row.size else None
        self.interpret = interpret
        self.n_spills = int(spill_pos.size)

    @classmethod
    def build(cls, chunk_row, nr_rows, n_positions, sections, interpret,
              max_spill_frac: float = 0.2):
        from ..pack.gather_stream import _match_tiles

        if sections is None or sections.shape[0] > cls.MAX_NW:
            return None
        nw = int(sections.shape[0])
        sec_start_pos = sections[:, 0] * LANES

        valid = np.flatnonzero(chunk_row != nr_rows)
        rows = chunk_row[valid].astype(np.int64)
        pos = valid.astype(np.int64)
        order = np.argsort(rows, kind="stable")
        rows, pos = rows[order], pos[order]
        if rows.shape[0]:
            starts = np.concatenate([[0],
                                     np.flatnonzero(np.diff(rows)) + 1])
            counts = np.diff(np.concatenate([starts, [rows.shape[0]]]))
            rank = np.arange(rows.shape[0]) - np.repeat(starts, counts)
        else:
            rank = np.zeros(0, np.int64)
        sec = np.searchsorted(sec_start_pos, pos, side="right") - 1

        n_tiles = max(1, -(-nr_rows // LANES))
        best = None
        for G_u in (4, 8, 16, 32):
            for tps in (64, 32, 16, 8):
                nt_pad = -(-n_tiles // tps) * tps
                n_steps = nt_pad // tps
                win = G_u * 1024
                step_of = (rows // LANES) // tps
                w = np.zeros((n_steps, nw), dtype=np.int64)
                in_win = np.zeros(rows.shape[0], dtype=bool)
                key = step_of * nw + sec
                order2 = np.argsort(key, kind="stable")
                k_sorted = key[order2]
                grp_starts = np.concatenate(
                    [[0], np.flatnonzero(np.diff(k_sorted)) + 1])
                for gs, ge in zip(grp_starts, np.concatenate(
                        [grp_starts[1:], [k_sorted.shape[0]]])):
                    idxs = order2[gs:ge]
                    kk = int(key[idxs[0]])
                    s_, b_ = kk // nw, kk % nw
                    wv = int(pos[idxs].min()) // win
                    w[s_, b_] = wv
                    in_win[idxs] = (pos[idxs] // win) == wv
                spills = int((~in_win).sum())
                cand = (spills, G_u * nw, -tps, tps, G_u, nt_pad, n_steps,
                        w, in_win)
                if best is None or cand[:3] < best[:3]:
                    best = cand
            if best[0] == 0:
                break
        spills, _, _, tps, G_u, nt_pad, n_steps, w, in_win = best
        if rows.shape[0] and spills / rows.shape[0] > max_spill_frac:
            return None

        step_of = (rows // LANES) // tps
        local_stripe = (pos // STRIPE
                        - w[step_of, sec] * (CHUNK * G_u))
        cell_val = sec * (CHUNK * G_u) + local_stripe
        ok = in_win & (local_stripe >= 0) & (local_stripe < CHUNK * G_u)
        slot = _match_tiles(nt_pad, rows, rank, pos % STRIPE, cell_val,
                            ok)
        placed = slot >= 0

        vals = np.zeros((nt_pad, CHUNK, LANES), dtype=np.float32)
        cells = np.zeros((nt_pad, CHUNK, LANES), dtype=np.int16)
        route = np.zeros((nt_pad, CHUNK, LANES), dtype=np.int16)
        t_of = (rows // LANES)[placed]
        l_of = (rows % LANES)[placed]
        s_of = slot[placed].astype(np.int64)
        r_of = (pos % STRIPE)[placed]
        vals[t_of, s_of, l_of] = 1.0
        route[t_of, s_of, l_of] = r_of
        cells[t_of, s_of, r_of] = cell_val[placed]

        x_pad_rows = (int(w.max()) + 1) * CHUNK * G_u
        x_pad_rows = max(x_pad_rows, -(-n_positions // STRIPE))
        x_pad_rows = -(-x_pad_rows // (CHUNK * G_u)) * (CHUNK * G_u)
        spill_mask = ~placed
        return cls(w.astype(np.int32),
                   vals.reshape(nt_pad * CHUNK, LANES),
                   cells.reshape(nt_pad * CHUNK, LANES),
                   route.reshape(nt_pad * CHUNK, LANES),
                   n_steps, tps, G_u, nw, x_pad_rows,
                   pos[spill_mask].astype(np.int32),
                   rows[spill_mask].astype(np.int32), interpret)

    def apply(self, chunk_sums: jax.Array, nr_rows: int) -> jax.Array:
        flat = chunk_sums.reshape(-1)
        need = self.x_pad_rows * STRIPE
        if flat.shape[0] < need:
            flat = jnp.pad(flat, (0, need - flat.shape[0]))
        x2 = flat[:need].reshape(-1, STRIPE)
        grid = _gstream_chunk_sums_mw(
            self.step_windows, x2, self.values, self.cell_idx, self.route,
            tiles_per_step=self.tiles_per_step, G=self.G,
            n_steps=self.n_steps, nw=self.nw, interpret=self.interpret)
        y = grid.reshape(-1)[:nr_rows]
        if self.spill_pos is not None:
            y = y.at[self.spill_row].add(
                jnp.take(chunk_sums.reshape(-1), self.spill_pos,
                         mode="clip"))
        return y


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


# ---------------------------------------------------------------------------
# pytree registration
#
# The packed device arrays must flow through jit as *arguments*, never as
# closure constants: a closed-over jax.Array is baked into the HLO as a
# literal, which for a 10M-nnz matrix inflates the compile payload by
# ~100 MB (and breaks remote-compile size limits).  Registering the device
# classes as pytrees lets users write ``jax.jit(lambda A, x: A.spmv(x))``
# and solvers pass the matrix through scan/fori_loop carries.
# ---------------------------------------------------------------------------

def _flevel_flatten(f):
    return ((f.values, f.cell_idx, f.route, f.step_window),
            (f.meta, f.interpret))


def _flevel_unflatten(aux, children):
    f = object.__new__(_FLevel)
    f.meta, f.interpret = aux
    f.values, f.cell_idx, f.route, f.step_window = children
    return f


def _final_flatten(f):
    return ((f.step_windows, f.values, f.cell_idx, f.route,
             f.spill_pos, f.spill_row),
            (f.n_steps, f.tiles_per_step, f.G, f.nw, f.x_pad_rows,
             f.interpret, f.n_spills))


def _final_unflatten(aux, children):
    f = object.__new__(_FinalLevel)
    (f.n_steps, f.tiles_per_step, f.G, f.nw, f.x_pad_rows,
     f.interpret, f.n_spills) = aux
    (f.step_windows, f.values, f.cell_idx, f.route,
     f.spill_pos, f.spill_row) = children
    return f


def _device_flatten(d):
    return ((d.values, d.cell_idx, d.route, d.step_window,
             tuple(d.finish), d.final, getattr(d, "chunk_row", None)),
            (d.meta, d.interpret))


def _device_unflatten(aux, children):
    d = object.__new__(GStreamDevice)
    d.meta, d.interpret = aux
    (d.values, d.cell_idx, d.route, d.step_window,
     finish, d.final, chunk_row) = children
    d.finish = list(finish)
    if chunk_row is not None:
        d.chunk_row = chunk_row
    return d


jax.tree_util.register_pytree_node(_FLevel, _flevel_flatten,
                                   _flevel_unflatten)
jax.tree_util.register_pytree_node(_FinalLevel, _final_flatten,
                                   _final_unflatten)
jax.tree_util.register_pytree_node(GStreamDevice, _device_flatten,
                                   _device_unflatten)
