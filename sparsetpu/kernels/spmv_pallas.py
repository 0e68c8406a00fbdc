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
    csr_hw.cpp:1531-1565) become the on-device *finish*: heavy rows
    (> HEAVY_CAP partials) are pre-reduced by incidence F levels
    (``_FLevel``), and everything lands in one gather-accumulate final
    level (``_FinalLevel``) whose output grid cell (r//128, r%128) IS
    y[r] — no XLA scatter on the hot path (XLA scatter costs ~8 ns per
    element on TPU; only rare placement spills take it).

The kernel processes ``tiles_per_step`` (8,128)-element tiles per grid step
and emits one partial sum per chunk; the grid is sequential on a TensorCore,
so steps pipeline DMA against compute exactly like the reference's dataflow
stages.  The final level's configuration is chosen per matrix by an
on-chip-fitted cost model and built by the native C++ builder
(native/final_builder.cpp) when present.
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


def combine_meta(cell_idx: np.ndarray, route: np.ndarray) -> np.ndarray:
    """Fuse the per-cell stripe index (< 8G <= 256, 8 bits) and the lane
    route (< 128, 7 bits) into one int16 stream: meta = cell << 7 | route.
    One stream instead of two cuts the kernel's metadata traffic from
    3 B/slot to 2 B/slot."""
    return ((cell_idx.astype(np.int32) << 7)
            | route.astype(np.int32) & 0x7F).astype(np.int16)


def _split_meta(meta_i32):
    """In-kernel inverse of combine_meta (meta widened to int32)."""
    i1 = jnp.right_shift(meta_i32, 7)
    j = jnp.bitwise_and(meta_i32, 0x7F)
    return i1, j


def _spmv_kernel(step_window_ref, xw_ref, val_ref, meta_ref,
                 out_ref, *, tiles_per_step: int, G: int, P: int = 1):
    """One grid step: tiles_per_step tiles -> per-chunk partial sums.

    xw_ref:   (8G, 128) x window (VMEM, staged by BlockSpec)
    val_ref:  (tiles_per_step*8, 128) values, stream layout
    meta_ref: (tiles_per_step*8, 128) int16 combined (cell << 7 | route)
    out_ref:  (tiles_per_step*P, 128) f32 chunk sums, P planes per tile
              (P = 8/Q where Q is the pack quantum; plane p sums
              sublanes [p*Q, (p+1)*Q) — the VF-wide accumulator tree of
              compute_results, spmv.cpp:91-97, one emit per chunk)
    """
    Q = CHUNK // P
    for t in range(tiles_per_step):
        sl = slice(t * CHUNK, (t + 1) * CHUNK)
        m32 = jnp.bitwise_and(meta_ref[sl, :].astype(jnp.int32), 0x7FFF)
        i1, j = _split_meta(m32)
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
        if P == 1:
            out_ref[t, :] = jnp.sum(prod, axis=0)
        else:
            for p in range(P):
                out_ref[t * P + p, :] = jnp.sum(
                    prod[p * Q:(p + 1) * Q, :], axis=0)


def _spmv_kernel_v2(step_window_ref, tb_ref, xw_ref, val_ref, meta_ref,
                    out_ref, *, tiles_per_step: int, GL: int, P: int = 1):
    """v2: each tile gathers from GL window groups at a per-tile dynamic
    sublane base (tb_ref, scalar-prefetched) — the select chain costs
    O(GL) regardless of the staged window size G (measured on v5e:
    116 Gslot/s at G=32/GL=1 vs 46 for the full chain)."""
    i = pl.program_id(0)
    Q = CHUNK // P
    for t in range(tiles_per_step):
        sl = slice(t * CHUNK, (t + 1) * CHUNK)
        b = tb_ref[i, t]
        m32 = jnp.bitwise_and(meta_ref[sl, :].astype(jnp.int32), 0x7FFF)
        i1, j = _split_meta(m32)
        xwin = xw_ref[pl.ds(b * CHUNK, CHUNK * GL), :]
        if GL == 1:
            g1 = jnp.take_along_axis(xwin, i1, axis=0)
        else:
            sub = jnp.bitwise_and(i1, CHUNK - 1)
            grp = jnp.right_shift(i1, 3)
            g1 = jnp.zeros((CHUNK, LANES), dtype=xw_ref.dtype)
            for g in range(GL):
                part = jnp.take_along_axis(
                    xwin[g * CHUNK:(g + 1) * CHUNK, :], sub, axis=0)
                g1 = jnp.where(grp == g, part, g1)
        g2 = jnp.take_along_axis(g1, j, axis=1)
        prod = val_ref[sl, :] * g2
        if P == 1:
            out_ref[t, :] = jnp.sum(prod, axis=0)
        else:
            for p in range(P):
                out_ref[t * P + p, :] = jnp.sum(
                    prod[p * Q:(p + 1) * Q, :], axis=0)


@functools.partial(jax.jit,
                   static_argnames=("tiles_per_step", "G", "n_steps", "P",
                                    "GL", "interpret"))
def _gstream_chunk_sums(step_window, x2, values, meta, *,
                        tiles_per_step: int, G: int, n_steps: int,
                        P: int = 1, GL: int = 0, tile_base=None,
                        interpret: bool = False):
    """Run the Pallas kernel over all steps; returns (n_tiles*P, 128)
    chunk partial sums.  ``meta`` is the combined (cell << 7 | route)
    stream.  GL > 0 selects the v2 per-tile-base kernel; ``tile_base``
    must then be the (n_steps, tiles_per_step) int32 group offsets."""
    n_tiles = n_steps * tiles_per_step
    rows_per_step = tiles_per_step * CHUNK

    if GL:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((CHUNK * G, LANES),
                             lambda i, sw, tb: (sw[i], 0)),   # x window
                pl.BlockSpec((rows_per_step, LANES),
                             lambda i, sw, tb: (i, 0)),
                pl.BlockSpec((rows_per_step, LANES),
                             lambda i, sw, tb: (i, 0)),
            ],
            out_specs=pl.BlockSpec((tiles_per_step * P, LANES),
                                   lambda i, sw, tb: (i, 0)),
        )
        kernel = functools.partial(_spmv_kernel_v2,
                                   tiles_per_step=tiles_per_step,
                                   GL=GL, P=P)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_tiles * P, LANES), x2.dtype),
            interpret=interpret,
        )(step_window, tile_base, x2, values, meta)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((CHUNK * G, LANES),
                         lambda i, sw: (sw[i], 0)),           # x window
            pl.BlockSpec((rows_per_step, LANES), lambda i, sw: (i, 0)),
            pl.BlockSpec((rows_per_step, LANES), lambda i, sw: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tiles_per_step * P, LANES),
                               lambda i, sw: (i, 0)),
    )
    kernel = functools.partial(_spmv_kernel, tiles_per_step=tiles_per_step,
                               G=G, P=P)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * P, LANES), x2.dtype),
        interpret=interpret,
    )(step_window, x2, values, meta)


def _final_kernel(sw_ref, *refs, tiles_per_step: int, G: int, nw: int):
    """Gather-accumulate final level (no values stream).

    Each grid step covers one fixed 128*tps-row output range with up to
    ``nw`` dynamically positioned x windows; several *instances* of the
    same output range appear consecutively in the grid, accumulating into
    the VMEM-resident out block (first instance initializes it).  Cell
    values encode (window, local stripe) as win * 8G + stripe; cells set
    to the out-of-range drain value contribute zero via the select chain.
    """
    xw_refs = refs[:nw]
    cell_ref, route_ref, out_ref = refs[nw:]
    i = pl.program_id(0)
    first = sw_ref[i, nw] == 1
    parts = []
    for t in range(tiles_per_step):
        sl = slice(t * CHUNK, (t + 1) * CHUNK)
        i1 = cell_ref[sl, :].astype(jnp.int32)
        j = route_ref[sl, :].astype(jnp.int32)
        sub = jnp.bitwise_and(i1, CHUNK - 1)
        grp = jnp.right_shift(i1, 3)          # window * G + group (or drain)
        g1 = jnp.zeros((CHUNK, LANES), dtype=out_ref.dtype)
        for w in range(nw):
            for g in range(G):
                part = jnp.take_along_axis(
                    xw_refs[w][g * CHUNK:(g + 1) * CHUNK, :], sub, axis=0)
                g1 = jnp.where(grp == w * G + g, part, g1)
        g2 = jnp.take_along_axis(g1, j, axis=1)
        parts.append(jnp.sum(g2, axis=0))
    acc = jnp.stack(parts, axis=0)

    @pl.when(first)
    def _():
        out_ref[...] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[...] = out_ref[...] + acc


@functools.partial(jax.jit,
                   static_argnames=("tiles_per_step", "G", "n_steps", "nw",
                                    "n_out_tiles", "interpret"))
def _final_gather_sums(step_meta, x2, cell_idx, route, *,
                       tiles_per_step: int, G: int, n_steps: int, nw: int,
                       n_out_tiles: int, interpret: bool = False):
    """step_meta: (n_steps, nw + 2) int32 — per step: nw window block-row
    indices (units of 8G), a first-instance flag, and the output block
    index (units of tiles_per_step out tiles)."""
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
        ],
        out_specs=pl.BlockSpec((tiles_per_step, LANES),
                               lambda i, sw: (sw[i, nw + 1], 0)),
    )
    kernel = functools.partial(_final_kernel,
                               tiles_per_step=tiles_per_step, G=G, nw=nw)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out_tiles, LANES), x2.dtype),
        interpret=interpret,
    )(step_meta, *([x2] * nw), cell_idx, route)


class GStreamDevice:
    """Device-resident packed matrix (the hw_matrix handed to spmv_hw,
    csr_hw_wrapper.cpp:193-288).  Holds the packed arrays as jax.Arrays so
    repeated spmv calls pay no host->device transfer.

    The row-reduction finish ("accum_results", csr_hw.cpp:1531-1565) runs
    entirely on device: XLA scatter/gather costs ~8 ns *per element* on
    TPU (measured), so heavy rows (> HEAVY_CAP partials) are pre-reduced
    by 0/1-incidence F levels expressed in the same GStream kernel, and
    everything else lands in one gather-accumulate final level whose
    output grid cell (r // 128, r %% 128) IS y[r].  Only pack-time spill
    leftovers (rare placement conflicts) take the slow XLA scatter path."""

    HEAVY_CAP = 32       # rows with more partials get an F pre-reduction

    def __init__(self, packed: GStreamMatrix, interpret: bool = False,
                 finish_levels: Optional[int] = None, value_dtype=None):
        self.meta = packed
        self.interpret = interpret
        # value_dtype=bfloat16 halves the value stream (the "ML precision"
        # speed mode; ~8-bit mantissa, see default_tolerance)
        self.values = jnp.asarray(packed.values, dtype=value_dtype)
        self.meta16 = jnp.asarray(combine_meta(packed.cell_idx,
                                               packed.route))
        self.step_window = jnp.asarray(packed.step_window)
        self.tile_base = (jnp.asarray(packed.tile_base.reshape(
            packed.n_steps, packed.tiles_per_step))
            if packed.GL else None)
        self._build_finish(packed, finish_levels)

    def _build_finish(self, packed: GStreamMatrix,
                      finish_levels: Optional[int]):
        """Build the chunk->row reduction: heavy rows (> HEAVY_CAP
        partials) get incidence F levels whose outputs extend the position
        space; all remaining partials are consumed by one multi-pass
        fixed-position final level (output grid cell (r//128, r%128) IS
        y[r]).  Leftover spills take a small XLA scatter; if the final
        cannot be built at all, the whole reduction falls back to XLA
        segment-sum over the combined vector."""
        from ..formats.csr import CSRMatrix
        from ..pack.gather_stream import pack_gstream

        self.finish = []           # F levels (heavy-row pre-reduction)
        self.final = None
        trap = packed.nr_rows
        chunk_row = packed.chunk_row.reshape(-1).astype(np.int64).copy()
        if packed.ordered:
            # row-major positions: the flat V2 final consumes everything
            # in one level (per-out-tile dynamic windows); heavy rows
            # (> PASS_CAP passes) would spill it back to legacy
            counts = np.bincount(
                chunk_row[chunk_row != trap], minlength=1)
            if counts.size == 0 or counts.max() <= \
                    _FinalLevelV2.PASS_CAP * CHUNK:
                self.final = _FinalLevelV2.build(
                    chunk_row, trap, packed.sections, packed.planes,
                    self.interpret)
                if self.final is None and \
                        packed.sections.shape[0] > 8:
                    # wide-column matrices (> 8 column blocks): split
                    # the sections into groups of <= 8 and sum one flat
                    # V2 final per group — the r2 VERDICT's "nwin > 8
                    # falls off the flat cliff" fix (missing #4)
                    self.final = _FinalLevelMulti.build(
                        chunk_row, trap, packed.sections, packed.planes,
                        self.interpret)
                if self.final is not None:
                    return
        for _ in range(3):
            valid = chunk_row != trap
            if not valid.any():
                break
            counts = np.bincount(chunk_row[valid], minlength=trap)
            if counts.size == 0 or counts.max() <= self.HEAVY_CAP:
                break
            heavy = counts > self.HEAVY_CAP
            hmask = np.zeros(chunk_row.shape[0], dtype=bool)
            hmask[valid] = heavy[chunk_row[valid]]
            hpos = np.flatnonzero(hmask)
            f_csr = CSRMatrix.from_coo(
                chunk_row[hpos].astype(np.int64), hpos.astype(np.int64),
                np.ones(hpos.shape[0], np.float32),
                trap, chunk_row.shape[0], sum_duplicates=False)
            fp = pack_gstream(f_csr, shuffle_lanes=False)
            self.finish.append(_FLevel(fp, self.interpret))
            chunk_row[hpos] = trap   # consumed by the F level
            chunk_row = np.concatenate(
                [chunk_row, fp.chunk_row.reshape(-1).astype(np.int64)])
        self.final = _FinalLevel.build(chunk_row, trap, self.interpret)
        if self.final is None:
            # pathological placement: XLA segment-sum fallback
            self.chunk_row = jnp.asarray(chunk_row.astype(np.int32))

    @property
    def dtype(self):
        return self.values.dtype

    def prepare_x(self, x) -> jax.Array:
        """Pack the x vector into the (S, 128) stripe matrix — the
        write_csr_hw_vector analogue (csr_hw.cpp:1470-1488), zero-padding
        past nr_cols (csr_hw.cpp:1480-1481).  x stays f32 even in the
        bf16 value mode (products promote to f32)."""
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
        chunk_sums = _gstream_chunk_sums(
            self.step_window, x2, self.values, self.meta16,
            tiles_per_step=self.meta.tiles_per_step, G=self.meta.G,
            n_steps=self.meta.n_steps, P=self.meta.planes,
            GL=self.meta.GL, tile_base=self.tile_base,
            interpret=self.interpret)
        return self.finish_vec(chunk_sums)

    def finish_vec(self, chunk_sums: jax.Array) -> jax.Array:
        """chunk partial sums -> y (the on-device accum_results,
        csr_hw.cpp:1531-1565).  F levels append their outputs to the
        position vector; the final level (or the XLA fallback) consumes
        the combined vector."""
        vec = chunk_sums.reshape(-1)
        for f in self.finish:
            vec = jnp.concatenate([vec, f.apply(vec).reshape(-1)])
        if self.final is not None:
            return self.final.apply(vec, self.meta.nr_rows)
        return spmv_chunked_xla(vec, self.chunk_row, self.meta.nr_rows)


def _rank_in_group(keys):
    """Per-element rank within its key group; keys need not be sorted.
    Returns (rank, order) where order sorts by key (stable)."""
    order = np.argsort(keys, kind="stable")
    ks = keys[order]
    if ks.shape[0] == 0:
        return np.zeros(0, np.int64), order
    starts = np.concatenate([[0], np.flatnonzero(np.diff(ks)) + 1])
    counts = np.diff(np.concatenate([starts, [ks.shape[0]]]))
    rank_sorted = np.arange(ks.shape[0]) - np.repeat(starts, counts)
    rank = np.empty_like(rank_sorted)
    rank[order] = rank_sorted
    return rank, order


def _assign_passes(rows, pos, step_of, win, nw_max, p_cap, n_steps):
    """Greedy pass/window assignment for the final level.

    Each pass gives every row 8 gather slots (one chunk at its fixed
    (r//128, r%128) cell) and every output step up to ``nw_max``
    dynamically chosen aligned x-windows of ``win`` positions.  Children
    are placed in the earliest pass whose fan-in and window budget admit
    them.  Returns (pass_of [-1 = unassigned], slot_of, W[p, step, nw])."""
    n = rows.shape[0]
    win_of = pos // win
    wmod = int(win_of.max()) + 2 if n else 2
    pass_of = np.full(n, -1, dtype=np.int16)
    slot_of = np.full(n, -1, dtype=np.int8)
    Ws = []
    remaining = np.ones(n, dtype=bool)
    for p in range(p_cap):
        idx = np.flatnonzero(remaining)
        if idx.size == 0:
            break
        rank, _ = _rank_in_group(rows[idx])
        cand = idx[rank < CHUNK]
        if cand.size == 0:
            break
        # top nw_max windows per step by child count
        key = step_of[cand].astype(np.int64) * wmod + win_of[cand]
        uk, inv, cnt = np.unique(key, return_inverse=True,
                                 return_counts=True)
        st = uk // wmod
        order = np.lexsort((-cnt, st))
        wrank, _ = _rank_in_group(st[order])
        slot_of_uk = np.full(uk.size, -1, dtype=np.int8)
        slot_of_uk[order] = np.where(wrank < nw_max, wrank,
                                     -1).astype(np.int8)
        ch_slot = slot_of_uk[inv]
        take = ch_slot >= 0
        tk = cand[take]
        pass_of[tk] = p
        slot_of[tk] = ch_slot[take]
        remaining[tk] = False
        W = np.zeros((n_steps, nw_max), dtype=np.int64)
        sel = order[wrank < nw_max]
        W[st[sel], slot_of_uk[sel]] = uk[sel] % wmod
        Ws.append(W)
        if not remaining.any():
            break
    if not Ws:
        Ws = [np.zeros((n_steps, nw_max), dtype=np.int64)]
    return pass_of, slot_of, np.stack(Ws)


class _FinalLevel:
    """Instance-based fixed-position reduction: output grid cell
    (r//128, r%128) IS y[r] — the whole SpMV finishes on device with no
    XLA scatter and no cross-pass sum.

    Children (per-row partials at arbitrary positions of the combined
    chunk-sum vector) are placed by a greedy: the output is divided into
    blocks of ``tps`` out tiles; each block gets one or more grid-step
    *instances*, each granting every row 8 gather slots and the step up
    to MAX_NW dynamically chosen aligned x-windows.  Instances of the
    same block are consecutive in the grid, so the out block stays
    VMEM-resident and accumulates (first instance initializes it); blocks
    whose children fit one instance pay exactly one step.  A residue
    matching (same constraint as the forward pack) assigns sublane slots;
    leftovers spill to a small XLA scatter."""

    MAX_NW = 8            # layout cap (drain encoding head-room)
    NW_CANDIDATES = (4, 8)
    G_CANDIDATES = (2, 4, 8)
    TPS_CANDIDATES = (64, 32, 16, 8)

    def __init__(self, step_meta, cell_idx, route, n_steps, tiles_per_step,
                 G, nw, nt_pad, x_pad_rows, spill_pos, spill_row,
                 interpret):
        self.step_meta = jnp.asarray(step_meta)
        self.cell_idx = jnp.asarray(cell_idx)
        self.route = jnp.asarray(route)
        self.n_steps = n_steps
        self.tiles_per_step = tiles_per_step
        self.G = G
        self.nw = nw
        self.nt_pad = nt_pad
        self.x_pad_rows = x_pad_rows
        self.spill_pos = jnp.asarray(spill_pos) if spill_pos.size else None
        self.spill_row = jnp.asarray(spill_row) if spill_row.size else None
        self.interpret = interpret
        self.n_spills = int(spill_pos.size)

    @classmethod
    def build(cls, chunk_row, nr_rows, interpret,
              max_spill_frac: float = 0.2, force=None):
        """force=(nw, G, tps) pins the configuration (the distributed
        layer needs uniform shapes across shards)."""
        from ..pack.gather_stream import _match_tiles

        valid = np.flatnonzero(chunk_row != nr_rows)
        rows_all = chunk_row[valid].astype(np.int64)
        pos_all = valid.astype(np.int64)
        n_children = rows_all.shape[0]
        n_tiles = max(1, -(-nr_rows // LANES))

        # choose (windows/step, window size, tiles/step) by a measured
        # cost model (TPU v5e): per metadata tile ~(3 + 0.6*nw*G) ns (the
        # select chain dominates), per window DMA ~6*nw*G ns/instance,
        # per spilled child ~8 ns of XLA scatter.  The search runs on a
        # row-range subsample and extrapolates, so pack time stays O(nnz).
        if force is not None:
            nw, G_u, tps = force
            nt_pad = -(-n_tiles // tps) * tps
            return cls._build_with(chunk_row, nr_rows, interpret,
                                   max_spill_frac, nw, G_u, tps, nt_pad,
                                   rows_all, pos_all, n_children)

        def eval_cand(rows_c, pos_c, nw_c, G_u, tps, row_cap, scale):
            n_blk = max(1, -(-row_cap // (LANES * tps)))
            o_of = (rows_c // LANES) // tps
            p_of, _, _ = _assign_passes(rows_c, pos_c, o_of, G_u * 1024,
                                        nw_c, 4, n_blk)
            spills = int((p_of < 0).sum())
            extra = len(np.unique(
                p_of[p_of > 0].astype(np.int64) * n_blk
                + o_of[p_of > 0]))
            n_inst = n_blk + extra
            return scale * (n_inst * tps * (3.0 + 0.6 * nw_c * G_u)
                            + n_inst * (50.0 + 6.0 * nw_c * G_u)
                            + 8.0 * spills)

        full_builds = {}    # (nw, G, tps) -> full-set native arrays

        def eval_native(rows_c, pos_c, nw_c, G_u, tps, row_cap, scale):
            from ..native.final import final_build_native
            ntp = max(1, -(-row_cap // (LANES * tps))) * tps
            order = np.argsort(rows_c, kind="stable")
            built = final_build_native(
                rows_c[order].astype(np.int32), pos_c[order], ntp, tps,
                G_u, nw_c)
            if row_cap >= nr_rows:
                full_builds[(nw_c, G_u, tps)] = built
            meta, _, _, sp, _ = built
            n_inst = meta.shape[0]
            return scale * (n_inst * tps * (3.0 + 0.6 * nw_c * G_u)
                            + n_inst * (50.0 + 6.0 * nw_c * G_u)
                            + 8.0 * sp.shape[0])

        try:
            from ..native.final import available as _nat_avail
            use_native_eval = _nat_avail()
        except Exception:
            use_native_eval = False
        evaluate = eval_native if use_native_eval else eval_cand

        # rank candidates on a row-range subsample, then re-evaluate the
        # leaders on the full children set (subsample spill estimates are
        # noisy)
        sub_rows = min(nr_rows, 16 * LANES * CHUNK)     # <= 16384 rows
        sub = rows_all < sub_rows
        rows_s, pos_s = rows_all[sub], pos_all[sub]
        scale = max(1.0, n_children / max(int(sub.sum()), 1))
        cands = []
        for nw_c in cls.NW_CANDIDATES:
            for G_u in cls.G_CANDIDATES:
                for tps in cls.TPS_CANDIDATES:
                    # small steps pay a fixed per-step cost; only consider
                    # them when the output itself is tiny
                    if tps > max(8, n_tiles) or (tps < 32 and
                                                 n_tiles >= 32):
                        continue
                    cost = evaluate(rows_s, pos_s, nw_c, G_u, tps,
                                    min(sub_rows, nr_rows), scale)
                    cands.append((cost, tps, G_u, nw_c))
        if not cands:
            return None
        cands.sort()
        if sub_rows < nr_rows and len(cands) > 1:
            top = [evaluate(rows_all, pos_all, nw_c, G_u, tps, nr_rows,
                            1.0) + 0 * i
                   for i, (_, tps, G_u, nw_c) in enumerate(cands[:3])]
            best_i = int(np.argmin(top))
            _, tps, G_u, nw = cands[best_i]
        else:
            _, tps, G_u, nw = cands[0]
        nt_pad = -(-n_tiles // tps) * tps
        return cls._build_with(chunk_row, nr_rows, interpret,
                               max_spill_frac, nw, G_u, tps, nt_pad,
                               rows_all, pos_all, n_children,
                               prebuilt=full_builds.get((nw, G_u, tps)))

    @classmethod
    def _build_with(cls, chunk_row, nr_rows, interpret, max_spill_frac,
                    nw, G_u, tps, nt_pad, rows_all, pos_all, n_children,
                    prebuilt=None):
        from ..pack.gather_stream import _match_tiles

        native = cls._build_native(chunk_row, nr_rows, interpret,
                                   max_spill_frac, nw, G_u, tps, nt_pad,
                                   rows_all, pos_all, n_children,
                                   prebuilt=prebuilt)
        if native is not None:
            return native

        win = G_u * 1024
        R = nt_pad * LANES
        n_blocks = nt_pad // tps
        o_of_all = (rows_all // LANES) // tps

        # assignment + residue matching; one retry on fresh instances
        placements = []   # (pos, row, seq, slot, cell_val)
        W_of_seq = {}     # (seq, o) -> window row (nw,)
        seq_off = 0
        rem = np.arange(n_children)
        for p_cap in (6, 2):
            if rem.size == 0:
                break
            rows, pos, o_of = rows_all[rem], pos_all[rem], o_of_all[rem]
            p_of, w_slot, W = _assign_passes(rows, pos, o_of, win, nw,
                                             p_cap, n_blocks)
            a = p_of >= 0
            if not a.any():
                break
            seq = p_of[a].astype(np.int64) + seq_off
            rows2 = rows[a] + seq * R
            local_stripe = (pos[a] // STRIPE
                            - W[p_of[a], o_of[a], w_slot[a]]
                            * (CHUNK * G_u))
            cell_val = (w_slot[a].astype(np.int64) * (CHUNK * G_u)
                        + local_stripe)
            rank2, _ = _rank_in_group(rows2)
            slot = _match_tiles((seq_off + W.shape[0]) * nt_pad, rows2,
                                rank2, pos[a] % STRIPE, cell_val,
                                np.ones(rows2.shape[0], dtype=bool))
            placed = slot >= 0
            placements.append((pos[a][placed], rows[a][placed],
                               seq[placed], slot[placed].astype(np.int64),
                               cell_val[placed]))
            for p in range(W.shape[0]):
                for o in range(n_blocks):
                    W_of_seq[(p + seq_off, o)] = W[p, o]
            seq_off += W.shape[0]
            keep = np.ones(rem.size, dtype=bool)
            keep[np.flatnonzero(a)[placed]] = False
            rem = rem[keep]

        n_spill = rem.size
        if n_children and n_spill / n_children > max_spill_frac:
            return None

        # instance list: (o, seq) pairs with children, plus (o, 0) always
        inst_keys = set((int(o), 0) for o in range(n_blocks))
        for ppos, prow, pseq, pslot, pcell in placements:
            po = (prow // LANES) // tps
            inst_keys.update(zip(po.tolist(), pseq.tolist()))
        inst_list = sorted(inst_keys)              # grouped by o, seq asc
        n_steps = len(inst_list)
        inst_step = {}
        step_meta = np.zeros((n_steps, nw + 2), dtype=np.int64)
        for i, (o, s) in enumerate(inst_list):
            inst_step[(o, s)] = i
            step_meta[i, :nw] = W_of_seq.get((s, o), 0)
            step_meta[i, nw] = 1 if s == 0 else 0   # (o, 0) always exists
            step_meta[i, nw + 1] = o

        drain = np.int16(nw * CHUNK * G_u)
        cells = np.full((n_steps * tps, CHUNK, LANES), drain,
                        dtype=np.int16)
        route = np.zeros((n_steps * tps, CHUNK, LANES), dtype=np.int8)
        route_set = np.zeros((n_steps * tps, CHUNK, LANES), dtype=bool)
        for ppos, prow, pseq, pslot, pcell in placements:
            po = (prow // LANES) // tps
            st = np.array([inst_step[(int(o), int(s))]
                           for o, s in zip(po, pseq)], dtype=np.int64)
            gt = st * tps + (prow // LANES) % tps
            l_of = prow % LANES
            r_of = ppos % STRIPE
            route[gt, pslot, l_of] = r_of
            route_set[gt, pslot, l_of] = True
            cells[gt, pslot, r_of] = pcell
        # unused stream positions route to a drain cell of their sublane
        cell_free = cells == drain                     # (gt, s, r)
        free_r = np.argmax(cell_free, axis=2).astype(np.int8)
        gt_i, s_i, l_i = np.nonzero(~route_set)
        route[gt_i, s_i, l_i] = free_r[gt_i, s_i]

        w_max = int(step_meta[:, :nw].max()) if n_steps else 0
        x_pad_rows = (w_max + 1) * CHUNK * G_u
        x_pad_rows = max(x_pad_rows,
                         -(-int(chunk_row.shape[0]) // STRIPE))
        x_pad_rows = -(-x_pad_rows // (CHUNK * G_u)) * (CHUNK * G_u)
        return cls(step_meta.astype(np.int32),
                   cells.reshape(-1, LANES), route.reshape(-1, LANES),
                   n_steps, tps, G_u, nw, nt_pad, x_pad_rows,
                   pos_all[rem].astype(np.int32),
                   rows_all[rem].astype(np.int32), interpret)

    @classmethod
    def _build_native(cls, chunk_row, nr_rows, interpret, max_spill_frac,
                      nw, G_u, tps, nt_pad, rows_all, pos_all,
                      n_children, prebuilt=None):
        """C++ builder (native/final_builder.cpp): assignment + residue
        matching + materialization in one sequential pass.  Returns None
        (falling back to the NumPy builder) when the library is absent or
        spills exceed the budget."""
        if prebuilt is not None:
            step_meta, cells, route, spill_pos, spill_row = prebuilt
        else:
            try:
                from ..native.final import available, final_build_native
                if not available():
                    return None
            except Exception:
                return None
            order = np.argsort(rows_all, kind="stable")
            (step_meta, cells, route,
             spill_pos, spill_row) = final_build_native(
                rows_all[order].astype(np.int32), pos_all[order],
                nt_pad, tps, G_u, nw)
        if n_children and spill_pos.shape[0] / n_children > max_spill_frac:
            return None
        n_steps = step_meta.shape[0]
        w_max = int(step_meta[:, :nw].max()) if n_steps else 0
        x_pad_rows = (w_max + 1) * CHUNK * G_u
        x_pad_rows = max(x_pad_rows,
                         -(-int(chunk_row.shape[0]) // STRIPE))
        x_pad_rows = -(-x_pad_rows // (CHUNK * G_u)) * (CHUNK * G_u)
        return cls(step_meta, cells, route, n_steps, tps, G_u, nw, nt_pad,
                   x_pad_rows, spill_pos, spill_row, interpret)

    def apply(self, vec: jax.Array, nr_rows: int) -> jax.Array:
        """vec: flat combined chunk-sum vector -> y (nr_rows,)."""
        flat = vec.reshape(-1)
        need = self.x_pad_rows * STRIPE
        if flat.shape[0] < need:
            flat = jnp.pad(flat, (0, need - flat.shape[0]))
        x2 = flat[:need].reshape(-1, STRIPE)
        grid = _final_gather_sums(
            self.step_meta, x2, self.cell_idx, self.route,
            tiles_per_step=self.tiles_per_step, G=self.G,
            n_steps=self.n_steps, nw=self.nw, n_out_tiles=self.nt_pad,
            interpret=self.interpret)
        y = grid.reshape(-1)[:nr_rows]
        if self.spill_pos is not None:
            # mode="drop": padded spill slots (dist layer) carry
            # spill_row == nr_rows and must vanish
            y = y.at[self.spill_row].add(
                jnp.take(vec.reshape(-1), self.spill_pos, mode="clip"),
                mode="drop")
        return y


def _final_kernel_v2(sw_ref, tb_ref, *refs, tiles_per_step: int,
                     GL_f: int, nwin: int):
    """Flat final level: per out tile, one GL_f-group dynamic-base slice
    per window block (tb_ref, scalar-prefetched), so the select chain
    costs O(nwin * GL_f) regardless of the position-space size — vs the
    legacy level's O(nw * G) whose coverage shrinks as positions scatter.
    Requires row-major chunk positions (GStreamMatrix.ordered)."""
    xw_refs = refs[:nwin]
    cell_ref, route_ref, out_ref = refs[nwin:]
    i = pl.program_id(0)
    first = sw_ref[i, nwin] == 1
    parts = []
    for t in range(tiles_per_step):
        sl = slice(t * CHUNK, (t + 1) * CHUNK)
        i1 = cell_ref[sl, :].astype(jnp.int32)  # w*(8*GL_f)+rel; drain >=
        j = route_ref[sl, :].astype(jnp.int32)
        sub = jnp.bitwise_and(i1, CHUNK - 1)
        grp = jnp.right_shift(i1, 3)            # w*GL_f + g (drain beyond)
        g1 = jnp.zeros((CHUNK, LANES), dtype=out_ref.dtype)
        for w in range(nwin):
            b = tb_ref[i, t * nwin + w]
            xwin = xw_refs[w][pl.ds(b * CHUNK, CHUNK * GL_f), :]
            for g in range(GL_f):
                part = jnp.take_along_axis(
                    xwin[g * CHUNK:(g + 1) * CHUNK, :], sub, axis=0)
                g1 = jnp.where(grp == w * GL_f + g, part, g1)
        g2 = jnp.take_along_axis(g1, j, axis=1)
        parts.append(jnp.sum(g2, axis=0))
    acc = jnp.stack(parts, axis=0)

    @pl.when(first)
    def _():
        out_ref[...] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[...] = out_ref[...] + acc


@functools.partial(jax.jit,
                   static_argnames=("tiles_per_step", "GL_f", "nwin", "GS",
                                    "n_steps", "n_out_tiles", "interpret"))
def _final_gather_sums_v2(step_meta, tile_bases, x2, cell_idx, route, *,
                          tiles_per_step: int, GL_f: int, nwin: int,
                          GS: int, n_steps: int, n_out_tiles: int,
                          interpret: bool = False):
    """step_meta: (n_steps, nwin + 2) int32 — per step: nwin staged-block
    indices (units of GS groups), a first-instance flag, the out block.
    tile_bases: (n_steps, tiles_per_step * nwin) int32 — per (tile, w)
    group offset of the tile's children within the staged block."""
    rows_per_step = tiles_per_step * CHUNK

    def win_spec(w):
        return pl.BlockSpec((CHUNK * GS, LANES),
                            lambda i, sw, tb, w=w: (sw[i, w], 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps,),
        in_specs=[win_spec(w) for w in range(nwin)] + [
            pl.BlockSpec((rows_per_step, LANES), lambda i, sw, tb: (i, 0)),
            pl.BlockSpec((rows_per_step, LANES), lambda i, sw, tb: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tiles_per_step, LANES),
                               lambda i, sw, tb: (sw[i, nwin + 1], 0)),
    )
    kernel = functools.partial(_final_kernel_v2,
                               tiles_per_step=tiles_per_step,
                               GL_f=GL_f, nwin=nwin)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out_tiles, LANES), x2.dtype),
        interpret=interpret,
    )(step_meta, tile_bases, *([x2] * nwin), cell_idx, route)


class _FinalLevelV2:
    """Flat fixed-position reduction over row-major chunk positions.

    Children of output tile ot (rows [ot*128, ot*128+128)) within window
    block w occupy a contiguous position range (the pack emits chunks
    row-major per block; first-fit backfill jitters the range by at most
    max_open tiles), so each (out tile, w) needs a single GL_f-group
    dynamic window — no greedy window search, no coverage-driven
    instances.  Rows with more than 8 children per pass get additional
    passes (consecutive accumulating instances of the same out block);
    rare residue-matching losers and over-span children spill to a small
    XLA scatter."""

    PASS_CAP = 4

    def __init__(self, step_meta, tile_bases, cell_idx, route, n_steps,
                 tiles_per_step, GL_f, nwin, GS, nt_pad, x_pad_rows,
                 spill_pos, spill_row, interpret):
        self.step_meta = jnp.asarray(step_meta)
        self.tile_bases = jnp.asarray(tile_bases)
        self.cell_idx = jnp.asarray(cell_idx)
        self.route = jnp.asarray(route)
        self.n_steps = n_steps
        self.tiles_per_step = tiles_per_step
        self.GL_f = GL_f
        self.nwin = nwin
        self.GS = GS
        self.nt_pad = nt_pad
        self.x_pad_rows = x_pad_rows
        self.spill_pos = jnp.asarray(spill_pos) if spill_pos.size else None
        self.spill_row = jnp.asarray(spill_row) if spill_row.size else None
        self.interpret = interpret
        self.n_spills = int(spill_pos.size)

    @classmethod
    def build(cls, chunk_row, nr_rows, sections, planes, interpret,
              max_spill_frac: float = 0.02, tiles_per_step: int = 64):
        from ..pack.gather_stream import _match_tiles

        nwin = int(sections.shape[0])
        if nwin > 8:
            return None                      # chain too long: legacy wins
        valid = np.flatnonzero(chunk_row != nr_rows)
        rows_all = chunk_row[valid].astype(np.int64)
        pos_all = valid.astype(np.int64)
        n_children = rows_all.shape[0]
        n_tiles_out = max(1, -(-nr_rows // LANES))
        tps = min(tiles_per_step, max(8, n_tiles_out))
        nt_pad = -(-n_tiles_out // tps) * tps
        n_blocks = nt_pad // tps
        if n_children == 0:
            return None

        # children sorted by (row, pos); pos is ascending within a row
        order = np.argsort(rows_all, kind="stable")
        rows = rows_all[order]
        pos = pos_all[order]
        rank, _ = _rank_in_group(rows)
        pass_of = rank // CHUNK
        spill = pass_of >= cls.PASS_CAP

        # window block of each child (position ranges from pack sections;
        # positions per tile = 128 chunk lanes x planes)
        block_pos = sections[:, 0] * (LANES * planes)
        w_of = np.searchsorted(block_pos, pos, side="right") - 1
        ot = rows // LANES
        groups = pos // (CHUNK * STRIPE)             # 1024-position groups
        key_tw = ot * nwin + w_of

        # per (out tile, w) group range of children
        big = 1 << 30
        ming = np.full(nt_pad * nwin, big, dtype=np.int64)
        maxg = np.full(nt_pad * nwin, -1, dtype=np.int64)
        live = ~spill
        np.minimum.at(ming, key_tw[live], groups[live])
        np.maximum.at(maxg, key_tw[live], groups[live])

        # GL_f: groups a tile-window slice covers (pow2, cap 8) — sized
        # to the p90 of per-(tile, w) needs; stragglers (first-fit
        # backfill jitter) retry in later passes with their own bases
        need = maxg - np.where(ming == big, maxg, ming) + 1
        nz_need = need[maxg >= 0]
        need90 = int(np.percentile(nz_need, 90)) if nz_need.size else 1
        GL_f = 1
        while GL_f < min(need90, 8):
            GL_f *= 2

        # staging: per (out block, window) TWO consecutive GS-group
        # blocks at bi and bi+1 (block-quantized BlockSpec indices cannot
        # start at arbitrary offsets; the pair makes any range of width
        # <= GS reachable regardless of alignment).  Children pick the
        # sub-window their group falls in; per-(tile, sub-window) bases
        # stay in [0, GS - GL_f].
        o_of_tw = (np.arange(nt_pad * nwin) // nwin) // tps
        key_ow = o_of_tw * nwin + (np.arange(nt_pad * nwin) % nwin)
        mn = np.full(n_blocks * nwin, big, dtype=np.int64)
        mx = np.full(n_blocks * nwin, -1, dtype=np.int64)
        has = ming < big
        np.minimum.at(mn, key_ow[has], ming[has])
        np.maximum.at(mx, key_ow[has], maxg[has])
        spread = int(np.where(mx >= 0,
                              mx - np.where(mn == big, mx, mn),
                              0).max()) if mx.size else 0
        # VMEM budget for the 2*nwin staged blocks (~4 MB, double-buffered
        # by the pipeline)
        gs_cap = 8
        while 2 * nwin * (gs_cap * 2) * CHUNK * LANES * 4 <= (4 << 20):
            gs_cap *= 2
        need_gs = max(8, spread + 1)
        if need_gs > gs_cap:
            return None          # block spread too wide: legacy wins
        GS = 8
        while GS < need_gs:
            GS *= 2
        bi = np.where(mx < 0, 0, np.where(mn == big, 0, mn) // GS)

        # sub-window of each child (global; bases are per pass)
        off = groups - bi[key_ow[key_tw]] * GS
        off = np.where(live, off, 0)
        sub_of = off // GS                          # 0 or 1
        off_sub = off - sub_of * GS                 # in [0, GS)
        w2_of = 2 * w_of + sub_of
        nwin2 = 2 * nwin
        key_tw2 = ot * nwin2 + w2_of

        # pass loop: each pass is a fresh instance with its OWN
        # per-(tile, sub-window) bases and cell table, so both base
        # stragglers (beyond the pass's GL_f slice) and residue-matching
        # losers retry in the next pass instead of spilling
        res = pos % STRIPE
        slot = np.full(rows.shape[0], -1, dtype=np.int8)
        cell_val = np.zeros(rows.shape[0], dtype=np.int64)
        final_pass = np.full(rows.shape[0], cls.PASS_CAP, dtype=np.int64)
        cur_pass = np.where(live, pass_of, cls.PASS_CAP).astype(np.int64)
        base_rounds = np.zeros((cls.PASS_CAP, nt_pad * nwin2),
                               dtype=np.int64)
        for r in range(cls.PASS_CAP):
            idx = np.flatnonzero(live & (cur_pass == r))
            if idx.size == 0:
                continue
            ming2 = np.full(nt_pad * nwin2, big, dtype=np.int64)
            np.minimum.at(ming2, key_tw2[idx], off_sub[idx])
            base_r = np.minimum(np.where(ming2 == big, 0, ming2),
                                GS - GL_f)
            base_rounds[r] = base_r
            over = off_sub[idx] - base_r[key_tw2[idx]] >= GL_f
            cur_pass[idx[over]] = r + 1
            idx = idx[~over]
            if idx.size == 0:
                continue
            # a round may hold natives + retries: defer members beyond
            # the chunk's 8 slots (the matcher needs distinct ranks)
            rk, _ = _rank_in_group(rows[idx])
            toomany = rk >= CHUNK
            if toomany.any():
                cur_pass[idx[toomany]] = r + 1
                idx, rk = idx[~toomany], rk[~toomany]
                if idx.size == 0:
                    continue
            rel = (off_sub[idx] - base_r[key_tw2[idx]]) * CHUNK \
                + (pos[idx] // STRIPE) % CHUNK
            cv = w2_of[idx] * (CHUNK * GL_f) + rel
            s = _match_tiles(nt_pad, rows[idx], rk % CHUNK, res[idx],
                             cv, np.ones(idx.size, dtype=bool))
            won = s >= 0
            slot[idx[won]] = s[won]
            cell_val[idx[won]] = cv[won]
            final_pass[idx[won]] = r
            cur_pass[idx[~won]] = r + 1
        pass_of = final_pass
        spill |= live & (slot < 0)
        live = ~spill
        if n_children and spill.sum() / n_children > max(
                max_spill_frac, 64 / n_children):
            return None

        # instance (step) list: (o, pass) pairs with children, plus (o, 0)
        o_of_child = (ot[live]).astype(np.int64) // tps
        inst_keys = set((int(o), 0) for o in range(n_blocks))
        inst_keys.update(zip(o_of_child.tolist(),
                             pass_of[live].tolist()))
        inst_list = sorted(inst_keys)
        n_steps = len(inst_list)
        inst_step = {k: i for i, k in enumerate(inst_list)}
        step_meta = np.zeros((n_steps, nwin2 + 2), dtype=np.int32)
        tile_bases = np.zeros((n_steps, tps * nwin2), dtype=np.int32)
        bi2 = bi.reshape(n_blocks, nwin)
        base4 = base_rounds.reshape(cls.PASS_CAP, nt_pad, nwin2)
        for i, (o, p) in enumerate(inst_list):
            step_meta[i, 0:nwin2:2] = bi2[o]
            step_meta[i, 1:nwin2:2] = bi2[o] + 1
            step_meta[i, nwin2] = 1 if p == 0 else 0
            step_meta[i, nwin2 + 1] = o
            tile_bases[i] = base4[p, o * tps:(o + 1) * tps].reshape(-1)

        drain = np.int16(nwin2 * CHUNK * GL_f)
        cells = np.full((n_steps * tps, CHUNK, LANES), drain,
                        dtype=np.int16)
        route_a = np.zeros((n_steps * tps, CHUNK, LANES), dtype=np.int8)
        route_set = np.zeros((n_steps * tps, CHUNK, LANES), dtype=bool)
        li = np.flatnonzero(live)
        st = np.array([inst_step[(int(o), int(p))]
                       for o, p in zip(ot[li] // tps, pass_of[li])],
                      dtype=np.int64)
        gt = st * tps + (ot[li] % tps)
        l_of = rows[li] % LANES
        r_of = res[li]
        s_of = slot[li].astype(np.int64)
        route_a[gt, s_of, l_of] = r_of
        route_set[gt, s_of, l_of] = True
        cells[gt, s_of, r_of] = cell_val[li]
        # unused stream positions route to a drain cell of their sublane
        cell_free = cells == drain
        free_r = np.argmax(cell_free, axis=2).astype(np.int8)
        gt_i, s_i, l_i = np.nonzero(~route_set)
        route_a[gt_i, s_i, l_i] = free_r[gt_i, s_i]

        # cover the bi+1 sub-blocks: pad the position vector to
        # (max bi + 2) staged blocks of GS groups
        x_pad_rows = int((bi.max() + 2 if bi.size else 2) * GS * CHUNK)
        x_pad_rows = max(x_pad_rows,
                         -(-int(chunk_row.shape[0]) // STRIPE))
        x_pad_rows = -(-x_pad_rows // (CHUNK * GS)) * (CHUNK * GS)
        sp = np.flatnonzero(spill)
        return cls(step_meta, tile_bases,
                   cells.reshape(-1, LANES), route_a.reshape(-1, LANES),
                   n_steps, tps, GL_f, nwin2, GS, nt_pad, x_pad_rows,
                   pos[sp].astype(np.int32), rows[sp].astype(np.int32),
                   interpret)

    def apply(self, vec: jax.Array, nr_rows: int) -> jax.Array:
        flat = vec.reshape(-1)
        need = self.x_pad_rows * STRIPE
        if flat.shape[0] < need:
            flat = jnp.pad(flat, (0, need - flat.shape[0]))
        x2 = flat[:need].reshape(-1, STRIPE)
        grid = _final_gather_sums_v2(
            self.step_meta, self.tile_bases, x2, self.cell_idx, self.route,
            tiles_per_step=self.tiles_per_step, GL_f=self.GL_f,
            nwin=self.nwin, GS=self.GS, n_steps=self.n_steps,
            n_out_tiles=self.nt_pad, interpret=self.interpret)
        y = grid.reshape(-1)[:nr_rows]
        if self.spill_pos is not None:
            y = y.at[self.spill_row].add(
                jnp.take(vec.reshape(-1), self.spill_pos, mode="clip"),
                mode="drop")
        return y


class _FinalLevelMulti:
    """Sum of per-section-group flat V2 finals: column-wide matrices
    (> 8 blocks) split their sections into groups of <= 8; each group's
    children reduce through an independent _FinalLevelV2 over the same
    position vector (others masked to the trap), and y is the sum of
    the group grids.  Finish cost stays child-count-linear instead of
    falling off the legacy 2x cliff."""

    def __init__(self, levels):
        self.levels = levels
        self.n_spills = sum(l.n_spills for l in levels)

    @classmethod
    def build(cls, chunk_row, nr_rows, sections, planes, interpret,
              group: int = 8):
        n_sec = sections.shape[0]
        levels = []
        for g0 in range(0, n_sec, group):
            sec_g = sections[g0:g0 + group]
            lo = int(sec_g[0, 0]) * (LANES * planes)
            hi = int(sec_g[-1, 1]) * (LANES * planes)
            cr = np.full_like(chunk_row, nr_rows)
            cr[lo:hi] = chunk_row[lo:hi]
            if not (cr != nr_rows).any():
                continue
            lvl = _FinalLevelV2.build(cr, nr_rows, sec_g, planes,
                                      interpret)
            if lvl is None:
                return None
            levels.append(lvl)
        return cls(levels) if levels else None

    def apply(self, vec, nr_rows):
        y = None
        for lvl in self.levels:
            yg = lvl.apply(vec, nr_rows)
            y = yg if y is None else y + yg
        return y


def _flm_flatten(f):
    return (tuple(f.levels), (f.n_spills,))


def _flm_unflatten(aux, children):
    f = object.__new__(_FinalLevelMulti)
    f.levels = list(children)
    f.n_spills = aux[0]
    return f


jax.tree_util.register_pytree_node(_FinalLevelMulti, _flm_flatten,
                                   _flm_unflatten)


def _finalv2_flatten(f):
    return ((f.step_meta, f.tile_bases, f.cell_idx, f.route, f.spill_pos,
             f.spill_row),
            (f.n_steps, f.tiles_per_step, f.GL_f, f.nwin, f.GS, f.nt_pad,
             f.x_pad_rows, f.interpret, f.n_spills))


def _finalv2_unflatten(aux, children):
    f = object.__new__(_FinalLevelV2)
    (f.n_steps, f.tiles_per_step, f.GL_f, f.nwin, f.GS, f.nt_pad,
     f.x_pad_rows, f.interpret, f.n_spills) = aux
    (f.step_meta, f.tile_bases, f.cell_idx, f.route, f.spill_pos,
     f.spill_row) = children
    return f


jax.tree_util.register_pytree_node(_FinalLevelV2, _finalv2_flatten,
                                   _finalv2_unflatten)


class _FLevel:
    """One packed finish level: chunk_sums -> coarser partial sums."""

    def __init__(self, fp: GStreamMatrix, interpret: bool):
        self.meta = fp
        self.interpret = interpret
        self.values = jnp.asarray(fp.values)
        self.meta16 = jnp.asarray(combine_meta(fp.cell_idx, fp.route))
        self.step_window = jnp.asarray(fp.step_window)

    def apply(self, chunk_sums: jax.Array) -> jax.Array:
        flat = chunk_sums.reshape(-1)
        pad = self.meta.padded_cols - flat.shape[0]
        if pad > 0:
            flat = jnp.pad(flat, (0, pad))
        x2 = flat[:self.meta.padded_cols].reshape(-1, STRIPE)
        return _gstream_chunk_sums(
            self.step_window, x2, self.values, self.meta16,
            tiles_per_step=self.meta.tiles_per_step, G=self.meta.G,
            n_steps=self.meta.n_steps, P=self.meta.planes,
            interpret=self.interpret)


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
    return ((f.values, f.meta16, f.step_window),
            (f.meta, f.interpret))


def _flevel_unflatten(aux, children):
    f = object.__new__(_FLevel)
    f.meta, f.interpret = aux
    f.values, f.meta16, f.step_window = children
    return f


def _final_flatten(f):
    return ((f.step_meta, f.cell_idx, f.route, f.spill_pos, f.spill_row),
            (f.n_steps, f.tiles_per_step, f.G, f.nw, f.nt_pad,
             f.x_pad_rows, f.interpret, f.n_spills))


def _final_unflatten(aux, children):
    f = object.__new__(_FinalLevel)
    (f.n_steps, f.tiles_per_step, f.G, f.nw, f.nt_pad,
     f.x_pad_rows, f.interpret, f.n_spills) = aux
    (f.step_meta, f.cell_idx, f.route, f.spill_pos, f.spill_row) = children
    return f


def _device_flatten(d):
    return ((d.values, d.meta16, d.step_window, d.tile_base,
             tuple(d.finish), d.final, getattr(d, "chunk_row", None)),
            (d.meta, d.interpret))


def _device_unflatten(aux, children):
    d = object.__new__(GStreamDevice)
    d.meta, d.interpret = aux
    (d.values, d.meta16, d.step_window, d.tile_base,
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
