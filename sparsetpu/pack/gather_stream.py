"""GStream: the TPU-native packed sparse format (pack side).

This is the re-design of the reference's packed-stream format
(csr_hw.cpp:270-318 ``generate_balanced_hw_submatrix``): where the FPGA packs
(15-bit in-block column index + end-of-row flag, value) pairs into 128-bit
bus words for a serial MAC pipeline, the TPU needs a layout that turns the
per-element ``x[col]`` access (spmv.cpp:87) into the two vector gather
primitives Mosaic supports on (8, 128) register tiles:

  * sublane gather: ``g1[s, r] = xw[i1[s, r], r]``
  * lane gather:    ``g2[s, l] = g1[s, j[s, l]]``

Layout
------
* Columns are processed in *windows* of ``W = 8 * G * 128`` columns (2D
  column blocking, util.h:43-58 analogue; G <= 32 gives W <= 32768 ==
  COLS_DIV_BLOCKS).  The x-window is staged HBM->VMEM per grid step by the
  Pallas pipeline (the per-CU BRAM x-copy of spmv.cpp:180-192, but
  double-buffered by the compiler).
* Within a (row x window) intersection, each row's nnz are padded to a
  multiple of 8 (the reference pads rows to VF, csr_hw.cpp:108-114).
  Each aligned group of 8 is a **chunk**; a chunk belongs to exactly one
  row, so per-chunk partial sums never straddle rows.
* 128 chunks form a **tile**: element (chunk ``l``, slot ``s``) sits at
  stream position (sublane ``s``, lane ``l``) of an (8, 128) tile.  The
  chunk partial sum is then a free sum over the sublane axis, and the
  end-of-row-flag scan of the reference (spmv.cpp:99) becomes a
  precomputed chunk->row map (the empty-rows bitmap of csr_hw.cpp:340-347
  is subsumed: empty rows simply have no chunks).
* **Residue matching**: for the sublane gather, every element must expose
  its x-stripe index at cell (s, r) where ``r = local_col % 128`` is its
  lane residue.  Elements of one chunk may permute freely across the 8
  slots (a row sum is order-invariant), so pack time solves a bipartite
  assignment per tile: slot choice such that within each (tile, sublane)
  residues are distinct (equal (stripe, residue) pairs may share a cell).
  Chunks that cannot be placed spill to fresh tiles.

Arrays produced (n = number of (8,128) tiles, padded to tiles_per_step):
  values      (n*8, 128) value dtype          stream layout
  cell_idx    (n*8, 128) int16   per-cell local stripe index in [0, 8G)
  route       (n*8, 128) int8    per-stream-position residue in [0, 128)
  chunk_row   (n, 128)   int32   global row per chunk (nr_rows = pad trap)
  step_window (n_steps,) int32   column-block index per grid step (the
                                 x-window staged for that step is block-row
                                 ``step_window[i]`` of x2 viewed in (8G, 128)
                                 blocks)
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from ..formats.csr import CSRMatrix
from ..utils.config import LANES, SUBLANES, SpmvConfig

STRIPE = LANES                      # 128 columns per x stripe
CHUNK = SUBLANES                    # 8 nnz per chunk (row padding quantum)
TILE_CHUNKS = LANES                 # 128 chunks per (8, 128) tile
TILE_NNZ = CHUNK * TILE_CHUNKS      # 1024 elements per tile
DEFAULT_TILES_PER_STEP = 16         # tiles per Pallas grid step
MAX_G = 32                          # window groups cap => W <= 32768 cols


@dataclasses.dataclass(eq=False)  # identity hash: usable as static jit aux
class GStreamMatrix:
    """Packed matrix + metadata (csr_hw_matrix analogue, csr_hw.h:16-26)."""

    values: np.ndarray       # (n_tiles*8, 128)
    cell_idx: np.ndarray     # (n_tiles*8, 128) int16
    route: np.ndarray        # (n_tiles*8, 128) int8
    chunk_row: np.ndarray    # (n_tiles, 128) int32
    step_window: np.ndarray  # (n_steps,) int32
    nr_rows: int
    nr_cols: int
    nr_nzeros: int           # real nnz (before padding)
    G: int                   # window groups (window = G*1024 cols)
    tiles_per_step: int
    padded_cols: int         # nr_cols padded to window multiple
    sections: np.ndarray = None  # (n_blocks, 2) tile ranges per col block

    @property
    def n_tiles(self) -> int:
        return int(self.chunk_row.shape[0])

    @property
    def n_steps(self) -> int:
        return int(self.step_window.shape[0])

    @property
    def window_cols(self) -> int:
        return self.G * CHUNK * STRIPE

    @property
    def n_slots(self) -> int:
        return self.n_tiles * TILE_NNZ

    @property
    def fill_factor(self) -> float:
        """Real nnz / allocated slots (padding + spill overhead measure)."""
        return self.nr_nzeros / max(self.n_slots, 1)

    def storage_bytes(self) -> int:
        """Packed bytes moved to the device — the reference's 'MB
        transferred' report (csr_hw.cpp:420-421).  cell_idx and route ship
        fused as one int16 stream (kernels.spmv_pallas.combine_meta), so
        the device stream is values + 2 B/slot of metadata."""
        return (self.values.nbytes + self.cell_idx.nbytes
                + self.chunk_row.nbytes + self.step_window.nbytes)

    def storage_overhead(self) -> float:
        """Packed size / plain CSR size (csr_hw.cpp:1401-1409 analogue)."""
        csr_bytes = (self.nr_nzeros * (self.values.dtype.itemsize + 4)
                     + 4 * (self.nr_rows + 1))
        return self.storage_bytes() / max(csr_bytes, 1)


# ---------------------------------------------------------------------------
# pack passes
# ---------------------------------------------------------------------------

def _pad_rows_to_chunks(sub_rows, sub_cols, sub_vals):
    """Pad each row's nnz run to a multiple of CHUNK (csr_hw.cpp:229-255
    analogue).  Input is row-major sorted; returns flat padded
    (row, local_col, val, is_real) arrays.  Pad elements reuse the row's
    first column so their gather stays in-window."""
    # sub_rows is row-major sorted: run-length encode instead of np.unique
    # (which re-sorts)
    if sub_rows.shape[0]:
        bounds = np.flatnonzero(np.diff(sub_rows)) + 1
        starts_u = np.concatenate([[0], bounds])
        rows_u = sub_rows[starts_u]
        counts = np.diff(np.concatenate([starts_u,
                                         [sub_rows.shape[0]]]))
    else:
        rows_u = sub_rows
        counts = np.zeros(0, dtype=np.int64)
    padded_counts = (-(-counts // CHUNK) * CHUNK).astype(np.int64)
    total = int(padded_counts.sum())
    out_row = np.repeat(rows_u, padded_counts).astype(np.int32)
    out_col = np.zeros(total, dtype=np.int32)
    out_val = np.zeros(total, dtype=sub_vals.dtype)
    is_real = np.zeros(total, dtype=bool)

    starts = np.concatenate([[0], np.cumsum(padded_counts)[:-1]])
    row_first = np.concatenate([[0], np.cumsum(counts)[:-1]])
    offset_within = np.arange(sub_vals.shape[0], dtype=np.int64)
    pos = (np.repeat(starts, counts)
           + (offset_within - np.repeat(row_first, counts)))
    out_col[pos] = sub_cols
    out_val[pos] = sub_vals
    is_real[pos] = True
    first_col_per_row = sub_cols[row_first]
    pad_fill = np.repeat(first_col_per_row, padded_counts)
    out_col = np.where(is_real, out_col, pad_fill)
    return out_row, out_col, out_val, is_real


def _match_tiles(n_tiles, local_chunk, rank, res, stripe, active):
    """Slot assignment: per (tile, sublane) distinct residues; equal
    (stripe, residue) pairs share a cell.  Vectorized greedy — attempt k
    proposes slot (rank + k) % 8; a contended free cell goes to the
    minimum-stripe contender; losers retry with the next slot.

    Only ``active`` elements (real nnz) claim cells; returns slot (-1 for
    unplaced/inactive) per element."""
    n = res.shape[0]
    slot = np.full(n, -1, dtype=np.int8)
    cell_stripe = np.full(n_tiles * CHUNK * LANES, -1, dtype=np.int64)
    tile_of = local_chunk // TILE_CHUNKS
    n_chunks_local = int(local_chunk.max()) + 1 if n else 0
    chunk_slot_used = np.zeros((n_chunks_local, CHUNK), dtype=bool)
    contender = np.empty(cell_stripe.shape[0], dtype=np.int64)
    for attempt in range(CHUNK):
        un = active & (slot < 0)
        if not un.any():
            break
        idx = np.flatnonzero(un)
        cand_s = (rank[idx] + attempt) % CHUNK
        # a chunk-mate may already hold this slot from an earlier attempt
        avail = ~chunk_slot_used[local_chunk[idx], cand_s]
        idx, cand_s = idx[avail], cand_s[avail]
        if idx.shape[0] == 0:
            continue
        key = (tile_of[idx] * CHUNK + cand_s) * LANES + res[idx]
        st = stripe[idx]
        cur = cell_stripe[key]
        accept = cur == st                      # share an existing cell
        free = cur == -1
        if free.any():
            fkey = key[free]
            contender[fkey] = np.iinfo(np.int64).max
            np.minimum.at(contender, fkey, st[free])
            won = free & (contender[key] == st)
            cell_stripe[key[won]] = st[won]
            accept |= won
        slot[idx[accept]] = cand_s[accept]
        chunk_slot_used[local_chunk[idx[accept]], cand_s[accept]] = True
    return slot


def _fill_free_slots(slot, active):
    """Assign slot-less (pad / unplaced) elements the slots left free in
    their chunk, so no real element's stream position is clobbered."""
    nc = slot.shape[0] // CHUNK
    sl2 = slot.reshape(nc, CHUNK)
    used = np.zeros((nc, CHUNK), dtype=bool)
    taken = sl2 >= 0
    used[np.nonzero(taken)[0], sl2[taken].astype(np.int64)] = True
    # free slots first (stable argsort of the used mask)
    free_order = np.argsort(used, axis=1, kind="stable")
    missing = ~taken
    miss_rank = np.cumsum(missing, axis=1) - 1
    fill = np.take_along_axis(free_order, np.maximum(miss_rank, 0), axis=1)
    return np.where(missing, fill, sl2).astype(np.int8).reshape(-1)


def _materialize(chunks_el_row, pcol, pval, preal, slot, local_chunk,
                 nr_rows, value_dtype):
    """Build (values, cell_idx, route, chunk_row) tile arrays from a fully
    matched element set."""
    n_el = slot.shape[0]
    nc = n_el // CHUNK
    n_t = int(local_chunk.max() // TILE_CHUNKS) + 1
    res = (pcol % STRIPE).astype(np.int64)
    stripe = (pcol // STRIPE).astype(np.int64)

    vals = np.zeros((n_t, CHUNK, LANES), dtype=value_dtype)
    cells = np.zeros((n_t, CHUNK, LANES), dtype=np.int16)
    route = np.zeros((n_t, CHUNK, LANES), dtype=np.int8)
    rowmap = np.full((n_t, LANES), nr_rows, dtype=np.int32)

    tile_of = (local_chunk // TILE_CHUNKS).astype(np.int64)
    lane_of = (local_chunk % TILE_CHUNKS).astype(np.int64)
    s = slot.astype(np.int64)
    vals[tile_of, s, lane_of] = np.where(preal, pval, 0).astype(value_dtype)
    route[tile_of, s, lane_of] = res
    real = np.flatnonzero(preal)
    cells[tile_of[real], s[real], res[real]] = stripe[real]
    # chunk -> row map (one row per chunk by construction)
    lc_c = local_chunk[::CHUNK]
    rowmap[lc_c // TILE_CHUNKS, lc_c % TILE_CHUNKS] = chunks_el_row
    return vals, cells, route, rowmap


def _rechunk_by_row(rows, cols, vals):
    """Group loose (row, col, val) elements into fresh single-row chunks,
    zero-padding each row's run to a CHUNK multiple."""
    order = np.argsort(rows, kind="stable")
    return _pad_rows_to_chunks(rows[order], cols[order], vals[order])


def _pack_block(prow, pcol, pval, preal, nr_rows, value_dtype):
    """Chunk + tile + residue-match one column block.  Returns stacked
    (values, cell_idx, route, chunk_row) arrays for the block's tiles.

    Elements that lose the residue matching in a round keep their tile
    *holes* (already-placed chunk mates stay put) and are re-chunked by row
    into fresh tiles for the next round; residue pressure drops every round
    so this converges quickly (the reference's analogous fallback is row
    padding, csr_hw.cpp:246-255 — here padding is the fallback, not the
    default)."""
    parts: List[Tuple[np.ndarray, ...]] = []
    cur = (prow, pcol, pval, preal)
    prev_unplaced = None
    while cur[0].shape[0] > 0:
        qrow, qcol, qval, qreal = cur
        n_el = qrow.shape[0]
        assert n_el % CHUNK == 0
        nc = n_el // CHUNK
        local_chunk = np.repeat(np.arange(nc, dtype=np.int64), CHUNK)
        n_t = -(-nc // TILE_CHUNKS)
        res = (qcol % STRIPE).astype(np.int64)
        stripe = (qcol // STRIPE).astype(np.int64)
        rank = np.arange(n_el, dtype=np.int64) % CHUNK
        slot = _match_tiles(n_t, local_chunk, rank, res, stripe, qreal)
        unplaced = qreal & (slot < 0)
        n_un = int(unplaced.sum())
        if prev_unplaced is not None and n_un >= prev_unplaced:
            # no progress: spread the stragglers one chunk per tile
            local_chunk = local_chunk * TILE_CHUNKS
            slot = _match_tiles(nc, local_chunk, rank, res, stripe, qreal)
            if (qreal & (slot < 0)).any():
                raise AssertionError(
                    "single-chunk-per-tile matching must always succeed")
            unplaced = np.zeros(n_el, dtype=bool)
            n_un = 0
        # materialize this round's placements (holes stay zero-padded)
        placed_mask = ~unplaced
        slot = _fill_free_slots(np.where(unplaced, -1, slot), ~unplaced)
        parts.append(_materialize(qrow[::CHUNK], qcol, qval,
                                  qreal & placed_mask, slot, local_chunk,
                                  nr_rows, value_dtype))
        if n_un == 0:
            break
        prev_unplaced = n_un
        cur = _rechunk_by_row(qrow[unplaced], qcol[unplaced], qval[unplaced])

    vals = np.concatenate([p[0] for p in parts], axis=0)
    cells = np.concatenate([p[1] for p in parts], axis=0)
    route = np.concatenate([p[2] for p in parts], axis=0)
    rowmap = np.concatenate([p[3] for p in parts], axis=0)
    return vals, cells, route, rowmap


def _native_pack_block():
    """The C++ pack engine (sparsetpu/native/packer.cpp), if built."""
    try:
        from ..native.packer import available, pack_block_native
        return pack_block_native if available() else None
    except Exception:
        return None


# Measured on TPU v5e at tiles_per_step=128 with the production fused
# int16 meta stream: slot throughput of the dual-gather kernel vs
# window-group count G.  The select chain costs ~linearly in G, while
# smaller windows pad short (row, window) nnz runs to the 8-slot chunk —
# the pack picks G minimizing predicted time.
_RATE_GSLOT = {1: 119.0, 2: 120.0, 4: 115.0, 8: 109.0, 16: 88.0,
               32: 51.0}


def _choose_G(matrix: CSRMatrix, tiles_per_step: int = 128) -> int:
    """Pick the column-window group count G from the (row, window) nnz
    histogram: total slots at each G — including the per-block padding of
    tile counts to tiles_per_step multiples, which dominates when blocks
    are many and small — over the measured slot rate."""
    need = max(1, -(-matrix.nr_cols // (CHUNK * STRIPE)))
    if need <= 4:
        return min(MAX_G, need)
    w0 = 4 * CHUNK * STRIPE                     # finest candidate window
    nb0 = -(-matrix.nr_cols // w0)
    # sample a row prefix (~2M nnz) — the histogram shape, not its scale,
    # drives the choice
    end_row = matrix.nr_rows
    if matrix.nr_nzeros > 2_000_000:
        end_row = int(np.searchsorted(matrix.row_ptr, 2_000_000))
        end_row = max(1, min(end_row, matrix.nr_rows))
    end_nnz = int(matrix.row_ptr[end_row])
    rows_all = np.repeat(np.arange(end_row, dtype=np.int64),
                         np.diff(matrix.row_ptr[:end_row + 1]).astype(
                             np.int64))
    key = rows_all * nb0 + matrix.col_ind[:end_nnz].astype(np.int64) // w0
    uk, counts = np.unique(key, return_counts=True)
    urow, uw = uk // nb0, uk % nb0
    best_g, best_t = None, None
    for g in (4, 8, 16, 32):
        if g > MAX_G:
            continue
        f = g // 4
        nb = -(-nb0 // f)
        key2 = urow * nb + uw // f
        u2, inv = np.unique(key2, return_inverse=True)
        c2 = np.zeros(u2.shape[0], dtype=np.int64)
        np.add.at(c2, inv, counts)
        chunks_pair = -(-c2 // CHUNK)
        # per-block tile counts, padded to the grid step quantum
        blk_of_pair = (u2 % nb).astype(np.int64)
        chunks_blk = np.bincount(blk_of_pair, weights=chunks_pair,
                                 minlength=1)
        nz = chunks_blk[chunks_blk > 0]
        tiles_blk = -(-nz // TILE_CHUNKS)
        tiles_pad = (-(-tiles_blk // tiles_per_step)) * tiles_per_step
        slots = int(tiles_pad.sum()) * TILE_NNZ
        t = slots / _RATE_GSLOT[g]
        if best_t is None or t < best_t:
            best_g, best_t = g, t
        if g >= need:                           # one window covers all cols
            break
    return best_g


def pack_gstream(matrix: CSRMatrix, config: Optional[SpmvConfig] = None,
                 tiles_per_step: Optional[int] = None,
                 value_dtype=np.float32, use_native: bool = True,
                 shuffle_lanes: bool = True,
                 G: Optional[int] = None) -> GStreamMatrix:
    """Pack a CSR matrix into GStream (create_csr_hw_matrix analogue,
    csr_hw.cpp:377-1398, collapsed to one parameterized routine)."""
    nr_rows, nr_cols = matrix.nr_rows, matrix.nr_cols
    if tiles_per_step is None:
        # bigger steps amortize the Pallas pipeline: T=128 (1.5 MB blocks)
        # reaches ~90% of v5e HBM bandwidth vs ~40% at T=16 (bench/micro);
        # small matrices take smaller steps to bound padding
        est_tiles = max(1, int(matrix.nr_nzeros * 1.3) // TILE_NNZ)
        if est_tiles >= 1024:
            tiles_per_step = 128
        elif est_tiles >= 128:
            tiles_per_step = 32
        else:
            tiles_per_step = 8
    if G is None:
        G = _choose_G(matrix, tiles_per_step)
    W = G * CHUNK * STRIPE
    n_blocks = max(1, -(-nr_cols // W))
    padded_cols = n_blocks * W

    rows_all = np.repeat(np.arange(nr_rows, dtype=np.int32),
                         matrix.row_nnz())
    cols_all = matrix.col_ind.astype(np.int64)
    vals_all = matrix.values
    native = _native_pack_block() if (
        use_native and np.dtype(value_dtype) == np.float32) else None

    all_v, all_c, all_r, all_m, step_win = [], [], [], [], []
    sections = []   # (tile_start, tile_end) per emitted column block

    def _pad_tiles(k):
        all_v.append(np.zeros((k * CHUNK, LANES), dtype=value_dtype))
        all_c.append(np.zeros((k * CHUNK, LANES), dtype=np.int16))
        all_r.append(np.zeros((k * CHUNK, LANES), dtype=np.int8))
        all_m.append(np.full((k, LANES), nr_rows, dtype=np.int32))

    if n_blocks > 1:
        # one stable sort by window (keeps row-major order inside each
        # block) instead of an O(n_blocks * nnz) mask scan per block
        blk = cols_all // W
        order = np.argsort(blk, kind="stable")
        rows_srt, cols_srt, vals_srt = (rows_all[order], cols_all[order],
                                        vals_all[order])
        blk_starts = np.searchsorted(blk[order],
                                     np.arange(n_blocks + 1))
    for b in range(n_blocks):
        if n_blocks == 1:
            brows, bcols, bvals = rows_all, cols_all, vals_all
        else:
            lo, hi = int(blk_starts[b]), int(blk_starts[b + 1])
            brows, bcols, bvals = (rows_srt[lo:hi], cols_srt[lo:hi],
                                   vals_srt[lo:hi])
        if brows.shape[0] == 0:
            continue
        local = (bcols - b * W).astype(np.int32)
        prow, pcol, pval, preal = _pad_rows_to_chunks(brows, local, bvals)
        if native is not None:
            v, c, r, mm = native(prow, pcol,
                                 pval.astype(np.float32, copy=False),
                                 preal, nr_rows)
            v = v.reshape(-1, CHUNK, LANES)
            c = c.reshape(-1, CHUNK, LANES)
            r = r.reshape(-1, CHUNK, LANES)
        else:
            v, c, r, mm = _pack_block(prow, pcol, pval, preal, nr_rows,
                                      value_dtype)
        nt = mm.shape[0]
        all_v.append(v.reshape(nt * CHUNK, LANES))
        all_c.append(c.reshape(nt * CHUNK, LANES))
        all_r.append(r.reshape(nt * CHUNK, LANES))
        all_m.append(mm)
        pad_t = (-nt) % tiles_per_step
        if pad_t:
            _pad_tiles(pad_t)
        start = sections[-1][1] if sections else 0
        sections.append((start, start + nt + pad_t))
        step_win.extend([b] * ((nt + pad_t) // tiles_per_step))

    if not step_win:  # fully empty matrix
        _pad_tiles(tiles_per_step)
        step_win.append(0)
        sections.append((0, tiles_per_step))

    values = np.concatenate(all_v, axis=0)
    cell_idx = np.concatenate(all_c, axis=0)
    route = np.concatenate(all_r, axis=0)
    chunk_row = np.concatenate(all_m, axis=0)
    if shuffle_lanes:
        _shuffle_chunk_lanes(values, route, chunk_row)

    return GStreamMatrix(
        values=values, cell_idx=cell_idx, route=route, chunk_row=chunk_row,
        step_window=np.asarray(step_win, dtype=np.int32),
        nr_rows=nr_rows, nr_cols=nr_cols, nr_nzeros=matrix.nr_nzeros,
        G=G, tiles_per_step=tiles_per_step, padded_cols=padded_cols,
        sections=np.asarray(sections, dtype=np.int64).reshape(-1, 2))


def _shuffle_chunk_lanes(values, route, chunk_row, seed: int = 0x5eed):
    """Randomly permute chunk lanes within every tile, in place.

    A chunk's lane is free (the x-gather cells are indexed by element
    residue, not by lane), but the chunk's *position* pos = tile*128 + lane
    is the column index seen by the reduction (F) levels.  Row-major
    packing gives a row's chunks consecutive positions -> consecutive
    residues -> catastrophic cell conflicts when the F level packs them
    (measured fill 0.23).  A per-tile random lane permutation makes F-level
    residues uniform (fill back to ~0.85) at zero kernel cost."""
    n_tiles = chunk_row.shape[0]
    rng = np.random.default_rng(seed)
    # one batched permutation matrix: argsort of random keys per tile
    perm = np.argsort(rng.random((n_tiles, TILE_CHUNKS)), axis=1)
    v3 = values.reshape(n_tiles, CHUNK, LANES)
    r3 = route.reshape(n_tiles, CHUNK, LANES)
    idx = perm[:, None, :]
    v3[...] = np.take_along_axis(v3, idx, axis=2)
    r3[...] = np.take_along_axis(r3, idx, axis=2)
    chunk_row[...] = np.take_along_axis(chunk_row, perm, axis=1)


def unpack_gstream(p: GStreamMatrix) -> CSRMatrix:
    """Inverse of pack (delete_csr_hw_matrix-adjacent capability: the
    packed format is self-describing, enabling serialization round-trips).

    Reconstructs CSR by replaying the dual-gather semantics on the host.
    """
    n_t = p.n_tiles
    W = p.window_cols
    vals = p.values.reshape(n_t, CHUNK, LANES)
    cells = p.cell_idx.reshape(n_t, CHUNK, LANES).astype(np.int64)
    route = p.route.reshape(n_t, CHUNK, LANES).astype(np.int64)
    tiles_per_step = p.tiles_per_step
    rows, cols, data = [], [], []
    for t in range(n_t):
        step = t // tiles_per_step
        win_base_cols = int(p.step_window[step]) * W
        # local col of element (s, l) = cell stripe at (s, route) * 128 + route
        r = route[t]
        stripe = np.take_along_axis(cells[t], r, axis=1)
        local_col = stripe * STRIPE + r
        v = vals[t]
        rowm = np.repeat(p.chunk_row[t][None, :], CHUNK, axis=0)
        nzmask = (v != 0) & (rowm < p.nr_rows)
        rows.append(rowm[nzmask])
        cols.append(local_col[nzmask] + win_base_cols)
        data.append(v[nzmask])
    if not rows:
        return CSRMatrix(np.zeros(p.nr_rows + 1, np.int32),
                         np.zeros(0, np.int32),
                         np.zeros(0, p.values.dtype), p.nr_rows, p.nr_cols)
    return CSRMatrix.from_coo(np.concatenate(rows), np.concatenate(cols),
                              np.concatenate(data), p.nr_rows, p.nr_cols)
