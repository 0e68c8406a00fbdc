"""Multi-chip distributed SpMV (mesh + shard_map).

The reference targets a single ZCU102 board: its only "communication" is
PS<->PL DMA (spmv.h:7-21 pragmas) and a host-side accumulation loop
(csr_hw_wrapper.cpp:277-281).  This module is the new first-class
communication layer (SURVEY.md section 2.9): matrix rows are nnz-balanced
across chips (the compute-unit partitioning of csr_hw.cpp:459-468 lifted to
the mesh axis), the x vector is sharded by column and all-gathered over ICI
before the block-local SpMV, and each chip's partial y is already disjoint
(row sharding) so no reduction is needed.

Design notes (scaling-book recipe): pick a mesh, annotate shardings, let
XLA insert collectives.  The all-gather of x rides ICI inside a slice; for
multi-host it crosses DCN once per step.  Compute/communication overlap of
the gather with the first column-window's compute is XLA's latency-hiding
scheduler's job once the kernel is decomposed per window (future: explicit
ppermute ring to overlap manually).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..formats.csr import CSRMatrix
from ..pack.balance import balance_rows
from ..pack.gather_stream import CHUNK, GStreamMatrix, pack_gstream, STRIPE
from ..utils.config import SpmvConfig


def make_mesh(n_devices: Optional[int] = None, axis: str = "rows") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


@dataclasses.dataclass
class ShardedSpmv:
    """Row-sharded packed matrix bound to a mesh.

    Each of the P partitions is packed independently (per-partition local
    row ids), padded to a common step count, stacked on a leading axis and
    sharded over the mesh.  ``spmv`` is a single jitted SPMD program:
    all-gather x -> local GStream kernel -> local fixed-position finish
    (padded to uniform shapes across shards) -> sharded y.
    """

    mesh: Mesh
    axis: str
    nr_rows: int
    nr_cols: int
    nr_nzeros: int
    row_starts: np.ndarray          # (P,) global row offset per partition
    rows_per_part: int              # padded local y length
    # stacked + sharded device arrays (leading dim = P)
    values: jax.Array
    meta16: jax.Array               # combined (cell << 7 | route) stream
    chunk_row: jax.Array            # (P, n_chunks) local row ids (trap = pad)
    step_window: jax.Array          # (P, n_steps)
    G: int
    tiles_per_step: int
    n_steps: int
    padded_cols: int
    planes: int = 1                 # chunk-sum planes (8 / pack quantum Q)
    interpret: bool = False
    # per-shard final reduction (None -> XLA segment-sum fallback)
    fin_meta: Optional[jax.Array] = None    # (P, S, nw+2)
    fin_cell: Optional[jax.Array] = None
    fin_route: Optional[jax.Array] = None
    fin_spill_pos: Optional[jax.Array] = None
    fin_spill_row: Optional[jax.Array] = None
    fin_static: Optional[tuple] = None      # (tps, G, nw, S, n_out, xpad)

    @property
    def num_partitions(self) -> int:
        return int(self.values.shape[0])

    def spmv(self, x) -> jax.Array:
        x = jnp.asarray(x, dtype=self.values.dtype)
        pad = self.padded_cols - self.nr_cols
        if pad:
            x = jnp.pad(x, (0, pad))
        fin = (self.fin_meta, self.fin_cell, self.fin_route,
               self.fin_spill_pos, self.fin_spill_row)
        y = _sharded_spmv_jit(
            self.values, self.meta16, self.chunk_row,
            self.step_window, fin, x,
            mesh=self.mesh, axis=self.axis,
            rows_per_part=self.rows_per_part, G=self.G,
            tiles_per_step=self.tiles_per_step, n_steps=self.n_steps,
            planes=self.planes,
            fin_static=self.fin_static, interpret=self.interpret)
        # y: (P, rows_per_part) -> global y
        return _scatter_rows(y, self.row_starts, self.nr_rows)


def _shspmv_flatten(s):
    children = (s.values, s.meta16, s.chunk_row, s.step_window,
                s.fin_meta, s.fin_cell, s.fin_route, s.fin_spill_pos,
                s.fin_spill_row)
    aux = (s.mesh, s.axis, s.nr_rows, s.nr_cols, s.nr_nzeros,
           tuple(int(v) for v in s.row_starts), s.rows_per_part, s.G,
           s.tiles_per_step, s.n_steps, s.padded_cols, s.planes,
           s.interpret, s.fin_static)
    return children, aux


def _shspmv_unflatten(aux, children):
    s = object.__new__(ShardedSpmv)
    (s.mesh, s.axis, s.nr_rows, s.nr_cols, s.nr_nzeros, row_starts,
     s.rows_per_part, s.G, s.tiles_per_step, s.n_steps, s.padded_cols,
     s.planes, s.interpret, s.fin_static) = aux
    s.row_starts = np.asarray(row_starts)
    (s.values, s.meta16, s.chunk_row, s.step_window, s.fin_meta,
     s.fin_cell, s.fin_route, s.fin_spill_pos, s.fin_spill_row) = children
    return s


# ShardedSpmv flows through jit as an ARGUMENT (closing over its sharded
# arrays would bake them into the HLO as constants — the anti-pattern
# flagged by ADVICE r1 on bench/scaling.py)
jax.tree_util.register_pytree_node(ShardedSpmv, _shspmv_flatten,
                                   _shspmv_unflatten)


def _scatter_rows(y_parts, row_starts, nr_rows):
    """Concatenate per-partition contiguous row ranges into the global y."""
    parts = []
    P_ = y_parts.shape[0]
    for p in range(P_):
        start = int(row_starts[p])
        end = int(row_starts[p + 1]) if p + 1 < len(row_starts) else nr_rows
        parts.append(y_parts[p, :end - start])
    return jnp.concatenate(parts)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "axis", "rows_per_part", "G",
                                    "tiles_per_step", "n_steps", "planes",
                                    "fin_static", "interpret"))
def _sharded_spmv_jit(values, meta16, chunk_row, step_window, fin,
                      x, *, mesh, axis, rows_per_part, G, tiles_per_step,
                      n_steps, planes, fin_static, interpret):
    # check_vma=False: pallas_call inside shard_map does not annotate its
    # out_shape with mesh-variance info, and every operand here is
    # explicitly sharded anyway
    shard_map = functools.partial(jax.shard_map, check_vma=False)

    def local(values, meta16, chunk_row, step_window, fin,
              x_shard):
        # x is column-sharded across the mesh: gather the full vector over
        # ICI (the reference's per-CU x broadcast, spmv.cpp:180-192, lifted
        # to the chip level)
        x_full = jax.lax.all_gather(x_shard, axis).reshape(-1)
        x2 = x_full.reshape(-1, STRIPE)
        y = _local_spmv(step_window[0], x2, values[0], meta16[0],
                        chunk_row[0],
                        jax.tree.map(lambda a: a[0], fin),
                        rows_per_part=rows_per_part, G=G,
                        tiles_per_step=tiles_per_step, n_steps=n_steps,
                        planes=planes, fin_static=fin_static,
                        interpret=interpret)
        return y[None]

    spec_m = P(axis)
    return shard_map(local, mesh=mesh,
                     in_specs=(spec_m, spec_m, spec_m, spec_m,
                               spec_m, P(axis)),
                     out_specs=P(axis))(
        values, meta16, chunk_row, step_window, fin, x)


def _local_spmv(step_window, x2, values, meta16, chunk_row, fin,
                *, rows_per_part, G, tiles_per_step, n_steps, fin_static,
                interpret, planes=1):
    """Per-shard SpMV: Pallas kernel when available, XLA fallback in
    simulated-mesh tests (CPU devices cannot run the TPU kernel)."""
    from ..kernels.spmv_pallas import (_final_gather_sums,
                                       _gstream_chunk_sums)
    if interpret == "xla":
        # emulate the kernel semantics in pure XLA (for CPU mesh tests)
        chunk_sums = _chunk_sums_xla(step_window, x2, values, meta16,
                                     G=G, P=planes,
                                     tiles_per_step=tiles_per_step)
    else:
        chunk_sums = _gstream_chunk_sums(
            step_window, x2, values, meta16,
            tiles_per_step=tiles_per_step, G=G, n_steps=n_steps,
            P=planes, interpret=bool(interpret))
    vec = chunk_sums.reshape(-1)
    if fin_static is None or interpret == "xla":
        y = jax.ops.segment_sum(vec, chunk_row,
                                num_segments=rows_per_part + 1,
                                indices_are_sorted=False)
        return y[:rows_per_part]
    # the on-device fixed-position finish (padded uniform across shards)
    f_tps, f_G, f_nw, f_S, f_n_out, f_xpad = fin_static
    fin_meta, fin_cell, fin_route, spill_pos, spill_row = fin
    need = f_xpad * STRIPE
    flat = jnp.pad(vec, (0, max(0, need - vec.shape[0])))[:need]
    grid = _final_gather_sums(
        fin_meta, flat.reshape(-1, STRIPE), fin_cell, fin_route,
        tiles_per_step=f_tps, G=f_G, n_steps=f_S, nw=f_nw,
        n_out_tiles=f_n_out, interpret=bool(interpret))
    y = grid.reshape(-1)[:rows_per_part]
    if spill_pos is not None:
        y = y.at[spill_row].add(
            jnp.take(vec, spill_pos, mode="clip"), mode="drop")
    return y


def _chunk_sums_xla(step_window, x2, values, meta16, *, G,
                    tiles_per_step, P=1):
    """Reference semantics of the kernel in plain XLA ops (works on any
    backend; used by simulated-mesh tests and as a drop-in fallback)."""
    n_rows_tot = values.shape[0]
    n_tiles = n_rows_tot // 8
    # window base (in stripes) per tile
    step_of_tile = jnp.arange(n_tiles) // tiles_per_step
    base = step_window[step_of_tile] * (8 * G)          # stripes
    m32 = jnp.bitwise_and(meta16.astype(jnp.int32), 0x7FFF)
    i1 = jnp.right_shift(m32, 7).reshape(n_tiles, 8, STRIPE)
    j = jnp.bitwise_and(m32, 0x7F).reshape(n_tiles, 8, STRIPE)
    v = values.reshape(n_tiles, 8, STRIPE)
    # g1[t, s, r] = x2[base[t] + i1[t, s, r], r]
    stripe_idx = base[:, None, None] + i1
    lanes = jnp.arange(STRIPE)[None, None, :]
    g1 = x2[stripe_idx, lanes]
    g2 = jnp.take_along_axis(g1, j, axis=2)
    prod = v * g2
    if P == 1:
        return jnp.sum(prod, axis=1)
    return jnp.sum(prod.reshape(n_tiles, P, 8 // P, STRIPE),
                   axis=2).reshape(n_tiles * P, STRIPE)


def shard_spmv(matrix: CSRMatrix, mesh: Mesh, axis: str = "rows",
               config: Optional[SpmvConfig] = None,
               interpret=False) -> ShardedSpmv:
    """Pack + shard a CSR matrix over a mesh (the multi-chip
    create_csr_hw_matrix)."""
    P_ = int(np.prod([mesh.shape[a] for a in mesh.axis_names if a == axis]))
    part = balance_rows(matrix, P_)
    packs: List[GStreamMatrix] = []
    for p in range(P_):
        r0, r1 = int(part.row_start[p]), int(part.row_end[p])
        sub = _slice_rows(matrix, r0, r1)
        # shuffle_lanes=True: the per-shard finals use the legacy
        # greedy-window builder, which needs decorrelated positions
        if not packs:
            packs.append(pack_gstream(sub, config, shuffle_lanes=True))
        else:
            # pin shard 0's layout: the SPMD program needs uniform
            # (G, Q, tiles_per_step) across shards
            packs.append(pack_gstream(
                sub, config, G=packs[0].G, Q=packs[0].Q,
                tiles_per_step=packs[0].tiles_per_step,
                shuffle_lanes=True))
    G = packs[0].G
    planes = packs[0].planes
    tps = packs[0].tiles_per_step
    n_steps = max(pk.n_steps for pk in packs)
    rows_per_part = int(max(part.row_end - part.row_start))

    def pad_steps(a, target_steps, per_step_rows, fill=0):
        cur = a.shape[0] // per_step_rows if per_step_rows else 0
        if cur == target_steps:
            return a
        padshape = ((target_steps - cur) * per_step_rows,) + a.shape[1:]
        return np.concatenate([a, np.full(padshape, fill, a.dtype)], axis=0)

    from ..kernels.spmv_pallas import combine_meta
    vals, metas, rowmaps, winds = [], [], [], []
    for p, pk in enumerate(packs):
        vals.append(pad_steps(pk.values, n_steps, tps * 8))
        metas.append(pad_steps(combine_meta(pk.cell_idx, pk.route),
                               n_steps, tps * 8))
        # local chunk_row trap = rows_per_part (local pad trap)
        cr = pk.chunk_row.copy()
        cr[cr == pk.nr_rows] = rows_per_part
        rowmaps.append(pad_steps(cr, n_steps, tps * planes,
                                 fill=rows_per_part))
        winds.append(pad_steps(pk.step_window, n_steps, 1))

    fin_arrays, fin_static = _build_shard_finals(
        rowmaps, rows_per_part)

    sharding = NamedSharding(mesh, P(axis))
    dev = lambda a: jax.device_put(jnp.asarray(a), sharding)
    fin_dev = [dev(a) if a is not None else None for a in fin_arrays]
    return ShardedSpmv(
        mesh=mesh, axis=axis, nr_rows=matrix.nr_rows,
        nr_cols=matrix.nr_cols, nr_nzeros=matrix.nr_nzeros,
        row_starts=part.row_start, rows_per_part=rows_per_part,
        values=dev(np.stack(vals)), meta16=dev(np.stack(metas)),
        chunk_row=dev(np.stack([r.reshape(-1) for r in rowmaps])),
        step_window=dev(np.stack(winds)),
        G=G, tiles_per_step=tps, n_steps=n_steps,
        padded_cols=packs[0].padded_cols, planes=planes,
        interpret=interpret,
        fin_meta=fin_dev[0], fin_cell=fin_dev[1], fin_route=fin_dev[2],
        fin_spill_pos=fin_dev[3], fin_spill_row=fin_dev[4],
        fin_static=fin_static)


# ICI per-link bandwidth (GB/s, v5e ring); HBM_GBPS lives in bench.harness
_ICI_GBPS = 45.0


def choose_schedule(matrix: CSRMatrix, n_dev: int,
                    hbm_gbps: float = 819.0) -> str:
    """Pick "ring" vs "allgather" by modeled cost (VERDICT r3 item 4).

    The all-gather serializes moving (P-1)/P of x over ICI before any
    compute; the ring hides each segment transfer under the previous
    stage's kernel — but pays a staged-padding tax: stage t runs at the
    max over shards of their stage-t segment's work, so any nnz
    imbalance between (shard, segment) cells taxes every stage (and a
    pigeonhole floor of ceil(nblocks/P)/(nblocks/P) applies when the
    column count is small in window units).  That tax is computable
    EXACTLY from the (shard, segment) nnz matrix under the ring's own
    nnz-balanced contiguous segment boundaries — no packing needed —
    so the chooser predicts it instead of guessing."""
    if n_dev < 2:
        return "allgather"
    from ..pack.gather_stream import _choose_layout
    from .ring import _balance_contiguous

    G, _ = _choose_layout(matrix)
    W = G * CHUNK * STRIPE
    nblocks = -(-matrix.nr_cols // W)
    blk = np.bincount(np.minimum(matrix.col_ind // W, nblocks - 1),
                      minlength=nblocks)
    bounds = _balance_contiguous(blk, n_dev)
    part = balance_rows(matrix, n_dev)
    rn = np.diff(matrix.row_ptr.astype(np.int64))
    shard_of_row = np.searchsorted(part.row_end, np.arange(matrix.nr_rows),
                                   side="right")
    el_shard = np.repeat(shard_of_row, rn)
    el_seg = np.searchsorted(
        bounds, np.minimum(matrix.col_ind // W, nblocks - 1),
        side="right") - 1
    w2 = np.bincount(el_shard * n_dev + el_seg,
                     minlength=n_dev * n_dev).reshape(n_dev, n_dev)
    staged = sum(int(max(w2[p][(p + t) % n_dev] for p in range(n_dev)))
                 for t in range(n_dev))
    ideal = w2.sum() / n_dev
    pad_ratio = staged / max(ideal, 1.0)

    x_bytes = matrix.nr_cols * 4
    stream_bytes = matrix.nr_nzeros / 0.6 * 6      # fill-0.6 estimate
    compute = stream_bytes / (hbm_gbps * 1e9) / n_dev   # per-device total
    stage_comm = x_bytes / n_dev / (_ICI_GBPS * 1e9)
    # +5% step quantization on top of the exact nnz staged-pad ratio
    stage_comp = compute * (pad_ratio + 0.05) / n_dev
    # the ring pipelines: each stage's segment transfer rides under the
    # previous stage's compute (or vice versa when comm-bound)
    ring_time = (n_dev - 1) * max(stage_comm, stage_comp) + stage_comp
    ag_time = (n_dev - 1) * stage_comm + compute
    return "ring" if ring_time < 0.95 * ag_time else "allgather"


def shard_spmv_auto(matrix: CSRMatrix, mesh: Mesh, axis: str = "rows",
                    interpret=False):
    """Pack + shard with the modeled-cost schedule choice: the ring-
    overlapped layout when hiding the x exchange pays, the plain
    all-gather otherwise."""
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names
                         if a == axis]))
    if choose_schedule(matrix, n_dev) == "ring":
        from .ring import ring_shard_spmv
        try:
            return ring_shard_spmv(matrix, mesh, axis=axis,
                                   interpret=interpret)
        except NotImplementedError:
            pass                    # pathological placement: all-gather
    return shard_spmv(matrix, mesh, axis=axis, interpret=interpret)


def _build_shard_finals(rowmaps, rows_per_part):
    """Per-shard fixed-position finals, pinned to a common configuration
    and padded to uniform shapes (extra steps write zeros to a dedicated
    pad output block; extra spill slots target the local trap row and are
    dropped).  Returns (arrays, static) or ((None,)*5, None) when a shard
    cannot be built (pathological placement -> XLA fallback)."""
    from ..kernels.spmv_pallas import _FinalLevel

    fins, force = [], None
    for rm in rowmaps:
        cr = rm.reshape(-1).astype(np.int64)
        fin = _FinalLevel.build(cr, rows_per_part, False, force=force)
        if fin is None:
            return (None,) * 5, None
        if force is None:
            force = (fin.nw, fin.G, fin.tiles_per_step)
        fins.append(fin)

    nw, G_u, tps = force
    nt_pad = fins[0].nt_pad
    drain = np.int16(nw * 8 * G_u)
    S_max = max(f.n_steps for f in fins)
    K_max = max(f.n_spills for f in fins)
    x_pad = max(f.x_pad_rows for f in fins)
    metas, cells_, routes_, sp_pos, sp_row = [], [], [], [], []
    for f in fins:
        meta = np.asarray(f.step_meta)
        cell = np.asarray(f.cell_idx)
        rout = np.asarray(f.route)
        pad_s = S_max - f.n_steps
        if pad_s:
            pm = np.zeros((pad_s, nw + 2), np.int32)
            pm[:, nw] = 1                      # first visit: zero-fill
            pm[:, nw + 1] = nt_pad // tps      # dedicated pad out block
            meta = np.concatenate([meta, pm], axis=0)
            cell = np.concatenate(
                [cell, np.full((pad_s * tps * 8, cell.shape[1]), drain,
                               np.int16)], axis=0)
            rout = np.concatenate(
                [rout, np.zeros((pad_s * tps * 8, rout.shape[1]),
                                rout.dtype)], axis=0)
        pos = (np.asarray(f.spill_pos) if f.spill_pos is not None
               else np.zeros(0, np.int32))
        row = (np.asarray(f.spill_row) if f.spill_row is not None
               else np.zeros(0, np.int32))
        sp_pos.append(np.pad(pos, (0, K_max - pos.shape[0])))
        sp_row.append(np.pad(row, (0, K_max - row.shape[0]),
                             constant_values=rows_per_part))
        metas.append(meta)
        cells_.append(cell)
        routes_.append(rout)
    arrays = (np.stack(metas), np.stack(cells_), np.stack(routes_),
              np.stack(sp_pos).astype(np.int32),
              np.stack(sp_row).astype(np.int32))
    if K_max == 0:
        arrays = arrays[:3] + (None, None)
    static = (tps, G_u, nw, S_max, nt_pad + tps, x_pad)
    return arrays, static


def _slice_rows(matrix: CSRMatrix, r0: int, r1: int) -> CSRMatrix:
    lo, hi = int(matrix.row_ptr[r0]), int(matrix.row_ptr[r1])
    return CSRMatrix(matrix.row_ptr[r0:r1 + 1] - lo,
                     matrix.col_ind[lo:hi], matrix.values[lo:hi],
                     r1 - r0, matrix.nr_cols)
