"""Ring-overlapped distributed SpMV.

``spmv_dist.ShardedSpmv`` all-gathers x up front: simple, but the gather
serializes before compute.  This module implements the BASELINE north-star
schedule — "x-vector halo segments exchanged via ICI collectives
(all-gather / permute) overlapped with block-local SpMV": x stays
column-sharded; at ring step s every shard multiplies the column segment
it currently holds against its rows' matching column-block pack while the
segment simultaneously moves to the next shard over ICI (`lax.ppermute`
inside `lax.scan` — XLA's async collectives let the permute of step s+1
ride under the Pallas kernel of step s).  Per-segment partial y's are
plain vector adds (row-disjoint shards), so no reduction collective is
needed.

Layout: every (row shard p, column segment s) block is packed
independently (uniform G / tiles_per_step / step count), stacked on the
step axis ordered by source segment, and each block gets its own
fixed-position final level (uniform shapes, same padding scheme as
spmv_dist._build_shard_finals).  The scan body dynamic-slices the current
segment's pack out of the shard-local stack.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..formats.csr import CSRMatrix
from ..pack.balance import balance_rows
from ..pack.gather_stream import CHUNK, STRIPE, pack_gstream
from .spmv_dist import _scatter_rows, _slice_rows


@dataclasses.dataclass
class RingShardedSpmv:
    mesh: Mesh
    axis: str
    nr_rows: int
    nr_cols: int
    nr_nzeros: int
    row_starts: np.ndarray
    rows_per_part: int
    seg_cols: int                  # columns per ring segment (padded)
    # shard-stacked arrays, leading dim = P; step axis ordered by segment
    values: jax.Array
    meta16: jax.Array              # combined (cell << 7 | route) stream
    step_window: jax.Array         # (P, P*n_steps_seg)
    G: int
    tiles_per_step: int
    n_steps_seg: int
    planes: int                    # chunk-sum planes (8 / pack quantum Q)
    # per-(shard, segment) finals, padded uniform; leading dims (P, P)
    fin_meta: jax.Array
    fin_cell: jax.Array
    fin_route: jax.Array
    fin_spill_pos: Optional[jax.Array]
    fin_spill_row: Optional[jax.Array]
    fin_static: tuple              # (tps, G, nw, S, n_out, xpad)
    interpret: bool = False

    @property
    def num_partitions(self) -> int:
        return int(self.values.shape[0])

    def spmv(self, x) -> jax.Array:
        x = jnp.asarray(x, dtype=jnp.float32)
        pad = self.seg_cols * self.num_partitions - self.nr_cols
        if pad:
            x = jnp.pad(x, (0, pad))
        fin = (self.fin_meta, self.fin_cell, self.fin_route,
               self.fin_spill_pos, self.fin_spill_row)
        y = _ring_spmv_jit(
            self.values, self.meta16, self.step_window,
            fin, x, mesh=self.mesh, axis=self.axis,
            rows_per_part=self.rows_per_part, G=self.G,
            tiles_per_step=self.tiles_per_step,
            n_steps_seg=self.n_steps_seg, planes=self.planes,
            fin_static=self.fin_static,
            interpret=self.interpret)
        return _scatter_rows(y, self.row_starts, self.nr_rows)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "axis", "rows_per_part", "G",
                                    "tiles_per_step", "n_steps_seg",
                                    "planes", "fin_static", "interpret"))
def _ring_spmv_jit(values, meta16, step_window, fin, x, *, mesh,
                   axis, rows_per_part, G, tiles_per_step, n_steps_seg,
                   planes, fin_static, interpret):
    from ..kernels.spmv_pallas import (_final_gather_sums,
                                       _gstream_chunk_sums)
    from .spmv_dist import _chunk_sums_xla

    shard_map = functools.partial(jax.shard_map, check_vma=False)
    n_dev = int(np.prod(list(mesh.shape.values())))
    rows_seg = n_steps_seg * tiles_per_step * CHUNK
    f_tps, f_G, f_nw, f_S, f_n_out, f_xpad = fin_static

    def local(values, meta16, step_window, fin, x_shard):
        me = jax.lax.axis_index(axis)
        x2 = x_shard.reshape(-1, STRIPE)          # my column segment

        fin_meta, fin_cell, fin_route, sp_pos, sp_row = \
            jax.tree.map(lambda a: a[0], fin)

        def body(carry, s):
            xseg, acc = carry
            src = jax.lax.rem(me + s, n_dev)      # segment owner
            w = jax.lax.dynamic_slice_in_dim(step_window[0],
                                             src * n_steps_seg,
                                             n_steps_seg, 0)
            v = jax.lax.dynamic_slice_in_dim(values[0], src * rows_seg,
                                             rows_seg, 0)
            mt = jax.lax.dynamic_slice_in_dim(meta16[0], src * rows_seg,
                                              rows_seg, 0)
            if interpret == "xla":
                cs = _chunk_sums_xla(w, xseg, v, mt, G=G, P=planes,
                                     tiles_per_step=tiles_per_step)
            else:
                cs = _gstream_chunk_sums(
                    w, xseg, v, mt, tiles_per_step=tiles_per_step, G=G,
                    n_steps=n_steps_seg, P=planes,
                    interpret=bool(interpret))
            vec = cs.reshape(-1)
            fm = jax.lax.dynamic_slice_in_dim(fin_meta, src * f_S, f_S, 0)
            fc = jax.lax.dynamic_slice_in_dim(
                fin_cell, src * f_S * f_tps * CHUNK,
                f_S * f_tps * CHUNK, 0)
            fr = jax.lax.dynamic_slice_in_dim(
                fin_route, src * f_S * f_tps * CHUNK,
                f_S * f_tps * CHUNK, 0)
            need = f_xpad * STRIPE
            flat = jnp.pad(vec, (0, max(0, need - vec.shape[0])))[:need]
            # the final runs interpreted on simulated meshes ("xla" mode
            # included — it works under shard_map, test_dist proves it)
            grid = _final_gather_sums(
                fm, flat.reshape(-1, STRIPE), fc, fr,
                tiles_per_step=f_tps, G=f_G, n_steps=f_S, nw=f_nw,
                n_out_tiles=f_n_out,
                interpret=True if interpret == "xla"
                else bool(interpret))
            y_seg = grid.reshape(-1)[:rows_per_part]
            if sp_pos is not None:
                k_sp = sp_pos.shape[0] // n_dev
                pos_s = jax.lax.dynamic_slice_in_dim(sp_pos, src * k_sp,
                                                     k_sp, 0)
                row_s = jax.lax.dynamic_slice_in_dim(sp_row, src * k_sp,
                                                     k_sp, 0)
                y_seg = y_seg.at[row_s].add(
                    jnp.take(vec, pos_s, mode="clip"), mode="drop")
            acc = acc + y_seg
            # pass my current segment to the left neighbor; receive from
            # the right — next iteration I hold segment (me + s + 1)
            xseg = jax.lax.ppermute(
                xseg, axis,
                [(i, (i - 1) % n_dev) for i in range(n_dev)])
            return (xseg, acc), None

        acc0 = jnp.zeros((rows_per_part,), jnp.float32)
        (_, y), _ = jax.lax.scan(body, (x2, acc0),
                                 jnp.arange(n_dev, dtype=jnp.int32))
        return y[None]

    spec_m = P(axis)
    return shard_map(local, mesh=mesh,
                     in_specs=(spec_m, spec_m, spec_m, spec_m,
                               P(axis)),
                     out_specs=P(axis))(
        values, meta16, step_window, fin, x)


def ring_shard_spmv(matrix: CSRMatrix, mesh: Mesh, axis: str = "rows",
                    interpret=False,
                    tiles_per_step: int = 32) -> RingShardedSpmv:
    """Pack + shard for the ring-overlapped schedule."""
    from ..pack.gather_stream import _choose_layout

    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names
                         if a == axis]))
    part = balance_rows(matrix, n_dev)
    rows_per_part = int(max(part.row_end - part.row_start))
    G, Q = _choose_layout(matrix)
    planes = CHUNK // Q
    W = G * CHUNK * STRIPE
    seg_cols = -(-matrix.nr_cols // (n_dev * W)) * W

    # per-(shard, segment) packs with uniform (G, tps)
    packs = [[None] * n_dev for _ in range(n_dev)]
    n_steps_seg = 1
    for p in range(n_dev):
        r0, r1 = int(part.row_start[p]), int(part.row_end[p])
        sub = _slice_rows(matrix, r0, r1)
        cols = sub.col_ind.astype(np.int64)
        rows_of = np.repeat(np.arange(sub.nr_rows, dtype=np.int64),
                            np.diff(sub.row_ptr).astype(np.int64))
        seg_of = cols // seg_cols
        for s in range(n_dev):
            msk = seg_of == s
            block = CSRMatrix.from_coo(
                rows_of[msk], cols[msk] - s * seg_cols,
                sub.values[msk].astype(np.float32),
                sub.nr_rows, seg_cols)
            pk = pack_gstream(block, tiles_per_step=tiles_per_step, G=G,
                              Q=Q, shuffle_lanes=True)
            assert pk.G == G and pk.tiles_per_step == tiles_per_step
            packs[p][s] = pk
            n_steps_seg = max(n_steps_seg, pk.n_steps)

    # pad packs to uniform steps, build per-block finals (pinned config)
    def pad_steps(a, per_step_rows, fill=0):
        cur = a.shape[0] // per_step_rows
        if cur == n_steps_seg:
            return a
        padshape = ((n_steps_seg - cur) * per_step_rows,) + a.shape[1:]
        return np.concatenate([a, np.full(padshape, fill, a.dtype)],
                              axis=0)

    from .spmv_dist import _build_shard_finals
    from ..kernels.spmv_pallas import combine_meta
    rowmaps = []
    vals, metas, winds = [], [], []
    for p in range(n_dev):
        pv, pm, pw = [], [], []
        for s in range(n_dev):
            pk = packs[p][s]
            pv.append(pad_steps(pk.values, tiles_per_step * CHUNK))
            pm.append(pad_steps(combine_meta(pk.cell_idx, pk.route),
                                tiles_per_step * CHUNK))
            pw.append(pad_steps(pk.step_window, 1))
            cr = pk.chunk_row.copy()
            cr[cr == pk.nr_rows] = rows_per_part
            rowmaps.append(pad_steps(cr, tiles_per_step * planes,
                                     fill=rows_per_part))
        vals.append(np.concatenate(pv, axis=0))
        metas.append(np.concatenate(pm, axis=0))
        winds.append(np.concatenate(pw, axis=0))

    fin_arrays, fin_static = _build_shard_finals(rowmaps, rows_per_part)
    if fin_static is None:
        raise NotImplementedError(
            "ring schedule requires the final level; pathological "
            "placement — use shard_spmv instead")
    # reshape finals (P*P, ...) -> per shard concat over segments
    fm, fc, fr, sp, sr = fin_arrays
    fm2 = fm.reshape(n_dev, n_dev * fm.shape[1], fm.shape[2])
    fc2 = fc.reshape(n_dev, n_dev * fc.shape[1], fc.shape[2])
    fr2 = fr.reshape(n_dev, n_dev * fr.shape[1], fr.shape[2])
    sp2 = sp.reshape(n_dev, -1) if sp is not None else None
    sr2 = sr.reshape(n_dev, -1) if sr is not None else None

    sharding = NamedSharding(mesh, P(axis))
    dev = lambda a: jax.device_put(jnp.asarray(a), sharding)
    return RingShardedSpmv(
        mesh=mesh, axis=axis, nr_rows=matrix.nr_rows,
        nr_cols=matrix.nr_cols, nr_nzeros=matrix.nr_nzeros,
        row_starts=part.row_start, rows_per_part=rows_per_part,
        seg_cols=seg_cols,
        values=dev(np.stack(vals)), meta16=dev(np.stack(metas)),
        step_window=dev(np.stack(winds)),
        G=G, tiles_per_step=tiles_per_step, n_steps_seg=n_steps_seg,
        planes=planes,
        fin_meta=dev(fm2), fin_cell=dev(fc2), fin_route=dev(fr2),
        fin_spill_pos=dev(sp2) if sp2 is not None else None,
        fin_spill_row=dev(sr2) if sr2 is not None else None,
        fin_static=fin_static, interpret=interpret)
