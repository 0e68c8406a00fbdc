"""Distributed double-float (df64) SpMV over a device mesh.

The reference's default build is DOUBLE=1 (Makefile:18); round 2 brought
f64-emulated kernels single-chip (kernels/f64emu.py) and round 3 carries
them onto the mesh: two f32 value planes per shard, compensated
(two-sum/two-prod) products and reductions, x planes all-gathered over
ICI, and a compensated SEGMENTED-SCAN finish (a plain f32 segment-sum
would cost every row its compensation).  ``cg_df64`` composes with the
returned DF64 pytrees, so the reference's DOUBLE solve runs multi-chip
with psum'd compensated dot products inserted by XLA.
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
from ..kernels.f64emu import (DF64, _two_prod, df64_add, split_f64)
from ..pack.balance import balance_rows
from ..pack.gather_stream import STRIPE, pack_gstream
from ..utils.config import SpmvConfig
from .spmv_dist import _slice_rows


@dataclasses.dataclass
class ShardedSpmvDF64:
    """Row-sharded df64 packed matrix bound to a mesh."""

    mesh: Mesh
    axis: str
    nr_rows: int
    nr_cols: int
    row_starts: np.ndarray
    rows_per_part: int
    vhi: jax.Array                  # (P, rows, 128)
    vlo: jax.Array
    meta16: jax.Array
    step_window: jax.Array
    cr_rows: jax.Array              # (P, n_chunks) row ids SORTED
    cr_order: jax.Array             # (P, n_chunks) positions ordered by row
    G: int
    tiles_per_step: int
    n_steps: int
    padded_cols: int
    interpret: bool = False

    def spmv(self, x) -> DF64:
        """x: DF64 (or float64 host array) of nr_cols -> DF64 y."""
        if not isinstance(x, DF64):
            xh, xl = split_f64(np.asarray(x, np.float64))
            x = DF64(jnp.asarray(xh), jnp.asarray(xl))
        pad = self.padded_cols - self.nr_cols
        xh, xl = x.hi, x.lo
        if pad:
            xh = jnp.pad(xh, (0, pad))
            xl = jnp.pad(xl, (0, pad))
        yh, yl = _sharded_df64_jit(
            self.vhi, self.vlo, self.meta16, self.step_window,
            self.cr_rows, self.cr_order, xh, xl,
            mesh=self.mesh, axis=self.axis,
            rows_per_part=self.rows_per_part, G=self.G,
            tiles_per_step=self.tiles_per_step, n_steps=self.n_steps,
            interpret=self.interpret)
        parts_h, parts_l = [], []
        for p in range(yh.shape[0]):
            start = int(self.row_starts[p])
            end = (int(self.row_starts[p + 1])
                   if p + 1 < len(self.row_starts) else self.nr_rows)
            parts_h.append(yh[p, :end - start])
            parts_l.append(yl[p, :end - start])
        return DF64(jnp.concatenate(parts_h), jnp.concatenate(parts_l))


def _sdf_flatten(s):
    return ((s.vhi, s.vlo, s.meta16, s.step_window, s.cr_rows,
             s.cr_order),
            (s.mesh, s.axis, s.nr_rows, s.nr_cols,
             tuple(int(v) for v in s.row_starts), s.rows_per_part, s.G,
             s.tiles_per_step, s.n_steps, s.padded_cols, s.interpret))


def _sdf_unflatten(aux, children):
    s = object.__new__(ShardedSpmvDF64)
    (s.mesh, s.axis, s.nr_rows, s.nr_cols, row_starts, s.rows_per_part,
     s.G, s.tiles_per_step, s.n_steps, s.padded_cols, s.interpret) = aux
    s.row_starts = np.asarray(row_starts)
    (s.vhi, s.vlo, s.meta16, s.step_window, s.cr_rows,
     s.cr_order) = children
    return s


jax.tree_util.register_pytree_node(ShardedSpmvDF64, _sdf_flatten,
                                   _sdf_unflatten)


def _df64_chunk_sums_xla(step_window, x2h, x2l, vhi, vlo, meta16, *, G,
                         tiles_per_step):
    """Compensated kernel semantics in plain XLA (CPU-mesh tests /
    fallback): per-element two-prod, df64 tree-sum over the 8 sublanes."""
    n_rows_tot = vhi.shape[0]
    n_tiles = n_rows_tot // 8
    step_of_tile = jnp.arange(n_tiles) // tiles_per_step
    base = step_window[step_of_tile] * (8 * G)
    m32 = jnp.bitwise_and(meta16.astype(jnp.int32), 0x7FFF)
    i1 = jnp.right_shift(m32, 7).reshape(n_tiles, 8, STRIPE)
    j = jnp.bitwise_and(m32, 0x7F).reshape(n_tiles, 8, STRIPE)
    stripe_idx = base[:, None, None] + i1
    lanes = jnp.arange(STRIPE)[None, None, :]
    g1h = x2h[stripe_idx, lanes]
    g1l = x2l[stripe_idx, lanes]
    g2h = jnp.take_along_axis(g1h, j, axis=2)
    g2l = jnp.take_along_axis(g1l, j, axis=2)
    vh = vhi.reshape(n_tiles, 8, STRIPE)
    vl = vlo.reshape(n_tiles, 8, STRIPE)
    ph, pe = _two_prod(vh, g2h)
    pl = pe + vh * g2l + vl * g2h
    sh, sl = ph[:, 0], pl[:, 0]
    for s in range(1, 8):
        sh, sl = df64_add(sh, sl, ph[:, s], pl[:, s])
    return sh, sl


@functools.partial(jax.jit,
                   static_argnames=("mesh", "axis", "rows_per_part", "G",
                                    "tiles_per_step", "n_steps",
                                    "interpret"))
def _sharded_df64_jit(vhi, vlo, meta16, step_window, cr_rows, cr_order,
                      xh, xl, *, mesh, axis, rows_per_part, G,
                      tiles_per_step, n_steps, interpret):
    shard_map = functools.partial(jax.shard_map, check_vma=False)

    def local(vhi, vlo, meta16, step_window, cr_rows, cr_order, xh, xl):
        xh_full = jax.lax.all_gather(xh, axis).reshape(-1)
        xl_full = jax.lax.all_gather(xl, axis).reshape(-1)
        x2h = xh_full.reshape(-1, STRIPE)
        x2l = xl_full.reshape(-1, STRIPE)
        if interpret == "xla":
            ch, cl = _df64_chunk_sums_xla(
                step_window[0], x2h, x2l, vhi[0], vlo[0], meta16[0],
                G=G, tiles_per_step=tiles_per_step)
        else:
            from ..kernels.f64emu import _df64_chunk_sums
            ch, cl = _df64_chunk_sums(
                step_window[0], x2h, x2l, vhi[0], vlo[0], meta16[0],
                tiles_per_step=tiles_per_step, G=G, n_steps=n_steps,
                interpret=bool(interpret))
        # compensated segmented reduction over row-sorted chunk sums (a
        # pack-time sort order; trap rows land at rows_per_part and are
        # dropped by the scatter)
        rows = cr_rows[0]
        sh = jnp.take(ch.reshape(-1), cr_order[0])
        sl = jnp.take(cl.reshape(-1), cr_order[0])
        first = jnp.concatenate([jnp.ones((1,), bool),
                                 rows[1:] != rows[:-1]])

        def comb(a, b):
            fa, ha, la = a
            fb, hb, lb = b
            h, l = df64_add(ha, la, hb, lb)
            return (fa | fb, jnp.where(fb, hb, h), jnp.where(fb, lb, l))

        _, th, tl = jax.lax.associative_scan(comb, (first, sh, sl))
        ends = jnp.concatenate([first[1:], jnp.ones((1,), bool)])
        tgt = jnp.where(ends, rows, rows_per_part)
        yh = jnp.zeros((rows_per_part,), jnp.float32).at[tgt].set(
            th, mode="drop")
        yl = jnp.zeros((rows_per_part,), jnp.float32).at[tgt].set(
            tl, mode="drop")
        return yh[None], yl[None]

    spec = P(axis)
    return shard_map(local, mesh=mesh,
                     in_specs=(spec,) * 6 + (P(axis), P(axis)),
                     out_specs=(P(axis), P(axis)))(
        vhi, vlo, meta16, step_window, cr_rows, cr_order, xh, xl)


def shard_spmv_df64(matrix: CSRMatrix, mesh: Mesh, axis: str = "rows",
                    config: Optional[SpmvConfig] = None,
                    interpret=False) -> ShardedSpmvDF64:
    """Pack + shard a float64 CSR matrix over a mesh as two f32 planes
    (the multi-chip DOUBLE=1 create_csr_hw_matrix)."""
    P_ = int(np.prod([mesh.shape[a] for a in mesh.axis_names
                      if a == axis]))
    part = balance_rows(matrix, P_)
    from ..kernels.spmv_pallas import combine_meta

    packs = []
    for p in range(P_):
        r0, r1 = int(part.row_start[p]), int(part.row_end[p])
        sub = _slice_rows(matrix, r0, r1)
        vhi, vlo = split_f64(sub.values.astype(np.float64))
        m_hi = CSRMatrix(sub.row_ptr, sub.col_ind, vhi, sub.nr_rows,
                         sub.nr_cols)
        m_lo = CSRMatrix(sub.row_ptr, sub.col_ind, vlo, sub.nr_rows,
                         sub.nr_cols)
        kw = {} if not packs else dict(
            G=packs[0][0].G, tiles_per_step=packs[0][0].tiles_per_step)
        pk_hi = pack_gstream(m_hi, config, shuffle_lanes=False, Q=8,
                             **kw)
        pk_lo = pack_gstream(m_lo, config, shuffle_lanes=False, Q=8,
                             G=pk_hi.G,
                             tiles_per_step=pk_hi.tiles_per_step)
        assert np.array_equal(pk_lo.chunk_row, pk_hi.chunk_row), \
            "hi/lo packs diverged (pack engine must be deterministic)"
        packs.append((pk_hi, pk_lo))

    G = packs[0][0].G
    tps = packs[0][0].tiles_per_step
    n_steps = max(pk.n_steps for pk, _ in packs)
    rows_per_part = int(max(part.row_end - part.row_start))
    n_chunks = n_steps * tps  # per step: tps tiles x 1 plane (Q=8)

    def pad_steps(a, per_step_rows, fill=0):
        cur = a.shape[0] // per_step_rows if per_step_rows else 0
        if cur == n_steps:
            return a
        padshape = ((n_steps - cur) * per_step_rows,) + a.shape[1:]
        return np.concatenate([a, np.full(padshape, fill, a.dtype)],
                              axis=0)

    vhis, vlos, metas, winds, crs, orders = [], [], [], [], [], []
    for pk_hi, pk_lo in packs:
        vhis.append(pad_steps(pk_hi.values, tps * 8))
        vlos.append(pad_steps(pk_lo.values, tps * 8))
        metas.append(pad_steps(combine_meta(pk_hi.cell_idx, pk_hi.route),
                               tps * 8))
        winds.append(pad_steps(pk_hi.step_window, 1))
        cr = pk_hi.chunk_row.reshape(-1).astype(np.int64).copy()
        cr[cr == pk_hi.nr_rows] = rows_per_part
        cr = np.concatenate([cr, np.full(
            n_chunks * STRIPE - cr.shape[0], rows_per_part, np.int64)])
        order = np.argsort(cr, kind="stable")
        crs.append(cr[order].astype(np.int32))
        orders.append(order.astype(np.int32))

    sharding = NamedSharding(mesh, P(axis))
    dev = lambda a: jax.device_put(jnp.asarray(np.stack(a)), sharding)
    return ShardedSpmvDF64(
        mesh=mesh, axis=axis, nr_rows=matrix.nr_rows,
        nr_cols=matrix.nr_cols, row_starts=part.row_start,
        rows_per_part=rows_per_part,
        vhi=dev(vhis), vlo=dev(vlos), meta16=dev(metas),
        step_window=dev(winds), cr_rows=dev(crs), cr_order=dev(orders),
        G=G, tiles_per_step=tps, n_steps=n_steps,
        padded_cols=packs[0][0].padded_cols, interpret=interpret)
