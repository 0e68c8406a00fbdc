"""Fused multi-RHS SpMM over the GStream format.

Y = A @ X with X of shape (nr_cols, k).  Extension scoped by BASELINE.json
("CSR SpMM (multi-RHS)"); the reference has no analogue.  The kernel reuses
one metadata fetch (cells/route/values) for all k right-hand sides, so the
per-nnz byte cost amortizes: SpMM at k=8 moves ~1.3 B/nnz/rhs where SpMV
moves ~8.5 B/nnz.

Layout: X is packed to (k, S, 128) stripe planes; the kernel's x-window
block is (k, 8G, 128); outputs are (k, n_tiles, 128) chunk sums, finished
by a fused multi-plane final level (one metadata fetch for all k planes;
per-plane F levels only when heavy rows are present).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..pack.gather_stream import CHUNK, LANES, STRIPE


def _spmm_kernel(step_window_ref, xw_ref, val_ref, meta_ref,
                 out_ref, *, tiles_per_step: int, G: int, k: int,
                 P: int = 1):
    from .spmv_pallas import _split_meta
    Q = CHUNK // P
    for t in range(tiles_per_step):
        sl = slice(t * CHUNK, (t + 1) * CHUNK)
        m32 = jnp.bitwise_and(meta_ref[sl, :].astype(jnp.int32), 0x7FFF)
        i1, j = _split_meta(m32)
        v = val_ref[sl, :]
        if G > 1:
            sub = jnp.bitwise_and(i1, CHUNK - 1)
            grp = jnp.right_shift(i1, 3)
        for kk in range(k):
            if G == 1:
                g1 = jnp.take_along_axis(xw_ref[kk], i1, axis=0)
            else:
                g1 = jnp.zeros((CHUNK, LANES), dtype=val_ref.dtype)
                for g in range(G):
                    part = jnp.take_along_axis(
                        xw_ref[kk, g * CHUNK:(g + 1) * CHUNK, :], sub,
                        axis=0)
                    g1 = jnp.where(grp == g, part, g1)
            g2 = jnp.take_along_axis(g1, j, axis=1)
            prod = v * g2
            if P == 1:
                out_ref[kk, t, :] = jnp.sum(prod, axis=0)
            else:
                for p in range(P):
                    out_ref[kk, t * P + p, :] = jnp.sum(
                        prod[p * Q:(p + 1) * Q, :], axis=0)


@functools.partial(jax.jit,
                   static_argnames=("tiles_per_step", "G", "n_steps", "k",
                                    "P", "interpret"))
def _gstream_chunk_sums_multi(step_window, x3, values, meta16, *,
                              tiles_per_step: int, G: int, n_steps: int,
                              k: int, P: int = 1,
                              interpret: bool = False):
    n_tiles = n_steps * tiles_per_step
    rows_per_step = tiles_per_step * CHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((k, CHUNK * G, LANES),
                         lambda i, sw: (0, sw[i], 0)),
            pl.BlockSpec((rows_per_step, LANES), lambda i, sw: (i, 0)),
            pl.BlockSpec((rows_per_step, LANES), lambda i, sw: (i, 0)),
        ],
        out_specs=pl.BlockSpec((k, tiles_per_step * P, LANES),
                               lambda i, sw: (0, i, 0)),
    )
    kernel = functools.partial(_spmm_kernel, tiles_per_step=tiles_per_step,
                               G=G, k=k, P=P)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, n_tiles * P, LANES), x3.dtype),
        interpret=interpret,
    )(step_window, x3, values, meta16)


def spmm_gstream(device, x_multi) -> jax.Array:
    """Y = A @ X for a GStreamDevice and X (nr_cols, k).  Returns
    (nr_rows, k)."""
    meta = device.meta
    x_multi = jnp.asarray(x_multi, dtype=device.dtype)
    k = int(x_multi.shape[1])
    pad = meta.padded_cols - meta.nr_cols
    if pad:
        x_multi = jnp.pad(x_multi, ((0, pad), (0, 0)))
    # (k, S, 128) stripe planes
    x3 = x_multi.T.reshape(k, -1, STRIPE)
    cs = _gstream_chunk_sums_multi(
        device.step_window, x3, device.values, device.meta16,
        tiles_per_step=meta.tiles_per_step, G=meta.G,
        n_steps=meta.n_steps, k=k, P=meta.planes,
        interpret=device.interpret)
    # fused multi-plane finish: one metadata fetch serves all k planes
    from .spmv_pallas import _FinalLevel, _FinalLevelV2
    if isinstance(device.final, _FinalLevelV2) and not device.finish:
        return _final_v2_sums_multi(device.final, cs, meta.nr_rows)
    if isinstance(device.final, _FinalLevel) and not device.finish:
        return _final_gather_sums_multi(device.final, cs, meta.nr_rows)
    return jnp.stack([device.finish_vec(cs[kk]) for kk in range(k)],
                     axis=1)


def _final_multi_kernel(sw_ref, *refs, tiles_per_step: int, G: int,
                        nw: int, k: int):
    """Multi-plane variant of the final gather-accumulate level (see
    spmv_pallas._final_kernel): nw window specs of shape (k, 8G, 128),
    out block (k, tps, 128)."""
    xw_refs = refs[:nw]
    cell_ref, route_ref, out_ref = refs[nw:]
    i = pl.program_id(0)
    first = sw_ref[i, nw] == 1
    accs = []
    for kk in range(k):
        parts = []
        for t in range(tiles_per_step):
            sl = slice(t * CHUNK, (t + 1) * CHUNK)
            i1 = cell_ref[sl, :].astype(jnp.int32)
            j = route_ref[sl, :].astype(jnp.int32)
            sub = jnp.bitwise_and(i1, CHUNK - 1)
            grp = jnp.right_shift(i1, 3)
            g1 = jnp.zeros((CHUNK, LANES), dtype=out_ref.dtype)
            for w in range(nw):
                for g in range(G):
                    part = jnp.take_along_axis(
                        xw_refs[w][kk, g * CHUNK:(g + 1) * CHUNK, :], sub,
                        axis=0)
                    g1 = jnp.where(grp == w * G + g, part, g1)
            g2 = jnp.take_along_axis(g1, j, axis=1)
            parts.append(jnp.sum(g2, axis=0))
        accs.append(jnp.stack(parts, axis=0))
    acc = jnp.stack(accs, axis=0)

    @pl.when(first)
    def _():
        out_ref[...] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[...] = out_ref[...] + acc


def _final_v2_multi_kernel(sw_ref, tb_ref, *refs, tiles_per_step: int,
                           GL_f: int, nwin: int, k: int):
    """Multi-plane variant of the flat V2 final (see
    spmv_pallas._final_kernel_v2): per-tile dynamic window bases shared
    by all k chunk-sum planes."""
    xw_refs = refs[:nwin]
    cell_ref, route_ref, out_ref = refs[nwin:]
    i = pl.program_id(0)
    first = sw_ref[i, nwin] == 1
    accs = []
    for kk in range(k):
        parts = []
        for t in range(tiles_per_step):
            sl = slice(t * CHUNK, (t + 1) * CHUNK)
            i1 = cell_ref[sl, :].astype(jnp.int32)
            j = route_ref[sl, :].astype(jnp.int32)
            sub = jnp.bitwise_and(i1, CHUNK - 1)
            grp = jnp.right_shift(i1, 3)
            g1 = jnp.zeros((CHUNK, LANES), dtype=out_ref.dtype)
            for w in range(nwin):
                b = tb_ref[i, t * nwin + w]
                xwin = xw_refs[w][kk, pl.ds(b * CHUNK, CHUNK * GL_f), :]
                for g in range(GL_f):
                    part = jnp.take_along_axis(
                        xwin[g * CHUNK:(g + 1) * CHUNK, :], sub, axis=0)
                    g1 = jnp.where(grp == w * GL_f + g, part, g1)
            g2 = jnp.take_along_axis(g1, j, axis=1)
            parts.append(jnp.sum(g2, axis=0))
        accs.append(jnp.stack(parts, axis=0))
    acc = jnp.stack(accs, axis=0)

    @pl.when(first)
    def _():
        out_ref[...] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[...] = out_ref[...] + acc


def _final_v2_sums_multi(fin, cs, nr_rows: int) -> jax.Array:
    """Apply a _FinalLevelV2 to (k, n_positions/128, 128) chunk-sum
    planes; returns (nr_rows, k)."""
    k = int(cs.shape[0])
    flat = cs.reshape(k, -1)
    need = fin.x_pad_rows * STRIPE
    if flat.shape[1] < need:
        flat = jnp.pad(flat, ((0, 0), (0, need - flat.shape[1])))
    x3 = flat[:, :need].reshape(k, -1, STRIPE)
    tps, GL_f, nwin, GS = fin.tiles_per_step, fin.GL_f, fin.nwin, fin.GS
    rows_per_step = tps * CHUNK

    def win_spec(w):
        return pl.BlockSpec((k, CHUNK * GS, LANES),
                            lambda i, sw, tb, w=w: (0, sw[i, w], 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(fin.n_steps,),
        in_specs=[win_spec(w) for w in range(nwin)] + [
            pl.BlockSpec((rows_per_step, LANES), lambda i, sw, tb: (i, 0)),
            pl.BlockSpec((rows_per_step, LANES), lambda i, sw, tb: (i, 0)),
        ],
        out_specs=pl.BlockSpec((k, tps, LANES),
                               lambda i, sw, tb: (0, sw[i, nwin + 1], 0)),
    )
    kernel = functools.partial(_final_v2_multi_kernel, tiles_per_step=tps,
                               GL_f=GL_f, nwin=nwin, k=k)
    grid = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, fin.nt_pad, LANES), cs.dtype),
        interpret=fin.interpret,
    )(fin.step_meta, fin.tile_bases, *([x3] * nwin), fin.cell_idx,
      fin.route)
    y = grid.reshape(k, -1)[:, :nr_rows]
    if fin.spill_pos is not None:
        adds = jnp.take(cs.reshape(k, -1), fin.spill_pos, axis=1,
                        mode="clip")
        y = y.at[:, fin.spill_row].add(adds, mode="drop")
    return y.T


def _final_gather_sums_multi(fin, cs, nr_rows: int) -> jax.Array:
    """Apply a _FinalLevel to (k, n_positions/128, 128) chunk-sum planes;
    returns (nr_rows, k)."""
    k = int(cs.shape[0])
    flat = cs.reshape(k, -1)
    need = fin.x_pad_rows * STRIPE
    if flat.shape[1] < need:
        flat = jnp.pad(flat, ((0, 0), (0, need - flat.shape[1])))
    x3 = flat[:, :need].reshape(k, -1, STRIPE)
    tps, G, nw = fin.tiles_per_step, fin.G, fin.nw
    rows_per_step = tps * CHUNK

    def win_spec(b):
        return pl.BlockSpec((k, CHUNK * G, LANES),
                            lambda i, sw, b=b: (0, sw[i, b], 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(fin.n_steps,),
        in_specs=[win_spec(b) for b in range(nw)] + [
            pl.BlockSpec((rows_per_step, LANES), lambda i, sw: (i, 0)),
            pl.BlockSpec((rows_per_step, LANES), lambda i, sw: (i, 0)),
        ],
        out_specs=pl.BlockSpec((k, tps, LANES),
                               lambda i, sw: (0, sw[i, nw + 1], 0)),
    )
    kernel = functools.partial(_final_multi_kernel, tiles_per_step=tps,
                               G=G, nw=nw, k=k)
    grid = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, fin.nt_pad, LANES), cs.dtype),
        interpret=fin.interpret,
    )(fin.step_meta, *([x3] * nw), fin.cell_idx, fin.route)
    y = grid.reshape(k, -1)[:, :nr_rows]
    if fin.spill_pos is not None:
        adds = jnp.take(cs.reshape(k, -1), fin.spill_pos, axis=1,
                        mode="clip")
        y = y.at[:, fin.spill_row].add(adds, mode="drop")
    return y.T
