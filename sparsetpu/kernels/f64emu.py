"""Double-float (f64-emulated) arithmetic and SpMV.

TPU has no native f64 ALU path worth using (the reference defaults to
DOUBLE=1, util.h:18-26 / Makefile:18, on an FPGA where f64 is just wider
logic).  The TPU-native equivalent is double-float ("df64"): every f64
value is an unevaluated sum hi + lo of two f32, giving ~48 mantissa bits.

  * split of the input f64 stream into (hi, lo) is exact;
  * products use Dekker's error-free TwoProd (Veltkamp split — no FMA
    primitive is exposed through Mosaic, so the 6-op split form is used);
  * row reductions accumulate the hi/lo/error terms in separate f32
    segment sums, recombined in f64 on the host side of the boundary.

Accuracy: element products are error-free; the reduction carries
~sqrt(row_nnz) * 2^-24 relative error on the compensation terms, i.e.
orders of magnitude inside the reference's 1e-5 absolute verification
tolerance (csr_hw.cpp:1573) where plain f32 fails on cancellation-heavy
rows (see tests/test_f64emu.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_SPLITTER = jnp.float32((1 << 12) + 1)  # Veltkamp split for f32 (24-bit)


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


def df64_add(ahi, alo, bhi, blo):
    """(ahi+alo) + (bhi+blo) as renormalized df64 (Knuth TwoSum chain)."""
    s, e = _two_sum(ahi, bhi)
    e = e + (alo + blo)
    hi, lo = _two_sum(s, e)
    return hi, lo


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
