"""Pure-XLA SpMV/SpMM paths (no Pallas).

Role in the framework (SURVEY.md section 4, "emulation as the fake
backend"): the reference tests multi-CU hardware behaviour in the SDSoC
emulator without a board (Makefile:103-108); here the XLA path runs the same
op semantics on any backend (CPU in unit tests, TPU as a fallback for shapes
the Pallas kernel does not cover, e.g. x too large for VMEM).

Semantics contract: spmv_gold (csr.cpp:184-194).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("nr_rows",))
def spmv_coo_xla(row_ind: jax.Array, col_ind: jax.Array, values: jax.Array,
                 x: jax.Array, nr_rows: int) -> jax.Array:
    """y[r] = sum over e of values[e] * x[col_ind[e]] for row_ind[e] == r.

    COO-style gather + segment-sum; XLA lowers the segment sum to a
    scatter-add.  Indices must be in-bounds (pack guarantees this).
    """
    prod = values * jnp.take(x, col_ind, indices_are_sorted=False,
                             unique_indices=False, mode="clip")
    return jax.ops.segment_sum(prod, row_ind, num_segments=nr_rows,
                               indices_are_sorted=True)


@functools.partial(jax.jit, static_argnames=("nr_rows",))
def spmm_coo_xla(row_ind: jax.Array, col_ind: jax.Array, values: jax.Array,
                 x: jax.Array, nr_rows: int) -> jax.Array:
    """Multi-RHS: Y = A @ X with X (nr_cols, k)."""
    prod = values[:, None] * jnp.take(x, col_ind, axis=0,
                                      mode="clip")
    return jax.ops.segment_sum(prod, row_ind, num_segments=nr_rows,
                               indices_are_sorted=True)


def spmv_chunked_xla(chunk_sums: jax.Array, chunk_rows: jax.Array,
                     nr_rows: int) -> jax.Array:
    """Finish pass shared with the Pallas kernel v1: reduce per-chunk partial
    sums (one chunk = 8 stream slots of a single row) into y.

    This is the XLA analogue of the reference's host-side ``accum_results``
    scatter (csr_hw.cpp:1531-1565): partial results accumulated into the
    final y, with padding chunks routed to a trap row (the bitmap-guided
    skip, csr_hw.cpp:1550-1553, becomes an index-based skip).
    """
    y = jax.ops.segment_sum(chunk_sums, chunk_rows, num_segments=nr_rows + 1,
                            indices_are_sorted=True)
    return y[:nr_rows]  # row nr_rows is the padding trap
