"""Random sparse matrix generators for tests and benchmarks.

The reference has no fixtures (inputs are external row-sorted files,
README.md:29); the test strategy mandated by SURVEY.md section 4 needs
reproducible synthetic matrices covering the reference's hard cases:
empty rows (csr.cpp:115-117, csr_hw.cpp:340-347), power-law row lengths
(load balance, csr_hw.cpp:459-468), dense rows/cols, banded structure.
"""

from __future__ import annotations

import numpy as np

from .csr import CSRMatrix, INDEX_DTYPE


def random_csr(nr_rows: int, nr_cols: int, density: float = 0.01,
               dtype=np.float64, seed=0, empty_row_frac: float = 0.0,
               powerlaw: bool = False) -> CSRMatrix:
    rng = np.random.default_rng(seed)
    if powerlaw:
        raw = rng.pareto(1.2, size=nr_rows) + 1.0
        raw = raw / raw.sum() * density * nr_rows * nr_cols
        row_nnz = np.minimum(raw.astype(np.int64), nr_cols)
    else:
        lam = density * nr_cols
        row_nnz = np.minimum(rng.poisson(lam, size=nr_rows), nr_cols)
    if empty_row_frac > 0:
        row_nnz[rng.random(nr_rows) < empty_row_frac] = 0
    rows = np.repeat(np.arange(nr_rows, dtype=np.int64), row_nnz)
    # distinct columns per row
    cols = np.empty(rows.shape[0], dtype=np.int64)
    off = 0
    for r in range(nr_rows):
        k = int(row_nnz[r])
        if k:
            cols[off:off + k] = rng.choice(nr_cols, size=k, replace=False)
            off += k
    vals = rng.standard_normal(rows.shape[0]).astype(dtype)
    return CSRMatrix.from_coo(rows.astype(INDEX_DTYPE),
                              cols.astype(INDEX_DTYPE), vals,
                              nr_rows, nr_cols)


def banded_csr(nr_rows: int, nr_cols: int, bandwidth: int = 16,
               dtype=np.float64, seed=0) -> CSRMatrix:
    rng = np.random.default_rng(seed)
    rows, cols = [], []
    for r in range(nr_rows):
        lo = max(0, r - bandwidth)
        hi = min(nr_cols, r + bandwidth + 1)
        if hi > lo:
            c = np.arange(lo, hi)
            rows.append(np.full(c.shape[0], r))
            cols.append(c)
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    vals = rng.standard_normal(rows.shape[0]).astype(dtype)
    return CSRMatrix.from_coo(rows, cols, vals, nr_rows, nr_cols)


def laplace_2d(n: int, dtype=np.float64) -> CSRMatrix:
    """5-point 2D Laplacian on an n x n grid (classic SpMV benchmark and a
    symmetric positive-definite matrix for the CG solver tests)."""
    N = n * n
    idx = np.arange(N).reshape(n, n)
    rows, cols, vals = [idx.ravel()], [idx.ravel()], [np.full(N, 4.0)]
    for dr, dc in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        src = idx[max(0, -dr):n - max(0, dr), max(0, -dc):n - max(0, dc)]
        dst = idx[max(0, dr):n + min(0, dr), max(0, dc):n + min(0, dc)]
        rows.append(src.ravel())
        cols.append(dst.ravel())
        vals.append(np.full(src.size, -1.0))
    return CSRMatrix.from_coo(np.concatenate(rows), np.concatenate(cols),
                              np.concatenate(vals).astype(dtype), N, N)
