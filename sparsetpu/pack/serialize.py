"""Packed-matrix serialization (checkpoint/resume of the repack artifact).

The reference rebuilds hw_matrix on every run and reports repack time as a
first-class cost (main.cpp:67-72); SURVEY.md section 5 calls out the packed
matrix as the checkpoint-able artifact.  Save/load round-trips both packed
formats as .npz archives.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .gather_stream import GStreamMatrix


def save_gstream(path: str, p: GStreamMatrix) -> None:
    np.savez_compressed(
        path, values=p.values, cell_idx=p.cell_idx, route=p.route,
        chunk_row=p.chunk_row, step_window=p.step_window,
        meta=np.array([p.nr_rows, p.nr_cols, p.nr_nzeros, p.G,
                       p.tiles_per_step, p.padded_cols], dtype=np.int64))


def load_gstream(path: str) -> GStreamMatrix:
    z = np.load(path)
    meta = z["meta"]
    return GStreamMatrix(
        values=z["values"], cell_idx=z["cell_idx"], route=z["route"],
        chunk_row=z["chunk_row"], step_window=z["step_window"],
        nr_rows=int(meta[0]), nr_cols=int(meta[1]), nr_nzeros=int(meta[2]),
        G=int(meta[3]), tiles_per_step=int(meta[4]),
        padded_cols=int(meta[5]))
