"""Public user API.

Mirrors the reference's documented programmer surface (README.md:34-46,
csr_hw_wrapper.h:9-17):

  reference                              sparsetpu
  -------------------------------------  ----------------------------------
  create_csr_hw_matrix(m, hw, bitmap)    pack(matrix, config) -> SparseMatrix
  create_csr_hw_x_vector(hw_x, x, ...)   SparseMatrix.prepare_x(x)
  create_csr_hw_y_vector(...)            (internal: fused on device)
  spmv_hw(hw, hw_x, y, bitmap)           SparseMatrix.spmv(x) / spmv(m, x)
  delete_csr_hw_matrix / _x / _y         (no-ops: GC + XLA allocator)

The aliases with reference names are provided for drop-in familiarity; the
idiomatic surface is ``pack``/``spmv``/``SparseMatrix``.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.csr import CSRMatrix
from ..kernels.spmv_pallas import GStreamDevice
from ..kernels.spmv_xla import spmv_coo_xla, spmm_coo_xla
from ..pack.gather_stream import GStreamMatrix, pack_gstream, unpack_gstream
from ..utils.config import SpmvConfig


class SparseMatrix:
    """A packed, device-resident sparse matrix with an ``@`` operator.

    The user-facing handle combining the reference's csr_hw_matrix array +
    empty-rows bitmap + per-CU bookkeeping (README.md:38) into one object.
    """

    def __init__(self, matrix: CSRMatrix, config: Optional[SpmvConfig] = None,
                 backend: str = "auto", interpret: Optional[bool] = None):
        if interpret is None and config is not None:
            # TARGET=emu knob (Makefile:11): config-selected interpreter
            interpret = config.interpret
        if interpret is None:
            # Pallas kernels need the interpreter off-TPU (the emulation
            # backend of SURVEY.md section 4)
            import jax
            interpret = jax.default_backend() != "tpu"
        self.config = config or SpmvConfig(dtype=matrix.dtype)
        self.nr_rows = matrix.nr_rows
        self.nr_cols = matrix.nr_cols
        self.nr_nzeros = matrix.nr_nzeros
        self.dtype = np.dtype(np.float32) if not self.config.is_double \
            else np.dtype(np.float64)
        self._backend = self._resolve_backend(backend)
        self._device: Optional[GStreamDevice] = None
        self._packed: Optional[GStreamMatrix] = None
        self._parts = None       # CU row partitions (num_partitions > 1)
        self._part_bounds = None
        self._heavy_dev = None   # hybrid heavy-row device (powerlaw)
        if self._backend == "pallas" and self.config.is_double:
            # DOUBLE=1 (util.h:18-26): two-float emulated kernels
            if self.config.num_partitions > 1:
                raise ValueError(
                    "num_partitions > 1 with dtype=float64 is not "
                    "supported on one chip; shard over a mesh with "
                    "sparsetpu.dist instead")
            # DOUBLE rides the flagship fused layout when x (hi + lo
            # planes) fits VMEM; classic windowed df64 otherwise
            dev = None
            if backend in ("auto", "pallas", "fused") and \
                    self.config.vf in (0, 1, 2, 4, 8) and \
                    self.config.block_cols >= 16 * 1024:
                from ..kernels.spmv_fused import pack_fused_df64
                dev = pack_fused_df64(matrix, interpret=interpret,
                                      Q=self.config.vf or None)
            if dev is None:
                from ..kernels.f64emu import DF64GStreamDevice
                dev = DF64GStreamDevice(matrix, interpret=interpret)
            self._device = dev
            self._packed = self._device.meta
            self._source = matrix   # unpack of the hi plane would lose lo
        elif self._backend == "pallas":
            vdt = None
            if self.config.is_bf16:
                import jax.numpy as _jnp
                vdt = _jnp.bfloat16
            if self.config.num_partitions > 1:
                # CU parity (util.h:41-59): nnz-balanced contiguous row
                # partitions, one packed stream + kernel pass each
                # (csr_hw.cpp:459-468 S1 split, one routine not x6)
                from ..pack.balance import balance_rows
                part = balance_rows(matrix, self.config.num_partitions)
                self._part_bounds = (part.row_start, part.row_end)
                self._parts = []
                for s, e in zip(part.row_start, part.row_end):
                    sub = matrix.row_slice(int(s), int(e))
                    fp = None
                    if vdt is None:
                        # partitions ride the fused layout too: x is
                        # shared and resident, only rows split — each
                        # partition is just a smaller RFX pack
                        # (util.h:41-59 CU knob x the flagship path)
                        from ..pack.fused import pack_fused
                        fp = pack_fused(sub, Q=self.config.vf or None)
                        if fp is not None and fp.fill_factor < 0.02:
                            fp = None
                    if fp is not None:
                        from ..kernels.spmv_fused import FusedDevice
                        self._parts.append(FusedDevice(
                            fp, interpret=interpret))
                    else:
                        pk = pack_gstream(sub, self.config,
                                          value_dtype=np.float32)
                        self._parts.append(GStreamDevice(
                            pk, interpret=interpret, value_dtype=vdt))
                self._packed = self._parts[0].meta
                self._source = matrix
            else:
                # fused resident-x layout first (pack/fused.py): whole
                # SpMV in one kernel pass when x fits VMEM; falls back
                # to the classic windowed GStream path
                fp = None
                heavy_dev = None
                heavy_rows_sel = None
                if vdt is None and backend in ("auto", "pallas",
                                               "fused") and \
                        self.config.vf in (0, 1, 2, 4, 8) and \
                        self.config.block_cols >= 16 * 1024:
                    from ..pack.fused import pack_fused
                    # heavy rows blow the fused in-step finish (its
                    # instance count is bounded per step); split them
                    # out to a classic device (whose F pre-reduction
                    # levels handle them) and fuse the light rest —
                    # y = y_light + y_heavy (the powerlaw/webbase case)
                    rn = matrix.row_nnz() if matrix.nr_rows else \
                        np.zeros(0, np.int64)
                    # threshold ladder: 4096 for ordinary matrices; 32
                    # for the scattered/powerlaw profile, whose Q=2
                    # direct finish can only absorb ~16 chunks per row.
                    # The profile picks the rung structurally (median
                    # row occupancy) so the scattered case doesn't pay a
                    # full pack at the 4096 rung first (webbase-class
                    # measured ~40 s wasted there)
                    nzr = rn[rn > 0]
                    med = float(np.median(nzr)) if nzr.size else 8.0
                    ladder = (4096, 32) if med >= 8 else (32,)
                    for thresh in ladder:
                        heavy_rows = np.flatnonzero(rn > thresh)
                        if thresh == 32 and not heavy_rows.size \
                                and len(ladder) > 1:
                            break
                        fuse_target = matrix
                        hd = None
                        if heavy_rows.size:
                            light, heavy = _split_rows(matrix,
                                                       heavy_rows)
                            if heavy.nr_nzeros > 0.7 * matrix.nr_nzeros:
                                continue    # mostly heavy: go classic
                            hd = GStreamDevice(
                                pack_gstream(heavy, self.config,
                                             value_dtype=np.float32),
                                interpret=interpret)
                            fuse_target = light
                        fp = pack_fused(fuse_target,
                                        Q=self.config.vf or None)
                        # gate only truly pathological packs: scattered
                        # 1M-col matrices legitimately land at fill
                        # ~0.04-0.07 and still beat the classic windowed
                        # path ~4x (webbase-class: 30 total slots/nnz
                        # fused vs the locality-bound classic finish)
                        if fp is not None and fp.fill_factor < 0.02:
                            fp = None    # pathological pack
                        if fp is not None:
                            heavy_dev = hd
                            heavy_rows_sel = (heavy_rows if hd is not None
                                              else None)
                            break
                    else:
                        fp = None
                if fp is not None:
                    from ..kernels.spmv_fused import FusedDevice
                    self._packed = fp
                    self._device = FusedDevice(fp, interpret=interpret)
                    self._heavy_dev = heavy_dev
                    if heavy_rows_sel is not None:
                        self._heavy_rows = jnp.asarray(
                            heavy_rows_sel.astype(np.int32))
                    self._source = matrix
                elif backend == "fused":
                    raise ValueError(
                        "fused layout not applicable to this matrix "
                        "(nr_cols too large or pathological structure)")
                else:
                    self._packed = pack_gstream(matrix, self.config,
                                                value_dtype=np.float32)
                    self._device = GStreamDevice(self._packed,
                                                 interpret=interpret,
                                                 value_dtype=vdt)
        else:
            coo = matrix.to_coo()
            self._row_ind = jnp.asarray(coo.row_ind)
            self._col_ind = jnp.asarray(coo.col_ind)
            self._values = jnp.asarray(coo.values.astype(self.dtype))

    @staticmethod
    def _resolve_backend(backend: str) -> str:
        if backend == "fused":          # fused is a pallas sub-mode
            return "pallas"
        if backend != "auto":
            return backend
        return "pallas"

    @property
    def shape(self):
        return (self.nr_rows, self.nr_cols)

    @property
    def packed(self) -> Optional[GStreamMatrix]:
        return self._packed

    def spmv(self, x):
        """y = A @ x (spmv_hw analogue, csr_hw_wrapper.cpp:193-288, with the
        per-block device calls and host accumulation fused into one device
        program).

        f64 configs: an eager host-array ``x`` returns a float64 numpy
        array (joined from the device's two-float planes); a ``DF64`` or
        traced ``x`` returns a ``DF64`` pytree, so df64 SpMV composes
        with jit / lax.while_loop (solvers.cg_df64 runs the reference's
        DOUBLE=1 solve end-to-end on device).  f32 returns a jax.Array."""
        if self._backend == "pallas":
            if self.config.is_double:
                from ..kernels.f64emu import DF64
                if isinstance(x, DF64) or isinstance(x, jax.core.Tracer):
                    yh, yl = self._device.spmv(
                        self._device.prepare_x(x), x_is_packed=True)
                    return DF64(yh, yl)
                return self._device.spmv_f64(x)
            if self._parts is not None:
                # one kernel pass per CU row partition; y segments
                # concatenate in row order (partitions are contiguous)
                return jnp.concatenate([d.spmv(x) for d in self._parts])
            y = self._device.spmv(x)
            hv = getattr(self, "_heavy_dev", None)
            if hv is not None:
                # heavy rows packed compacted: scatter-add their y back
                y = y.at[self._heavy_rows].add(hv.spmv(x))
            return y
        x = jnp.asarray(x, dtype=self.dtype)
        return spmv_coo_xla(self._row_ind, self._col_ind, self._values, x,
                            self.nr_rows)

    def spmm(self, x):
        """Y = A @ X for X of shape (nr_cols, k) (multi-RHS extension) —
        fused kernel: one metadata fetch serves all k right-hand sides
        (for DOUBLE configs too: the df64 SpMM streams the packed matrix
        once for all k, not k host-joined spmv calls)."""
        if self._backend == "pallas":
            if self.config.is_double:
                from ..kernels.f64emu import spmm_df64
                return spmm_df64(self._device, x)
            from ..kernels.spmm import spmm_gstream
            from ..kernels.spmv_fused import FusedDevice
            if self._parts is not None:
                # per-partition SpMM; row segments concatenate in order
                # (partitions are contiguous, same as spmv above)
                x = jnp.asarray(x)

                def part_spmm(d):
                    if isinstance(d, FusedDevice):
                        if d.spmm_applicable(int(x.shape[1])):
                            return d.spmm(x)
                        return jnp.stack([d.spmv(x[:, i]) for i in
                                          range(int(x.shape[1]))], axis=1)
                    return spmm_gstream(d, x)
                return jnp.concatenate([part_spmm(d)
                                        for d in self._parts])
            x = jnp.asarray(x)
            if isinstance(self._device, FusedDevice) and \
                    self._device.spmm_applicable(int(x.shape[1])):
                Y = self._device.spmm(x)
                hv = getattr(self, "_heavy_dev", None)
                if hv is not None:
                    Y = Y.at[self._heavy_rows].add(spmm_gstream(hv, x))
                return Y
            return spmm_gstream(self._classic_device(), x)
        x = jnp.asarray(x)
        return spmm_coo_xla(self._row_ind, self._col_ind, self._values, x,
                            self.nr_rows)

    def __matmul__(self, x):
        if isinstance(x, (SparseMatrix, CSRMatrix)):
            # sparse @ sparse -> SpGEMM (numeric phase on device)
            from ..kernels.spgemm import spgemm
            other = x.unpack() if isinstance(x, SparseMatrix) else x
            if self._packed is None:
                raise ValueError("SpGEMM needs the pallas backend")
            return spgemm(self.unpack(), other)
        if self.config.is_double:
            # keep full input precision on the DOUBLE path: jnp.asarray
            # would truncate float64 x to f32 before the (hi, lo) split
            from ..kernels.f64emu import DF64
            if isinstance(x, DF64):
                return self.spmv(x)
            xa = x if isinstance(x, jax.core.Tracer) else np.asarray(x)
            if xa.ndim == 1:
                return self.spmv(xa)
            if xa.ndim == 2:
                return self.spmm(xa)
            raise ValueError("operand must be a vector or matrix")
        x = jnp.asarray(x)
        if x.ndim == 1:
            return self.spmv(x)
        if x.ndim == 2:
            return self.spmm(x)
        raise ValueError("operand must be a vector or matrix")

    def _classic_device(self):
        """The windowed GStream device (built lazily when the resident
        fused device is active but an op needs the classic kernels —
        SpMM's multi-RHS stream only exists there)."""
        from ..kernels.spmv_fused import FusedDevice
        if not isinstance(self._device, FusedDevice):
            return self._device
        if getattr(self, "_classic", None) is None:
            if getattr(self, "_source", None) is None:
                # pytree-reconstructed handle (jit boundary crossing
                # drops host-side CSR): classic repack is impossible
                raise ValueError(
                    "fused matrix lost its source CSR (pytree "
                    "reconstruction); call this op on the original "
                    "handle")
            pk = pack_gstream(self._source, self.config,
                              value_dtype=np.float32)
            self._classic = GStreamDevice(
                pk, interpret=self._device.interpret)
        return self._classic

    def prepare_x(self, x) -> jax.Array:
        """Pre-pack x for repeated spmv calls (create_csr_hw_x_vector,
        csr_hw_wrapper.cpp:187-191)."""
        if self._backend == "pallas":
            if self._parts is not None or \
                    getattr(self, "_heavy_dev", None) is not None:
                # partitions / hybrid devices pad x independently:
                # keep it unpacked
                return jnp.asarray(x, dtype=jnp.float32)
            return self._device.prepare_x(x)
        return jnp.asarray(x, dtype=self.dtype)

    def spmv_packed_x(self, x_packed):
        if self._backend == "pallas":
            if self._parts is not None:
                return jnp.concatenate(
                    [d.spmv(x_packed) for d in self._parts])
            if getattr(self, "_heavy_dev", None) is not None:
                # hybrid heavy/light: devices pad x differently — take
                # the un-packed path (prepare_x returned raw x)
                return self.spmv(x_packed)
            y = self._device.spmv(x_packed, x_is_packed=True)
            if self.config.is_double:
                from ..kernels.f64emu import join_f64
                return join_f64(np.asarray(y[0]), np.asarray(y[1]))
            return y
        return self.spmv(x_packed)

    def unpack(self) -> CSRMatrix:
        if getattr(self, "_source", None) is not None:
            return self._source
        if self._parts is not None:
            # (only reachable on a pytree-reconstructed handle: __init__
            # keeps _source for partitioned packs)
            raise ValueError("partitioned matrix lost its source CSR; "
                             "unpack the original handle")
        if self._packed is None:
            raise ValueError("XLA-backend matrix: keep the original CSR")
        from ..pack.fused import FusedMatrix
        if isinstance(self._packed, FusedMatrix):
            raise ValueError("fused matrix lost its source CSR (pytree "
                             "reconstruction); unpack the original "
                             "handle")
        return unpack_gstream(self._packed)

    def transpose(self) -> "SparseMatrix":
        """A^T, packed lazily on first access (cached)."""
        if getattr(self, "_transposed", None) is None:
            self._transposed = SparseMatrix(
                self.unpack().transpose(), self.config,
                backend=self._backend,
                interpret=getattr(self._device, "interpret", None))
        return self._transposed

    @property
    def T(self) -> "SparseMatrix":
        return self.transpose()

    # reporting (main.cpp:84-88)
    def storage_overhead(self) -> float:
        if self._parts is not None:
            csr_bytes = (self.nr_nzeros * (4 + 4) + 4 * (self.nr_rows + 1))
            return sum(d.meta.storage_bytes()
                       for d in self._parts) / max(csr_bytes, 1)
        if self._packed is not None:
            return self._packed.storage_overhead()
        return 1.0

    def fill_factor(self) -> float:
        if self._parts is not None:
            return self.nr_nzeros / max(
                sum(d.meta.n_slots for d in self._parts), 1)
        if self._packed is not None:
            return self._packed.fill_factor
        return 1.0


def _split_rows(matrix: CSRMatrix, heavy_rows: np.ndarray):
    """(light, heavy): light is full-shape with the heavy rows' nnz
    removed; heavy is COMPACTED to len(heavy_rows) rows (a mostly-empty
    full-shape heavy matrix made its device's finish build and runtime
    scan ~100x bigger than needed — webbase-class measured 9 s of final
    build over 1M rows holding 7.8k non-empty ones).  Callers scatter
    heavy's y back via ``heavy_rows``."""
    mask = np.zeros(matrix.nr_rows, dtype=bool)
    mask[heavy_rows] = True
    rn = matrix.row_nnz()
    el_heavy = np.repeat(mask, rn)

    counts = np.where(~mask, rn, 0)
    ptr = np.concatenate([[0], np.cumsum(counts)]).astype(
        matrix.row_ptr.dtype)
    light = CSRMatrix(ptr, matrix.col_ind[~el_heavy],
                      matrix.values[~el_heavy],
                      matrix.nr_rows, matrix.nr_cols)
    hptr = np.concatenate(
        [[0], np.cumsum(rn[heavy_rows])]).astype(matrix.row_ptr.dtype)
    heavy = CSRMatrix(hptr, matrix.col_ind[el_heavy],
                      matrix.values[el_heavy],
                      int(heavy_rows.shape[0]), matrix.nr_cols)
    return light, heavy


def _sm_flatten(sm):
    parts = tuple(sm._parts) if sm._parts is not None else None
    if sm._backend == "pallas":
        children = (sm._device, parts,
                    getattr(sm, "_heavy_dev", None),
                    getattr(sm, "_heavy_rows", None), None, None, None)
    else:
        children = (None, None, None, None,
                    sm._row_ind, sm._col_ind, sm._values)
    aux = (sm.config, sm.nr_rows, sm.nr_cols, sm.nr_nzeros, sm.dtype,
           sm._backend, sm._packed, sm._part_bounds)
    return children, aux


def _sm_unflatten(aux, children):
    sm = object.__new__(SparseMatrix)
    (sm.config, sm.nr_rows, sm.nr_cols, sm.nr_nzeros, sm.dtype,
     sm._backend, sm._packed, sm._part_bounds) = aux
    (sm._device, parts, heavy_dev, heavy_rows,
     row_ind, col_ind, values) = children
    sm._parts = list(parts) if parts is not None else None
    sm._heavy_dev = heavy_dev
    sm._heavy_rows = heavy_rows
    sm._source = None     # host CSR does not cross the jit boundary
    if sm._backend != "pallas":
        sm._row_ind, sm._col_ind, sm._values = row_ind, col_ind, values
    return sm


# SparseMatrix flows through jit/scan as an argument (never a closure
# constant — see sparsetpu/kernels/spmv_pallas.py pytree note).
jax.tree_util.register_pytree_node(SparseMatrix, _sm_flatten, _sm_unflatten)


def pack(matrix: CSRMatrix, config: Optional[SpmvConfig] = None,
         backend: str = "auto", interpret: Optional[bool] = None) -> SparseMatrix:
    """create_csr_hw_matrix analogue (README.md:38)."""
    return SparseMatrix(matrix, config, backend=backend, interpret=interpret)


def spmv(matrix: Union[SparseMatrix, CSRMatrix], x,
         config: Optional[SpmvConfig] = None) -> jax.Array:
    if isinstance(matrix, CSRMatrix):
        matrix = pack(matrix, config)
    return matrix.spmv(x)


def unpack(matrix: SparseMatrix) -> CSRMatrix:
    return matrix.unpack()


# --- reference-named aliases (README.md:34-46) ------------------------------

def create_csr_hw_matrix(matrix: CSRMatrix,
                         config: Optional[SpmvConfig] = None) -> SparseMatrix:
    return pack(matrix, config)


def create_csr_hw_x_vector(hw_matrix: SparseMatrix, x) -> jax.Array:
    return hw_matrix.prepare_x(x)


def spmv_hw(hw_matrix: SparseMatrix, hw_x) -> jax.Array:
    return hw_matrix.spmv_packed_x(hw_x)


def delete_csr_hw_matrix(hw_matrix) -> None:
    """No-op: device buffers are freed by GC / the XLA allocator.  Kept so
    reference-shaped programs port line-for-line."""


def delete_csr_hw_x_vector(hw_x) -> None:
    """No-op (see delete_csr_hw_matrix)."""
