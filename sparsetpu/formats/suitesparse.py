"""SuiteSparse Matrix Collection ingestion.

The reference benchmarks on externally supplied matrix files
(/root/reference/README.md:23-29: ``./run.elf <matrix-file>`` over
row-sorted triplet files, in practice SuiteSparse exports).  This module
is the framework's fetch-and-cache helper for the collection:

  * ``fetch(group, name)`` downloads the MatrixMarket tarball from the
    collection mirror, caches it under ``$SPARSETPU_SS_DIR`` (default
    ``~/.cache/sparsetpu/suitesparse``), extracts the ``.mtx`` and loads
    it through the standard reader (formats/io.py — the same parser that
    reads the reference's triplet format).
  * Pre-placed files are honored: drop ``<name>.mtx`` (or the tarball)
    into the cache dir on an air-gapped machine and ``fetch`` uses it
    without touching the network.
  * ``synthetic_stand_in(name)`` builds a random matrix with the real
    matrix's published shape/nnz statistics for environments with no
    network AND no pre-placed files — clearly labeled, so benchmark
    tables can distinguish real inputs from stand-ins.

The classic SpMV benchmark set (Williams et al., "Optimization of sparse
matrix-vector multiplication on emerging multicore platforms", SC'07) is
registered in ``CLASSIC_SUITE`` with published dimensions.
"""

from __future__ import annotations

import dataclasses
import os
import tarfile
from typing import Dict, Optional, Tuple

import numpy as np

from .csr import CSRMatrix
from .io import read_matrix

MIRRORS = (
    "https://suitesparse-collection-website.herokuapp.com/MM/{group}/{name}.tar.gz",
    "https://sparse.tamu.edu/MM/{group}/{name}.tar.gz",
)


@dataclasses.dataclass(frozen=True)
class MatrixInfo:
    group: str
    name: str
    rows: int
    cols: int
    nnz: int              # nonzeros after symmetric expansion
    kind: str = "general"  # general | symmetric | powerlaw


# The classic SpMV set: published (rows, cols, nnz) from the collection.
CLASSIC_SUITE: Dict[str, MatrixInfo] = {
    "pdb1HYS": MatrixInfo("Williams", "pdb1HYS", 36_417, 36_417,
                          4_344_765, "symmetric"),
    "consph": MatrixInfo("Williams", "consph", 83_334, 83_334,
                         6_010_480, "symmetric"),
    "cant": MatrixInfo("Williams", "cant", 62_451, 62_451,
                       4_007_383, "symmetric"),
    "pwtk": MatrixInfo("Boeing", "pwtk", 217_918, 217_918,
                       11_524_432, "symmetric"),
    "rma10": MatrixInfo("Bova", "rma10", 46_835, 46_835,
                        2_329_092, "general"),
    "shipsec1": MatrixInfo("DNVS", "shipsec1", 140_874, 140_874,
                           3_568_176, "symmetric"),
    "mac_econ_fwd500": MatrixInfo("Williams", "mac_econ_fwd500",
                                  206_500, 206_500, 1_273_389, "general"),
    "scircuit": MatrixInfo("Hamm", "scircuit", 170_998, 170_998,
                           958_936, "general"),
    "webbase-1M": MatrixInfo("Williams", "webbase-1M", 1_000_005,
                             1_000_005, 3_105_536, "powerlaw"),
    "cop20k_A": MatrixInfo("Williams", "cop20k_A", 121_192, 121_192,
                           2_624_331, "symmetric"),
}


def cache_dir() -> str:
    return os.environ.get(
        "SPARSETPU_SS_DIR",
        os.path.join(os.environ.get("SPARSETPU_CACHE",
                                    os.path.expanduser("~/.cache/sparsetpu")),
                     "suitesparse"))


def _find_cached_mtx(name: str) -> Optional[str]:
    base = cache_dir()
    for cand in (os.path.join(base, f"{name}.mtx"),
                 os.path.join(base, name, f"{name}.mtx")):
        if os.path.exists(cand):
            return cand
    return None


def _extract(tar_path: str, name: str) -> str:
    base = cache_dir()
    with tarfile.open(tar_path) as tf:
        for member in tf.getmembers():
            if member.name.endswith(f"{name}.mtx"):
                member.name = os.path.join(name, f"{name}.mtx")
                tf.extract(member, base)
                return os.path.join(base, name, f"{name}.mtx")
    raise FileNotFoundError(f"{name}.mtx not found inside {tar_path}")


def download(group: str, name: str, timeout: float = 120.0) -> str:
    """Fetch the MatrixMarket tarball into the cache; returns the .mtx
    path.  Raises ConnectionError (with the per-mirror reasons) when the
    network is unreachable — callers can fall back to
    synthetic_stand_in."""
    mtx = _find_cached_mtx(name)
    if mtx:
        return mtx
    base = cache_dir()
    os.makedirs(base, exist_ok=True)
    tar_path = os.path.join(base, f"{name}.tar.gz")
    if not os.path.exists(tar_path):
        import urllib.request
        errs = []
        for url_t in MIRRORS:
            url = url_t.format(group=group, name=name)
            try:
                with urllib.request.urlopen(url, timeout=timeout) as r, \
                        open(tar_path + ".part", "wb") as f:
                    while True:
                        chunk = r.read(1 << 20)
                        if not chunk:
                            break
                        f.write(chunk)
                os.replace(tar_path + ".part", tar_path)
                break
            except Exception as e:
                errs.append(f"{url}: {type(e).__name__}: {e}")
        else:
            raise ConnectionError(
                "SuiteSparse download failed on every mirror (offline "
                "environment? pre-place the .mtx in "
                f"{base!r} instead):\n  " + "\n  ".join(errs))
    return _extract(tar_path, name)


def fetch(name: str, group: Optional[str] = None,
          allow_synthetic: bool = False) -> Tuple[CSRMatrix, bool]:
    """Load a SuiteSparse matrix as CSR.  Returns (matrix, is_real);
    ``is_real`` is False when the download failed and a synthetic
    stand-in (same shape / nnz statistics) was substituted
    (allow_synthetic=True only)."""
    info = CLASSIC_SUITE.get(name)
    if group is None:
        if info is None:
            raise KeyError(
                f"{name!r} is not in CLASSIC_SUITE; pass group=")
        group = info.group
    try:
        path = download(group, name)
        return read_matrix(path), True
    except ConnectionError:
        if not allow_synthetic or info is None:
            raise
        return synthetic_stand_in(name), False


def synthetic_stand_in(name: str, seed: int = 1234) -> CSRMatrix:
    """A random matrix with the registered matrix's published shape and
    nnz count (power-law row distribution for web-graph-like entries).
    A stand-in for *throughput protocol* runs on air-gapped machines —
    numerics match the format, not the original operator."""
    import zlib

    from .random import random_csr
    info = CLASSIC_SUITE[name]
    density = info.nnz / (info.rows * float(info.cols))
    # stable per-name seed: Python's str hash is randomized per process
    # (PYTHONHASHSEED), which made stand-ins — and so suite pack times
    # and layout-chooser decisions — irreproducible across runs
    return random_csr(info.rows, info.cols, density=density,
                      seed=seed ^ (zlib.crc32(name.encode()) & 0xFFFF),
                      dtype=np.float32,
                      powerlaw=(info.kind == "powerlaw"))
