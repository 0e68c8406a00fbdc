"""Native (C++) host-side runtime: fast matrix loader, pack engine, gold.

The reference's host side is C++ on the Zynq ARM (csr.cpp, csr_hw.cpp);
here the equivalent hot host paths (file parsing, repack inner loops,
verification) are C++ behind ctypes, built by sparsetpu/native/Makefile.
Everything degrades gracefully to the NumPy implementations when the
shared library has not been built.
"""

from . import loader  # noqa: F401
