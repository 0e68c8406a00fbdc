"""Benchmark protocol (the reference main.cpp run report, extended) and
measured-hardware micro benchmarks."""

from .harness import BenchResult, bench_spmv, detect_hbm_gbps
from .scaling import scaling_report

__all__ = ["BenchResult", "bench_spmv", "detect_hbm_gbps",
           "scaling_report"]
