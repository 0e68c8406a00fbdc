"""Round-5 suite driver: per-row wall timing + incremental JSON.

Writes BENCH_SUITE_r05.json after EVERY row so a timeout never loses
the round's artifact, and prints per-row phase timings to find slow
rows.  No output pipes — stdout is unbuffered via -u.
"""
import json
import sys
import time

OUT = "/root/repo/BENCH_SUITE_r05.json"


def main():
    from sparsetpu.bench.suite import _structured_suite
    from sparsetpu.formats.suitesparse import CLASSIC_SUITE, fetch
    from sparsetpu.bench.harness import bench_spmv
    from sparsetpu.utils.config import SpmvConfig
    import numpy as np

    structured = _structured_suite()
    names = sys.argv[1:] or (list(CLASSIC_SUITE) + list(structured))
    rows = []
    for name in names:
        t0 = time.time()
        if name in structured:
            m, is_real = structured[name](), "structured"
        else:
            try:
                m, is_real = fetch(name, allow_synthetic=True)
            except (ConnectionError, KeyError) as e:
                rows.append({"matrix": name, "status": "skip",
                             "reason": str(e)})
                continue
        t_fetch = time.time() - t0
        m.values = m.values.astype(np.float32)
        t0 = time.time()
        r = bench_spmv(m, name=name, config=SpmvConfig(dtype=np.float32))
        t_bench = time.time() - t0
        status = (is_real if isinstance(is_real, str)
                  else ("real" if is_real else "synthetic"))
        rows.append({
            "matrix": name, "status": status,
            "rows": r.nr_rows, "cols": r.nr_cols, "nnz": r.nr_nzeros,
            "pack_ms": round(r.pack_ms, 1),
            "compile_ms": round(r.compile_ms, 1),
            "gnnz_s": round(r.gnnz_s, 3),
            "gflop_s": round(r.gflop_s, 3),
            "roofline_frac": round(r.roofline_frac, 3),
            "fill": round(r.fill_factor, 3),
            "layout": {"G": r.layout_g, "Q": r.layout_q},
            "verify": "PASS" if r.verify_errors == 0 else "FAIL",
        })
        with open(OUT, "w") as f:
            f.write(json.dumps(rows, indent=1))
        print(f"{name:18s} {r.nr_nzeros:9d}nnz {r.gnnz_s:7.2f} Gnnz/s "
              f"fill={r.fill_factor:.3f} pack={r.pack_ms/1e3:.1f}s "
              f"compile={r.compile_ms/1e3:.1f}s row_wall={t_bench:.0f}s "
              f"fetch={t_fetch:.0f}s "
              f"{'PASS' if r.verify_errors == 0 else 'FAIL'}", flush=True)
    print("DONE", len(rows))


if __name__ == "__main__":
    main()
