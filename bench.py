"""Driver benchmark: prints ONE JSON line with the headline metric.

Headline: SpMV throughput in Gnnz/s on a SuiteSparse-like random matrix
(~10M nnz, 50 nnz/row), single chip, f32, measured with differential
in-jit chained timing (host-side per-dispatch timing is unreliable through
the device tunnel; see sparsetpu/bench/micro.py).  vs_baseline is the
speedup over the reference hardware's bandwidth ceiling: the ZCU102's HP
ports move ~10 GB/s and the packed stream costs ~10 B/nnz for f32
(util.h:61, README.md:61-63) => ~1.0 Gnnz/s.  The reference publishes no
measured numbers (BASELINE.md), so its roofline is the fairest stand-in.

Failure handling (the reference prints its measured protocol on EVERY
run, main.cpp:61-75; this bench must too): TPU backend init through the
device tunnel can hang for minutes before raising UNAVAILABLE — it did
in the round-3 official capture, which died rc=1 with no JSON line.  So
the backend is probed in a SUBPROCESS with a hard timeout and bounded
retries; if the chip is gone, the bench forces the CPU platform (the
same jax.config trick tests/conftest.py and __graft_entry__ use, because
the tunnel plugin force-registers over JAX_PLATFORMS) and runs a scaled-
down interpret-mode protocol, emitting one JSON line with
"backend": "cpu-fallback" and rc=0.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REFERENCE_CEILING_GNNZ_S = 1.0  # ZCU102 HP ports ~10 GB/s / ~10 B per nnz


def _probe_tpu(attempts: int = 3, timeout_s: int = 150) -> bool:
    """Bounded-time TPU availability probe in a child process.

    jax backend init is done in a subprocess because a dead tunnel makes
    it HANG (not raise) for several minutes; the parent stays clean to
    force the CPU platform if the probe fails."""
    code = "import jax; print(jax.default_backend())"
    for i in range(attempts):
        try:
            out = subprocess.run(
                [sys.executable, "-c", code], capture_output=True,
                text=True, timeout=timeout_s)
            if out.returncode == 0 and out.stdout.strip().endswith("tpu"):
                return True
        except subprocess.TimeoutExpired:
            pass
        if i + 1 < attempts:
            time.sleep(15)
    return False


def _force_cpu() -> None:
    """Force the CPU platform before the first jax operation.

    The tunnel plugin force-registers the TPU platform over
    JAX_PLATFORMS, so the env var alone is not enough — override the
    config and flush the backend cache (same mechanism as
    tests/conftest.py)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
        import jax._src.xla_bridge as _xb
        _xb._clear_backends()
    except Exception:
        pass


def run(on_tpu: bool, backend: str) -> None:
    import jax
    import jax.numpy as jnp
    from sparsetpu.formats.random import random_csr
    from sparsetpu.formats.gold import spmv_gold, verification
    from sparsetpu.api.api import SparseMatrix

    if on_tpu:
        nr, nc = 200_000, 100_000   # ~10M nnz headline protocol
    else:
        nr, nc = 40_000, 20_000     # interpret mode: liveness, not speed
    m = random_csr(nr, nc, density=0.0005, seed=1, dtype=np.float32)
    sm = SparseMatrix(m, backend="pallas", interpret=not on_tpu)
    d = sm._device
    x = np.random.default_rng(0).standard_normal(m.nr_cols)
    x2 = d.prepare_x(x)

    # correctness gate first: a fast wrong kernel scores zero
    y = np.asarray(d.spmv(x2, x_is_packed=True))
    errors = verification(spmv_gold(m, x), y, diff_thres=1e-2,
                          rel_thres=1e-3)

    n, n_base = (256, 8) if on_tpu else (4, 2)

    def build(k):
        # d passes through jit as a pytree ARGUMENT: closing over it would
        # bake ~100 MB of packed arrays into the HLO as constants.
        @jax.jit
        def loop(dev, x2i):
            def body(i, carry):
                x2c, acc = carry
                yy = dev.spmv(x2c, x_is_packed=True)
                return (x2c + yy[0] * 1e-30, acc + yy[0])
            return jax.lax.fori_loop(0, k, body,
                                     (x2i, jnp.float32(0)))[1]
        return loop

    loops = build(n), build(n_base)
    loop_n = lambda xi: loops[0](d, xi)
    loop_b = lambda xi: loops[1](d, xi)
    float(loop_n(x2)), float(loop_b(x2))
    diffs = []
    for r in range(5):
        xr = x2 + jnp.float32(1e-6 * (r + 1))
        t0 = time.perf_counter()
        float(loop_b(xr))
        tb = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop_n(xr))
        tn = time.perf_counter() - t0
        diffs.append((tn - tb) / (n - n_base))
    diffs.sort()
    per_call = max(diffs[len(diffs) // 2], 1e-9)
    gnnz = m.nr_nzeros / per_call / 1e9
    if errors:
        gnnz = 0.0

    # honest context numbers alongside the vs-FPGA speedup: fraction of
    # this chip's HBM roofline (bytes actually moved / peak bandwidth)
    # and the pack fill factor that gates it (VERDICT r1 item 8)
    from sparsetpu.bench.harness import detect_hbm_gbps
    moved_bytes = sm.packed.storage_bytes() if sm.packed else 0
    floor_s = moved_bytes / (detect_hbm_gbps() * 1e9)
    print(json.dumps({
        "metric": "spmv_throughput",
        "value": round(gnnz, 3),
        "unit": "Gnnz/s",
        # vs_baseline compares against the REFERENCE's hardware ceiling
        # (~1 Gnnz/s on ZCU102 HP ports) — a cross-hardware speedup, not
        # a same-chip efficiency; roofline_frac is THIS chip's honest
        # efficiency number (fraction of the HBM bound for bytes moved)
        "vs_baseline": round(gnnz / REFERENCE_CEILING_GNNZ_S, 2),
        "roofline_frac": round(floor_s / per_call, 3) if gnnz else 0.0,
        "fill": round(sm.fill_factor(), 3),
        "backend": backend,
        "layout": {"G": sm.packed.G, "Q": sm.packed.Q,
                   "final": ("fused-instep"
                             if getattr(sm._device, "final",
                                        None) is None
                             else type(sm._device.final).__name__)},
    }), flush=True)


def main():
    forced = os.environ.get("SPARSETPU_BENCH_BACKEND")
    if forced:
        backend = forced
    else:
        backend = "tpu" if _probe_tpu() else "cpu-fallback"
    if backend != "tpu":
        _force_cpu()
    try:
        run(on_tpu=backend == "tpu", backend=backend)
        return
    except Exception as e:
        err = f"{type(e).__name__}: {e}"
    if backend == "tpu" and not forced:
        # tunnel died mid-run: salvage the capture with a clean-process
        # CPU fallback (jax cannot switch platforms once initialized)
        env = dict(os.environ, SPARSETPU_BENCH_BACKEND="cpu-fallback")
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True,
                             timeout=3600)
        line = out.stdout.strip().splitlines()
        if out.returncode == 0 and line:
            print(line[-1], flush=True)
            return
    # last resort: still one parseable JSON line, rc=0 — a lost tunnel
    # must never cost the round its official artifact
    print(json.dumps({
        "metric": "spmv_throughput", "value": 0.0, "unit": "Gnnz/s",
        "vs_baseline": 0.0, "backend": "error", "error": err[:500],
    }), flush=True)


if __name__ == "__main__":
    main()
