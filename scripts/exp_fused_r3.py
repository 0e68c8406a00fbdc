"""On-chip measurement of the fused resident-x SpMV (round 3)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from sparsetpu.formats.random import random_csr
from sparsetpu.formats.gold import spmv_gold, verification
from sparsetpu.pack.fused import pack_fused
from sparsetpu.kernels.spmv_fused import FusedDevice

def main():
    m = random_csr(200_000, 100_000, density=0.0005, seed=1)
    t0 = time.time()
    p = pack_fused(m)
    print(f"pack {time.time()-t0:.1f}s fill={p.fill_factor:.3f} "
          f"steps={p.n_steps} slabs={p.n_slabs} F1={p.F1_max} F2={p.F2_max} "
          f"OBp={p.OBp} GX={p.GX} f1_mean={float(p.fin1_cnt.mean()):.1f}",
          flush=True)
    dev = FusedDevice(p)
    x = np.random.default_rng(0).standard_normal(m.nr_cols)
    x2 = dev.prepare_x(x)

    t0 = time.time()
    y = np.asarray(dev.spmv(x2, x_is_packed=True))
    print(f"first call (compile) {time.time()-t0:.1f}s", flush=True)
    errors = verification(spmv_gold(m, x), y, diff_thres=1e-2,
                          rel_thres=1e-3)
    print("verify errors:", errors, flush=True)

    # chained differential timing (dev as pytree arg)
    def build(k):
        @jax.jit
        def loop(d, xi):
            def body(_, carry):
                xc, acc = carry
                yy = d.spmv(xc, x_is_packed=True)
                return (xc + yy[0] * 1e-30, acc + yy[0])
            return jax.lax.fori_loop(0, k, body, (xi, jnp.float32(0)))[1]
        return loop
    n, nb = 256, 8
    ln, lb = build(n), build(nb)
    float(ln(dev, x2)), float(lb(dev, x2))
    diffs = []
    for r in range(5):
        xr = x2 + jnp.float32(1e-6 * (r + 1))
        t0 = time.perf_counter(); float(lb(dev, xr)); tb = time.perf_counter() - t0
        t0 = time.perf_counter(); float(ln(dev, xr)); tn = time.perf_counter() - t0
        diffs.append((tn - tb) / (n - nb))
    diffs.sort()
    per = diffs[len(diffs)//2]
    print(f"per-spmv {per*1e6:.1f} us -> {m.nr_nzeros/per/1e9:.1f} Gnnz/s",
          flush=True)

if __name__ == "__main__":
    main()
