"""Kernel micro-benchmarks: isolate the cost of each stage of the SpMV
kernel on real hardware (per-call blocked timing — see
.claude/skills/verify/SKILL.md for why amortized loops lie here).

Stage ladder (each adds one mechanism):
  stream   read value tiles, sum sublanes              -> HBM floor
  lane     + lane gather (route)                       -> + take_along(axis=1)
  dual     + sublane gather (cells, G=1)               -> + take_along(axis=0)
  chain-G  + G-group select chain                      -> window scaling
  full     the production kernel                       -> + int16 widening etc.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import LANES, SUBLANES as CHUNK


def timeit(f, n=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(f())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def timeit_chained(make_call, xw, n=1024, n_base=16, reps=5):
    """Trustworthy device timing on a tunneled runtime.

    Two lies must be defeated here (measured, see bench notes):
      1. ``jax.block_until_ready`` does NOT wait for device compute through
         the tunnel — only a device->host readback does, and that readback
         costs a fixed ~24 ms round trip.
      2. Results of identical dispatches can be served from cache, and XLA
         hoists loop-invariant work, so each in-loop invocation must be
         data-dependent on the previous one.

    So: run the call chained inside one jit, force a scalar readback, and
    report the DIFFERENTIAL (n minus n_base iterations) per call.  The
    round trip jitters by a few ms, so n must be large enough that
    n * per_call clears the jitter, and the median (not min) of the
    differential is reported."""

    def build(k):
        @jax.jit
        def loop(xw):
            def body(i, carry):
                xw_i, acc = carry
                out = make_call(xw_i)
                bump = out[0, 0] * 1e-30
                return (xw_i + bump, acc + out[0, 0])
            return jax.lax.fori_loop(0, k, body, (xw, jnp.float32(0)))[1]
        return loop

    loop_n, loop_b = build(n), build(n_base)
    float(loop_n(xw)), float(loop_b(xw))          # compile + warm
    diffs = []
    for r in range(reps):
        xr = xw + jnp.float32(1e-6 * (r + 1))     # defeat result caching
        t0 = time.perf_counter()
        float(loop_b(xr))
        tb = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop_n(xr))
        tn = time.perf_counter() - t0
        diffs.append((tn - tb) / (n - n_base))
    diffs.sort()
    return max(diffs[len(diffs) // 2], 1e-9)


def _mk(kernel, n_tiles, tiles_per_step, extra_in_specs, out_dtype=jnp.float32):
    rows = tiles_per_step * CHUNK
    n_steps = n_tiles // tiles_per_step
    grid_spec = pl.GridSpec(
        grid=(n_steps,),
        in_specs=[pl.BlockSpec((rows, LANES), lambda i: (i, 0))
                  ] + extra_in_specs,
        out_specs=pl.BlockSpec((tiles_per_step, LANES), lambda i: (i, 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, LANES), out_dtype))


def bench_ladder(n_tiles=8192, tiles_per_step=16, G_list=(1, 2, 4, 8, 16, 32),
                 verbose=True, chain_n=1024):
    """Returns {stage: (ms, GB/s effective)} for n_tiles (8,128) f32 tiles.
    All stages take the x-window as the chained (perturbed) input so the
    in-jit loop timing cannot be shortcut."""
    rng = np.random.default_rng(0)
    rows = n_tiles * CHUNK
    val = jax.device_put(rng.standard_normal((rows, LANES)).astype(np.float32))
    idx16 = jax.device_put(
        rng.integers(0, LANES, size=(rows, LANES)).astype(np.int16))
    cell16 = jax.device_put(
        rng.integers(0, CHUNK, size=(rows, LANES)).astype(np.int16))
    xw0 = jax.device_put(
        rng.standard_normal((CHUNK * 32, LANES)).astype(np.float32))
    T = tiles_per_step
    n_steps = n_tiles // T
    results = {}
    bytes_main = int(val.nbytes)

    def mk(kernel, n_extra_streams):
        specs = [pl.BlockSpec((CHUNK * 32, LANES), lambda i: (0, 0))]
        specs += [pl.BlockSpec((T * CHUNK, LANES), lambda i: (i, 0))
                  for _ in range(n_extra_streams)]
        return pl.pallas_call(
            kernel,
            grid_spec=pl.GridSpec(
                grid=(n_steps,), in_specs=specs,
                out_specs=pl.BlockSpec((T, LANES), lambda i: (i, 0))),
            out_shape=jax.ShapeDtypeStruct((n_tiles, LANES), jnp.float32))

    def report(name, t, extra_bytes=0):
        gbs = (bytes_main + extra_bytes) / t / 1e9
        results[name] = (t * 1e3, gbs)
        if verbose:
            print(f"  {name:12s} {t*1e3:8.3f} ms   {gbs:7.1f} GB/s eff   "
                  f"{n_tiles * 1024 / t / 1e9:6.1f} Gslot/s", flush=True)

    # -- stream: val only
    def k_stream(xw_ref, v_ref, o_ref):
        scale = xw_ref[0, 0]
        for t in range(T):
            o_ref[t, :] = jnp.sum(v_ref[t * CHUNK:(t + 1) * CHUNK, :],
                                  axis=0) * scale
    f = mk(k_stream, 1)
    report("stream", timeit_chained(lambda xw: f(xw, val), xw0, chain_n))

    # -- lane: + route widening + lane gather
    def k_lane(xw_ref, v_ref, j_ref, o_ref):
        scale = xw_ref[0, 0]
        for t in range(T):
            sl = slice(t * CHUNK, (t + 1) * CHUNK)
            j = j_ref[sl, :].astype(jnp.int32)
            g = jnp.take_along_axis(v_ref[sl, :], j, axis=1)
            o_ref[t, :] = jnp.sum(g, axis=0) * scale
    f = mk(k_lane, 2)
    report("lane", timeit_chained(lambda xw: f(xw, val, idx16), xw0, chain_n),
           int(idx16.nbytes))

    # -- dual: + cell widening + sublane gather (G=1)
    def k_dual(xw_ref, v_ref, j_ref, c_ref, o_ref):
        for t in range(T):
            sl = slice(t * CHUNK, (t + 1) * CHUNK)
            i1 = c_ref[sl, :].astype(jnp.int32)
            g1 = jnp.take_along_axis(xw_ref[0:CHUNK, :], i1, axis=0)
            j = j_ref[sl, :].astype(jnp.int32)
            g2 = jnp.take_along_axis(g1, j, axis=1)
            o_ref[t, :] = jnp.sum(v_ref[sl, :] * g2, axis=0)
    f = mk(k_dual, 3)
    report("dual", timeit_chained(lambda xw: f(xw, val, idx16, cell16),
                                  xw0, chain_n),
           int(idx16.nbytes) + int(cell16.nbytes))

    # -- tilebase: per-tile dynamic window base (v2 layout) — one
    # 8-sublane gather at a scalar-prefetched offset; the flat
    # alternative to the chain (chain-32 46.5 vs tilebase 116 Gslot/s
    # measured on v5e, within 3% of dual — VERDICT r1 item 2)
    def k_tb(base_ref, xw_ref, v_ref, j_ref, c_ref, o_ref):
        i = pl.program_id(0)
        for t in range(T):
            sl = slice(t * CHUNK, (t + 1) * CHUNK)
            b = base_ref[i, t]
            i1 = jnp.bitwise_and(c_ref[sl, :].astype(jnp.int32), CHUNK - 1)
            j = j_ref[sl, :].astype(jnp.int32)
            g1 = jnp.take_along_axis(
                xw_ref[pl.ds(b * CHUNK, CHUNK), :], i1, axis=0)
            g2 = jnp.take_along_axis(g1, j, axis=1)
            o_ref[t, :] = jnp.sum(v_ref[sl, :] * g2, axis=0)
    bases = jax.device_put(
        rng.integers(0, 32, size=(n_steps, T)).astype(np.int32))
    try:
        gs_tb = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((CHUNK * 32, LANES), lambda i, b: (0, 0)),
                pl.BlockSpec((T * CHUNK, LANES), lambda i, b: (i, 0)),
                pl.BlockSpec((T * CHUNK, LANES), lambda i, b: (i, 0)),
                pl.BlockSpec((T * CHUNK, LANES), lambda i, b: (i, 0)),
            ],
            out_specs=pl.BlockSpec((T, LANES), lambda i, b: (i, 0)))
        f = pl.pallas_call(
            k_tb, grid_spec=gs_tb,
            out_shape=jax.ShapeDtypeStruct((n_tiles, LANES), jnp.float32))
        report("tilebase",
               timeit_chained(lambda xw: f(bases, xw, val, idx16, cell16),
                              xw0, chain_n),
               int(idx16.nbytes) + int(cell16.nbytes))
    except Exception as e:
        if verbose:
            print(f"  tilebase: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)

    # -- chain-G: G-group select chain
    for G in G_list:
        if G == 1:
            continue

        def k_chain(xw_ref, v_ref, j_ref, c_ref, o_ref, G=G):
            for t in range(T):
                sl = slice(t * CHUNK, (t + 1) * CHUNK)
                i1 = c_ref[sl, :].astype(jnp.int32)
                sub = jnp.bitwise_and(i1, CHUNK - 1)
                grp = jnp.right_shift(i1, 3)
                g1 = jnp.zeros((CHUNK, LANES), dtype=jnp.float32)
                for g in range(G):
                    part = jnp.take_along_axis(
                        xw_ref[g * CHUNK:(g + 1) * CHUNK, :], sub, axis=0)
                    g1 = jnp.where(grp == g, part, g1)
                j = j_ref[sl, :].astype(jnp.int32)
                g2 = jnp.take_along_axis(g1, j, axis=1)
                o_ref[t, :] = jnp.sum(v_ref[sl, :] * g2, axis=0)
        f = mk(k_chain, 3)
        report(f"chain-{G}",
               timeit_chained(lambda xw: f(xw, val, idx16, cell16),
                              xw0, chain_n),
               int(idx16.nbytes) + int(cell16.nbytes))

    return results


if __name__ == "__main__":
    import sys
    n_tiles = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    tps = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    print(f"n_tiles={n_tiles} ({n_tiles * 1024 / 1e6:.1f}M slots), "
          f"tiles_per_step={tps}, main stream "
          f"{n_tiles * CHUNK * LANES * 4 / 1e6:.0f} MB", flush=True)
    bench_ladder(n_tiles, tps)
