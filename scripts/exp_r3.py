"""Round-3 primitive experiments: can the G-group select chain be
cheaper at the same window size?

Variants (all produce identical per-tile chunk sums over a 16-group
window, i.e. the headline G=16 layout):
  chain16   baseline linear chain: 16x (gather + cmp + select)     [88]
  tree16    16 gathers + binary-tree merge (15 selects, 4 bit masks)
  hilo16    x stored as two int16 planes (hi/lo 16 bits); a 16-sublane
            int16 gather reaches TWO f32 groups per op -> 8x
            (2 gathers + cmp + 2 selects) + int32 recombine
  b8x16     x as four int8 byte planes; a 32-sublane int8 gather
            reaches FOUR f32 groups -> 4x4 gathers + recombine
  tb_res    tilebase kernel with the x BlockSpec constant (resident
            full x, G=128 staged once) — validates the fused design's
            staging cost

Usage: python scripts/exp_r3.py [n_tiles] [variant ...]
"""

import functools
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from sparsetpu.bench.micro import timeit_chained  # noqa: E402
from sparsetpu.utils.config import LANES, SUBLANES as CHUNK  # noqa: E402

G = 16


def mk(kernel, n_tiles, T, extra_specs, xw_shape):
    n_steps = n_tiles // T
    grid_spec = pl.GridSpec(
        grid=(n_steps,),
        in_specs=[pl.BlockSpec(xw_shape, lambda i: (0, 0))] + extra_specs,
        out_specs=pl.BlockSpec((T, LANES), lambda i: (i, 0)))
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, LANES), jnp.float32))


def stream_specs(T, n):
    return [pl.BlockSpec((T * CHUNK, LANES), lambda i: (i, 0))
            for _ in range(n)]


def main():
    n_tiles = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    only = set(sys.argv[2:])
    T = 128
    rng = np.random.default_rng(0)
    rows = n_tiles * CHUNK
    val = jax.device_put(
        rng.standard_normal((rows, LANES)).astype(np.float32))
    route = rng.integers(0, LANES, size=(rows, LANES))
    cells = rng.integers(0, CHUNK * G, size=(rows, LANES))
    meta16 = jax.device_put(((cells << 7) | route).astype(np.int16))
    xw0 = jax.device_put(
        rng.standard_normal((CHUNK * G, LANES)).astype(np.float32))

    def report(name, t):
        print(f"  {name:10s} {t*1e3:8.3f} ms  "
              f"{n_tiles * 1024 / t / 1e9:6.1f} Gslot/s", flush=True)

    def split(m_ref, sl):
        m32 = jnp.bitwise_and(m_ref[sl, :].astype(jnp.int32), 0x7FFF)
        return jnp.right_shift(m32, 7), jnp.bitwise_and(m32, 0x7F)

    # ---- chain16 baseline (the production kernel's structure)
    if not only or "chain16" in only:
        def k_chain(xw_ref, v_ref, m_ref, o_ref):
            for t in range(T):
                sl = slice(t * CHUNK, (t + 1) * CHUNK)
                i1, j = split(m_ref, sl)
                sub = jnp.bitwise_and(i1, CHUNK - 1)
                grp = jnp.right_shift(i1, 3)
                g1 = jnp.zeros((CHUNK, LANES), dtype=jnp.float32)
                for g in range(G):
                    part = jnp.take_along_axis(
                        xw_ref[g * CHUNK:(g + 1) * CHUNK, :], sub, axis=0)
                    g1 = jnp.where(grp == g, part, g1)
                g2 = jnp.take_along_axis(g1, j, axis=1)
                o_ref[t, :] = jnp.sum(v_ref[sl, :] * g2, axis=0)
        f = mk(k_chain, n_tiles, T, stream_specs(T, 2), (CHUNK * G, LANES))
        report("chain16",
               timeit_chained(lambda xw: f(xw, val, meta16), xw0))

    # ---- tree16: binary-tree select merge
    if not only or "tree16" in only:
        def k_tree(xw_ref, v_ref, m_ref, o_ref):
            for t in range(T):
                sl = slice(t * CHUNK, (t + 1) * CHUNK)
                i1, j = split(m_ref, sl)
                sub = jnp.bitwise_and(i1, CHUNK - 1)
                grp = jnp.right_shift(i1, 3)
                parts = [jnp.take_along_axis(
                    xw_ref[g * CHUNK:(g + 1) * CHUNK, :], sub, axis=0)
                    for g in range(G)]
                level = 0
                while len(parts) > 1:
                    bit = jnp.bitwise_and(grp, 1 << level) != 0
                    parts = [jnp.where(bit, parts[i + 1], parts[i])
                             for i in range(0, len(parts), 2)]
                    level += 1
                g2 = jnp.take_along_axis(parts[0], j, axis=1)
                o_ref[t, :] = jnp.sum(v_ref[sl, :] * g2, axis=0)
        f = mk(k_tree, n_tiles, T, stream_specs(T, 2), (CHUNK * G, LANES))
        report("tree16",
               timeit_chained(lambda xw: f(xw, val, meta16), xw0))

    # ---- hilo16: two int16 planes, 16-sublane gathers (2 groups/op)
    if not only or "hilo16" in only:
        def k_hilo(xw_ref, v_ref, m_ref, o_ref):
            # xw_ref: (2*8G, 128) int16; rows [2k*8, 2k*8+16) hold the
            # hi|lo interleave of f32 groups 2k,2k+1?  Layout: plane-major
            # — hi plane rows [0, 8G), lo plane rows [8G, 16G).
            HG = CHUNK * G
            for t in range(T):
                sl = slice(t * CHUNK, (t + 1) * CHUNK)
                i1, j = split(m_ref, sl)
                sub16 = jnp.bitwise_and(i1, 2 * CHUNK - 1)
                grp2 = jnp.right_shift(i1, 4)          # pair group
                h = jnp.zeros((CHUNK, LANES), dtype=jnp.int16)
                lo = jnp.zeros((CHUNK, LANES), dtype=jnp.int16)
                for p in range(G // 2):
                    ph = jnp.take_along_axis(
                        xw_ref[p * 16:(p + 1) * 16, :], sub16, axis=0)
                    plo = jnp.take_along_axis(
                        xw_ref[HG + p * 16:HG + (p + 1) * 16, :], sub16,
                        axis=0)
                    m = grp2 == p
                    h = jnp.where(m, ph, h)
                    lo = jnp.where(m, plo, lo)
                w = jnp.left_shift(h.astype(jnp.int32), 16) | \
                    jnp.bitwise_and(lo.astype(jnp.int32), 0xFFFF)
                g1 = jax.lax.bitcast_convert_type(w, jnp.float32)
                g2 = jnp.take_along_axis(g1, j, axis=1)
                o_ref[t, :] = jnp.sum(v_ref[sl, :] * g2, axis=0)

        xw_i32 = np.asarray(xw0).view(np.int32)
        xw_hilo = np.concatenate([(xw_i32 >> 16).astype(np.int16),
                                  (xw_i32 & 0xFFFF).astype(np.int16)],
                                 axis=0)
        xw_hilo = jax.device_put(xw_hilo)

        def k_wrap(xwf_ref, xw16_ref, v_ref, m_ref, o_ref):
            # chained perturbation comes through the f32 xw; the int16
            # planes are static — fold a scalar from xwf so the loop
            # cannot be hoisted
            k_hilo(xw16_ref, v_ref, m_ref, o_ref)
            o_ref[0, :] += xwf_ref[0, 0] * 1e-30

        n_steps = n_tiles // T
        f = pl.pallas_call(
            k_wrap,
            grid_spec=pl.GridSpec(
                grid=(n_steps,),
                in_specs=[
                    pl.BlockSpec((CHUNK * G, LANES), lambda i: (0, 0)),
                    pl.BlockSpec((2 * CHUNK * G, LANES), lambda i: (0, 0)),
                ] + stream_specs(T, 2),
                out_specs=pl.BlockSpec((T, LANES), lambda i: (i, 0))),
            out_shape=jax.ShapeDtypeStruct((n_tiles, LANES), jnp.float32))
        try:
            report("hilo16",
                   timeit_chained(
                       lambda xw: f(xw, xw_hilo, val, meta16), xw0))
        except Exception as e:
            print(f"  hilo16: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    # ---- tb_res: resident full x (G=128), per-tile base, GL=1
    if not only or "tb_res" in only:
        GR = 128

        def k_tb(base_ref, xw_ref, v_ref, m_ref, o_ref):
            i = pl.program_id(0)
            for t in range(T):
                sl = slice(t * CHUNK, (t + 1) * CHUNK)
                b = base_ref[i, t]
                i1, j = split(m_ref, sl)
                sub = jnp.bitwise_and(i1, CHUNK - 1)
                g1 = jnp.take_along_axis(
                    xw_ref[pl.ds(b * CHUNK, CHUNK), :], sub, axis=0)
                g2 = jnp.take_along_axis(g1, j, axis=1)
                o_ref[t, :] = jnp.sum(v_ref[sl, :] * g2, axis=0)

        n_steps = n_tiles // T
        bases = jax.device_put(
            rng.integers(0, GR, size=(n_steps, T)).astype(np.int32))
        xbig0 = jax.device_put(
            rng.standard_normal((CHUNK * GR, LANES)).astype(np.float32))
        gs_tb = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((CHUNK * GR, LANES), lambda i, b: (0, 0)),
            ] + [pl.BlockSpec((T * CHUNK, LANES), lambda i, b: (i, 0))
                 for _ in range(2)],
            out_specs=pl.BlockSpec((T, LANES), lambda i, b: (i, 0)))
        f = pl.pallas_call(
            k_tb, grid_spec=gs_tb,
            out_shape=jax.ShapeDtypeStruct((n_tiles, LANES), jnp.float32))
        try:
            report("tb_res",
                   timeit_chained(lambda xw: f(bases, xw, val, meta16),
                                  xbig0))
        except Exception as e:
            print(f"  tb_res: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    # ---- tb_res2: resident x, TWO per-tile bases, per-element range bit
    if not only or "tb_res2" in only:
        GR = 128

        def k_tb2(base_ref, xw_ref, v_ref, m_ref, o_ref):
            i = pl.program_id(0)
            for t in range(T):
                sl = slice(t * CHUNK, (t + 1) * CHUNK)
                b0 = base_ref[i, 2 * t]
                b1 = base_ref[i, 2 * t + 1]
                i1, j = split(m_ref, sl)        # i1 in [0, 16): range<<3|sub
                sub = jnp.bitwise_and(i1, CHUNK - 1)
                rbit = jnp.right_shift(i1, 3) != 0
                ga = jnp.take_along_axis(
                    xw_ref[pl.ds(b0 * CHUNK, CHUNK), :], sub, axis=0)
                gb = jnp.take_along_axis(
                    xw_ref[pl.ds(b1 * CHUNK, CHUNK), :], sub, axis=0)
                g1 = jnp.where(rbit, gb, ga)
                g2 = jnp.take_along_axis(g1, j, axis=1)
                o_ref[t, :] = jnp.sum(v_ref[sl, :] * g2, axis=0)

        n_steps = n_tiles // T
        bases2 = jax.device_put(
            rng.integers(0, GR, size=(n_steps, 2 * T)).astype(np.int32))
        xbig0 = jax.device_put(
            rng.standard_normal((CHUNK * GR, LANES)).astype(np.float32))
        gs_tb2 = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((CHUNK * GR, LANES), lambda i, b: (0, 0)),
            ] + [pl.BlockSpec((T * CHUNK, LANES), lambda i, b: (i, 0))
                 for _ in range(2)],
            out_specs=pl.BlockSpec((T, LANES), lambda i, b: (i, 0)))
        f = pl.pallas_call(
            k_tb2, grid_spec=gs_tb2,
            out_shape=jax.ShapeDtypeStruct((n_tiles, LANES), jnp.float32))
        try:
            report("tb_res2",
                   timeit_chained(lambda xw: f(bases2, xw, val, meta16),
                                  xbig0))
        except Exception as e:
            print(f"  tb_res2: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__" and "extra" not in sys.argv and "i8" not in sys.argv:
    main()


def extra_variants(n_tiles=4096):
    """tb_tree16: single per-tile base over resident x, GL=16 groups,
    binary-tree select.  tb2_tree8: two per-tile bases, GL=8 each,
    tree select within range + range-bit merge."""
    T = 128
    rng = np.random.default_rng(0)
    rows = n_tiles * CHUNK
    val = jax.device_put(
        rng.standard_normal((rows, LANES)).astype(np.float32))
    route = rng.integers(0, LANES, size=(rows, LANES))
    n_steps = n_tiles // T
    GR = 128
    xbig0 = jax.device_put(
        rng.standard_normal((CHUNK * GR, LANES)).astype(np.float32))

    def report(name, t):
        print(f"  {name:10s} {t*1e3:8.3f} ms  "
              f"{n_tiles * 1024 / t / 1e9:6.1f} Gslot/s", flush=True)

    def tree_merge(parts, grp):
        level = 0
        while len(parts) > 1:
            bit = jnp.bitwise_and(grp, 1 << level) != 0
            parts = [jnp.where(bit, parts[i + 1], parts[i])
                     for i in range(0, len(parts), 2)]
            level += 1
        return parts[0]

    def run(name, kern, meta, bases_w):
        bases = jax.device_put(rng.integers(
            0, GR - 16, size=(n_steps, bases_w * T)).astype(np.int32))
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((CHUNK * GR, LANES), lambda i, b: (0, 0)),
                pl.BlockSpec((T * CHUNK, LANES), lambda i, b: (i, 0)),
                pl.BlockSpec((T * CHUNK, LANES), lambda i, b: (i, 0)),
            ],
            out_specs=pl.BlockSpec((T, LANES), lambda i, b: (i, 0)))
        f = pl.pallas_call(
            kern, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((n_tiles, LANES), jnp.float32))
        try:
            report(name,
                   timeit_chained(lambda xw: f(bases, xw, val, meta),
                                  xbig0))
        except Exception as e:
            print(f"  {name}: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    # tb_tree16: i1 in [0, 128): grp = i1>>3 in [0,16), sub = i1&7
    cells16 = rng.integers(0, CHUNK * 16, size=(rows, LANES))
    meta_t16 = jax.device_put(((cells16 << 7) | route).astype(np.int16))

    def k_tb_tree16(base_ref, xw_ref, v_ref, m_ref, o_ref):
        i = pl.program_id(0)
        for t in range(T):
            sl = slice(t * CHUNK, (t + 1) * CHUNK)
            b = base_ref[i, t]
            m32 = jnp.bitwise_and(m_ref[sl, :].astype(jnp.int32), 0x7FFF)
            i1 = jnp.right_shift(m32, 7)
            j = jnp.bitwise_and(m32, 0x7F)
            sub = jnp.bitwise_and(i1, CHUNK - 1)
            grp = jnp.right_shift(i1, 3)
            xwin = xw_ref[pl.ds(b * CHUNK, CHUNK * 16), :]
            parts = [jnp.take_along_axis(
                xwin[g * CHUNK:(g + 1) * CHUNK, :], sub, axis=0)
                for g in range(16)]
            g1 = tree_merge(parts, grp)
            g2 = jnp.take_along_axis(g1, j, axis=1)
            o_ref[t, :] = jnp.sum(v_ref[sl, :] * g2, axis=0)
    run("tb_tree16", k_tb_tree16, meta_t16, 1)

    # tb2_tree8: two bases, 8 groups each: i1 in [0,128): range=i1>>6,
    # grp3 = (i1>>3)&7, sub = i1&7
    def k_tb2_tree8(base_ref, xw_ref, v_ref, m_ref, o_ref):
        i = pl.program_id(0)
        for t in range(T):
            sl = slice(t * CHUNK, (t + 1) * CHUNK)
            b0 = base_ref[i, 2 * t]
            b1 = base_ref[i, 2 * t + 1]
            m32 = jnp.bitwise_and(m_ref[sl, :].astype(jnp.int32), 0x7FFF)
            i1 = jnp.right_shift(m32, 7)
            j = jnp.bitwise_and(m32, 0x7F)
            sub = jnp.bitwise_and(i1, CHUNK - 1)
            grp = jnp.bitwise_and(jnp.right_shift(i1, 3), 7)
            rbit = jnp.right_shift(i1, 6)
            w0 = xw_ref[pl.ds(b0 * CHUNK, CHUNK * 8), :]
            w1 = xw_ref[pl.ds(b1 * CHUNK, CHUNK * 8), :]
            pa = [jnp.take_along_axis(
                w0[g * CHUNK:(g + 1) * CHUNK, :], sub, axis=0)
                for g in range(8)]
            pb = [jnp.take_along_axis(
                w1[g * CHUNK:(g + 1) * CHUNK, :], sub, axis=0)
                for g in range(8)]
            ga = tree_merge(pa, grp)
            gb = tree_merge(pb, grp)
            g1 = jnp.where(rbit != 0, gb, ga)
            g2 = jnp.take_along_axis(g1, j, axis=1)
            o_ref[t, :] = jnp.sum(v_ref[sl, :] * g2, axis=0)
    run("tb2_tree8", k_tb2_tree8, meta_t16, 2)


if __name__ == "__main__" and "extra" in sys.argv and "i8" not in sys.argv:
    extra_variants(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)


def i8_variant(n_tiles=4096):
    """tb_tree16 with SPLIT int8 meta streams (i1 byte + route byte)
    instead of the fused int16 (cell << 7 | route): same 2 B/slot, but
    the kernel skips the mask+shift unfuse."""
    T = 128
    rng = np.random.default_rng(0)
    rows = n_tiles * CHUNK
    val = jax.device_put(
        rng.standard_normal((rows, LANES)).astype(np.float32))
    route8 = jax.device_put(
        rng.integers(0, LANES, size=(rows, LANES)).astype(np.int8))
    cells16 = rng.integers(0, CHUNK * 16, size=(rows, LANES))
    # i1 in [0,128): int8 holds it exactly
    i1_8 = jax.device_put(cells16.astype(np.int8))
    n_steps = n_tiles // T
    GR = 128
    xbig0 = jax.device_put(
        rng.standard_normal((CHUNK * GR, LANES)).astype(np.float32))
    bases = jax.device_put(rng.integers(
        0, GR - 16, size=(n_steps, T)).astype(np.int32))

    def tree_merge(parts, grp):
        level = 0
        while len(parts) > 1:
            bit = jnp.bitwise_and(grp, 1 << level) != 0
            parts = [jnp.where(bit, parts[i + 1], parts[i])
                     for i in range(0, len(parts), 2)]
            level += 1
        return parts[0]

    def k(base_ref, xw_ref, v_ref, i1_ref, j_ref, o_ref):
        i = pl.program_id(0)
        for t in range(T):
            sl = slice(t * CHUNK, (t + 1) * CHUNK)
            b = base_ref[i, t]
            i1 = i1_ref[sl, :].astype(jnp.int32)
            j = j_ref[sl, :].astype(jnp.int32)
            sub = jnp.bitwise_and(i1, CHUNK - 1)
            grp = jnp.right_shift(i1, 3)
            xwin = xw_ref[pl.ds(b * CHUNK, CHUNK * 16), :]
            parts = [jnp.take_along_axis(
                xwin[g * CHUNK:(g + 1) * CHUNK, :], sub, axis=0)
                for g in range(16)]
            g1 = tree_merge(parts, grp)
            g2 = jnp.take_along_axis(g1, j, axis=1)
            o_ref[t, :] = jnp.sum(v_ref[sl, :] * g2, axis=0)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((CHUNK * GR, LANES), lambda i, b: (0, 0)),
            pl.BlockSpec((T * CHUNK, LANES), lambda i, b: (i, 0)),
            pl.BlockSpec((T * CHUNK, LANES), lambda i, b: (i, 0)),
            pl.BlockSpec((T * CHUNK, LANES), lambda i, b: (i, 0)),
        ],
        out_specs=pl.BlockSpec((T, LANES), lambda i, b: (i, 0)))
    f = pl.pallas_call(
        k, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((n_tiles, LANES), jnp.float32))
    try:
        t = timeit_chained(lambda xw: f(bases, xw, val, i1_8, route8),
                           xbig0)
        print(f"  tb_tree16_i8 {t*1e3:8.3f} ms  "
              f"{n_tiles * 1024 / t / 1e9:6.1f} Gslot/s", flush=True)
    except Exception as e:
        print(f"  tb_tree16_i8: {type(e).__name__}: {str(e)[:160]}",
              flush=True)


if __name__ == "__main__" and "i8" in sys.argv:
    i8_variant(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
