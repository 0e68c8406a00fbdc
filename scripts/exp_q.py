#!/usr/bin/env python
"""Experiment: kernel rate vs (G window groups, Q row-pad quantum).

Measures the production-shaped dual-gather kernel extended with
P = 8/Q output planes (segment sums of Q sublanes each), and a few
alternative gather formulations, on the real chip.  Feeds the
(G, Q)-keyed rate table in pack/gather_stream.py.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from sparsetpu.bench.micro import timeit_chained
from sparsetpu.utils.config import LANES, SUBLANES as CHUNK


def mk(kernel, n_tiles, T, n_extra, P=1, xw_rows=CHUNK * 32):
    n_steps = n_tiles // T
    specs = [pl.BlockSpec((xw_rows, LANES), lambda i: (0, 0))]
    specs += [pl.BlockSpec((T * CHUNK, LANES), lambda i: (i, 0))
              for _ in range(n_extra)]
    return pl.pallas_call(
        kernel,
        grid_spec=pl.GridSpec(
            grid=(n_steps,), in_specs=specs,
            out_specs=pl.BlockSpec((T * P, LANES), lambda i: (i, 0))),
        out_shape=jax.ShapeDtypeStruct((n_tiles * P, LANES), jnp.float32))


def main(n_tiles=8192, T=128, combos=None, extras=("bigdual", "tilebase")):
    rng = np.random.default_rng(0)
    rows = n_tiles * CHUNK
    val = jax.device_put(rng.standard_normal((rows, LANES)).astype(np.float32))
    meta = jax.device_put(
        rng.integers(0, 1 << 15, size=(rows, LANES)).astype(np.int16))
    xw0 = jax.device_put(
        rng.standard_normal((CHUNK * 32, LANES)).astype(np.float32))

    def report(name, t):
        print(f"  {name:16s} {t*1e3:8.3f} ms  "
              f"{n_tiles * 1024 / t / 1e9:6.1f} Gslot/s", flush=True)

    # production dual-gather with G-chain and P planes
    if combos is None:
        combos = [(g, p) for g in (1, 2, 4, 8, 16, 32) for p in (1, 2, 4)]
    for G, P in combos:
        if True:
            def k(xw_ref, v_ref, m_ref, o_ref, G=G, P=P):
                Q = CHUNK // P
                for t in range(T):
                    sl = slice(t * CHUNK, (t + 1) * CHUNK)
                    m32 = jnp.bitwise_and(m_ref[sl, :].astype(jnp.int32),
                                          0x7FFF)
                    i1 = jnp.right_shift(m32, 7) % (CHUNK * G)
                    j = jnp.bitwise_and(m32, 0x7F)
                    if G == 1:
                        g1 = jnp.take_along_axis(xw_ref[0:CHUNK, :], i1,
                                                 axis=0)
                    else:
                        sub = jnp.bitwise_and(i1, CHUNK - 1)
                        grp = jnp.right_shift(i1, 3)
                        g1 = jnp.zeros((CHUNK, LANES), dtype=jnp.float32)
                        for g in range(G):
                            part = jnp.take_along_axis(
                                xw_ref[g * CHUNK:(g + 1) * CHUNK, :], sub,
                                axis=0)
                            g1 = jnp.where(grp == g, part, g1)
                    g2 = jnp.take_along_axis(g1, j, axis=1)
                    prod = v_ref[sl, :] * g2
                    if P == 1:
                        o_ref[t, :] = jnp.sum(prod, axis=0)
                    else:
                        for p in range(P):
                            o_ref[t * P + p, :] = jnp.sum(
                                prod[p * Q:(p + 1) * Q, :], axis=0)
            f = mk(k, n_tiles, T, 2, P=P)
            report(f"chain G={G:2d} P={P}",
                   timeit_chained(lambda xw: f(xw, val, meta), xw0, 512, 16))

    # direct big sublane gather: take_along_axis over the full (8G,128)
    for G in ((4, 8, 32) if "bigdual" in extras else ()):
        def k_big(xw_ref, v_ref, m_ref, o_ref, G=G):
            for t in range(T):
                sl = slice(t * CHUNK, (t + 1) * CHUNK)
                m32 = jnp.bitwise_and(m_ref[sl, :].astype(jnp.int32), 0x7FFF)
                i1 = jnp.right_shift(m32, 7) % (CHUNK * G)
                j = jnp.bitwise_and(m32, 0x7F)
                g1 = jnp.take_along_axis(xw_ref[0:CHUNK * G, :],
                                         i1, axis=0)
                g2 = jnp.take_along_axis(g1, j, axis=1)
                o_ref[t, :] = jnp.sum(v_ref[sl, :] * g2, axis=0)
        try:
            f = mk(k_big, n_tiles, T, 2)
            report(f"bigdual G={G:2d}",
                   timeit_chained(lambda xw: f(xw, val, meta), xw0, 512, 16))
        except Exception as e:
            print(f"  bigdual G={G:2d}: {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)

    # per-tile dynamic window base: one 8-sublane gather at a dynamic
    # sublane offset read from SMEM-prefetched per-tile bases
    def k_base(base_ref, xw_ref, v_ref, m_ref, o_ref):
        i = pl.program_id(0)
        for t in range(T):
            sl = slice(t * CHUNK, (t + 1) * CHUNK)
            b = base_ref[i, t]
            m32 = jnp.bitwise_and(m_ref[sl, :].astype(jnp.int32), 0x7FFF)
            i1 = jnp.right_shift(m32, 7) % CHUNK
            j = jnp.bitwise_and(m32, 0x7F)
            g1 = jnp.take_along_axis(xw_ref[pl.ds(b * CHUNK, CHUNK), :],
                                     i1, axis=0)
            g2 = jnp.take_along_axis(g1, j, axis=1)
            o_ref[t, :] = jnp.sum(v_ref[sl, :] * g2, axis=0)
    n_steps = n_tiles // T
    bases = jax.device_put(
        rng.integers(0, 32, size=(n_steps, T)).astype(np.int32))
    if "tilebase" not in extras:
        return
    try:
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((CHUNK * 32, LANES), lambda i, b: (0, 0)),
                pl.BlockSpec((T * CHUNK, LANES), lambda i, b: (i, 0)),
                pl.BlockSpec((T * CHUNK, LANES), lambda i, b: (i, 0)),
            ],
            out_specs=pl.BlockSpec((T, LANES), lambda i, b: (i, 0)))
        f = pl.pallas_call(
            k_base, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((n_tiles, LANES), jnp.float32))
        report("tilebase G=32",
               timeit_chained(lambda xw: f(bases, xw, val, meta), xw0,
                              512, 16))
    except Exception as e:
        print(f"  tilebase: {type(e).__name__}: {str(e)[:160]}", flush=True)


def tilebase_variants(n_tiles=8192, T=128, combos=((1, 1), (1, 2), (2, 1),
                                                   (2, 2), (4, 1), (2, 4))):
    """Measure the v2 kernel shape: per-tile dynamic base slice of the
    staged window + GL-group chain + P output planes."""
    rng = np.random.default_rng(0)
    rows = n_tiles * CHUNK
    val = jax.device_put(rng.standard_normal((rows, LANES)).astype(np.float32))
    n_steps = n_tiles // T
    xw0 = jax.device_put(
        rng.standard_normal((CHUNK * 32, LANES)).astype(np.float32))

    for GL, P in combos:
        cells = rng.integers(0, CHUNK * GL, size=(rows, LANES))
        route = rng.integers(0, LANES, size=(rows, LANES))
        meta = jax.device_put(((cells << 7) | route).astype(np.int16))
        bases = jax.device_put(
            rng.integers(0, 32 - GL + 1,
                         size=(n_steps, T)).astype(np.int32))

        def k(tb_ref, xw_ref, v_ref, m_ref, o_ref, GL=GL, P=P):
            i = pl.program_id(0)
            Q = CHUNK // P
            for t in range(T):
                sl = slice(t * CHUNK, (t + 1) * CHUNK)
                b = tb_ref[i, t]
                m32 = jnp.bitwise_and(m_ref[sl, :].astype(jnp.int32),
                                      0x7FFF)
                i1 = jnp.right_shift(m32, 7)
                j = jnp.bitwise_and(m32, 0x7F)
                xwin = xw_ref[pl.ds(b * CHUNK, CHUNK * GL), :]
                if GL == 1:
                    g1 = jnp.take_along_axis(xwin, i1, axis=0)
                else:
                    sub = jnp.bitwise_and(i1, CHUNK - 1)
                    grp = jnp.right_shift(i1, 3)
                    g1 = jnp.zeros((CHUNK, LANES), dtype=jnp.float32)
                    for g in range(GL):
                        part = jnp.take_along_axis(
                            xwin[g * CHUNK:(g + 1) * CHUNK, :], sub,
                            axis=0)
                        g1 = jnp.where(grp == g, part, g1)
                g2 = jnp.take_along_axis(g1, j, axis=1)
                prod = v_ref[sl, :] * g2
                if P == 1:
                    o_ref[t, :] = jnp.sum(prod, axis=0)
                else:
                    for p in range(P):
                        o_ref[t * P + p, :] = jnp.sum(
                            prod[p * Q:(p + 1) * Q, :], axis=0)

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((CHUNK * 32, LANES), lambda i, tb: (0, 0)),
                pl.BlockSpec((T * CHUNK, LANES), lambda i, tb: (i, 0)),
                pl.BlockSpec((T * CHUNK, LANES), lambda i, tb: (i, 0)),
            ],
            out_specs=pl.BlockSpec((T * P, LANES), lambda i, tb: (i, 0)))
        f = pl.pallas_call(
            k, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((n_tiles * P, LANES),
                                           jnp.float32))
        t = timeit_chained(lambda xw: f(bases, xw, val, meta), xw0, 512, 16)
        print(f"  tb GL={GL} P={P}   {t*1e3:8.3f} ms  "
              f"{n_tiles * 1024 / t / 1e9:6.1f} Gslot/s", flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    batch = sys.argv[1] if len(sys.argv) > 1 else "1"
    if batch == "1":
        main(combos=[(1, 1), (1, 2), (1, 4), (4, 1), (4, 2), (4, 4)],
             extras=())
    elif batch == "2":
        main(combos=[(8, 1), (8, 2), (8, 4), (16, 2), (16, 4)], extras=())
    elif batch == "3":
        main(combos=[(2, 2), (2, 4), (32, 1), (32, 4)], extras=())
    elif batch == "4":
        main(combos=[], extras=("bigdual", "tilebase"))
    else:
        tilebase_variants()
