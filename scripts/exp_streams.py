"""Per-grid-step overhead vs input-stream count (round 5).

Theory: scattered-regime steps (T=16, ~0.18 us compute) pay ~0.26 us
of fixed per-step cost — suspected DMA descriptor issue for the 8
per-step input streams.  Measure kernels reading the SAME bytes per
step through 8 separate streams vs 2 merged ones, at scircuit-like
shapes.  Trivial compute (sums) so the fixed costs dominate.
"""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparsetpu.bench.micro import timeit_chained

CHUNK, LANES = 8, 128
T = 16
F1, F2 = 20, 8
N_STEPS = 106

rows_v = T * CHUNK          # f32 values rows/step
rows_m = 2 * T * CHUNK      # meta int8 rows/step (i1+rt)
rows_f = 2 * (F1 + F2) * CHUNK  # fin int8 rows/step (4 grids)


def spec(rows):
    return pl.BlockSpec((rows, LANES), lambda i: (i, 0))


def kern8(v_ref, i1_ref, rt_ref, a_ref, b_ref, c_ref, d_ref, o_ref):
    o_ref[...] = jnp.broadcast_to(
        jnp.sum(v_ref[...], axis=0, keepdims=True)
                  + jnp.sum(i1_ref[...].astype(jnp.float32), axis=0,
                            keepdims=True)
                  + jnp.sum(rt_ref[...].astype(jnp.float32), axis=0,
                            keepdims=True)
                  + jnp.sum(a_ref[...].astype(jnp.float32), axis=0,
                            keepdims=True)
                  + jnp.sum(b_ref[...].astype(jnp.float32), axis=0,
                            keepdims=True)
                  + jnp.sum(c_ref[...].astype(jnp.float32), axis=0,
                            keepdims=True)
                  + jnp.sum(d_ref[...].astype(jnp.float32), axis=0,
                            keepdims=True), (CHUNK, LANES))


def kern2(v_ref, m_ref, o_ref):
    o_ref[...] = jnp.broadcast_to(
        jnp.sum(v_ref[...], axis=0, keepdims=True)
                  + jnp.sum(m_ref[...].astype(jnp.float32), axis=0,
                            keepdims=True), (CHUNK, LANES))


rng = np.random.default_rng(0)
v = jnp.asarray(rng.standard_normal((N_STEPS * rows_v, LANES)),
                jnp.float32)
i8s = [jnp.asarray(rng.integers(0, 100, (N_STEPS * r, LANES)), jnp.int8)
       for r in (T * CHUNK, T * CHUNK, F1 * CHUNK, F1 * CHUNK,
                 F2 * CHUNK, F2 * CHUNK)]
merged = jnp.asarray(
    rng.integers(0, 100, (N_STEPS * (rows_m + rows_f), LANES)), jnp.int8)

f8 = pl.pallas_call(
    kern8,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=(N_STEPS,),
        in_specs=[spec(rows_v)] + [spec(a.shape[0] // N_STEPS)
                                   for a in i8s],
        out_specs=pl.BlockSpec((CHUNK, LANES), lambda i: (i, 0))),
    out_shape=jax.ShapeDtypeStruct((N_STEPS * CHUNK, LANES), jnp.float32))

f2 = pl.pallas_call(
    kern2,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=(N_STEPS,),
        in_specs=[spec(rows_v), spec(rows_m + rows_f)],
        out_specs=pl.BlockSpec((CHUNK, LANES), lambda i: (i, 0))),
    out_shape=jax.ShapeDtypeStruct((N_STEPS * CHUNK, LANES), jnp.float32))

xw = v  # chain through v


def run8(x):
    return f8(x, *i8s)


def run2(x):
    return f2(x, merged)


for name, fn in (("8 streams", run8), ("2 streams", run2)):
    t = timeit_chained(fn, xw, 192, 8)
    print(f"{name}: {t*1e6:7.1f} us  ({t*1e6/N_STEPS*1000:6.0f} ns/step)",
          flush=True)


# grouped: same total bytes, S sub-steps folded into one grid step
for S in (2, 4):
    ns = N_STEPS // S
    fS = pl.pallas_call(
        kern2,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(ns,),
            in_specs=[spec(rows_v * S), spec((rows_m + rows_f) * S)],
            out_specs=pl.BlockSpec((CHUNK, LANES), lambda i: (i, 0))),
        out_shape=jax.ShapeDtypeStruct((ns * CHUNK, LANES), jnp.float32))
    vS = v[:ns * S * rows_v]
    mS = merged[:ns * S * (rows_m + rows_f)]
    t = timeit_chained(lambda x: fS(x, mS), vS, 192, 8)
    print(f"2 streams S={S}: {t*1e6:7.1f} us ({t*1e6/ns*1000:6.0f} ns/gstep,"
          f" {t*1e6/(ns*S)*1000:6.0f} ns/substep)", flush=True)
