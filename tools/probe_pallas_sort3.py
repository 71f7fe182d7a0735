"""Probe 3: which part of the Pallas tile sort is slow?

probe2 measured 0.034 ms/stage on a (512,128) tile — ~10x worse than
lax.sort's effective per-stage rate.  This isolates the costs:
  a) axis-0 (sublane) rolls only — a column sort stage
  b) axis-1 (lane) rolls only
  c) pure elementwise compare-exchange (no rolls)
Each variant runs a 64-'stage' chain on one (512,128) tile.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/jax_comp_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, L = 512, 128
STAGES = 64


def make_kernel(mode):
    def _kernel(hi_ref, lo_ref, va_ref, ohi, olo, ova):
        rows = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
        pos = rows * L + lanes
        hi, lo, va = hi_ref[:], lo_ref[:], va_ref[:]
        for t in range(STAGES):
            if mode == 'rows':
                s, axis, size = 1 << (t % 8), 0, R
                shift = s
            elif mode == 'lanes':
                s, axis, size = 1 << (t % 7), 1, L
                shift = s
            else:
                s, axis, size, shift = 1, 0, R, 0
            if mode == 'none':
                phi, plo, pva = lo, hi, va  # stand-in partners
                sbit = 1
            else:
                phi = pltpu.roll(hi, shift, axis)
                plo = pltpu.roll(lo, shift, axis)
                pva = pltpu.roll(va, shift, axis)
                mhi = pltpu.roll(hi, size - shift, axis)
                mlo = pltpu.roll(lo, size - shift, axis)
                mva = pltpu.roll(va, size - shift, axis)
                sbit = s * (L if axis == 0 else 1)
                up = (pos & sbit) == 0
                phi = jnp.where(up, mhi, phi)
                plo = jnp.where(up, mlo, plo)
                pva = jnp.where(up, mva, pva)
            dirbit = ((pos // sbit) ^ (pos >> 10)) & 1
            gti = ((hi > phi) | ((hi == phi) & (lo > plo))).astype(
                jnp.int32)
            lti = ((hi < phi) | ((hi == phi) & (lo < plo))).astype(
                jnp.int32)
            swap = jnp.where(dirbit == 0, gti, lti) == 1
            hi = jnp.where(swap, phi, hi)
            lo = jnp.where(swap, plo, lo)
            va = jnp.where(swap, pva, va)
        ohi[:] = hi
        olo[:] = lo
        ova[:] = va
    return _kernel


def run(mode):
    kern = make_kernel(mode)

    @jax.jit
    def call(hi, lo, va):
        return pl.pallas_call(
            kern,
            out_shape=[jax.ShapeDtypeStruct((R, L), jnp.int32)] * 3,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        )(hi, lo, va)

    rng = np.random.default_rng(0)
    hi = jnp.asarray(rng.integers(0, 1 << 20, (R, L), dtype=np.int32))
    lo = jnp.asarray(rng.integers(0, 1 << 20, (R, L), dtype=np.int32))
    va = jnp.asarray(rng.integers(0, 1 << 20, (R, L), dtype=np.int32))

    from jax import lax

    @jax.jit
    def chain(x):
        def body(i, c):
            a, b, d = call(c[0], c[1], c[2])
            return (a, b, d ^ 1)
        return lax.fori_loop(0, 10, body, x)

    t0 = time.time()
    r = chain((hi, lo, va))
    np.asarray(r[0])
    compile_s = time.time() - t0
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(chain((hi, lo, va))[0])
        ts.append(time.perf_counter() - t0)
    per = min(ts) / 10 / STAGES
    print('%-6s: %.5f ms/stage (compile %.0fs)'
          % (mode, per * 1e3, compile_s), flush=True)


if __name__ == '__main__':
    for mode in (sys.argv[1:] or ['none', 'rows', 'lanes']):
        run(mode)
