"""Probe: Mosaic throughput for VMEM-resident bitonic compare-exchange
stages — decides whether a Pallas sort can beat lax.sort (which runs its
network at HBM speed: ~10.8 ms for a 5-array 2^20 sort round).

Kernel: 3 arrays (key_hi, key_lo, val) as (8192, 128) int32, column-major
semantics (element i = (row i % 8192, lane i // 8192)).  Sorts every
LANE's 8192-element column independently: 91 bitonic stages, all row-axis
partner exchanges via jnp.roll.  This is phase A of a full sort; its
ms/stage extrapolates the whole 210-stage network.
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

R, L = 8192, 128
LOGR = 13


def _stage(hi, lo, va, s, level_bit):
    """One bitonic compare-exchange stage, stride s (rows), direction
    from bit `level_bit` of the row index."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    up = (rows & s) == 0          # partner below (row + s) if up
    # partner values: roll -s brings row+s up; roll +s brings row-s down
    phi = jnp.where(up, pltpu.roll(hi, -s, 0), pltpu.roll(hi, s, 0))
    plo = jnp.where(up, pltpu.roll(lo, -s, 0), pltpu.roll(lo, s, 0))
    pva = jnp.where(up, pltpu.roll(va, -s, 0), pltpu.roll(va, s, 0))
    asc = ((rows >> level_bit) & 1) == 0
    gt = (hi > phi) | ((hi == phi) & (lo > plo))
    lt = (hi < phi) | ((hi == phi) & (lo < plo))
    # keep mine if (I'm the min and should be) or (I'm the max and should be)
    want_small = up == asc
    keep = jnp.where(want_small, ~gt, ~lt)
    return (jnp.where(keep, hi, phi), jnp.where(keep, lo, plo),
            jnp.where(keep, va, pva))


def _kernel(hi_ref, lo_ref, va_ref, ohi, olo, ova):
    hi, lo, va = hi_ref[:], lo_ref[:], va_ref[:]
    for level in range(1, LOGR + 1):          # merge level: blocks of 2^level
        for st in range(level - 1, -1, -1):   # strides 2^st
            hi, lo, va = _stage(hi, lo, va, 1 << st, level)
    ohi[:] = hi
    olo[:] = lo
    ova[:] = va


@jax.jit
def column_sort(hi, lo, va):
    return pl.pallas_call(
        _kernel,
        out_shape=[jax.ShapeDtypeStruct((R, L), jnp.int32)] * 3,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
    )(hi, lo, va)


def main():
    rng = np.random.default_rng(0)
    hi = jnp.asarray(rng.integers(0, 1 << 20, (R, L), dtype=np.int32))
    lo = jnp.asarray(rng.integers(0, 1 << 20, (R, L), dtype=np.int32))
    va = jnp.asarray(rng.integers(0, 1 << 20, (R, L), dtype=np.int32))

    t0 = time.time()
    r = column_sort(hi, lo, va)
    np.asarray(r[0])
    print('compile+first: %.1fs' % (time.time() - t0), flush=True)

    # correctness: each column sorted by (hi, lo)
    h, l, v = (np.asarray(x) for x in r)
    k = h.astype(np.int64) * (1 << 21) + l
    assert (np.diff(k, axis=0) >= 0).all(), 'columns not sorted'
    # value payload still a permutation per column
    hi0, lo0, va0 = (np.asarray(x) for x in (hi, lo, va))
    for c in (0, 63, 127):
        assert sorted(v[:, c]) == sorted(va0[:, c])
    print('correct', flush=True)

    # chained timing
    from jax import lax

    @jax.jit
    def chain(x):
        def body(i, c):
            a, b, d = column_sort(c[0], c[1], c[2])
            return (a, b, d ^ 1)
        return lax.fori_loop(0, 10, body, x)

    r = chain((hi, lo, va))
    np.asarray(r[0])
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        r = chain((hi, lo, va))
        np.asarray(r[0])
        ts.append(time.perf_counter() - t0)
    per = min(ts) / 10
    n_stages = LOGR * (LOGR + 1) // 2
    print('column sort (91 stages, 3x4MB): %.2f ms  => %.3f ms/stage'
          % (per * 1e3, per * 1e3 / n_stages))
    print('extrapolated 210-stage full 2^20 sort: %.1f ms (lax.sort '
          'quad round: ~10.8 ms)' % (per * 1e3 / n_stages * 210))


if __name__ == '__main__':
    main()
