"""Probe: Mosaic throughput for VMEM-resident bitonic compare-exchange
stages — decides whether a Pallas sort can beat lax.sort (which runs its
network at HBM speed: ~10.8 ms for a 5-array 2^20 sort round).

Kernel: 3 arrays (key_hi, key_lo, val) as (R, 128) int32, column-major
semantics.  Sorts every LANE's R-element column independently:
log2(R)*(log2(R)+1)/2 bitonic stages, all row-axis partner exchanges via
pltpu.roll.  ms/stage extrapolates a full multi-tile sort network.

VMEM: in-place (input_output_aliases) + swap-mask-first staging keeps
peak live ~6 arrays; R=4096 -> ~12 MB + temps.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

INTERPRET = '--cpu' in sys.argv
if INTERPRET:
    sys.argv.remove('--cpu')
    jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
from jax import lax

jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/jax_comp_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
L = 128
LOGR = R.bit_length() - 1


def _stage(hi, lo, va, s, level, rows):
    """One bitonic compare-exchange stage: static stride s (rows),
    TRACED merge level (direction = bit `level` of the row index).
    Masks stay int32 (Mosaic cannot truncate i8 vectors to i1)."""
    up = (rows & s) == 0
    phi = jnp.where(up, pltpu.roll(hi, R - s, 0), pltpu.roll(hi, s, 0))
    plo = jnp.where(up, pltpu.roll(lo, R - s, 0), pltpu.roll(lo, s, 0))
    lg = s.bit_length() - 1
    dirbit = ((rows >> lg) ^ (rows >> level)) & 1
    gti = ((hi > phi) | ((hi == phi) & (lo > plo))).astype(jnp.int32)
    lti = ((hi < phi) | ((hi == phi) & (lo < plo))).astype(jnp.int32)
    swap = jnp.where(dirbit == 0, gti, lti) == 1
    hi = jnp.where(swap, phi, hi)
    lo = jnp.where(swap, plo, lo)
    pva = jnp.where(up, pltpu.roll(va, R - s, 0), pltpu.roll(va, s, 0))
    va = jnp.where(swap, pva, va)
    return hi, lo, va


def _stage_dyn(hi, lo, va, lg, level, rows):
    """Compare-exchange with traced stride-log2: the roll shift must be
    static, so a lax.switch picks among the LOGR static stride variants
    (kernel code stays O(LOGR) without unrolling all stages)."""
    def mk(lgs):
        def f(args):
            return _stage(args[0], args[1], args[2], 1 << lgs, level,
                          rows)
        return f

    return lax.switch(lg, [mk(g) for g in range(LOGR)], (hi, lo, va))


def _kernel(sched_ref, hi_ref, lo_ref, va_ref, ohi, olo, ova):
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    ohi[:] = hi_ref[:]
    olo[:] = lo_ref[:]
    ova[:] = va_ref[:]
    n_stages = LOGR * (LOGR + 1) // 2

    def body(t, _):
        lg = sched_ref[t, 0]
        level = sched_ref[t, 1]
        hi, lo, va = _stage_dyn(ohi[:], olo[:], ova[:], lg, level, rows)
        ohi[:] = hi
        olo[:] = lo
        ova[:] = va
        return 0

    jax.lax.fori_loop(0, n_stages, body, 0)


def _schedule():
    rows = []
    for level in range(1, LOGR + 1):
        for st in range(level - 1, -1, -1):
            rows.append((st, level))
    return np.array(rows, dtype=np.int32)


@jax.jit
def column_sort(hi, lo, va):
    sched = jnp.asarray(_schedule())
    return pl.pallas_call(
        _kernel,
        out_shape=[jax.ShapeDtypeStruct((R, L), jnp.int32)] * 3,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        input_output_aliases={1: 0, 2: 1, 3: 2},
        interpret=INTERPRET,
    )(sched, hi, lo, va)


def main():
    rng = np.random.default_rng(0)
    hi = jnp.asarray(rng.integers(0, 1 << 20, (R, L), dtype=np.int32))
    lo = jnp.asarray(rng.integers(0, 1 << 20, (R, L), dtype=np.int32))
    va = jnp.asarray(rng.integers(0, 1 << 20, (R, L), dtype=np.int32))

    t0 = time.time()
    r = column_sort(hi, lo, va)
    np.asarray(r[0])
    print('compile+first: %.1fs (R=%d)' % (time.time() - t0, R),
          flush=True)

    h, l, v = (np.asarray(x) for x in r)
    k = h.astype(np.int64) * (1 << 21) + l
    assert (np.diff(k, axis=0) >= 0).all(), 'columns not sorted'
    va0 = np.asarray(va)
    for c in (0, 63, 127):
        assert sorted(v[:, c]) == sorted(va0[:, c])
    print('correct', flush=True)

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
    elems = R * L
    print('column sort (%d stages, 3x%.1fMB): %.2f ms  => %.4f ms/stage'
          % (n_stages, elems * 4 / 1e6, per * 1e3, per * 1e3 / n_stages))
    # full 2^20 3-array sort = 210 stage-passes over 2^20; this kernel
    # does n_stages passes over `elems`
    full = per / n_stages * 210 * ((1 << 20) / elems)
    print('extrapolated 210-stage full 2^20 sort: %.1f ms '
          '(lax.sort quad round: ~10.8 ms)' % (full * 1e3))


if __name__ == '__main__':
    main()
