"""Probe 2: fully-UNROLLED bitonic sort of one (R, 128) tile in Pallas.

probe_pallas_sort.py's lax.switch-per-stage kernel did not finish
Mosaic compilation in 600 s; this build unrolls the whole stage schedule
as straight-line code (static strides, static direction masks folded to
iota math) and sorts the tile in ROW-MAJOR global element order
(element i = r*128 + l), which needs BOTH roll axes:

  stride s < 128          -> lane-axis roll (axis=1)
  128 <= s < R*128        -> sublane-axis roll (axis=0) by s/128

Measures the full-tile sort (log2(R*128) levels) and per-stage cost, and
extrapolates the tiled full-2^20 sorter design (local tile sort + XLA
cross-tile stages + per-level Pallas tails).
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

jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/jax_comp_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = int(sys.argv[1]) if len(sys.argv) > 1 else 512
L = 128
N = R * L
LOGN = N.bit_length() - 1


def _stage(hi, lo, va, s, level, pos):
    """One compare-exchange stage, static stride s and merge level.
    Partner of element at position p is p ^ s; direction from bit
    `level` of p (ascending when 0)."""
    if s < L:
        phi = pltpu.roll(hi, s, 1)  # XOR partner: roll by s both ways
        plo = pltpu.roll(lo, s, 1)  # is wrong in general; see below
        pva = pltpu.roll(va, s, 1)
    else:
        phi = pltpu.roll(hi, s // L, 0)
        plo = pltpu.roll(lo, s // L, 0)
        pva = pltpu.roll(va, s // L, 0)
    # XOR-partnering via symmetric rolls: for stride s (power of 2) the
    # partner p^s is at roll(-s) when bit s of p is 0, roll(+s) when 1.
    # rolling by +s gives element p-s... handle via select of two rolls.
    if s < L:
        mhi = pltpu.roll(hi, L - s, 1)
        mlo = pltpu.roll(lo, L - s, 1)
        mva = pltpu.roll(va, L - s, 1)
    else:
        mhi = pltpu.roll(hi, R - s // L, 0)
        mlo = pltpu.roll(lo, R - s // L, 0)
        mva = pltpu.roll(va, R - s // L, 0)
    up = (pos & s) == 0
    phi = jnp.where(up, mhi, phi)
    plo = jnp.where(up, mlo, plo)
    pva = jnp.where(up, mva, pva)
    # swap selector: bit log2(s) of p (right element) XOR bit
    # `level` of p (descending run) — int32 throughout: Mosaic cannot
    # truncate i8 bool vectors to i1
    lg = s.bit_length() - 1
    dirbit = ((pos >> lg) ^ (pos >> level)) & 1
    gti = ((hi > phi) | ((hi == phi) & (lo > plo))).astype(jnp.int32)
    lti = ((hi < phi) | ((hi == phi) & (lo < plo))).astype(jnp.int32)
    swap = jnp.where(dirbit == 0, gti, lti) == 1
    hi = jnp.where(swap, phi, hi)
    lo = jnp.where(swap, plo, lo)
    va = jnp.where(swap, pva, va)
    return hi, lo, va


def _kernel(hi_ref, lo_ref, va_ref, ohi, olo, ova):
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    pos = rows * L + lanes
    hi, lo, va = hi_ref[:], lo_ref[:], va_ref[:]
    for level_bit in range(1, LOGN + 1):
        # final level: bit LOGN of pos is always 0 => ascending run
        for st in range(level_bit - 1, -1, -1):
            hi, lo, va = _stage(hi, lo, va, 1 << st, level_bit, pos)
    ohi[:] = hi
    olo[:] = lo
    ova[:] = va


@jax.jit
def tile_sort(hi, lo, va):
    return pl.pallas_call(
        _kernel,
        out_shape=[jax.ShapeDtypeStruct((R, L), jnp.int32)] * 3,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        input_output_aliases={0: 0, 1: 1, 2: 2},
        interpret=INTERPRET,
    )(hi, lo, va)


def main():
    rng = np.random.default_rng(0)
    hi = jnp.asarray(rng.integers(0, 1 << 20, (R, L), dtype=np.int32))
    lo = jnp.asarray(rng.integers(0, 1 << 20, (R, L), dtype=np.int32))
    va = jnp.asarray(rng.integers(0, 1 << 20, (R, L), dtype=np.int32))

    t0 = time.time()
    r = tile_sort(hi, lo, va)
    np.asarray(r[0])
    n_stages = LOGN * (LOGN + 1) // 2
    print('compile+first: %.1fs (R=%d, %d elems, %d stages)'
          % (time.time() - t0, R, N, n_stages), flush=True)

    h, l, v = (np.asarray(x).reshape(-1) for x in r)
    k = h.astype(np.int64) * (1 << 21) + l
    assert (np.diff(k) >= 0).all(), 'tile not sorted'
    assert sorted(v) == sorted(np.asarray(va).reshape(-1).tolist())
    print('correct', flush=True)

    from jax import lax

    @jax.jit
    def chain(x):
        def body(i, c):
            a, b, d = tile_sort(c[0], c[1], c[2])
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
    print('tile sort (%d stages, 3x%.2fMB): %.3f ms  => %.5f ms/stage'
          % (n_stages, N * 4 / 1e6, per * 1e3, per * 1e3 / n_stages))
    # full 2^20 sorter: 8-or-more local tile sorts + 3 levels of
    # (XLA cross stages + Pallas 17-stage tails)
    tiles = (1 << 20) // N
    lt = int(np.log2(1 << 20)) - int(np.log2(N))
    total_tile_stage = tiles * (n_stages + lt * LOGN)
    full = per / n_stages * total_tile_stage
    print('extrapolated full 2^20 sort (Pallas part only): %.2f ms '
          '(lax.sort round: ~10.8 ms)' % (full * 1e3))


if __name__ == '__main__':
    main()
