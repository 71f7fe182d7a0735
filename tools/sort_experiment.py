"""Round-3 sort experiments: can wider seeds / higher-radix doubling cut
the rotation-sort time below the round-2 quad build (64.7 ms / 900 KB)?

Variants (all produce the exact cyclic rotation order; verified against
the production kernel):
  quad16  — production: 16-byte seed (4 u32 keys), 4x rounds
  quad32  — 32-byte seed (8 u32 keys), 4x rounds from k=32
  oct16   — 16-byte seed, 8x rounds (9-array num_keys=8 sorts)
  oct32   — 32-byte seed, 8x rounds

Also times raw lax.sort at 1/2/4/8 keys to expose the marginal key
cost (2 keys = the production quad-round seed path baseline).
Run on TPU: python tools/sort_experiment.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/jax_comp_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)

import jax.numpy as jnp
import numpy as np
from jax import lax

from compressjs_tpu.ops import jax_kernels as jk
from compressjs_tpu.ops import rle as rle_ops

SAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tests', 'data')
if not os.path.exists(os.path.join(SAMPLES, 'sample5.ref')):
    SAMPLES = '/root/reference/test'


def _words(bu, count, stride=4):
    """count packed-u32 context words starting at byte offsets 0,4,8,..."""
    def word(d):
        return ((jnp.roll(bu, -d) << 24) | (jnp.roll(bu, -(d + 1)) << 16) |
                (jnp.roll(bu, -(d + 2)) << 8) | jnp.roll(bu, -(d + 3)))
    return [word(i * stride) for i in range(count)]


def _seed_start(keys, idx, n):
    arrs = lax.sort(tuple(keys) + (idx,), num_keys=len(keys))
    order0 = arrs[-1]
    diff = jnp.ones(n, dtype=jnp.bool_)
    d = jnp.zeros(n - 1, dtype=jnp.bool_)
    for s in arrs[:-1]:
        d = d | (s[1:] != s[:-1])
    diff = diff.at[1:].set(d)
    start = jk._seg_start(diff, n)
    rank = jnp.zeros(n, dtype=jnp.int32).at[order0].set(start)
    return rank, order0, jk._tied_count(diff, n)


def _double_radix(rank0, order0, tied0, idx, n, k0, radix):
    """Doubling rounds with `radix` rank shifts per round (4=quad, 8=oct)."""
    def cond(state):
        rank, order, k, tied = state
        return (tied > 0) & (k < n)

    def body(state):
        rank, order, k, _ = state
        keys = [rank] + [jnp.roll(rank, -(j * k)) for j in range(1, radix)]
        arrs = lax.sort(tuple(keys) + (idx,), num_keys=radix)
        order = arrs[-1]
        diff = jnp.ones(n, dtype=jnp.bool_)
        d = jnp.zeros(n - 1, dtype=jnp.bool_)
        for s in arrs[:-1]:
            d = d | (s[1:] != s[:-1])
        diff = diff.at[1:].set(d)
        start = jk._seg_start(diff, n)
        new_rank = jnp.zeros(n, dtype=jnp.int32).at[order].set(start)
        return new_rank, order, k * radix, jk._tied_count(diff, n)

    return lax.while_loop(cond, body, (rank0, order0, jnp.int32(k0), tied0))


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def sort_variant(block, n, seed_words, radix):
    bu = block[:n].astype(jnp.uint32)
    idx = jnp.arange(n, dtype=jnp.int32)
    keys = _words(bu, seed_words)
    rank, order, tied = _seed_start(keys, idx, n)
    rank, order, _, tied = _double_radix(rank, order, tied, idx, n,
                                         seed_words * 4, radix)
    return lax.cond(
        tied > 0,
        lambda a: lax.sort((a[0], -idx, idx), num_keys=2)[2],
        lambda a: a[1], (rank, order))


def chain_time(fn, init, K=10):
    @jax.jit
    def run(x):
        return lax.fori_loop(0, K, lambda i, c: fn(c), x)
    r = run(init)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = run(init)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts) / K


def main():
    data = np.fromfile(os.path.join(SAMPLES, 'sample5.ref'), dtype=np.uint8)
    block, _ = rle_ops.rle1_encode(data, 0, 9 * 100000 - 19)
    n = block.shape[0]
    dblock = jax.device_put(jnp.asarray(block))
    print('n =', n, 'device =', jax.devices()[0])

    ref = np.asarray(jk.cyclic_suffix_sort(dblock, n))

    # raw sort cost at 2/4/8 keys (5..9 arrays)
    idx = jnp.arange(n, dtype=jnp.int32)
    r = jnp.asarray(np.random.default_rng(0).integers(0, n, n, np.int32))
    variants = {'quad16 (prod)': (4, 4), 'quad32': (8, 4),
                'oct16': (4, 8), 'oct32': (8, 8)}
    if '--raw' in sys.argv:
        for nk in (1, 2, 4, 8):
            arrs = tuple(jnp.roll(r, -j) for j in range(nk)) + (idx,)
            def one(x, arrs=arrs, nk=nk):
                out = lax.sort(arrs[:-1] + (x,), num_keys=nk)[-1]
                return out
            t = chain_time(one, idx)
            print('lax.sort %d keys (%d arrays): %6.1f ms'
                  % (nk, nk + 1, t * 1e3), flush=True)
    for a in sys.argv[1:]:
        if a.startswith('--only='):
            key = a.split('=', 1)[1]
            variants = {k: v for k, v in variants.items()
                        if k.startswith(key)}
            if not variants:
                print('warning: --only=%s matches no variants' % key,
                      flush=True)
    for name, (sw, radix) in variants.items():
        got = np.asarray(sort_variant(dblock, n, sw, radix))
        ok = bool((got == ref).all())
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            sort_variant(dblock, n, sw, radix).block_until_ready()
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print('%-14s %6.1f ms incl dispatch  (%5.1f MB/s)  exact=%s'
              % (name, t * 1e3, n / 1e6 / t, ok), flush=True)


if __name__ == '__main__':
    main()
