"""Per-stage device profiling on the real chip (round-2 tuning harness).

Times each device kernel piece on a real 900 KB sample5 block so
optimization targets are measured, not guessed.  Usage:
    python tools/profile_device.py [sort|mtf|rle2|core|huff]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from compressjs_tpu.ops import jax_kernels as jk
from compressjs_tpu.ops import rle as rle_ops


def timeit(fn, *args, reps=3, warmup=1):
    for _ in range(warmup):
        r = fn(*args)
        jax.block_until_ready(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return min(ts), r


def load_block():
    data = np.fromfile('/root/reference/test/sample5.ref', dtype=np.uint8)
    bs = 9 * 100000 - 19
    block, _ = rle_ops.rle1_encode(data, 0, bs)
    return block


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    block = load_block()
    n = block.shape[0]
    print('block n =', n, 'device =', jax.devices()[0])
    dblock = jax.device_put(jnp.asarray(block))

    if which in ('all', 'sort'):
        t, order = timeit(lambda b: jk.cyclic_suffix_sort(b, n), dblock)
        print('cyclic_suffix_sort: %.4f s  (%.1f MB/s)' % (t, n / 1e6 / t))

        # decompose: seed sort cost and one doubling-round cost
        bu = dblock.astype(jnp.uint32)
        idx = jnp.arange(n, dtype=jnp.int32)
        hi, lo = jk.pack_cyclic_seed_keys(bu)

        @jax.jit
        def seed_only(hi, lo):
            return jk._seed_ranks(hi, lo, idx, n)
        t, rank0 = timeit(seed_only, hi, lo)
        print('  seed ranks (sort + compress): %.4f s' % t)

        @jax.jit
        def raw_sort3(a, b):
            return jax.lax.sort((a, b, idx), num_keys=2)
        t, _ = timeit(raw_sort3, hi.astype(jnp.int32), lo.astype(jnp.int32))
        print('  lax.sort 3xi32 num_keys=2: %.4f s' % t)

        @jax.jit
        def one_round(rank):
            rank2 = jnp.roll(rank, -8)
            s1, s2, order = jax.lax.sort((rank, rank2, idx), num_keys=2)
            diff = jnp.ones(n, dtype=jnp.int32)
            diff = diff.at[1:].set(
                ((s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])).astype(jnp.int32))
            csum = jnp.cumsum(diff)
            new_rank = jnp.zeros(n, dtype=jnp.int32)
            new_rank = new_rank.at[order].set(csum - 1)
            return new_rank
        t, _ = timeit(one_round, rank0)
        print('  one doubling round (sort+compress+scatter): %.4f s' % t)

        @jax.jit
        def scatter_only(order, csum):
            return jnp.zeros(n, dtype=jnp.int32).at[order].set(csum)
        t, _ = timeit(scatter_only, idx[::-1], rank0)
        print('  permutation scatter alone: %.4f s' % t)

        @jax.jit
        def cumsum_only(x):
            return jnp.cumsum(x)
        t, _ = timeit(cumsum_only, rank0)
        print('  cumsum alone: %.4f s' % t)

        @jax.jit
        def gather_only(x, i):
            return x[i]
        t, _ = timeit(gather_only, rank0, idx[::-1])
        print('  permutation gather alone: %.4f s' % t)

        # how many rounds does sample5 need?
        rank = np.asarray(rank0)
        k = 8
        rounds = 0
        while rank.max() < n - 1 and k < n:
            r2 = np.roll(rank, -k)
            o = np.lexsort((r2, rank))
            s1, s2 = rank[o], r2[o]
            d = np.ones(n, dtype=np.int64)
            d[1:] = (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])
            c = np.cumsum(d)
            rank = np.zeros(n, dtype=np.int64)
            rank[o] = c - 1
            k *= 2
            rounds += 1
        print('  doubling rounds needed (sample5 block0, k0=8):', rounds)

    if which in ('all', 'mtf'):
        remap = np.zeros(256, dtype=np.int32)
        used = np.zeros(256, dtype=bool)
        used[block] = True
        remap[np.nonzero(used)[0]] = np.arange(int(used.sum()))
        order = jk.cyclic_suffix_sort(dblock, n)
        U = dblock[:n][(order - 1) % n]
        dense = jnp.asarray(remap)[U.astype(jnp.int32)]
        dense = jax.block_until_ready(dense)
        for cl in (256, 512, 1024):
            t, _ = timeit(lambda d: jk.mtf_encode(d, n, cl, 256), dense)
            print('mtf_encode chunk=%d: %.4f s  (%.1f MB/s)'
                  % (cl, t, n / 1e6 / t))

    if which in ('all', 'rle2'):
        mtf_seq = jnp.asarray(np.random.default_rng(1).integers(
            0, 10, size=n).astype(np.int32))
        # realistic zero-heavy distribution
        mask = np.random.default_rng(2).random(n) < 0.6
        ms = np.asarray(mtf_seq)
        ms[mask] = 0
        mtf_seq = jnp.asarray(ms)
        t, _ = timeit(lambda s: jk.rle2_encode(s, n, jnp.int32(200)),
                      mtf_seq)
        print('rle2_encode: %.4f s  (%.1f MB/s)' % (t, n / 1e6 / t))

    if which in ('all', 'core'):
        remap = np.zeros(256, dtype=np.int32)
        used = np.zeros(256, dtype=bool)
        used[block] = True
        remap[np.nonzero(used)[0]] = np.arange(int(used.sum()))
        eob = jnp.int32(int(used.sum()) + 1)
        t, _ = timeit(
            lambda b: jk.encode_block_core(b, n, jnp.asarray(remap), eob),
            dblock)
        print('encode_block_core (fused): %.4f s  (%.1f MB/s)'
              % (t, n / 1e6 / t))


if __name__ == '__main__':
    main()
