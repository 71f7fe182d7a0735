"""Tunnel-robust device microbenchmarks: each op is iterated K times
inside ONE jitted loop with a carried data dependency, and the result is
fetched (np.asarray) to force a real sync.  Reported time = (loop -
overhead) / K."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from compressjs_tpu.ops import jax_kernels as jk
from compressjs_tpu.ops import rle as rle_ops

K = 20


def chain_time(make_body, init, reps=2):
    """Time K chained applications of body inside one jit."""
    @jax.jit
    def run(x):
        return lax.fori_loop(0, K, lambda i, c: make_body(c), x)

    r = run(init)
    np.asarray(jax.tree_util.tree_leaves(r)[0])  # warmup + compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = run(init)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts) / K


def load_block():
    data = np.fromfile('/root/reference/test/sample5.ref', dtype=np.uint8)
    bs = 9 * 100000 - 19
    block, _ = rle_ops.rle1_encode(data, 0, bs)
    return block


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    block = load_block()
    n = block.shape[0]
    print('block n = %d' % n)
    dblock = jax.device_put(jnp.asarray(block))
    idx = jnp.arange(n, dtype=jnp.int32)

    if which in ('all', 'prims'):
        # primitive costs, chained via (x -> op(x)-shaped transforms)
        t = chain_time(lambda x: jnp.cumsum(x) & 0xFFFF, idx)
        print('cumsum n:            %.2f ms' % (t * 1e3))
        t = chain_time(lambda x: x[(x + 1) % n], idx)
        print('random-ish gather n: %.2f ms' % (t * 1e3))
        t = chain_time(
            lambda x: jnp.zeros(n, jnp.int32).at[x].set(x), idx[::-1])
        print('perm scatter n:      %.2f ms' % (t * 1e3))
        t = chain_time(
            lambda x: lax.sort((x, jnp.roll(x, -8), idx),
                               num_keys=2)[0], idx[::-1])
        print('sort 3xi32 2key n:   %.2f ms' % (t * 1e3))
        t = chain_time(
            lambda x: lax.sort((x, idx), num_keys=1)[0], idx[::-1])
        print('sort 2xi32 1key n:   %.2f ms' % (t * 1e3))
        t = chain_time(lambda x: lax.associative_scan(jnp.maximum, x), idx)
        print('assoc-scan max n:    %.2f ms' % (t * 1e3))

    if which in ('all', 'stages'):
        # full stage costs chained K times
        def sort_stage(b):
            o = jk.cyclic_suffix_sort(b, n)
            return (b + (o[0] % 2)).astype(jnp.uint8)  # dependency
        t = chain_time(sort_stage, dblock)
        print('cyclic_suffix_sort:  %.2f ms (%.1f MB/s)'
              % (t * 1e3, n / 1e6 / t))

        remap = np.zeros(256, dtype=np.int32)
        used = np.zeros(256, dtype=bool)
        used[block] = True
        remap[np.nonzero(used)[0]] = np.arange(int(used.sum()))
        eob = jnp.int32(int(used.sum()) + 1)
        dremap = jnp.asarray(remap)

        order = jk.cyclic_suffix_sort(dblock, n)
        U = dblock[:n][(order - 1) % n]
        dense = jax.device_put(dremap[U.astype(jnp.int32)])

        def mtf_stage(d):
            m = jk.mtf_encode(d, n, 512, 256)
            return (d + (m[0] % 2)).astype(jnp.int32)
        t = chain_time(mtf_stage, dense)
        print('mtf_encode 512/256:  %.2f ms (%.1f MB/s)'
              % (t * 1e3, n / 1e6 / t))

        mtf_seq = np.asarray(jk.mtf_encode(dense, n, 512, 256))
        dmtf = jax.device_put(jnp.asarray(mtf_seq))

        def rle2_stage(s):
            syms, count, freq = jk.rle2_encode(s, n, eob)
            return s + (count % 2)
        t = chain_time(rle2_stage, dmtf)
        print('rle2_encode:         %.2f ms (%.1f MB/s)'
              % (t * 1e3, n / 1e6 / t))

        def core_stage(b):
            pidx, syms, count, freq = jk.encode_block_core(
                b, n, dremap, eob)
            return (b + (count % 2)).astype(jnp.uint8)
        t = chain_time(core_stage, dblock)
        print('encode_block_core:   %.2f ms (%.1f MB/s)'
              % (t * 1e3, n / 1e6 / t))


if __name__ == '__main__':
    main()
