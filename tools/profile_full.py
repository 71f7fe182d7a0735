"""Stage profile of the full device bzip2 block encode on the real chip.

Chained-jit timing (transfers amortized) for each stage of
encode_block_full, plus the fused whole-block kernel, on the sample5
900KB first block.  Usage: python tools/profile_full.py [stage ...]
"""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from jax import lax
import os
cache = '/root/repo/.xla_cache'
os.makedirs(cache, exist_ok=True)
jax.config.update('jax_compilation_cache_dir', cache)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from compressjs_tpu.ops import jax_kernels as jk, rle as rle_ops
from compressjs_tpu.ops import device_entropy as de


def chain_time(body, init, iters=6, reps=2):
    @jax.jit
    def run(x):
        for _ in range(iters):
            x = body(x)
        return x
    out = run(init); np.asarray(jax.tree_util.tree_leaves(out)[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(init); np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    which = set(sys.argv[1:]) or {'sort', 'mtf', 'rle2', 'groups', 'pack', 'full'}
    data = np.fromfile('/root/reference/test/sample5.ref', dtype=np.uint8)
    block, _ = rle_ops.rle1_encode(data, 0, 9 * 100000 - 19)
    n = block.shape[0]
    print('block n = %d' % n, flush=True)
    dblock = jax.device_put(jnp.asarray(block))
    remap = np.zeros(256, dtype=np.int32)
    used = np.zeros(256, dtype=bool); used[block] = True
    remap[np.nonzero(used)[0]] = np.arange(int(used.sum()))
    eob = int(used.sum()) + 1
    dremap = jnp.asarray(remap)
    n_chunks = -(-(n + 1) // de.GROUP_SIZE)

    # precompute inputs for later stages
    order = jk.cyclic_suffix_sort(dblock, n)
    U = dblock[:n][(order - 1) % n]
    dense = jax.device_put(dremap[U.astype(jnp.int32)])
    mtf_seq = jax.device_put(jk.mtf_encode(dense, n, 512, 256))
    syms, count, freq = jk.rle2_encode(mtf_seq, n, eob)
    syms, count, freq = map(jax.device_put, (syms, count, freq))
    lens, g, sel, codes = de.optimize_groups_dev(
        syms, count, n_chunks, freq, eob + 1, 'xla')
    lens, sel, codes = map(jax.device_put, (lens, sel, codes))

    if 'sort' in which:
        t = chain_time(lambda b: (b + (jk.cyclic_suffix_sort(b, n)[0] % 2)).astype(jnp.uint8), dblock)
        print('sort:        %7.2f ms (%5.1f MB/s)' % (t*1e3, n/1e6/t), flush=True)
    if 'mtf' in which:
        t = chain_time(lambda d: d + (jk.mtf_encode(d, n, 512, 256)[0] % 2), dense)
        print('mtf:         %7.2f ms (%5.1f MB/s)' % (t*1e3, n/1e6/t), flush=True)
    if 'rle2' in which:
        t = chain_time(lambda s: s + (jk.rle2_encode(s, n, eob)[1] % 2), mtf_seq)
        print('rle2:        %7.2f ms (%5.1f MB/s)' % (t*1e3, n/1e6/t), flush=True)
    if 'groups' in which:
        def body(s):
            L, G, S, C = de.optimize_groups_dev(s, count, n_chunks, freq, eob + 1, 'xla')
            return s + (S[0] % 2)
        t = chain_time(body, syms)
        print('groups(xla): %7.2f ms (%5.1f MB/s)' % (t*1e3, n/1e6/t), flush=True)
        def body2(s):
            L, G, S, C = de.optimize_groups_dev(s, count, n_chunks, freq, eob + 1, 'pallas')
            return s + (S[0] % 2)
        try:
            t = chain_time(body2, syms)
            print('groups(pls): %7.2f ms (%5.1f MB/s)' % (t*1e3, n/1e6/t), flush=True)
        except Exception as e:
            print('groups(pls) failed: %r' % (e,), flush=True)
    if 'pack' in which:
        cap = de.payload_cap_bytes(n)
        def body(s):
            payload, bits = de.payload_pack_words_dev(s, count, sel, lens, codes, cap)
            return s + (bits % 2).astype(s.dtype)
        t = chain_time(body, syms)
        print('pack:        %7.2f ms (%5.1f MB/s)' % (t*1e3, n/1e6/t), flush=True)
    if 'full' in which:
        for impl in ('xla', 'pallas'):
            def body(b):
                out = de.encode_block_full(b, n, dremap, eob, mtf_impl='xla',
                                           alloc_impl=impl)
                return (b + (out[2] % 2)).astype(jnp.uint8)
            try:
                t = chain_time(body, dblock, iters=3)
                print('full(%s): %7.2f ms (%5.1f MB/s)' % (impl, t*1e3, n/1e6/t), flush=True)
            except Exception as e:
                print('full(%s) failed: %r' % (impl, e), flush=True)


if __name__ == '__main__':
    main()
