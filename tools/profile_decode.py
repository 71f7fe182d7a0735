"""Stage profile of the all-device block decode on the real chip."""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from jax import lax
import os
jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/jax_comp_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from compressjs_tpu.codecs import bzip2
from compressjs_tpu.ops import device_huffman as dh
from compressjs_tpu.ops import jax_kernels as jk


def chain_time(body, init, iters=4, reps=2):
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


data = np.fromfile('/root/reference/test/sample5.ref', dtype=np.uint8)
n = 9 * 100000 - 19
comp = np.frombuffer(bytes(bzip2.compress_file(data, None, 9)), np.uint8)
r = bzip2._BitReader(comp)
r.read_bits(32); assert r.read_bits(48) == bzip2.WHOLEPI; r.read_bits(32)
optr, s2b, selectors, groups = bzip2._parse_block_header(r, 900000)
byte0, bit0 = r.pos >> 3, r.pos & 7
limits, bases, perms, mins = dh.tables_for_device(groups, len(groups))
s2b_arr = np.zeros(256, np.uint8); s2b_arr[:len(s2b)] = s2b
payload = jax.device_put(jnp.asarray(comp[byte0:]))
sel = jax.device_put(jnp.asarray(selectors, dtype=jnp.int32))
nbits_cap = (comp.shape[0] - byte0) * 8
s_cap = len(selectors)
G = len(groups)
eob = jnp.int32(len(s2b) + 1)
nsel = jnp.int32(len(selectors))

def walk_body(p):
    syms, count, end = dh.huffman_walk_dev(
        p, bit0, nbits_cap, s_cap, G, limits, bases, perms, mins, sel,
        nsel, eob)
    return p + (count % 2).astype(jnp.uint8)
t = chain_time(walk_body, payload)
print('huffman walk:   %7.2f ms' % (t*1e3), flush=True)

syms, count, end = dh.huffman_walk_dev(
    payload, bit0, nbits_cap, s_cap, G, limits, bases, perms, mins,
    sel, nsel, eob)
syms = jax.device_put(syms)
def rle2_body(s):
    idx, total = jk.rle2_decode(s, 900008, count)
    return s + (total % 2)
t = chain_time(rle2_body, syms)
print('rle2 undo:      %7.2f ms' % (t*1e3), flush=True)

idx, total = jk.rle2_decode(syms, 900008, count)
idx = jax.device_put(idx)
def mtf_body(i):
    d = jk.mtf_decode(i, 900008)
    return i + (d[0] % 2)
t = chain_time(mtf_body, idx)
print('mtf undo:       %7.2f ms' % (t*1e3), flush=True)

dense = jk.mtf_decode(idx, 900008)
U = jnp.asarray(s2b_arr)[dense].astype(jnp.uint8)
U = jax.device_put(U)
def ibwt_body(u):
    p = jk.inverse_bwt_block_masked(u, 900008, total,
                                    jnp.minimum(jnp.int32(optr), total-1))
    return u + (p[0] % 2)
t = chain_time(ibwt_body, U)
print('inverse BWT:    %7.2f ms' % (t*1e3), flush=True)

packed = jk.inverse_bwt_block_masked(U, 900008, total,
                                     jnp.minimum(jnp.int32(optr), total-1))
packed = jax.device_put(packed)
def rle1_body(p):
    out, cnt = jk.rle1_decode_dev(p, 1000000, total)
    return p + (cnt % 2).astype(jnp.uint8)
t = chain_time(rle1_body, packed)
print('rle1 undo:      %7.2f ms' % (t*1e3), flush=True)
