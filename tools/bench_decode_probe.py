"""Time sec_device_decode's EXACT program shape + validate bytes."""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from compressjs_tpu.codecs import bzip2
from compressjs_tpu.ops import device_huffman as dh
from compressjs_tpu.ops import rle as rle_ops

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
caps = (-(-(comp.shape[0] - byte0) * 8 // 16384) * 16384,
        len(selectors), len(groups), 900000 + 8, 1000000)
print('caps', caps, flush=True)

probe = jax.jit(lambda x: x.reshape(-1)[0] % 2)
f = lambda p: dh.decode_block_full_dev(
    p, bit0, *caps, limits, bases, perms, mins, sel,
    jnp.int32(len(selectors)), jnp.int32(len(s2b) + 1),
    jnp.asarray(s2b_arr), jnp.int32(optr))
t0 = time.perf_counter()
out, cnt, endb = f(payload)
got = np.asarray(out); cnt = int(cnt)
print('compile+first %.1fs' % (time.perf_counter() - t0), flush=True)
blk1, _ = rle_ops.rle1_encode(data, 0, n)
expect = rle_ops.rle1_decode(blk1)
print('cnt=%d expect=%d bytes_ok=%s' %
      (cnt, expect.shape[0], (got[:cnt] == expect).all() and
       cnt == expect.shape[0]), flush=True)
best = None
for _ in range(3):
    t0 = time.perf_counter()
    rr = None
    for _ in range(4):
        rr = f(payload)[0]
    int(np.asarray(probe(rr)))
    dt = (time.perf_counter() - t0) / 4
    best = dt if best is None else min(best, dt)
print('warm=%.1fms -> full_block_decode_mb_s=%.2f' %
      (best * 1e3, n / 1e6 / best), flush=True)
