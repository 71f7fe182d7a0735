"""Isolate the TPU rle1 miscount: states+total only (no scatter)."""
import sys
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from compressjs_tpu.ops import rle as rle_ops
import functools

@functools.partial(jax.jit, static_argnums=())
def total_of(b32, count):
    n = b32.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = idx < count
    eq = jnp.concatenate([jnp.zeros(1, jnp.bool_), b32[1:] == b32[:-1]])
    f_eq = jnp.array([1, 2, 3, 4, 0], dtype=jnp.int8)
    f_ne = jnp.array([1, 1, 1, 1, 0], dtype=jnp.int8)
    maps = jnp.where(eq[:, None], f_eq[None, :], f_ne[None, :])
    def compose(a, c):
        out = c[:, :1] * jnp.zeros_like(a)
        for s in range(5):
            out = jnp.where(a == s, c[:, s:s + 1], out)
        return out
    states = lax.associative_scan(compose, maps, axis=0)[:, 1]
    is_count = (states == 0) & valid
    out_cnt = jnp.where(is_count, b32, jnp.where(valid, 1, 0))
    return jnp.sum(out_cnt), jnp.sum(is_count.astype(jnp.int32)), states

def host_truth(block, n):
    # host DFA: state 1..4 run phase, 0 = count byte
    s = 1; cbs = []
    total = 0
    for i in range(n):
        if s == 0:
            cbs.append(i); total += int(block[i]); s = 1
        else:
            total += 1
            if i + 1 < n:
                if s < 4 and block[i + 1] == block[i]:
                    s += 1
                elif s == 4:
                    s = 0
                else:
                    s = 1
            # careful: when s==4 the NEXT byte is a count regardless
    return total, len(cbs)

data = np.fromfile('/root/reference/test/sample5.ref', dtype=np.uint8)
block, _ = rle_ops.rle1_encode(data, 0, 9 * 100000 - 19)
n = block.shape[0]
th, ch = host_truth(block, n)
print('host: total=%d (data len %d) count_bytes=%d' % (th, len(data), ch),
      flush=True)

for cap in (4096, 65536, 900008, 1 << 20):
    b = np.zeros(cap, np.uint8); m = min(n, cap - 8)
    b[:m] = block[:m]
    tt, cc, st = jax.tree_util.tree_map(np.asarray, total_of(
        jnp.asarray(b).astype(jnp.int32), jnp.int32(m)))
    th2, ch2 = host_truth(block, m)
    print('cap=%-8d tpu total=%d cnt_bytes=%d | host total=%d cnt_bytes=%d ok=%s'
          % (cap, int(tt), int(cc), th2, ch2, int(tt) == th2), flush=True)
