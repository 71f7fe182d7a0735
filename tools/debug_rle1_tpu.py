"""Repro the TPU rle1_decode_dev miscount: sweep caps + dtypes."""
import sys
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from compressjs_tpu.ops import jax_kernels as jk
from compressjs_tpu.ops import rle as rle_ops

data = np.fromfile('/root/reference/test/sample5.ref', dtype=np.uint8)
block, _ = rle_ops.rle1_encode(data, 0, 9 * 100000 - 19)
n = block.shape[0]

for cap in (900008, 1 << 20):
    out, cnt = jax.jit(lambda p, t: jk.rle1_decode_dev(
        p, 1 << 22, t), static_argnums=())(
        jnp.asarray(np.pad(block, (0, cap - n))), jnp.int32(n))
    print('cap=%d cnt=%d want=%d' % (cap, int(cnt), len(data)), flush=True)

# small synthetic: AAAA5BBBB0C -> expansion
syn = np.frombuffer(b'AAAA' + bytes([5]) + b'BBBB' + bytes([0]) + b'C',
                    dtype=np.uint8)
out, cnt = jax.jit(lambda p, t: jk.rle1_decode_dev(p, 4096, t))(
    jnp.asarray(np.pad(syn, (0, 1024 - len(syn)))), jnp.int32(len(syn)))
got = np.asarray(out)[:int(cnt)]
want = b'A' * 9 + b'B' * 4 + b'C'
print('synthetic cnt=%d want=%d ok=%s' %
      (int(cnt), len(want), got.tobytes() == want), flush=True)

# isolate the DFA state scan on the real block at cap 2^20
cap = 1 << 20
b32 = jnp.asarray(np.pad(block, (0, cap - n))).astype(jnp.int32)
idx = jnp.arange(cap, dtype=jnp.int32)

@jax.jit
def states_of(b, count):
    eq = jnp.concatenate([jnp.zeros(1, jnp.bool_), b[1:] == b[:-1]])
    f_eq = jnp.array([1, 2, 3, 4, 0], dtype=jnp.int8)
    f_ne = jnp.array([1, 1, 1, 1, 0], dtype=jnp.int8)
    maps = jnp.where(eq[:, None], f_eq[None, :], f_ne[None, :])
    def compose(a, c):
        out = c[:, :1] * jnp.zeros_like(a)
        for s in range(5):
            out = jnp.where(a == s, c[:, s:s + 1], out)
        return out
    return lax.associative_scan(compose, maps, axis=0)[:, 1]

st = np.asarray(states_of(b32, n))
# host reference DFA
eq = np.concatenate([[False], block[1:] == block[:-1]])
ref = np.zeros(n, dtype=np.int8)
s = 1
for i in range(n):
    if s == 4:
        ns = 0
    elif eq[i]:
        ns = s + 1 if s < 4 else 0
    else:
        ns = 1
    # transition applied at i: state AFTER consuming eq[i]
    ref[i] = ns if s != 0 else (1 if True else 0)
    s = ns if s != 0 else 1  # after a count byte, next starts fresh
print('scan vs host DFA: need careful host model; count_bytes(scan)=%d'
      % int((st[:n] == 0).sum()), flush=True)
# ground truth count bytes from the encoder
runs = 0
i = 0
cbs = []
while i < n:
    j = i
    while j < n and j - i < 3 and j + 1 <= n - 1 and block[j] == block[i]:
        j += 1
    i += 1
print('...', flush=True)
