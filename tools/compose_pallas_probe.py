"""Probe: Pallas windowed compose on the real chip — compile time,
warm runtime per window size, vs the gather build's one level."""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
import jax, jax.numpy as jnp

print('devices', jax.devices(), flush=True)
from compressjs_tpu.ops.pallas_compose import compose_windowed
from compressjs_tpu.ops.device_huffman import _power_k_gather

G, cap = 6, 1 << 21
rng = np.random.RandomState(0)
b_np = np.minimum(np.arange(cap)[None, :] + rng.randint(2, 41, size=(G, cap)), cap - 1).astype(np.int32)
a_np = np.minimum(np.arange(cap)[None, :] + rng.randint(2, 41, size=(G, cap)), cap - 1).astype(np.int32)
a = jnp.asarray(a_np); b = jnp.asarray(b_np)

def timeit(f, n=3):
    t0 = time.time(); r = f(); np.asarray(r); t_first = time.time() - t0
    ts = []
    for _ in range(n):
        t0 = time.time(); r = f(); np.asarray(r); ts.append(time.time() - t0)
    return t_first, min(ts)

for tr in (64, 128):
    for (blo, bhi) in ((2, 40), (32, 640)):
        t_first, t_warm = timeit(lambda: compose_windowed(a, b, blo, bhi, tr))
        print(f'pallas tile_rows={tr} win=[{blo},{bhi}] first={t_first:.1f}s warm={t_warm*1e3:.1f}ms', flush=True)

# correctness on chip vs numpy brute for the valid region
got = np.asarray(compose_windowed(a, b, 2, 40, 64))
brute = np.stack([a_np[g][b_np[g]] for g in range(G)])
valid = np.arange(cap) < cap - 41
print('on-chip exact (valid region):', (got[:, valid] == brute[:, valid]).all(), flush=True)

t_first, t_warm = timeit(lambda: _power_k_gather(b, cap, 2))
print(f'gather build k=2 (1 level): first={t_first:.1f}s warm={t_warm*1e3:.1f}ms', flush=True)
