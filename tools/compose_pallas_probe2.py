"""Probe 2: compute-only timing via chained composes + scalar fetch."""
import sys, time, functools
sys.path.insert(0, '/root/repo')
import numpy as np
import jax, jax.numpy as jnp
from compressjs_tpu.ops.pallas_compose import compose_windowed
from compressjs_tpu.ops.device_huffman import _power_k_gather

G, cap = 6, 1 << 21
rng = np.random.RandomState(0)
b_np = np.minimum(np.arange(cap)[None, :] + rng.randint(2, 41, size=(G, cap)), cap - 1).astype(np.int32)
a = jnp.asarray(np.minimum(np.arange(cap)[None, :] + rng.randint(2, 41, size=(G, cap)), cap - 1).astype(np.int32))
b = jnp.asarray(b_np)

REPS = 8

@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def chain_pallas(a, b, blo, bhi, tr):
    c = b
    for _ in range(REPS):
        c = compose_windowed(a, c, blo, bhi, tr)
    return c[:, :8].sum()

@jax.jit
def chain_gather(a, b):
    c = b
    for _ in range(REPS):
        c = a.reshape(-1)[(jnp.arange(G, dtype=jnp.int32) * cap)[:, None] + c]
    return c[:, :8].sum()

def timeit(f, n=3):
    t0 = time.time(); np.asarray(f()); t_first = time.time() - t0
    ts = []
    for _ in range(n):
        t0 = time.time(); np.asarray(f()); ts.append(time.time() - t0)
    return t_first, min(ts) / REPS

for tr in (64, 128):
    for (blo, bhi) in ((2, 40), (8, 160), (32, 640)):
        tf, tw = timeit(lambda: chain_pallas(a, b, blo, bhi, tr))
        print(f'pallas tr={tr} win=[{blo},{bhi}] compile={tf:.1f}s per-compose={tw*1e3:.1f}ms', flush=True)

tf, tw = timeit(lambda: chain_gather(a, b))
print(f'gather per-compose={tw*1e3:.1f}ms (compile {tf:.1f}s)', flush=True)
