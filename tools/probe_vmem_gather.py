"""Probe: does Mosaic lower value-level int32 gathers inside a Pallas
TPU kernel, and at what rate?

The decode walk's 50th-power composition is ~92 M random HBM gathers at
~0.11 G/s (XLA).  But nxt^k[p] lands in [p+k, p+20k] — a <=640-element
window — so a tiled kernel could gather entirely from VMEM.  This probe
measures `vals[idx]` (jnp gather on VALUES, not refs) inside a kernel:
tile of T positions + halo H, out[i] = tile[idx[i]] with idx in [0,T+H).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

INTERPRET = '--cpu' in sys.argv
if INTERPRET:
    sys.argv.remove('--cpu')
    jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/jax_comp_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 512
L = 128
N = R * L          # 64 K positions per tile


def _kernel(tab_ref, idx_ref, out_ref):
    tab = tab_ref[:]                  # (R, L) values
    idx = idx_ref[:]                  # (R, L) flat indices into tab
    flat = tab.reshape(-1)
    out_ref[:] = flat[idx.reshape(-1)].reshape(R, L)


@jax.jit
def vmem_gather(tab, idx):
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(tab, idx)


def main():
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.integers(0, 1 << 20, (R, L), dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, N, (R, L), dtype=np.int32))

    t0 = time.time()
    r = vmem_gather(tab, idx)
    np.asarray(r)
    print('compile+first: %.1fs' % (time.time() - t0), flush=True)
    expect = np.asarray(tab).reshape(-1)[np.asarray(idx).reshape(-1)]
    assert (np.asarray(r).reshape(-1) == expect).all(), 'gather wrong'
    print('correct', flush=True)

    from jax import lax

    @jax.jit
    def chain(x):
        def body(i, c):
            return vmem_gather(c, idx) ^ 1
        return lax.fori_loop(0, 50, body, x)

    r = chain(tab)
    np.asarray(r)
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(chain(tab))
        ts.append(time.perf_counter() - t0)
    per = min(ts) / 50
    print('VMEM gather of %d elems: %.4f ms => %.3f G gathers/s '
          '(XLA HBM random: ~0.11 G/s)' % (N, per * 1e3, N / per / 1e9))


if __name__ == '__main__':
    main()
