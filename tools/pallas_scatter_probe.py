"""Round-4 feasibility probe for VERDICT item 2: can a hand-written
Pallas radix partition beat lax.sort in the quad doubling rounds?

Every radix-partition design ultimately needs, per pass, a random
PERMUTE-APPLY of the n-element payload (scatter to computed
destinations, or equivalently gather from the inverse).  The TPU has no
vector scatter: a Pallas scatter is a per-element scalar-unit loop, and
an XLA scatter/gather is issue-rate bound.  This probe measures the
three movement primitives at the sort's working size (n = 900 K,
int32) so the radix family can be bounded by arithmetic instead of
built speculatively:

  1. lax.sort 5-array/4-key round (the incumbent, ~10 ms measured)
  2. XLA scatter  out.at[perm].set(vals)   (unique random perm)
  3. XLA gather   vals[perm]
  4. Pallas VMEM-resident per-element scatter loop

A 4-key quad radix sort needs >= 10 8-bit passes x 5 payload arrays of
permute-apply; if one 900 K permute-apply costs anywhere near one full
lax.sort round, the design loses by an order of magnitude and is
closed.  Run on the real TPU: python tools/pallas_scatter_probe.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 900 * 1024


def timed(f, *args, K=6):
    probe = jax.jit(lambda x: x.reshape(-1)[0] % 2)
    t0 = time.perf_counter()
    int(np.asarray(probe(f(*args))))
    compile_s = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        r = None
        for _ in range(K):
            r = f(*args)
        int(np.asarray(probe(r)))
        dt = (time.perf_counter() - t0) / K
        best = dt if best is None else min(best, dt)
    return best, compile_s


@functools.partial(jax.jit, static_argnums=())
def sort5(k1, k2, k3, k4, idx):
    return lax.sort((k1, k2, k3, k4, idx), num_keys=4)[4]


@jax.jit
def xla_scatter(perm, vals):
    return jnp.zeros(N, jnp.int32).at[perm].set(vals)


@jax.jit
def xla_gather(perm, vals):
    return vals[perm]


def _scatter_kernel(idx_ref, val_ref, out_ref):
    def body(i, _):
        out_ref[pl.ds(idx_ref[i], 1)] = val_ref[pl.ds(i, 1)]
        return 0
    lax.fori_loop(0, idx_ref.shape[0], body, 0)


@jax.jit
def pallas_scatter(perm, vals):
    return pl.pallas_call(
        _scatter_kernel,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(perm, vals)


def main():
    rng = np.random.default_rng(0)
    perm = jax.device_put(jnp.asarray(
        rng.permutation(N).astype(np.int32)))
    vals = jax.device_put(jnp.asarray(
        rng.integers(0, N, N).astype(np.int32)))
    ks = [jax.device_put(jnp.asarray(
        rng.integers(0, N, N).astype(np.int32))) for _ in range(4)]
    idx = jax.device_put(jnp.arange(N, dtype=jnp.int32))

    t, cs = timed(sort5, *ks, idx)
    print('lax.sort 5-array 4-key:     %7.2f ms  (compile %.0fs)'
          % (t * 1e3, cs), flush=True)
    t, cs = timed(xla_scatter, perm, vals)
    print('XLA scatter (unique perm):  %7.2f ms  (compile %.0fs)'
          % (t * 1e3, cs), flush=True)
    t, cs = timed(xla_gather, perm, vals)
    print('XLA gather:                 %7.2f ms  (compile %.0fs)'
          % (t * 1e3, cs), flush=True)
    try:
        t, cs = timed(pallas_scatter, perm, vals)
        print('Pallas VMEM scatter loop:   %7.2f ms  (compile %.0fs)'
              % (t * 1e3, cs), flush=True)
    except Exception as e:
        print('Pallas VMEM scatter loop:   FAILED %s: %s'
              % (type(e).__name__, str(e)[-300:]), flush=True)


if __name__ == '__main__':
    main()
