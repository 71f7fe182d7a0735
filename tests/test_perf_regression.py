"""Device-kernel throughput regression tests (VERDICT round-1 item 7).

Marked `tpu`: they need the real chip.  Thresholds ride ~80% of the
round-2 measured numbers (v5e, 900 KB sample5 block) so a ~25% kernel
regression fails CI while run-to-run noise does not:

    rotation sort        13.9 MB/s  -> floor 11
    pallas MTF (512/512) 37.7 MB/s  -> floor 30
    rle2                 119 MB/s   -> floor 50
    fused full block     5.5-6.1    -> floor 4.5

Timing uses profiling.chain_throughput (iterations chained in one jit,
forced fetch) — wall-clock timers around single dispatches measure the
tunnel, not the chip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from compressjs_tpu.ops import rle as rle_ops
from compressjs_tpu.parallel.profiling import chain_throughput

pytestmark = pytest.mark.tpu


@pytest.fixture(scope='module')
def block900():
    if jax.devices()[0].platform not in ('tpu', 'axon'):
        pytest.skip('needs a real TPU')
    jax.config.update('jax_compilation_cache_dir',
                      '/root/.cache/jax_comp_cache')
    data = np.fromfile('/root/reference/test/sample5.ref', dtype=np.uint8)
    block, _ = rle_ops.rle1_encode(data, 0, 9 * 100000 - 19)
    return jax.device_put(jnp.asarray(block)), block


def _meta(block):
    used = np.zeros(256, dtype=bool)
    used[block] = True
    remap = np.zeros(256, dtype=np.int32)
    remap[np.nonzero(used)[0]] = np.arange(int(used.sum()))
    return jnp.asarray(remap), jnp.int32(int(used.sum()) + 1)


def test_sort_throughput(block900):
    from compressjs_tpu.ops import jax_kernels as jk
    dblock, block = block900
    n = block.shape[0]
    mbs, _ = chain_throughput(
        lambda b: (b + (jk.cyclic_suffix_sort(b, n)[0] % 2))
        .astype(jnp.uint8), dblock, n)
    assert mbs > 11.0, mbs


def test_mtf_throughput(block900):
    from compressjs_tpu.ops import jax_kernels as jk
    from compressjs_tpu.ops import pallas_kernels as pk
    dblock, block = block900
    n = block.shape[0]
    remap, _ = _meta(block)
    order = jk.cyclic_suffix_sort(dblock, n)
    dense = jax.device_put(
        remap[dblock[:n][(order - 1) % n].astype(jnp.int32)])
    mbs, _ = chain_throughput(
        lambda d: (d + (pk.mtf_encode_pallas(d, n, 512, 256,
                                             interpret=False)[0] % 2))
        .astype(jnp.int32), dense, n)
    assert mbs > 30.0, mbs


def test_rle2_throughput(block900):
    from compressjs_tpu.ops import jax_kernels as jk
    dblock, block = block900
    n = block.shape[0]
    remap, eob = _meta(block)
    mtf = jax.device_put(jk.mtf_encode(
        remap[dblock.astype(jnp.int32)], n, 512, 256))
    mbs, _ = chain_throughput(
        lambda s: s + (jk.rle2_encode(s, n, eob)[1] % 2), mtf, n)
    assert mbs > 50.0, mbs


def test_full_block_throughput(block900):
    from compressjs_tpu.ops import device_entropy as de
    dblock, block = block900
    n = block.shape[0]
    remap, eob = _meta(block)

    def body(b):
        pidx, payload, bits, lens, g, sel, count, freq = \
            de.encode_block_full(b, n, remap, eob, 256, 'pallas')
        return (b + ((bits + lens[0, 0] + sel[0] + pidx
                      + payload[0].astype(jnp.int32)) % 2)) \
            .astype(jnp.uint8)

    mbs, _ = chain_throughput(body, dblock, n)
    assert mbs > 4.5, mbs


def test_decode_kernel_throughput(block900):
    """Decode-side floors (measured round-2, 900 KB block: rle2 undo
    44 MB/s, mtf undo 20.5, inverse BWT 5.5, rle1 undo 8.1 — floors at
    ~80% of those)."""
    from compressjs_tpu.ops import jax_kernels as jk
    dblock, block = block900
    n = block.shape[0]
    remap, eob = _meta(block)
    mtf = jk.mtf_encode(remap[dblock.astype(jnp.int32)], n, 512, 256)
    syms, count, freq = jk.rle2_encode(mtf, n, eob)
    syms = jax.device_put(syms)
    cap = n + 8

    mbs, _ = chain_throughput(
        lambda s: s + (jk.rle2_decode(s, cap, count)[1] % 2), syms, n)
    assert mbs > 35.0, ('rle2_decode', mbs)

    idx, total = jk.rle2_decode(syms, cap, count)
    idx = jax.device_put(idx)
    mbs, _ = chain_throughput(
        lambda i: i + (jk.mtf_decode(i, cap)[0] % 2), idx, n)
    assert mbs > 16.0, ('mtf_decode', mbs)

    U = jax.device_put(dblock[:n][(jk.cyclic_suffix_sort(dblock, n)
                                   - 1) % n])
    pidx = jnp.int32(0)
    mbs, _ = chain_throughput(
        lambda u: (u + (jk.inverse_bwt_block_masked(
            u, n, jnp.int32(n), pidx)[0] % 2)).astype(jnp.uint8),
        U, n)
    assert mbs > 4.4, ('inverse_bwt', mbs)

    mbs, _ = chain_throughput(
        lambda p: (p + (jk.rle1_decode_dev(p, n + n // 2,
                                           jnp.int32(n))[1] % 2))
        .astype(jnp.uint8), dblock, n)
    assert mbs > 6.4, ('rle1_decode', mbs)
