"""Device-kernel throughput regression tests (VERDICT round-1 item 7).

Marked `tpu`: they need the real chip.  Thresholds ride ~80% of the
round-2 measured numbers (v5e, 900 KB sample5 block) so a ~25% kernel
regression fails CI while run-to-run noise does not:

    rotation sort        13.9 MB/s  -> floor 11
    pallas MTF (512/512) 37.7 MB/s  -> floor 30
    rle2                 119 MB/s   -> floor 50
    fused full block     5.5-6.1    -> floor 4.5
    full block decode    5.45 (r5)  -> floor 3.0 (the VERDICT r4 bar)
    inverse BWT          5.7  (r5)  -> floor 4.5

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
    # round-5 two-phase orbit (m=1024): 158.5 ms/900 KB -> 5.7 MB/s
    assert mbs > 4.5, ('inverse_bwt', mbs)

    mbs, _ = chain_throughput(
        lambda p: (p + (jk.rle1_decode_dev(p, n + n // 2,
                                           jnp.int32(n))[1] % 2))
        .astype(jnp.uint8), dblock, n)
    assert mbs > 6.4, ('rle1_decode', mbs)


def _direct_mbs(f, arg, n, K=4):
    """Direct-dispatch rate of an already-jitted program with its input
    resident on device — the method the round-4 bench records (the fori-chained
    wrapper would be a second 100 s-class compile of a program the
    production path never runs)."""
    import time
    probe = jax.jit(lambda x: x.reshape(-1)[0] % 2)
    int(np.asarray(probe(f(arg))))           # warm
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        r = None
        for _ in range(K):
            r = f(arg)
        int(np.asarray(probe(r)))
        dt = (time.perf_counter() - t0) / K
        best = dt if best is None else min(best, dt)
    return n / 1e6 / best


def test_full_block_decode_throughput(block900):
    """Round-5 floor for the all-device block decode: with the Pallas
    windowed compose (k=10), the gather-free window build, and the
    two-phase orbit, round-5 runs record 5.45 MB/s at production
    shapes (tools/walk_tune_r5.py full) vs round 4's 1.44.  Floor at
    the VERDICT r4 #2 bar (3.0) — ~55% of measured, so compile/noise
    variance cannot flake it while a regression to the round-4 design
    fails loudly."""
    from compressjs_tpu.codecs import bzip2
    from compressjs_tpu.ops import device_huffman as dh
    _, block = block900
    data = np.fromfile('/root/reference/test/sample5.ref',
                       dtype=np.uint8)
    n = 9 * 100000 - 19
    comp = np.frombuffer(bytes(bzip2.compress_file(data, None, 9)),
                         np.uint8)
    r = bzip2._BitReader(comp)
    r.read_bits(32)
    assert r.read_bits(48) == bzip2.WHOLEPI
    r.read_bits(32)
    optr, s2b, selectors, groups = bzip2._parse_block_header(r, 900000)
    byte0, bit0 = r.pos >> 3, r.pos & 7
    limits, bases, perms, mins = dh.tables_for_device(groups,
                                                      len(groups))
    s2b_arr = np.zeros(256, np.uint8)
    s2b_arr[:len(s2b)] = s2b
    payload = jax.device_put(jnp.asarray(comp[byte0:]))
    sel = jax.device_put(jnp.asarray(selectors, dtype=jnp.int32))
    # bit cap rounded to the Pallas compose tile so the production
    # composition build runs (exact caps would fall back to gathers)
    caps = (-(-(comp.shape[0] - byte0) * 8 // 16384) * 16384,
            len(selectors), len(groups), 900000 + 8, 1000000)
    mbs = _direct_mbs(
        lambda p: dh.decode_block_full_dev(
            p, bit0, *caps, limits, bases, perms, mins, sel,
            jnp.int32(len(selectors)), jnp.int32(len(s2b) + 1),
            jnp.asarray(s2b_arr), jnp.int32(optr))[0], payload, n)
    assert mbs > 3.0, ('full_block_decode', mbs)


def test_bwtcl_device_throughput(block900):
    """Round-4 floors for the BWTC-L lane pipeline (VERDICT r3 item 6):
    round-4 runs record 0.30 / 0.23 MB/s encode/decode e2e on sample5;
    floors at ~80%."""
    import time
    from compressjs_tpu.parallel.pipeline import bwtcl_compress_device, \
        bwtcl_decompress_device
    data = np.fromfile('/root/reference/test/sample5.ref',
                       dtype=np.uint8)
    comp = bytes(bwtcl_compress_device(data, None, 9))      # warm
    t0 = time.perf_counter()
    comp = bytes(bwtcl_compress_device(data, None, 9))
    t_enc = time.perf_counter() - t0
    out = bytes(bwtcl_decompress_device(comp))              # warm
    assert out == data.tobytes()
    t0 = time.perf_counter()
    out = bytes(bwtcl_decompress_device(comp))
    t_dec = time.perf_counter() - t0
    assert out == data.tobytes()
    assert 2.13064 / t_enc > 0.24, ('bwtcl_encode', 2.13064 / t_enc)
    assert 2.13064 / t_dec > 0.18, ('bwtcl_decode', 2.13064 / t_dec)
