"""Round-5 walk/ibwt tuning on the real chip, at PRODUCTION shapes
(pow2 caps, exactly what parallel/decode._device_entropy_launch uses).

Sweeps: power_k x compose build, CHASE_UNROLL, orbit cursor count m,
then times the full decode_block_full_dev composition.
"""
import os
import sys
import time

sys.path.insert(0, '/root/repo')
import numpy as np
import jax
import jax.numpy as jnp

from compressjs_tpu.codecs import bzip2
from compressjs_tpu.ops import device_huffman as dh
from compressjs_tpu.ops import jax_kernels as jk
from compressjs_tpu.parallel.decode import _pow2_at_least

MODE = sys.argv[1] if len(sys.argv) > 1 else 'all'

data = np.fromfile('/root/reference/test/sample5.ref', dtype=np.uint8)
comp = np.frombuffer(bytes(bzip2.compress_file(data, None, 9)), np.uint8)
r = bzip2._BitReader(comp)
r.read_bits(32)
assert r.read_bits(48) == bzip2.WHOLEPI
r.read_bits(32)
optr, s2b, selectors, groups = bzip2._parse_block_header(r, 900000)
byte0, bit0 = r.pos >> 3, r.pos & 7
limits, bases, perms, mins = dh.tables_for_device(groups, len(groups))
# production caps (mirrors _device_entropy_launch)
nbits_cap = _pow2_at_least((comp.shape[0] - byte0) * 8 + 1, 1 << 12)
s_cap = _pow2_at_least(len(selectors), 64)
payload = jax.device_put(jnp.asarray(
    comp[byte0:byte0 + ((nbits_cap + bit0 + 7) >> 3) + 8]))
sel = jnp.zeros(s_cap, dtype=jnp.int32).at[:len(selectors)].set(
    jnp.asarray(selectors, dtype=jnp.int32))
sel = jax.device_put(sel)
G = len(groups)
eob = jnp.int32(len(s2b) + 1)
nsel = jnp.int32(len(selectors))
print('shapes: nbits_cap=%d s_cap=%d G=%d n_sel=%d' %
      (nbits_cap, s_cap, G, len(selectors)), flush=True)

# host-truth symbols for validation
r2 = bzip2._BitReader(comp)
r2.read_bits(32)
truth = bzip2._read_block_header(r2, 900000)
truth_dbuf = truth[0]


def timeit(f, reps=3):
    t0 = time.time()
    out = f()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t_first = time.time() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = f()
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.time() - t0)
    return t_first, best, out


def run_walk(k):
    syms, count, end = dh.huffman_walk_dev(
        payload, bit0, nbits_cap, s_cap, G, limits, bases, perms, mins,
        sel, nsel, eob, k)
    return count  # tiny fetch


if MODE in ('all', 'walk'):
    for build in ('pallas', 'gather'):
        os.environ['COMPRESSJS_TPU_COMPOSE'] = build
        for k in (2, 5, 10, 25, 50):
            dh.huffman_walk_dev.clear_cache()
            try:
                tf, tw, _ = timeit(lambda: run_walk(k))
                print('walk %s k=%-2d compile=%5.1fs warm=%6.1fms'
                      % (build, k, tf, tw * 1e3), flush=True)
            except Exception as e:
                print('walk %s k=%d FAILED: %r' % (build, k, e),
                      flush=True)
    os.environ.pop('COMPRESSJS_TPU_COMPOSE', None)

if MODE in ('all', 'unroll'):
    os.environ['COMPRESSJS_TPU_COMPOSE'] = 'pallas'
    for unroll in (32, 64, 128):
        dh.CHASE_UNROLL = unroll
        for k in (2, 5, 10):
            dh.huffman_walk_dev.clear_cache()
            tf, tw, _ = timeit(lambda: run_walk(k))
            print('walk pallas k=%-2d unroll=%-3d compile=%5.1fs '
                  'warm=%6.1fms' % (k, unroll, tf, tw * 1e3), flush=True)
    dh.CHASE_UNROLL = 32
    os.environ.pop('COMPRESSJS_TPU_COMPOSE', None)

if MODE in ('all', 'ibwt'):
    # validate + time the two-phase orbit at several m on the real dbuf
    dbuf_cap = 1 << 20
    U8 = np.zeros(dbuf_cap, dtype=np.uint8)
    U8[:truth_dbuf.shape[0]] = truth_dbuf
    total = truth_dbuf.shape[0]
    Uj = jax.device_put(jnp.asarray(U8))
    from compressjs_tpu.ops import bwt as bwt_ops
    expect = bwt_ops.inverse_bwt_cyclic(truth_dbuf, total, optr)
    for m in (1024, 4096, 16384, 1 << 30):
        jk.ORBIT_CURSORS = m
        jk.inverse_bwt_block_masked.clear_cache()
        tf, tw, out = timeit(lambda: jk.inverse_bwt_block_masked(
            Uj, dbuf_cap, total, min(optr, total - 1)))
        ok = (np.asarray(out)[:total] == expect).all()
        print('ibwt m=%-8d compile=%5.1fs warm=%6.1fms ok=%s'
              % (m, tf, tw * 1e3, ok), flush=True)
    jk.ORBIT_CURSORS = 4096

if MODE in ('all', 'full'):
    os.environ['COMPRESSJS_TPU_COMPOSE'] = 'pallas'
    from compressjs_tpu.ops.device_huffman import decode_block_full_dev
    s2b_arr = np.zeros(256, np.uint8)
    s2b_arr[:len(s2b)] = s2b
    dbuf_cap = 1 << 20
    out_cap = 1 << 22   # sample5 is 2,130,640 B — 1<<21 would truncate
    for k in (5, 10):
        decode_block_full_dev.clear_cache()
        dh.huffman_walk_dev.clear_cache()
        tf, tw, out = timeit(lambda: decode_block_full_dev(
            payload, bit0, nbits_cap, s_cap, G, dbuf_cap, out_cap,
            limits, bases, perms, mins, sel, nsel, eob,
            jnp.asarray(s2b_arr), jnp.int32(optr), k))
        o, cnt, _ = out
        got = np.asarray(o)[:int(cnt)]
        # ONE block decodes to the first block's data only: sample5 at
        # -9 spans multiple blocks (RLE1 on light-run text slightly
        # EXPANDS via count-0 bytes), so the truth is the RLE1 undo of
        # this block, not the whole file
        from compressjs_tpu.ops import rle as rle_ops2
        blk1, _ = rle_ops2.rle1_encode(data, 0, 9 * 100000 - 19)
        expect = rle_ops2.rle1_decode(blk1)
        ok = got.shape[0] == expect.shape[0] and (got == expect).all()
        n_in = blk1.shape[0]
        print('full k=%-2d compile=%5.1fs warm=%6.1fms bytes_ok=%s '
              '(%.2f MB/s)' % (k, tf, tw * 1e3, ok,
                               n_in / tw / 1e6), flush=True)
    os.environ.pop('COMPRESSJS_TPU_COMPOSE', None)
