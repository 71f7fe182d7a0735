"""Isolate the TPU-only full-decode mismatch: verify each suspect stage
on-chip against host truth (compose tr=128, walk syms, rle2/mtf, ibwt)."""
import os
import sys
import time

sys.path.insert(0, '/root/repo')
import numpy as np
import jax
import jax.numpy as jnp

STEP = sys.argv[1] if len(sys.argv) > 1 else 'all'

if STEP in ('all', 'compose'):
    from compressjs_tpu.ops.pallas_compose import compose_windowed
    rng = np.random.RandomState(0)
    for (cap, tr, blo, bhi) in ((1 << 22, 128, 1, 20), (1 << 22, 128, 2, 40),
                                (1 << 22, 128, 8, 160), (1 << 20, 128, 1, 20)):
        G = 6
        b = np.minimum(np.arange(cap)[None, :] +
                       rng.randint(blo, bhi + 1, size=(G, cap)),
                       cap - 1).astype(np.int32)
        a = np.minimum(np.arange(cap)[None, :] +
                       rng.randint(blo, bhi + 1, size=(G, cap)),
                       cap - 1).astype(np.int32)
        got = np.asarray(compose_windowed(jnp.asarray(a), jnp.asarray(b),
                                          blo, bhi, tr))
        brute = np.take_along_axis(a, b, axis=1)
        valid = np.arange(cap) < cap - (bhi + 1)
        ok = (got[:, valid] == brute[:, valid]).all()
        print('compose cap=%d tr=%d win=[%d,%d] ok=%s' %
              (cap, tr, blo, bhi, ok), flush=True)
        if not ok:
            bad = np.argwhere(got[:, valid] != brute[:, valid])
            print('  first bad', bad[:3], 'of', bad.shape[0], flush=True)

if STEP in ('all', 'walk'):
    from compressjs_tpu.codecs import bzip2
    from compressjs_tpu.ops import device_huffman as dh
    from compressjs_tpu.ops import mtf as mtf_ops
    from compressjs_tpu.ops import rle as rle_ops
    from compressjs_tpu.ops import bwt as bwt_ops
    from compressjs_tpu.parallel.decode import _pow2_at_least

    data = np.fromfile('/root/reference/test/sample5.ref', dtype=np.uint8)
    comp = np.frombuffer(bytes(bzip2.compress_file(data, None, 9)),
                         np.uint8)
    r = bzip2._BitReader(comp)
    r.read_bits(32)
    assert r.read_bits(48) == bzip2.WHOLEPI
    r.read_bits(32)
    optr, s2b, selectors, groups = bzip2._parse_block_header(r, 900000)
    byte0, bit0 = r.pos >> 3, r.pos & 7
    limits, bases, perms, mins = dh.tables_for_device(groups, len(groups))
    nbits_cap = _pow2_at_least((comp.shape[0] - byte0) * 8 + 1, 1 << 12)
    s_cap = _pow2_at_least(len(selectors), 64)
    payload = jnp.asarray(comp[byte0:byte0 +
                               ((nbits_cap + bit0 + 7) >> 3) + 8])
    sel = jnp.zeros(s_cap, dtype=jnp.int32).at[:len(selectors)].set(
        jnp.asarray(selectors, dtype=jnp.int32))
    eob = len(s2b) + 1

    # host truth symbol stream
    block, _ = rle_ops.rle1_encode(data, 0, 9 * 100000 - 19)
    n = block.shape[0]
    U = np.zeros(n, dtype=np.uint8)
    pidx = bwt_ops.bwtransform2(block, U, n, 256)
    alphabet = np.unique(block)
    mtf_seq = mtf_ops.mtf_encode(U, alphabet)
    syms_host = rle_ops.mtf_rle2_encode(mtf_seq, eob)

    for k in (2, 10):
        for build in ('pallas', 'gather'):
            os.environ['COMPRESSJS_TPU_COMPOSE'] = build
            dh.huffman_walk_dev.clear_cache()
            t0 = time.time()
            syms, count, end_bit = jax.tree_util.tree_map(
                np.asarray, dh.huffman_walk_dev(
                    payload, bit0, nbits_cap, s_cap, len(groups),
                    limits, bases, perms, mins, sel,
                    jnp.int32(len(selectors)), jnp.int32(eob), k))
            ok_count = int(count) == len(syms_host) - 1
            ok_syms = (syms[:int(count)] ==
                       syms_host[:int(count)]).all()
            print('walk k=%d %s count_ok=%s syms_ok=%s (%.0fs)' %
                  (k, build, ok_count, ok_syms, time.time() - t0),
                  flush=True)
            if not ok_syms:
                s = syms[:int(count)]
                h = syms_host[:int(count)]
                bad = np.nonzero(s != h)[0]
                print('  first mismatch at sym', bad[0] if bad.size
                      else '?', 'of', int(count), flush=True)
    os.environ.pop('COMPRESSJS_TPU_COMPOSE', None)

if STEP in ('all2', 'stages'):
    from compressjs_tpu.codecs import bzip2
    from compressjs_tpu.ops import jax_kernels as jk
    from compressjs_tpu.ops import mtf as mtf_ops
    from compressjs_tpu.ops import rle as rle_ops
    from compressjs_tpu.ops import bwt as bwt_ops

    data = np.fromfile('/root/reference/test/sample5.ref', dtype=np.uint8)
    block, _ = rle_ops.rle1_encode(data, 0, 9 * 100000 - 19)
    n = block.shape[0]
    U = np.zeros(n, dtype=np.uint8)
    pidx = bwt_ops.bwtransform2(block, U, n, 256)
    alphabet = np.unique(block)
    remap = np.zeros(256, dtype=np.int32)
    remap[alphabet] = np.arange(alphabet.shape[0])
    dense_host = remap[U]
    eob = alphabet.shape[0] + 1
    mtf_seq = mtf_ops.mtf_encode(U, alphabet)
    syms_host = rle_ops.mtf_rle2_encode(mtf_seq, eob)

    s_cap50 = 8192 * 50
    dbuf_cap = 1 << 20
    wsyms = np.full(s_cap50, eob, dtype=np.int32)
    wsyms[:len(syms_host)] = syms_host
    dws = jnp.asarray(wsyms)
    count = jnp.int32(len(syms_host) - 1)   # EOB index

    idx, total = jax.jit(lambda s, c: jk.rle2_decode(s, dbuf_cap, c),
                         static_argnums=())(dws, count)
    idx_np = np.asarray(idx); total_np = int(total)
    print('rle2_decode: total_ok=%s idx_ok=%s' %
          (total_np == n, (idx_np[:n] == mtf_seq).all()), flush=True)

    dense = jax.jit(lambda i: jk.mtf_decode(i, dbuf_cap))(jnp.asarray(
        np.pad(mtf_seq.astype(np.int32), (0, dbuf_cap - n))))
    print('mtf_decode: ok=%s' %
          (np.asarray(dense)[:n] == dense_host).all(), flush=True)

    s2b_arr = np.zeros(256, np.uint8)
    s2b_arr[:len(alphabet)] = alphabet
    Upad = np.pad(U, (0, dbuf_cap - n))
    packed = jax.jit(lambda u, t, p: jk.inverse_bwt_block_masked(
        u, dbuf_cap, t, p))(jnp.asarray(Upad), jnp.int32(n),
                            jnp.int32(min(pidx, n - 1)))
    print('ibwt: ok=%s' % (np.asarray(packed)[:n] == block).all(),
          flush=True)

    out_cap = 1 << 22
    out, ocnt = jax.jit(lambda p, t: jk.rle1_decode_dev(
        p, out_cap, t))(jnp.asarray(np.pad(block, (0, dbuf_cap - n))),
                        jnp.int32(n))
    ocnt = int(ocnt)
    print('rle1_decode: cnt_ok=%s (%d vs %d) bytes_ok=%s' %
          (ocnt == len(data), ocnt, len(data),
           (np.asarray(out)[:min(ocnt, len(data))] ==
            data[:min(ocnt, len(data))]).all()), flush=True)
