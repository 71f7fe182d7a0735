"""Device canonical-Huffman symbol decode (ops/device_huffman.py) vs a
reference-transcribed sequential walk (Bzip2.js:288-361 semantics)."""

import numpy as np
import pytest
import jax.numpy as jnp

from compressjs_tpu.codecs import bzip2
from compressjs_tpu.ops import device_huffman as dh
from compressjs_tpu.ops import jax_kernels as jk


def _walk_reference(r, groups, selectors, eob):
    """Sequential symbol walk emitting the raw symbol stream (incl. the
    EOB) and the end bit position."""
    syms = []
    sel_idx = 0
    budget = 0
    cur = None
    while True:
        if not budget:
            budget = 50
            cur = groups[selectors[sel_idx]]
            sel_idx += 1
        budget -= 1
        min_len, max_len, limit, base, permute = cur
        i = min_len
        j = r.read_bits(i)
        while j > limit[i]:
            i += 1
            assert i <= max_len
            j = (j << 1) | r.read_bits(1)
        j -= base[i]
        sym = permute[j]
        syms.append(sym)
        if sym == eob:
            return syms, r.pos


def _block_parts(data, level=1):
    """Compress `data` at `level`, parse the first block's header on the
    host, and return everything the device walk needs plus the
    reference walk's outputs."""
    comp = np.frombuffer(bytes(bzip2.compress_file(data, props=level)),
                         dtype=np.uint8)
    r = bzip2._BitReader(comp)
    assert r.read_bits(24) == 0x425A68            # 'BZh'
    lvl = r.read_bits(8) - 0x30
    assert r.read_bits(48) == bzip2.WHOLEPI
    r.read_bits(32)                               # block CRC
    dbuf_size = lvl * 100000
    orig_ptr, sym_to_byte, selectors, groups = bzip2._parse_block_header(
        r, dbuf_size)
    sym_start = r.pos
    eob = len(sym_to_byte) + 1
    ref_syms, ref_end = _walk_reference(r, groups, selectors, eob)
    return (comp, sym_start, orig_ptr, sym_to_byte, selectors, groups,
            eob, ref_syms, ref_end)


def _run_device_walk(comp, sym_start, selectors, groups, eob,
                     nbits_cap=None, s_cap=None):
    byte0 = sym_start >> 3
    bit0 = sym_start & 7
    payload = jnp.asarray(comp[byte0:])
    if nbits_cap is None:
        nbits_cap = (comp.shape[0] - byte0) * 8
    if s_cap is None:
        s_cap = len(selectors)
    limits, bases, perms, mins = dh.tables_for_device(groups, len(groups))
    sel = jnp.zeros(s_cap, dtype=jnp.int32).at[:len(selectors)].set(
        jnp.asarray(selectors, dtype=jnp.int32)[:s_cap])
    syms, count, end_bit = dh.huffman_walk_dev(
        payload, bit0, int(nbits_cap), int(s_cap), len(groups),
        limits, bases, perms, mins, sel,
        jnp.int32(len(selectors)), jnp.int32(eob))
    return (np.asarray(syms), int(count),
            int(end_bit) + byte0 * 8)


SAMPLES = [
    b'This is a test\n' * 40,
    bytes(range(256)) * 30,
    b'aaaaaaaaabbbbbbbbbcc' * 500,
    open('/root/reference/test/sample1.ref', 'rb').read()[:60000],
    open('/root/reference/test/sample4.ref', 'rb').read()[:200000],
]


@pytest.mark.parametrize('i', range(len(SAMPLES)))
def test_walk_matches_reference(i):
    data = SAMPLES[i]
    (comp, sym_start, _optr, _s2b, selectors, groups, eob,
     ref_syms, ref_end) = _block_parts(data)
    syms, count, end_bit = _run_device_walk(comp, sym_start, selectors,
                                            groups, eob)
    assert count == len(ref_syms) - 1
    assert syms[:count].tolist() == ref_syms[:-1]
    assert end_bit == ref_end


def test_walk_padded_caps():
    """Caps larger than needed (the bucketed-jit shapes the mesh decode
    uses) must not change the result."""
    data = open('/root/reference/test/sample1.ref', 'rb').read()[:30000]
    (comp, sym_start, _optr, _s2b, selectors, groups, eob,
     ref_syms, ref_end) = _block_parts(data)
    byte0 = sym_start >> 3
    nbits_cap = (comp.shape[0] - byte0) * 8 + 555
    s_cap = len(selectors) + 37
    syms, count, end_bit = _run_device_walk(
        comp, sym_start, selectors, groups, eob,
        nbits_cap=nbits_cap, s_cap=s_cap)
    assert count == len(ref_syms) - 1
    assert syms[:count].tolist() == ref_syms[:-1]
    assert end_bit == ref_end


def test_device_block_decode_end_to_end():
    """Walk -> rle2_decode -> mtf_decode -> sym_to_byte equals the BWT
    column the host decoder produces."""
    data = open('/root/reference/test/sample4.ref', 'rb').read()[:120000]
    (comp, sym_start, orig_ptr, sym_to_byte, selectors, groups, eob,
     ref_syms, _end) = _block_parts(data)
    syms, count, _ = _run_device_walk(comp, sym_start, selectors,
                                      groups, eob)
    dbuf_cap = 100000 + 10
    idx, total = jk.rle2_decode(jnp.asarray(syms), dbuf_cap,
                                jnp.int32(count))
    total = int(total)
    dense = jk.mtf_decode(idx, dbuf_cap)
    s2b = np.zeros(256, dtype=np.uint8)
    s2b[:len(sym_to_byte)] = sym_to_byte
    U = s2b[np.asarray(dense)[:total]]
    # host truth: the dbuf the Python walk builds (native off)
    r = bzip2._BitReader(comp)
    r.read_bits(32)
    import unittest.mock as mock
    with mock.patch.object(bzip2, '_native', None):
        res = bzip2._read_block_header(r, 100000)
    dbuf, optr2, _crc = res
    assert optr2 == orig_ptr
    assert total == dbuf.shape[0]
    assert np.array_equal(U, dbuf)
