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


def test_rle1_decode_dev_matches_host():
    from compressjs_tpu.ops import rle as rle_ops
    rng = np.random.default_rng(1)
    cases = [
        np.frombuffer(b'aaaaXbbbb\x00cc', np.uint8),
        np.frombuffer(b'aaaa\x05', np.uint8),
        np.frombuffer(b'aaaaaaaa', np.uint8),  # count byte == run byte
        rng.integers(0, 4, 5000).astype(np.uint8),
        np.repeat(np.arange(30, dtype=np.uint8),
                  rng.integers(1, 600, 30)),
    ]
    data = np.fromfile('/root/reference/test/sample4.ref', np.uint8)
    blk, _ = rle_ops.rle1_encode(data, 0, 100000 - 19)
    cases.append(blk)
    for i, c in enumerate(cases):
        ref = rle_ops.rle1_decode(c)
        cap = len(ref) + 8
        padded = np.zeros(len(c) + 5, np.uint8)
        padded[:len(c)] = c
        out, total = jk.rle1_decode_dev(jnp.asarray(padded), cap,
                                        jnp.int32(len(c)))
        total = int(total)
        assert total == len(ref), i
        assert np.array_equal(np.asarray(out)[:total], ref), i


def test_decode_block_full_dev():
    """The all-device block decode (walk -> RLE2 -> MTF -> inverse BWT
    -> RLE1 undo) reproduces the original bytes + CRC."""
    from compressjs_tpu.utils.crc32 import crc32_bzip2
    data = open('/root/reference/test/sample4.ref', 'rb').read()[:250000]
    comp = np.frombuffer(bytes(bzip2.compress_file(data, props=1)),
                         np.uint8)
    r = bzip2._BitReader(comp)
    r.read_bits(32)
    assert r.read_bits(48) == bzip2.WHOLEPI
    crc = r.read_bits(32)
    optr, s2b, selectors, groups = bzip2._parse_block_header(r, 100000)
    byte0, bit0 = r.pos >> 3, r.pos & 7
    limits, bases, perms, mins = dh.tables_for_device(groups,
                                                      len(groups))
    s2b_arr = np.zeros(256, np.uint8)
    s2b_arr[:len(s2b)] = s2b
    out, cnt, _end = dh.decode_block_full_dev(
        jnp.asarray(comp[byte0:]), bit0, (comp.shape[0] - byte0) * 8,
        len(selectors), len(groups), 100000 + 8, 200000,
        limits, bases, perms, mins,
        jnp.asarray(selectors, dtype=jnp.int32),
        jnp.int32(len(selectors)), jnp.int32(len(s2b) + 1),
        jnp.asarray(s2b_arr), jnp.int32(optr))
    cnt = int(cnt)
    got = np.asarray(out)[:cnt]
    assert crc32_bzip2(got) == crc
    assert got.tobytes() == data[:cnt]


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


def test_walk_compose_builds_and_powers_agree(monkeypatch):
    """Windowed vs gather composition and every power_k produce the
    identical walk (the TPU picks windowed + small k; CPU gathers)."""
    data = SAMPLES[0]
    (comp, sym_start, _optr, _s2b, selectors, groups, eob,
     ref_syms, ref_end) = _block_parts(data)
    ref = None
    for mode in ('gather', 'windowed'):
        monkeypatch.setenv('COMPRESSJS_TPU_COMPOSE', mode)
        # the build choice is read at trace time: drop cached traces so
        # the env override actually selects the implementation
        dh.huffman_walk_dev.clear_cache()
        for k in (50, 10, 2):
            byte0 = sym_start >> 3
            limits, bases, perms, mins = dh.tables_for_device(
                groups, len(groups))
            syms, count, end_bit = dh.huffman_walk_dev(
                jnp.asarray(comp[byte0:]), sym_start & 7,
                (comp.shape[0] - byte0) * 8, len(selectors),
                len(groups), limits, bases, perms, mins,
                jnp.asarray(selectors, dtype=jnp.int32),
                jnp.int32(len(selectors)), jnp.int32(eob), k)
            cur = (int(count), int(end_bit),
                   np.asarray(syms)[:int(count)].tolist())
            if ref is None:
                ref = cur
            assert cur == ref, (mode, k)
