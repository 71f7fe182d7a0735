"""ctypes bindings for the native host runtime (core.cpp).

Built on demand with g++ (cached as libcompressjs_native.so next to the
source; rebuilt when core.cpp is newer).  All entry points degrade
gracefully: `available()` is False if no compiler is present and callers
fall back to the numpy/Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, 'core.cpp')
_SO = os.path.join(_DIR, 'libcompressjs_native.so')

_lib = None
_lock = threading.Lock()
_build_error = None

_i64 = ctypes.c_int64
_p_u8 = np.ctypeslib.ndpointer(dtype=np.uint8, flags='C_CONTIGUOUS')
_p_i32 = np.ctypeslib.ndpointer(dtype=np.int32, flags='C_CONTIGUOUS')
_p_i64 = np.ctypeslib.ndpointer(dtype=np.int64, flags='C_CONTIGUOUS')


def _build():
    cmd = ['g++', '-O3', '-march=native', '-shared', '-fPIC',
           '-std=c++17', '-o', _SO, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
        except Exception as e:  # no compiler / load failure
            _build_error = e
            return None
        lib.cz_suffix_sort.argtypes = [_p_u8, _p_i64, _i64]
        lib.cz_suffix_sort_sais.argtypes = [_p_u8, _p_i64, _i64]
        lib.cz_huff_code_lengths.argtypes = [_p_i64, ctypes.c_int32,
                                             ctypes.c_int32, _p_u8]
        lib.cz_bz2_block_full.argtypes = [_p_u8, _i64,
                                          ctypes.POINTER(_i64), _i64,
                                          _p_u8, ctypes.POINTER(_i64)]
        lib.cz_bz2_block_full.restype = _i64
        lib.cz_selector_mtf.argtypes = [_p_u8, _i64, ctypes.c_int32, _p_u8]
        lib.cz_selector_mtf.restype = _i64
        lib.cz_bwt_cyclic.argtypes = [_p_u8, _p_u8, _i64]
        lib.cz_bwt_cyclic.restype = _i64
        lib.cz_bwt_cyclic_ref.argtypes = [_p_u8, _p_u8, _i64]
        lib.cz_bwt_cyclic_ref.restype = _i64
        lib.cz_bwt_eof.argtypes = [_p_u8, _p_u8, _i64]
        lib.cz_bwt_eof.restype = _i64
        lib.cz_mtf_encode.argtypes = [_p_u8, _i64, _p_u8, ctypes.c_int32,
                                      _p_i32]
        lib.cz_mtf_decode.argtypes = [_p_i32, _i64, _p_u8, ctypes.c_int32,
                                      _p_u8]
        lib.cz_bz2_decode_block.argtypes = [
            _p_u8, _i64, ctypes.POINTER(_i64), _p_u8, _i64,
            _p_i32, _p_i32, _p_i64, _p_i64, _p_i32,
            ctypes.c_int32, _p_u8, _p_u8, _i64]
        lib.cz_bz2_decode_block.restype = _i64
        lib.cz_inverse_bwt.argtypes = [_p_u8, _i64, _i64, _p_u8]
        lib.cz_inverse_bwt_eof.argtypes = [_p_u8, _p_u8, _i64, _i64]
        lib.cz_rle1_decode.argtypes = [_p_u8, _i64, _p_u8, _i64]
        lib.cz_rle1_decode.restype = _i64
        lib.cz_rle1_encode.argtypes = [_p_u8, _i64, _i64, _p_u8,
                                       ctypes.POINTER(_i64)]
        lib.cz_rle1_encode.restype = _i64
        _p_u16 = np.ctypeslib.ndpointer(dtype=np.uint16,
                                        flags='C_CONTIGUOUS')
        _p_u32 = np.ctypeslib.ndpointer(dtype=np.uint32,
                                        flags='C_CONTIGUOUS')
        lib.cz_mtf_rle2.argtypes = [_p_u8, _i64, _p_u8, ctypes.c_int32,
                                    _p_u16, _p_i64]
        lib.cz_mtf_rle2.restype = _i64
        lib.cz_group_costs.argtypes = [_p_u16, _i64, _p_u8,
                                       ctypes.c_int32, ctypes.c_int32,
                                       _p_i64]
        lib.cz_chunk_freqs.argtypes = [_p_u16, _i64, _p_u8,
                                       ctypes.c_int32, ctypes.c_int32,
                                       _p_i64]
        lib.cz_payload_pack.argtypes = [_p_u16, _i64, _p_u8, _p_u8,
                                        _p_u32, ctypes.c_int32, _p_u8]
        lib.cz_payload_pack.restype = _i64
        lib.cz_bwtc_encode_block.argtypes = [_p_i32, _i64, ctypes.c_int32,
                                             ctypes.c_int32, _p_i64, _p_u8]
        lib.cz_bwtc_encode_block.restype = _i64
        lib.cz_bwtc_decode_block.argtypes = [_p_u8, _i64, _p_i64,
                                             ctypes.c_int32,
                                             ctypes.c_int32, _p_u8, _i64]
        lib.cz_bwtc_decode_block.restype = _i64
        lib.cz_order0_fenwick_encode.argtypes = [
            _p_u8, _i64, ctypes.c_int32, ctypes.c_int32, _p_i64, _p_u8]
        lib.cz_order0_fenwick_encode.restype = _i64
        lib.cz_order0_fenwick_decode.argtypes = [
            _p_u8, _i64, _p_i64, ctypes.c_int32, _p_u8, _i64]
        lib.cz_order0_fenwick_decode.restype = _i64
        lib.cz_lzjb_encode.argtypes = [_p_u8, _i64, ctypes.c_int32,
                                       ctypes.c_int32, _p_u8]
        lib.cz_lzjb_encode.restype = _i64
        lib.cz_lzjb_decode.argtypes = [_p_u8, _i64, _p_u8, _i64]
        lib.cz_lzjb_decode.restype = _i64
        lib.cz_lzjbr_encode.argtypes = [_p_u8, _i64, ctypes.c_int32,
                                        ctypes.c_int32, _p_i64, _p_u8]
        lib.cz_lzjbr_encode.restype = _i64
        lib.cz_lzjbr_decode.argtypes = [_p_u8, _i64, _p_i64, _p_u8, _i64]
        lib.cz_lzjbr_decode.restype = _i64
        lib.cz_huff_encode.argtypes = [_p_u8, _i64, _p_u8]
        lib.cz_huff_encode.restype = _i64
        lib.cz_huff_decode.argtypes = [_p_u8, _i64, _p_u8, _i64]
        lib.cz_huff_decode.restype = _i64
        lib.cz_ctx1_encode.argtypes = [_p_u8, _i64, _p_u8]
        lib.cz_ctx1_encode.restype = _i64
        lib.cz_ctx1_decode.argtypes = [_p_u8, _i64, _p_u8, _i64]
        lib.cz_ctx1_decode.restype = _i64
        lib.cz_simple_encode.argtypes = [_p_u8, _i64, _p_i64, _p_u8]
        lib.cz_simple_encode.restype = _i64
        lib.cz_simple_decode.argtypes = [_p_u8, _i64, _p_i64, _p_u8, _i64]
        lib.cz_simple_decode.restype = _i64
        for nm in ('cz_order0_mtf_encode', 'cz_order0_defsum_encode'):
            getattr(lib, nm).argtypes = [
                _p_u8, _i64, ctypes.c_int32, ctypes.c_int32, _p_i64, _p_u8]
            getattr(lib, nm).restype = _i64
        for nm in ('cz_order0_mtf_decode', 'cz_order0_defsum_decode'):
            getattr(lib, nm).argtypes = [
                _p_u8, _i64, _p_i64, ctypes.c_int32, _p_u8, _i64]
            getattr(lib, nm).restype = _i64
        lib.cz_dmc_encode.argtypes = [_p_u8, _i64, ctypes.c_int32,
                                      ctypes.c_int32, _i64, _i64,
                                      _p_i64, _p_u8]
        lib.cz_dmc_encode.restype = _i64
        lib.cz_dmc_decode.argtypes = [_p_u8, _i64, _p_i64,
                                      ctypes.c_int32, _i64, _i64,
                                      _p_u8, _i64]
        lib.cz_dmc_decode.restype = _i64
        lib.cz_ppm_encode.argtypes = [_p_u8, _i64, ctypes.c_int32,
                                      ctypes.c_int32, _p_i64, _p_u8]
        lib.cz_ppm_encode.restype = _i64
        lib.cz_ppm_decode.argtypes = [_p_u8, _i64, _p_i64,
                                      ctypes.c_int32, _p_u8, _i64]
        lib.cz_ppm_decode.restype = _i64
        lib.cz_lzp3_encode.argtypes = [_p_u8, _i64, _p_i64, _p_u8]
        lib.cz_lzp3_encode.restype = _i64
        lib.cz_lzp3_decode.argtypes = [_p_u8, _i64, _p_i64, _p_u8, _i64]
        lib.cz_lzp3_decode.restype = _i64
        _lib = lib
        return _lib


def available():
    # kill-switch: force every pure-Python fallback path (debugging,
    # fallback-parity fuzzing, platforms without a C++ toolchain);
    # conventional "off" spellings keep native enabled
    if os.environ.get('COMPRESSJS_TPU_NO_NATIVE', '').lower() \
            not in ('', '0', 'false', 'no'):
        return False
    return _load() is not None


def suffix_sort(T):
    lib = _load()
    T = np.ascontiguousarray(T, dtype=np.uint8)
    SA = np.empty(T.shape[0], dtype=np.int64)
    lib.cz_suffix_sort(T, SA, T.shape[0])
    return SA


def bwt_cyclic(T):
    lib = _load()
    T = np.ascontiguousarray(T, dtype=np.uint8)
    U = np.empty(T.shape[0], dtype=np.uint8)
    pidx = lib.cz_bwt_cyclic(T, U, T.shape[0])
    return U, int(pidx)


def huff_code_lengths(freq, maxlen):
    """Length-limited canonical Huffman code lengths (native build of
    coders/huffman_allocator.py + the (freq<<9|sym) sort-invert)."""
    lib = _load()
    freq = np.ascontiguousarray(freq, dtype=np.int64)
    n = freq.shape[0]
    lengths = np.zeros(n, dtype=np.uint8)
    lib.cz_huff_code_lengths(freq, np.int32(n), np.int32(maxlen), lengths)
    return lengths


def selector_mtf(selectors, n_groups):
    """Selectors MTF'd + unary-coded to a 0/1 bit array."""
    lib = _load()
    selectors = np.ascontiguousarray(selectors, dtype=np.uint8)
    out = np.empty(selectors.shape[0] * max(1, n_groups), dtype=np.uint8)
    count = lib.cz_selector_mtf(selectors, selectors.shape[0],
                                np.int32(n_groups), out)
    if count < 0:
        raise ValueError('invalid selector value')
    return out[:count]


def bz2_block_full(data, bitpos, dbuf_size):
    """Full-native bzip2 block parse+decode from the bit position right
    after the 48-bit magic and 32-bit CRC.  Returns (dbuf, orig_ptr,
    new_bitpos) or None on any anomaly (caller re-parses in Python so
    error behavior matches the reference exactly)."""
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    dbuf = np.empty(dbuf_size, dtype=np.uint8)
    pos = ctypes.c_int64(bitpos)
    optr = ctypes.c_int64(0)
    count = lib.cz_bz2_block_full(data, data.shape[0],
                                  ctypes.byref(pos), dbuf_size,
                                  dbuf, ctypes.byref(optr))
    if count < 0:
        return None
    return dbuf[:count], int(optr.value), int(pos.value)


def suffix_sort_sais(T):
    """Plain SA-IS path: the differential-test reference for the
    two-stage sorter behind suffix_sort()."""
    lib = _load()
    T = np.ascontiguousarray(T, dtype=np.uint8)
    SA = np.empty(T.shape[0], dtype=np.int64)
    lib.cz_suffix_sort_sais(T, SA, T.shape[0])
    return SA


def bwt_cyclic_ref(T):
    """Doubled-string SA-IS construction: the differential-test
    reference for the direct cyclic rotation sort behind bwt_cyclic()."""
    lib = _load()
    T = np.ascontiguousarray(T, dtype=np.uint8)
    U = np.empty(T.shape[0], dtype=np.uint8)
    pidx = lib.cz_bwt_cyclic_ref(T, U, T.shape[0])
    return U, int(pidx)


def bwt_eof(T):
    lib = _load()
    T = np.ascontiguousarray(T, dtype=np.uint8)
    U = np.empty(T.shape[0], dtype=np.uint8)
    pidx = lib.cz_bwt_eof(T, U, T.shape[0])
    return U, int(pidx)


def mtf_encode(data, alphabet):
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    alphabet = np.ascontiguousarray(alphabet, dtype=np.uint8)
    out = np.empty(data.shape[0], dtype=np.int32)
    lib.cz_mtf_encode(data, data.shape[0], alphabet,
                      np.int32(alphabet.shape[0]), out)
    return out


def mtf_decode(indices, alphabet):
    lib = _load()
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    alphabet = np.ascontiguousarray(alphabet, dtype=np.uint8)
    out = np.empty(indices.shape[0], dtype=np.uint8)
    lib.cz_mtf_decode(indices, indices.shape[0], alphabet,
                      np.int32(alphabet.shape[0]), out)
    return out


def bz2_decode_block(data, bitpos, selectors, minlen, maxlen, limit, base,
                     permute, sym_total, sym_to_byte, dbuf_size):
    """Returns (dbuf, new_bitpos) or raises ValueError on data error."""
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    dbuf = np.empty(dbuf_size, dtype=np.uint8)
    pos = _i64(bitpos)
    r = lib.cz_bz2_decode_block(
        data, data.shape[0], ctypes.byref(pos),
        np.ascontiguousarray(selectors, dtype=np.uint8),
        len(selectors),
        np.ascontiguousarray(minlen, dtype=np.int32),
        np.ascontiguousarray(maxlen, dtype=np.int32),
        np.ascontiguousarray(limit, dtype=np.int64),
        np.ascontiguousarray(base, dtype=np.int64),
        np.ascontiguousarray(permute, dtype=np.int32),
        np.int32(sym_total),
        np.ascontiguousarray(sym_to_byte, dtype=np.uint8),
        dbuf, dbuf_size)
    if r < 0:
        raise ValueError('Data error')
    return dbuf[:r], int(pos.value)


def inverse_bwt_eof(T, pidx):
    """Invert the EOF-terminated BWT."""
    lib = _load()
    T = np.ascontiguousarray(T, dtype=np.uint8)
    out = np.empty(T.shape[0], dtype=np.uint8)
    lib.cz_inverse_bwt_eof(T, out, T.shape[0], pidx)
    return out


def inverse_bwt(U, pidx):
    lib = _load()
    U = np.ascontiguousarray(U, dtype=np.uint8)
    out = np.empty(U.shape[0], dtype=np.uint8)
    lib.cz_inverse_bwt(U, U.shape[0], pidx, out)
    return out


def rle1_encode(data, block_size):
    """Pack runs into one block; returns (block, consumed_input)."""
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.empty(block_size, dtype=np.uint8)
    consumed = _i64(0)
    n = lib.cz_rle1_encode(data, data.shape[0], block_size, out,
                           ctypes.byref(consumed))
    return out[:n], int(consumed.value)


def mtf_rle2(U, alphabet):
    """Fused MTF + RLE2: returns (syms uint16, freq int64[eob+1])."""
    lib = _load()
    U = np.ascontiguousarray(U, dtype=np.uint8)
    alphabet = np.ascontiguousarray(alphabet, dtype=np.uint8)
    syms = np.empty(U.shape[0] + 1, dtype=np.uint16)
    freq = np.zeros(alphabet.shape[0] + 2, dtype=np.int64)
    count = lib.cz_mtf_rle2(U, U.shape[0], alphabet,
                            np.int32(alphabet.shape[0]), syms, freq)
    return syms[:count], freq


def group_costs(syms, lengths):
    """(n_chunks, n_groups) chunk costs.  lengths: (g, alpha) uint8."""
    lib = _load()
    syms = np.ascontiguousarray(syms, dtype=np.uint16)
    lengths = np.ascontiguousarray(lengths, dtype=np.uint8)
    g, alpha = lengths.shape
    n_chunks = -(-syms.shape[0] // 50)
    costs = np.empty((n_chunks, g), dtype=np.int64)
    lib.cz_group_costs(syms, syms.shape[0], lengths, np.int32(g),
                       np.int32(alpha), costs)
    return costs


def chunk_freqs(syms, selectors, n_groups, alpha):
    lib = _load()
    syms = np.ascontiguousarray(syms, dtype=np.uint16)
    selectors = np.ascontiguousarray(selectors, dtype=np.uint8)
    freqs = np.zeros((n_groups, alpha), dtype=np.int64)
    lib.cz_chunk_freqs(syms, syms.shape[0], selectors,
                       np.int32(n_groups), np.int32(alpha), freqs)
    return freqs


def payload_pack(syms, selectors, lengths, codes):
    """Returns (packed bytes, total_bits)."""
    lib = _load()
    syms = np.ascontiguousarray(syms, dtype=np.uint16)
    selectors = np.ascontiguousarray(selectors, dtype=np.uint8)
    lengths = np.ascontiguousarray(lengths, dtype=np.uint8)
    codes = np.ascontiguousarray(codes, dtype=np.uint32)
    g, alpha = lengths.shape
    out = np.zeros(syms.shape[0] * 20 // 8 + 16, dtype=np.uint8)
    bits = lib.cz_payload_pack(syms, syms.shape[0], selectors, lengths,
                               codes, np.int32(alpha), out)
    return out[:(bits + 7) // 8], int(bits)


def bwtc_encode_block(mtf_seq, asize, fast, enc_state):
    """RLE2+model-code one BWTC block on a shared range coder.
    enc_state: int64[5] ndarray, mutated in place.  Returns bytes."""
    lib = _load()
    mtf_seq = np.ascontiguousarray(mtf_seq, dtype=np.int32)
    out = np.empty(mtf_seq.shape[0] * 3 + 4096, dtype=np.uint8)
    n = lib.cz_bwtc_encode_block(mtf_seq, mtf_seq.shape[0],
                                 np.int32(asize), np.int32(1 if fast else 0),
                                 enc_state, out)
    return out[:n]


def bwtc_decode_block(data, dec_state, asize, fast, length):
    """Decode one BWTC block's MTF indices.  dec_state: int64[5]
    ([low, range, buffer, pos]), mutated in place."""
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    b = np.empty(length, dtype=np.uint8)
    r = lib.cz_bwtc_decode_block(data, data.shape[0], dec_state,
                                 np.int32(asize),
                                 np.int32(1 if fast else 0), b, length)
    if r < 0:
        raise ValueError('BWTC block decode overrun')
    return b


def order0_fenwick_encode(data, size, eof_sym, enc_state):
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.empty(data.shape[0] * 3 + 4096, dtype=np.uint8)
    n = lib.cz_order0_fenwick_encode(data, data.shape[0], np.int32(size),
                                     np.int32(eof_sym), enc_state, out)
    return out[:n]


def order0_fenwick_decode(data, dec_state, size, n):
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.empty(n, dtype=np.uint8)
    lib.cz_order0_fenwick_decode(data, data.shape[0], dec_state,
                                 np.int32(size), out, n)
    return out


def lzjb_encode(data, lempel_size, expand):
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.empty(data.shape[0] * 2 + 1024, dtype=np.uint8)
    n = lib.cz_lzjb_encode(data, data.shape[0], np.int32(lempel_size),
                           np.int32(expand), out)
    return out[:n]


def lzjb_decode(data, out_size):
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.empty(out_size, dtype=np.uint8)
    n = lib.cz_lzjb_decode(data, data.shape[0], out, out_size)
    return out[:n]


def lzjbr_encode(data, lempel_size, expand, enc_state):
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.empty(data.shape[0] * 2 + 65536, dtype=np.uint8)
    n = lib.cz_lzjbr_encode(data, data.shape[0], np.int32(lempel_size),
                            np.int32(expand), enc_state, out)
    return out[:n]


def lzjbr_decode(data, dec_state, out_size):
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.empty(out_size, dtype=np.uint8)
    lib.cz_lzjbr_decode(data, data.shape[0], dec_state, out, out_size)
    return out


def huff_encode(data):
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.empty(data.shape[0] * 2 + 4096, dtype=np.uint8)
    n = lib.cz_huff_encode(data, data.shape[0], out)
    return out[:n]


def huff_decode(data, n):
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.empty(n, dtype=np.uint8)
    lib.cz_huff_decode(data, data.shape[0], out, n)
    return out


def ctx1_encode(data):
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.empty(data.shape[0] * 2 + 4096, dtype=np.uint8)
    n = lib.cz_ctx1_encode(data, data.shape[0], out)
    return out[:n]


def ctx1_decode(data, n):
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.empty(n, dtype=np.uint8)
    lib.cz_ctx1_decode(data, data.shape[0], out, n)
    return out


def simple_encode(data, enc_state):
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.empty(data.shape[0] * 2 + data.shape[0] // 1000 * 520 + 8192,
                   dtype=np.uint8)
    n = lib.cz_simple_encode(data, data.shape[0], enc_state, out)
    return out[:n]


def simple_decode(data, dec_state, cap):
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.empty(cap, dtype=np.uint8)
    n = lib.cz_simple_decode(data, data.shape[0], dec_state, out, cap)
    if n < 0:
        raise ValueError('simple decode overrun')
    return out[:n]


def order0_encode(kind, data, size, eof_sym, enc_state):
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.empty(data.shape[0] * 3 + 65536, dtype=np.uint8)
    fn = getattr(lib, 'cz_order0_%s_encode' % kind)
    n = fn(data, data.shape[0], np.int32(size), np.int32(eof_sym),
           enc_state, out)
    return out[:n]


def order0_decode(kind, data, dec_state, size, n):
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.empty(n, dtype=np.uint8)
    fn = getattr(lib, 'cz_order0_%s_decode' % kind)
    fn(data, data.shape[0], dec_state, np.int32(size), out, n)
    return out


def dmc_encode(data, size, eof_sym, min1, min2, enc_state):
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.empty(data.shape[0] * 3 + 65536, dtype=np.uint8)
    n = lib.cz_dmc_encode(data, data.shape[0], np.int32(size),
                          np.int32(eof_sym), min1, min2, enc_state, out)
    return out[:n]


def dmc_decode(data, dec_state, size, min1, min2, n):
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.empty(n, dtype=np.uint8)
    lib.cz_dmc_decode(data, data.shape[0], dec_state, np.int32(size),
                      min1, min2, out, n)
    return out


def ppm_encode(data, size, eof_sym, enc_state):
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.empty(data.shape[0] * 3 + 65536, dtype=np.uint8)
    n = lib.cz_ppm_encode(data, data.shape[0], np.int32(size),
                          np.int32(eof_sym), enc_state, out)
    return out[:n]


def ppm_decode(data, dec_state, size, n):
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.empty(n, dtype=np.uint8)
    lib.cz_ppm_decode(data, data.shape[0], dec_state, np.int32(size),
                      out, n)
    return out


def lzp3_encode(data, enc_state):
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.empty(data.shape[0] * 2 + 65536, dtype=np.uint8)
    n = lib.cz_lzp3_encode(data, data.shape[0], enc_state, out)
    return out[:n]


def lzp3_decode(data, dec_state, n):
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.empty(n, dtype=np.uint8)
    lib.cz_lzp3_decode(data, data.shape[0], dec_state, out, n)
    return out


def rle1_decode(block, out_cap):
    lib = _load()
    block = np.ascontiguousarray(block, dtype=np.uint8)
    out = np.empty(out_cap, dtype=np.uint8)
    r = lib.cz_rle1_decode(block, block.shape[0], out, out_cap)
    if r < 0:
        raise ValueError('RLE1 output overflow')
    return out[:r]
