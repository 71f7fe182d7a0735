"""Bit-exact bzip2 codec.

Format-compatible with the standard bzip2 container and with the reference
implementation (/root/reference/lib/Bzip2.js): 'BZh1'-'BZh9' magic, 48-bit
pi/sqrt-pi block magics, per-block CRC32 and rolling stream CRC, the
blockSize = level*100000 - 19 quirk, RLE1 + cyclic BWT + MTF/RLE2 +
grouped static Huffman with MTF'd unary selectors and delta-coded length
tables.  Includes multistream decode and the random-access pair
`decompress_block(input, bit_pos)` / `table(input, callback)`.

Architecture is array-in/array-out: each block is transformed by
vectorized stages (compressjs_tpu.ops.rle/mtf/bwt/huffman_stages) and bits
are emitted in bulk; streams exist only at the container boundary.  The
device (JAX) build of the same stages lives in
compressjs_tpu.ops.jax_kernels and the data-parallel multi-block path in
compressjs_tpu.parallel.
"""

from __future__ import annotations

import os

import numpy as np

from ..ops import bwt as bwt_ops
from ..ops import mtf as mtf_ops
from ..ops import rle as rle_ops
from ..ops import huffman_stages as hs
from ..utils.crc32 import crc32_bzip2, stream_crc_combine

try:
    from .. import native as _native
except Exception:  # pragma: no cover
    _native = None
from ..utils.stream import (ArrayInputStream, BitStream, BufferStream,
                            coerce_input_stream, coerce_output_stream, EOF)

WHOLEPI = 0x314159265359
SQRTPI = 0x177245385090
MAX_HUFCODE_BITS = 20
MAX_SYMBOLS = 258
GROUP_SIZE = 50


class Bzip2Error(ValueError):
    def __init__(self, msg, code=None):
        super().__init__(msg)
        self.error_code = code


# error codes mirroring the reference's Err table (Bzip2.js:62-88)
class Err:
    OK = 0
    LAST_BLOCK = -1
    NOT_BZIP_DATA = -2
    UNEXPECTED_INPUT_EOF = -3
    UNEXPECTED_OUTPUT_EOF = -4
    DATA_ERROR = -5
    OUT_OF_MEMORY = -6
    OBSOLETE_INPUT = -7
    END_OF_BLOCK = -8


def _throw(code, detail=None):
    messages = {
        Err.LAST_BLOCK: 'Bad file checksum',
        Err.NOT_BZIP_DATA: 'Not bzip data',
        Err.UNEXPECTED_INPUT_EOF: 'Unexpected input EOF',
        Err.UNEXPECTED_OUTPUT_EOF: 'Unexpected output EOF',
        Err.DATA_ERROR: 'Data error',
        Err.OUT_OF_MEMORY: 'Out of memory',
        Err.OBSOLETE_INPUT: 'Obsolete (pre 0.9.5) bzip format not supported.',
    }
    msg = messages.get(code, 'unknown error')
    if detail:
        msg += ': ' + detail
    raise Bzip2Error(msg, code)


# ===========================================================================
# encoder

def mtf_rle2(U, alphabet, alphabet_size):
    """MTF + RLE2 + histogram: the fused native scan, or the numpy
    three-pass fallback.  Shared by this module and parallel.pipeline —
    the single site for the native-vs-fallback dispatch."""
    if _native is not None and _native.available():
        return _native.mtf_rle2(U, alphabet)
    mtf_seq = mtf_ops.mtf_encode(U, alphabet)
    syms = rle_ops.mtf_rle2_encode(mtf_seq, alphabet_size + 1)
    freq = np.bincount(syms, minlength=alphabet_size + 2)
    return syms, freq


def compress_block_bits(block):
    """Compress one RLE1-packed block to a header+payload bit array
    (everything after the 48-bit magic and 32-bit CRC;
    reference compressBlock, Bzip2.js:735-876)."""
    return entropy_stage_bits(block, *bwt_stage(block))


def bwt_stage(block):
    """The block transform half of compress_block_bits (the heavier,
    independently schedulable stage)."""
    length = block.shape[0]
    U = np.zeros(length, dtype=np.uint8)
    pidx = bwt_ops.bwtransform2(block, U, length, 256)
    return U, pidx


def entropy_stage_bits(block, U, pidx):
    """The MTF/RLE2/Huffman half of compress_block_bits."""
    length = block.shape[0]
    header = BitArrayWriter()
    header.write_bit(0)                 # not randomized
    header.write_bits(24, pidx)

    # used-byte bitmap: 16-bit compact map + 16-bit per present row
    used = np.zeros(256, dtype=bool)
    used[block] = True
    compact = used.reshape(16, 16).any(axis=1)
    for i in range(16):
        header.write_bit(bool(compact[i]))
    for i in range(16):
        if compact[i]:
            for j in range(16):
                header.write_bit(bool(used[(i << 4) | j]))
    alphabet = np.nonzero(used)[0].astype(np.uint8)
    alphabet_size = len(alphabet)
    end_of_block = alphabet_size + 1

    # MTF then RLE2 (RUNA/RUNB) with EOB; the native path fuses both
    # passes (one scan of U instead of three array passes)
    syms, freq = mtf_rle2(U, alphabet, alphabet_size)

    # Huffman groups + selectors
    length_matrix, selectors = hs.optimize_groups(syms, end_of_block + 1,
                                                  freq)
    n_groups = length_matrix.shape[0]
    code_matrix = np.stack([hs.canonical_codes(length_matrix[g])
                            for g in range(n_groups)])

    header.write_bits(3, n_groups)
    header.write_bits(15, len(selectors))
    header.append(hs.selector_mtf_bits(selectors, n_groups))
    for g in range(n_groups):
        header.append(hs.emit_table_deltas(length_matrix[g]))
    payload, total_bits = hs.payload_bytes(syms, selectors, length_matrix,
                                           code_matrix)
    header.append(np.unpackbits(payload, count=total_bits))
    return header.bits()


class BitArrayWriter:
    """Accumulate bits as uint8 0/1 chunks; cheap bulk appends."""

    def __init__(self):
        self._parts = []

    def write_bit(self, b):
        self._parts.append(np.array([1 if b else 0], dtype=np.uint8))

    def write_bits(self, n, value):
        arr = np.array([(value >> i) & 1 for i in range(n - 1, -1, -1)],
                       dtype=np.uint8)
        self._parts.append(arr)

    def append(self, bits):
        self._parts.append(np.asarray(bits, dtype=np.uint8))

    def bits(self):
        if not self._parts:
            return np.zeros(0, dtype=np.uint8)
        return np.concatenate(self._parts)


def compress_file(input_data, output=None, props=None):
    """Bzip2.compressFile: level = block size multiplier 1-9 (default 9)."""
    in_stream = coerce_input_stream(input_data)
    o = coerce_output_stream(output)
    out = BitStream(o.stream)

    level = 9
    if isinstance(props, (int, float)) and not isinstance(props, bool):
        level = int(props)
    if level < 1 or level > 9:
        raise ValueError('Invalid block size multiplier')

    # the C implementation reads ahead over runs at the block edge; the
    # reference (and we) instead shave 19 bytes so block cuts line up in
    # the common no-trailing-run case (Bzip2.js:893-900)
    block_size = level * 100000 - 19

    out.write_byte(ord('B'))
    out.write_byte(ord('Z'))
    out.write_byte(ord('h'))
    out.write_byte(ord('0') + level)

    # slurp input (array path; stream path buffered through read())
    if isinstance(in_stream, ArrayInputStream):
        data = in_stream.read_array(in_stream.size - in_stream.pos)
    else:
        chunks = []
        buf = np.zeros(1 << 20, dtype=np.uint8)
        while True:
            n = in_stream.read(buf, 0, buf.shape[0])
            if n <= 0:
                break
            chunks.append(buf[:n].copy())
        data = (np.concatenate(chunks) if chunks
                else np.zeros(0, dtype=np.uint8))

    # RLE1 boundaries are the only serial dependency between blocks
    # (each block's start is the previous block's consumed end), so the
    # independent blocks are compressed on a thread pool — the native
    # sort/entropy calls release the GIL, so this scales with host
    # cores even from Python.  When only a few blocks exist, each block
    # becomes TWO chained tasks (BWT, then entropy): a core that
    # finished its rotation sort steals another block's entropy stage
    # instead of idling (sample5 -9 is 3 blocks on 2 cores, +15%).
    # With many blocks, whole-block tasks pack the cores on their own
    # and keep each block's arrays on one core's cache, so the split is
    # skipped.  In-flight work is bounded, keeping peak memory
    # O(workers * block) instead of buffering the whole file's results.
    from collections import deque
    from concurrent.futures import Future, ThreadPoolExecutor

    workers = max(1, min(8, os.cpu_count() or 1))
    est_blocks = -(-data.shape[0] // block_size)
    split_stages = est_blocks <= 3 * workers

    def bwt_job(block, start, consumed):
        crc = crc32_bzip2(data[start:start + consumed])
        U, pidx = bwt_stage(block)
        return crc, block, U, pidx

    def ent_job(crc, block, U, pidx):
        return crc, entropy_stage_bits(block, U, pidx)

    def whole_job(block, start, consumed):
        return ent_job(*bwt_job(block, start, consumed))

    def chain_ent(ex, bwt_fut):
        """Future for ent_job(*bwt_fut.result()), submitted only once
        the BWT task finishes (never parks a worker on a wait)."""
        outf = Future()

        def on_bwt(f):
            exc = f.exception()
            if exc is not None:
                outf.set_exception(exc)
                return
            try:
                nxt = ex.submit(ent_job, *f.result())
            except RuntimeError as e:  # pool shut down by an earlier failure
                outf.set_exception(e)
                return

            def on_ent(g):
                exc2 = g.exception()
                if exc2 is not None:
                    outf.set_exception(exc2)
                else:
                    outf.set_result(g.result())

            nxt.add_done_callback(on_ent)

        bwt_fut.add_done_callback(on_bwt)
        return outf

    stream_crc = 0
    with ThreadPoolExecutor(workers) as ex:
        inflight = deque()
        start = 0
        done = False

        def drain(fut):
            nonlocal stream_crc
            crc, bits = fut.result()
            stream_crc = stream_crc_combine(stream_crc, crc)
            out.write_bits(48, WHOLEPI)
            out.write_bits(32, crc)
            out.write_bit_array(bits)

        while not done:
            block, consumed = rle_ops.rle1_encode(data, start, block_size)
            # a block can be short of block_size mid-stream (the RLE1
            # count-byte back-off defers a byte), so termination is by
            # input position, not block fill
            start += consumed
            done = consumed == 0 or start >= data.shape[0]
            if block.shape[0] > 0:
                if split_stages:
                    bwt_fut = ex.submit(bwt_job, block, start - consumed,
                                        consumed)
                    inflight.append(chain_ent(ex, bwt_fut))
                else:
                    inflight.append(ex.submit(whole_job, block,
                                              start - consumed, consumed))
            while len(inflight) > workers + 1:
                drain(inflight.popleft())
        while inflight:
            drain(inflight.popleft())

    out.write_bits(48, SQRTPI)
    out.write_bits(32, stream_crc)
    out.flush()
    return o.retval


# ===========================================================================
# decoder

class _BitReader:
    """Fast MSB-first bit reader over a byte buffer with absolute bit
    addressing (the in-memory analog of BitStream.seekBit/tellBit)."""

    __slots__ = ('data', 'nbits', 'pos')

    def __init__(self, data):
        # held as a uint8 ndarray VIEW (zero-copy for bytes and for
        # memmapped inputs — a >RAM compressed file is never
        # materialized; reads page in on demand)
        if isinstance(data, np.ndarray):
            data = np.ascontiguousarray(data.view(np.uint8)) \
                if data.dtype != np.uint8 else data
        else:
            data = np.frombuffer(bytes(data) if not
                                 isinstance(data, (bytes, bytearray,
                                                   memoryview))
                                 else data, dtype=np.uint8)
        self.data = data
        self.nbits = int(data.shape[0]) * 8
        self.pos = 0

    def read_bits(self, n):
        """Read n bits; bits past EOF are zero (BitStream semantics)."""
        pos = self.pos
        self.pos = pos + n
        end_byte = (pos + n + 7) >> 3
        start_byte = pos >> 3
        chunk = bytes(self.data[start_byte:end_byte])
        if len(chunk) < end_byte - start_byte:
            chunk = chunk + b'\0' * (end_byte - start_byte - len(chunk))
        val = int.from_bytes(chunk, 'big')
        total_bits = (end_byte - start_byte) * 8
        val >>= total_bits - ((pos & 7) + n)
        return val & ((1 << n) - 1)

    def eof(self):
        return self.pos >= self.nbits

    def seek_bit(self, pos):
        self.pos = pos

    def tell_bit(self):
        return self.pos

    def align_byte(self):
        self.pos = (self.pos + 7) & ~7


def _parse_block_header(r, dbuf_size):
    """Parse one block header (after magic+CRC) up to the first symbol
    bit: randomized flag, origPtr, symbol map, selectors, Huffman tables
    (reference Bzip2.js:137-275).  Returns (orig_pointer, sym_to_byte,
    selectors, groups) with r.pos left at the first symbol bit; groups
    are _decode_tables tuples.  Shared by the Python walk and the device
    Huffman walk (ops/device_huffman.py)."""
    if r.read_bits(1):
        _throw(Err.OBSOLETE_INPUT)
    orig_pointer = r.read_bits(24)
    if orig_pointer > dbuf_size:
        _throw(Err.DATA_ERROR, 'initial position out of bounds')

    # symbol map
    t = r.read_bits(16)
    sym_to_byte = []
    for i in range(16):
        if t & (1 << (0xF - i)):
            k = r.read_bits(16)
            for j in range(16):
                if k & (1 << (0xF - j)):
                    sym_to_byte.append((i << 4) | j)
    sym_total = len(sym_to_byte)

    group_count = r.read_bits(3)
    if group_count < 2 or group_count > 6:
        _throw(Err.DATA_ERROR)
    n_selectors = r.read_bits(15)
    if n_selectors == 0:
        _throw(Err.DATA_ERROR)

    # selectors: unary + MTF.  The unary codes are decoded vectorized
    # from a bounded bit window (worst case group_count+1 bits each)
    # instead of bit-at-a-time — this loop runs ~n/50 times per block.
    max_bits = n_selectors * (group_count + 1)
    start = r.pos
    nbytes = max(0, min(r.data.shape[0] - (start >> 3),
                        (max_bits + (start & 7) + 7) >> 3))
    off = min(start >> 3, r.data.shape[0])
    window = r.data[off:off + nbytes]
    bits = np.unpackbits(window)[start & 7:]
    if bits.shape[0] < max_bits:   # past-EOF bits read as zero
        bits = np.concatenate(
            [bits, np.zeros(max_bits - bits.shape[0], dtype=np.uint8)])
    zeros = np.nonzero(bits == 0)[0][:n_selectors]
    if zeros.shape[0] < n_selectors:
        _throw(Err.DATA_ERROR)
    j_arr = np.diff(zeros, prepend=-1) - 1
    if (j_arr >= group_count).any():
        _throw(Err.DATA_ERROR)
    r.pos = start + int(zeros[-1]) + 1
    mtf_lst = list(range(group_count))
    selectors = []
    for j in j_arr.tolist():
        s = mtf_lst.pop(j)
        mtf_lst.insert(0, s)
        selectors.append(s)

    # Huffman tables: delta-coded lengths -> permute/base/limit
    sym_count = sym_total + 2
    groups = []
    for _ in range(group_count):
        t = r.read_bits(5)
        lengths = np.empty(sym_count, dtype=np.int32)
        for i in range(sym_count):
            while True:
                if t < 1 or t > MAX_HUFCODE_BITS:
                    _throw(Err.DATA_ERROR)
                if not r.read_bits(1):
                    break
                if not r.read_bits(1):
                    t += 1
                else:
                    t -= 1
            lengths[i] = t
        groups.append(_decode_tables(lengths, sym_count))
    return orig_pointer, sym_to_byte, selectors, groups


def _read_block_header(r, dbuf_size):
    """Parse one block's header+symbols; returns (dbuf, crc) or None on the
    stream-end magic (reference _get_next_block, Bzip2.js:125-398)."""
    h = r.read_bits(48)
    if h == SQRTPI:
        return None
    if h != WHOLEPI:
        _throw(Err.NOT_BZIP_DATA)
    target_crc = r.read_bits(32)
    # full-native fast path: header parse + symbol decode in one call;
    # any anomaly falls through to the Python parser below, which
    # reproduces the reference's exact error behavior (and acceptance
    # of degenerate blocks)
    if _native is not None and _native.available():
        res = _native.bz2_block_full(r.data, r.pos, dbuf_size)
        if res is not None:
            dbuf, orig_pointer, r.pos = res
            return dbuf, orig_pointer, target_crc
    orig_pointer, sym_to_byte, selectors, groups = _parse_block_header(
        r, dbuf_size)
    sym_total = len(sym_to_byte)
    group_count = len(groups)
    n_selectors = len(selectors)

    # symbol decode loop (RLE2+MTF undo into dbuf); the native runtime
    # runs this canonical-Huffman walk at C speed when present
    if _native is not None and _native.available():
        g = len(groups)
        minlen = np.array([grp[0] for grp in groups], dtype=np.int32)
        maxlen = np.array([grp[1] for grp in groups], dtype=np.int32)
        limit = np.zeros((g, 25), dtype=np.int64)
        base = np.zeros((g, 22), dtype=np.int64)
        permute = np.zeros((g, 258), dtype=np.int32)
        for i, grp in enumerate(groups):
            limit[i, :len(grp[2])] = grp[2]
            base[i, :len(grp[3])] = grp[3]
            permute[i, :len(grp[4])] = grp[4]
        data_arr = r.data
        s2b = np.zeros(256, dtype=np.uint8)
        s2b[:sym_total] = sym_to_byte
        try:
            dbuf, newpos = _native.bz2_decode_block(
                data_arr, r.pos, np.array(selectors, dtype=np.uint8),
                minlen, maxlen, limit, base, permute, sym_total, s2b,
                dbuf_size)
        except ValueError:
            _throw(Err.DATA_ERROR)
        r.pos = newpos
        if orig_pointer < 0 or orig_pointer >= dbuf.shape[0]:
            _throw(Err.DATA_ERROR)
        return dbuf, orig_pointer, target_crc

    dbuf = np.empty(dbuf_size, dtype=np.uint8)
    byte_count = np.zeros(256, dtype=np.int64)
    mtf_syms = list(range(256))
    run_pos = 0
    t_acc = 0
    dbuf_count = 0
    selector_idx = 0
    sym_budget = 0
    read_bits = r.read_bits
    while True:
        if not sym_budget:
            sym_budget = GROUP_SIZE
            if selector_idx >= n_selectors:
                _throw(Err.DATA_ERROR)
            min_len, max_len, limit, base, permute = groups[
                selectors[selector_idx]]
            selector_idx += 1
        sym_budget -= 1
        # canonical Huffman walk
        i = min_len
        j = read_bits(i)
        while j > limit[i]:
            i += 1
            if i > max_len:
                _throw(Err.DATA_ERROR)
            j = (j << 1) | read_bits(1)
        j -= base[i]
        if j < 0 or j >= MAX_SYMBOLS:
            _throw(Err.DATA_ERROR)
        next_sym = permute[j]
        if next_sym <= 1:  # RUNA / RUNB
            if not run_pos:
                run_pos = 1
                t_acc = 0
            t_acc += run_pos if next_sym == 0 else 2 * run_pos
            run_pos <<= 1
            continue
        if run_pos:
            run_pos = 0
            if dbuf_count + t_acc > dbuf_size:
                _throw(Err.DATA_ERROR)
            uc = sym_to_byte[mtf_syms[0]]
            byte_count[uc] += t_acc
            dbuf[dbuf_count:dbuf_count + t_acc] = uc
            dbuf_count += t_acc
        if next_sym > sym_total:  # EOB
            break
        if dbuf_count >= dbuf_size:
            _throw(Err.DATA_ERROR)
        j = next_sym - 1
        uc = mtf_syms.pop(j)
        mtf_syms.insert(0, uc)
        uc = sym_to_byte[uc]
        byte_count[uc] += 1
        dbuf[dbuf_count] = uc
        dbuf_count += 1

    if orig_pointer < 0 or orig_pointer >= dbuf_count:
        _throw(Err.DATA_ERROR)
    return dbuf[:dbuf_count], orig_pointer, target_crc


def _decode_tables(lengths, sym_count):
    """permute/base/limit tables from code lengths (Bzip2.js:226-275)."""
    min_len = int(lengths.min())
    max_len = int(lengths.max())
    permute = np.zeros(MAX_SYMBOLS, dtype=np.int32)
    pp = 0
    temp = np.zeros(MAX_HUFCODE_BITS + 1, dtype=np.int64)
    limit = np.zeros(MAX_HUFCODE_BITS + 2, dtype=np.int64)
    base = np.zeros(MAX_HUFCODE_BITS + 1, dtype=np.int64)
    for i in range(min_len, max_len + 1):
        sel = np.nonzero(lengths == i)[0]
        permute[pp:pp + len(sel)] = sel
        pp += len(sel)
    for i in range(sym_count):
        temp[lengths[i]] += 1
    pp = t = 0
    for i in range(min_len, max_len):
        pp += temp[i]
        limit[i] = pp - 1
        pp <<= 1
        t += temp[i]
        base[i + 1] = pp - t
    limit[max_len + 1] = np.iinfo(np.int64).max
    limit[max_len] = pp + temp[max_len] - 1
    base[min_len] = 0
    # plain lists: the symbol-decode loop indexes these per bit, and list
    # indexing is several times faster than ndarray item access
    return (min_len, max_len, limit.tolist(), base.tolist(),
            permute.tolist())


def _decode_one_block(r, dbuf_size):
    """Header+symbols -> inverse BWT -> RLE1 undo -> (bytes, crc_ok)."""
    res = _read_block_header(r, dbuf_size)
    if res is None:
        return None
    dbuf, orig_pointer, target_crc = res
    if _native is not None and _native.available():
        packed = _native.inverse_bwt(dbuf, orig_pointer)
        out = _native.rle1_decode(packed, packed.shape[0] * 256 + 256)
    else:
        packed = bwt_ops.inverse_bwt_cyclic(dbuf, dbuf.shape[0],
                                            orig_pointer)
        out = rle_ops.rle1_decode(packed)
    crc = crc32_bzip2(out)
    if crc != target_crc:
        _throw(Err.DATA_ERROR,
               'Bad block CRC (got %x expected %x)' % (crc, target_crc))
    return out, target_crc


def _slurp(input_data):
    if hasattr(input_data, 'read_byte'):
        s = coerce_input_stream(input_data)
        if isinstance(s, ArrayInputStream):
            return s.data[s.pos:]
        chunks = []
        buf = np.zeros(1 << 20, dtype=np.uint8)
        while True:
            n = s.read(buf, 0, buf.shape[0])
            if n <= 0:
                break
            chunks.append(buf[:n].copy())
        return (np.concatenate(chunks) if chunks
                else np.zeros(0, dtype=np.uint8))
    return np.frombuffer(bytes(input_data), dtype=np.uint8) \
        if not isinstance(input_data, np.ndarray) else input_data


def _start(r):
    """Parse the BZh# file header; returns dbuf size."""
    b = [r.read_bits(8) for _ in range(4)]
    if bytes(b[:3]) != b'BZh':
        _throw(Err.NOT_BZIP_DATA, 'bad magic')
    level = b[3] - 0x30
    if level < 1 or level > 9:
        _throw(Err.NOT_BZIP_DATA, 'level out of range')
    return 100000 * level


def decompress_file(input_data, output=None, multistream=False,
                    _sequential=False):
    data = _slurp(input_data)
    # multi-block single-stream inputs decode block-parallel: the magic
    # scan yields the block manifest, blocks decode concurrently on a
    # thread pool (the native walk releases the GIL), and per-block +
    # trailing stream CRCs validate the assembly (any anomaly —
    # including multistream inputs — falls back here with
    # _sequential=True, so this dispatch cannot recurse).  Requires an
    # in-memory result (output=None): the parallel path buffers every
    # block until the stream CRC validates, while streaming outputs
    # keep the sequential decoder's block-by-block writes.
    if (not _sequential and not multistream
            and output is None
            and data.shape[0] > 65536
            and (os.cpu_count() or 1) > 1
            and _native is not None and _native.available()
            and os.environ.get('COMPRESSJS_TPU_NO_PARALLEL', '') == ''):
        from ..parallel import decode as _pdecode
        return _pdecode.decompress_file_parallel(data, output,
                                                 executor='thread')
    r = _BitReader(data)
    o = coerce_output_stream(output)
    dbuf_size = _start(r)
    stream_crc = 0
    while True:
        res = _decode_one_block(r, dbuf_size)
        if res is not None:
            out, block_crc = res
            o.stream.write_array(out) if hasattr(o.stream, 'write_array') \
                else o.stream.write(out, 0, len(out))
            stream_crc = stream_crc_combine(stream_crc, block_crc)
            continue
        target_stream_crc = r.read_bits(32)
        if target_stream_crc != stream_crc:
            _throw(Err.DATA_ERROR,
                   'Bad stream CRC (got %x expected %x)'
                   % (stream_crc, target_stream_crc))
        if multistream and not r.eof():
            r.align_byte()
            if r.eof():
                break
            dbuf_size = _start(r)
            stream_crc = 0
            continue
        break
    return o.retval


def decompress_block(input_data, pos, output=None):
    """Random access: decode the single block whose header starts at bit
    `pos` (reference Bunzip.decodeBlock, Bzip2.js:482-503)."""
    data = _slurp(input_data)
    r = _BitReader(data)
    o = coerce_output_stream(output)
    dbuf_size = _start(r)
    r.seek_bit(pos)
    res = _decode_one_block(r, dbuf_size)
    if res is not None:
        out, _ = res
        if hasattr(o.stream, 'write_array'):
            o.stream.write_array(out)
        else:
            o.stream.write(out, 0, len(out))
    return o.retval


def table(input_data, callback, multistream=False):
    """Walk all blocks emitting callback(bit_position, uncompressed_size)
    — the seek index that enables parallel/random-access decode
    (reference Bunzip.table, Bzip2.js:508-548)."""
    data = _slurp(input_data)
    r = _BitReader(data)
    dbuf_size = _start(r)
    while True:
        position = r.tell_bit()
        res = _read_block_header(r, dbuf_size)
        if res is not None:
            dbuf, orig_pointer, _ = res
            packed = bwt_ops.inverse_bwt_cyclic(dbuf, dbuf.shape[0],
                                                orig_pointer)
            out = rle_ops.rle1_decode(packed)
            callback(position, len(out))
            continue
        r.read_bits(32)  # stream CRC (ignored)
        if multistream and not r.eof():
            r.align_byte()
            if r.eof():
                break
            new_size = _start(r)
            assert new_size == dbuf_size, \
                "shouldn't change block size within multistream file"
            continue
        break


class Bzip2:
    Err = Err
    compress_file = staticmethod(compress_file)
    decompress_file = staticmethod(decompress_file)
    decompress_block = staticmethod(decompress_block)
    table = staticmethod(table)
