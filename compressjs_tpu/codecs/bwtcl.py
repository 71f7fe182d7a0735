"""BWTC-L: the lane-interleaved entropy format (SURVEY.md §2
'interleaved entropy streams', VERDICT round-2 item 5).

The reference's range coder is strictly sequential per stream
(RangeCoder.js:38-60): one carry chain, one byte cursor.  BWTC-P
parallelized across BLOCKS; this format parallelizes WITHIN a block:
the block's RLE2 symbol stream is split round-robin across L lanes,
and every lane runs its own adaptive FenwickModel over its own
Schindler range coder.  All L coder/model chains are independent, so
both encode and decode map onto the batched device kernels
(ops.device_model.fenwick_{encode,decode}_streams +
ops.device_coder.batched_range_encode) at their design point — L in
the hundreds — instead of the L-equals-block-count parity regime.

Pipeline per block (block_size = level*100000): EOF-terminated BWT
(reference bwtransform semantics, BWT.js:328-350) -> MTF -> RLE2
(RUNA/RUNB zero-run digits + literal c+1, BWTC.js:108-133) -> round-
robin lane split -> per-lane Fenwick(asize+1, 0xFF00, 0x100) over a
fresh range coder.

Container: 'bwtL' magic + varint(fileSize+1) via the shared helper,
then level byte, varint block count, and per block a varint payload
size + payload.  Block payload: varint block length, varint pidx,
varint symbol count S, varint lane count L, 32-byte used bitmap,
L varint lane sizes, then the concatenated lane byte streams.

The trade: per-lane model adaptation and coder tails cost compressed
size (measured on sample5 at L=256: see ARCHITECTURE.md) in exchange
for a decode/encode that is lane-parallel on device.  Not a reference
format — the framework-native answer to the reference's sequential-
coder constraint.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..coders.range_coder import RangeCoder
from ..models.fenwick_model import FenwickModel
from ..ops import bwt as bwt_ops
from ..ops import mtf as mtf_ops
from ..utils import util
from ..utils.stream import ArrayInputStream, BufferStream

try:
    from .. import native as _native
except Exception:  # pragma: no cover
    _native = None

MAGIC = 'bwtL'
# Lane count written per block header; 128 measured as the ratio/
# parallelism balance on sample5 -9: L=64 +8.0%, 128 +10.2%, 256
# +13.5%, 512 +19.1% vs single-stream BWTC (272,997 B) — each lane
# costs ~230 B of model adaptation + coder tail
LANES = 128
F_PROB_MAX = 0xFF00
F_PROB_INCR = 0x0100


def _nat():
    return _native is not None and _native.available()


def rle2_symbols(U, used):
    """BWTC-body symbol stream of a BWT column: MTF indices with zero
    runs as bijective base-2 RUNA/RUNB digits and literal c+1.  Returns
    (syms int16/32 array, asize)."""
    alphabet = np.nonzero(used)[0].astype(np.uint8)
    asize = len(alphabet)
    if _nat():
        syms, _freq = _native.mtf_rle2(U, alphabet)
        return np.asarray(syms)[:-1], asize       # strip bzip2's EOB
    mtf_seq = mtf_ops.mtf_encode(U, alphabet)
    from ..ops import rle as rle_ops
    syms = rle_ops.mtf_rle2_encode(mtf_seq, asize + 1)
    return syms[:-1], asize


def rle2_undo(syms, length):
    """Invert rle2_symbols (vectorized): RUNA/RUNB digit groups -> zero
    runs, literal c+1 -> c.  Returns MTF indices uint16[length]; raises
    ValueError if the stream does not expand to exactly `length`."""
    s = np.asarray(syms, dtype=np.int64)
    n = len(s)
    if n == 0:
        if length:
            raise ValueError('empty symbol stream')
        return np.zeros(0, dtype=np.uint16)
    idx = np.arange(n, dtype=np.int64)
    is_digit = s < 2
    grp_start = np.maximum.accumulate(np.where(~is_digit, idx + 1, 0))
    dpos = np.minimum(idx - grp_start, 40)
    contrib = np.where(is_digit, (s + 1) << dpos, 0)
    csum = np.cumsum(contrib)
    grp_end = is_digit & np.concatenate([~is_digit[1:],
                                         np.ones(1, dtype=bool)])
    seg_base = np.where(grp_start > 0, csum[np.maximum(grp_start - 1, 0)],
                        0)
    run_len = np.where(grp_end, csum - seg_base, 0)
    out_cnt = np.where(is_digit, run_len, 1)
    offsets = np.cumsum(out_cnt) - out_cnt
    total = int(offsets[-1] + out_cnt[-1])
    if total != length:
        raise ValueError('RLE2 stream expands to %d, expected %d'
                         % (total, length))
    out = np.zeros(length, dtype=np.uint16)
    lit = ~is_digit
    out[offsets[lit]] = (s[lit] - 1).astype(np.uint16)
    return out


def lane_split(syms, lanes):
    """Round-robin lane views: lane l gets syms[l::lanes]."""
    return [np.ascontiguousarray(syms[l::lanes]) for l in range(lanes)]


def lane_sizes(S, lanes):
    """Per-lane symbol counts of a round-robin split of S symbols."""
    base = S // lanes
    return [base + (1 if l < S % lanes else 0) for l in range(lanes)]


def _encode_lane(lane_syms, asize):
    """One lane's byte stream: fresh coder + Fenwick(asize+1)."""
    out = BufferStream()
    enc = RangeCoder(out)
    enc.encode_start(0, 0)
    if _nat() and asize <= 255:
        st = enc.export_enc_state()
        payload = _native.order0_fenwick_encode(
            lane_syms.astype(np.uint8), asize + 1, -1, st)
        out.write_array(payload)
        enc.import_enc_state(st)
    else:
        model = FenwickModel(enc, asize + 1, F_PROB_MAX, F_PROB_INCR)
        for c in lane_syms.tolist():
            model.encode(int(c))
    enc.encode_finish()
    return out.get_buffer()


def _decode_lane(payload, asize, n_syms):
    """One lane's symbols back from its byte stream."""
    ins = ArrayInputStream(payload)
    dec = RangeCoder(ins)
    dec.decode_start()
    if _nat() and asize <= 255:
        st = dec.export_dec_state(ins.pos)
        out = _native.order0_fenwick_decode(ins.data, st, asize + 1,
                                            n_syms)
        ins.pos = dec.import_dec_state(st)
        return out.astype(np.int32)
    model = FenwickModel(dec, asize + 1, F_PROB_MAX, F_PROB_INCR)
    return np.array([model.decode() for _ in range(n_syms)],
                    dtype=np.int32)


def encode_block(block, lanes=None, pre=None):
    """One self-contained block payload (bytes).  `pre` optionally
    supplies a precomputed (U, pidx) EOF BWT (the device path computes
    the transforms in HBM and hands them in)."""
    if lanes is None:
        lanes = LANES                # module default, read at call time
    length = block.shape[0]
    if pre is not None:
        U, pidx = np.asarray(pre[0], dtype=np.uint8), int(pre[1])
    else:
        U = np.zeros(length, dtype=np.uint8)
        A = np.zeros(length, dtype=np.int32)
        pidx = bwt_ops.bwtransform(block, U, A, length, 256)
    used = np.zeros(256, dtype=bool)
    used[block] = True
    syms, asize = rle2_symbols(U, used)
    S = len(syms)
    lanes = min(lanes, max(S, 1))
    lane_payloads = [_encode_lane(ls, asize)
                     for ls in lane_split(syms, lanes)]

    head = BufferStream()
    util.write_unsigned_number(head, length)
    util.write_unsigned_number(head, pidx)
    util.write_unsigned_number(head, S)
    util.write_unsigned_number(head, lanes)
    head.write_array(np.packbits(used))
    for p in lane_payloads:
        util.write_unsigned_number(head, len(p))
    parts = [head.get_buffer()] + lane_payloads
    return np.concatenate([np.asarray(p, dtype=np.uint8) for p in parts])


def parse_block_header(payload):
    """(length, pidx, S, lanes, used, lane_payload_list) of one block."""
    ins = ArrayInputStream(payload)
    length = util.read_unsigned_number(ins)
    pidx = util.read_unsigned_number(ins)
    S = util.read_unsigned_number(ins)
    lanes = util.read_unsigned_number(ins)
    bitmap = np.zeros(32, dtype=np.uint8)
    ins.read(bitmap, 0, 32)
    used = np.unpackbits(bitmap).astype(bool)
    sizes = [util.read_unsigned_number(ins) for _ in range(lanes)]
    offs = np.cumsum([ins.pos] + sizes)
    lane_payloads = [payload[offs[i]:offs[i + 1]] for i in range(lanes)]
    return length, pidx, S, lanes, used, lane_payloads


def decode_block(payload, lane_syms_hook=None):
    """Invert encode_block.  `lane_syms_hook(lane_payloads, asize,
    counts) -> syms` optionally replaces the per-lane entropy decode
    (the device path decodes all lanes in lock-step and hands the
    interleaved stream back here)."""
    length, pidx, S, lanes, used, lane_payloads = \
        parse_block_header(payload)
    alphabet = np.nonzero(used)[0].astype(np.uint8)
    asize = len(alphabet)
    counts = lane_sizes(S, lanes)
    if lane_syms_hook is not None:
        syms = lane_syms_hook(lane_payloads, asize, counts)
    else:
        outs = [_decode_lane(lane_payloads[l], asize, counts[l])
                for l in range(lanes)]
        syms = np.zeros(S, dtype=np.int32)
        for l in range(lanes):
            syms[l::lanes] = outs[l]
    mtf_seq = rle2_undo(syms, length)
    b = mtf_ops.mtf_decode(mtf_seq.astype(np.uint8)
                           if asize <= 256 else mtf_seq, alphabet)
    U = np.zeros(length, dtype=np.uint8)
    A = np.zeros(length, dtype=np.int32)
    bwt_ops.unbwtransform(b, U, A, length, pidx)
    return U[:length]


def _level_of(props):
    if isinstance(props, (int, float)) and not isinstance(props, bool) \
            and 1 <= int(props) <= 9:
        return int(props)
    return 9


def _compress_guts(in_stream, out_stream, file_size, props, final_byte):
    level = _level_of(props)
    out_stream.write_byte(level)
    block_size = level * 100000

    if isinstance(in_stream, ArrayInputStream) and file_size >= 0:
        data = in_stream.read_array(file_size)
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

    blocks = [data[i:i + block_size]
              for i in range(0, max(len(data), 1), block_size)] \
        if len(data) else []
    workers = min(8, os.cpu_count() or 2)
    if len(blocks) > 1:
        with ThreadPoolExecutor(workers) as ex:
            payloads = list(ex.map(lambda b: encode_block(b), blocks))
    else:
        payloads = [encode_block(b) for b in blocks]

    util.write_unsigned_number(out_stream, len(payloads))
    for p in payloads:
        util.write_unsigned_number(out_stream, len(p))
    for p in payloads:
        out_stream.write_array(p) if hasattr(out_stream, 'write_array') \
            else out_stream.write(p, 0, len(p))


def _decompress_guts(in_stream, out_stream, file_size):
    in_stream.read_byte()            # level (block size only; not needed)
    n_blocks = util.read_unsigned_number(in_stream)
    sizes = [util.read_unsigned_number(in_stream)
             for _ in range(n_blocks)]
    payloads = []
    for sz in sizes:
        buf = np.zeros(sz, dtype=np.uint8)
        in_stream.read(buf, 0, sz)
        payloads.append(buf)
    workers = min(8, os.cpu_count() or 2)
    if n_blocks > 1:
        with ThreadPoolExecutor(workers) as ex:
            outs = list(ex.map(decode_block, payloads))
    else:
        outs = [decode_block(p) for p in payloads]
    for o in outs:
        out_stream.write(o, 0, len(o))


compress_file = util.compress_file_helper(MAGIC, _compress_guts)
decompress_file = util.decompress_file_helper(MAGIC, _decompress_guts)


class BWTCL:
    MAGIC = MAGIC
    compress_file = staticmethod(compress_file)
    decompress_file = staticmethod(decompress_file)
