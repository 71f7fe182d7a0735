"""BWTC-P: the parallel-stream extension format.

The reference's BWTC threads ONE range coder through every block
(BWTC.js:13-14), which makes decode inherently sequential.  This is the
framework-native extension SURVEY.md §2 calls for ("interleaved entropy
streams"): same per-block pipeline as BWTC (EOF-terminated BWT, usage
tree, MTF, RLE2 through Fenwick/DefSum over a Schindler coder), but each
block gets an INDEPENDENT coder and the container carries a block index,
so both encode and decode are embarrassingly parallel across blocks —
workers on host threads here, shards on a device mesh in the limit.

Container: 'bwtP' magic + varint(fileSize+1), then a varint block count,
per block varint(compressed size), then the concatenated per-block
streams.  Each block stream is a self-contained mini-BWTC body:
range-coded [short-block indicator? length] pidx, usage tree, and the
RLE2 symbol stream, finished per block.

Not a reference format — it is this framework's answer to "how would
BWTC look if it were designed for parallel hardware".
"""

from __future__ import annotations

import contextvars
from concurrent.futures import ThreadPoolExecutor
import os

import numpy as np

from ..coders.range_coder import RangeCoder
from ..models.defsum_model import DefSumModel
from ..models.fenwick_model import FenwickModel
from ..models.log_distance_model import LogDistanceModel
from ..models.no_model import NoModel
from ..ops import bwt as bwt_ops
from ..ops import mtf as mtf_ops
from ..ops import rle as rle_ops
from ..utils import util
from ..utils.stream import ArrayInputStream, BufferStream

try:
    from .. import native as _native
except Exception:  # pragma: no cover
    _native = None

MAGIC = 'bwtP'
F_PROB_MAX = 0xFF00
F_PROB_INCR = 0x0100

# per-call hook: maps block index -> precomputed (U, pidx) EOF BWT.
# parallel.mesh.mesh_compress_bwtcp sets it so the device-sharded
# transforms flow through the one real container/serialization path
# below (thread-local via contextvars: concurrent calls stay isolated)
_PRE_BWT = contextvars.ContextVar('bwtcp_pre_bwt', default=None)


def _encode_block(block, level, pre=None):
    """One self-contained block stream (bytes).  `pre` optionally
    supplies a precomputed (U, pidx) EOF BWT — the mesh encoder
    (parallel.mesh.mesh_compress_bwtcp) runs the transforms sharded on
    devices and hands them in here."""
    from .bwtc import _encode_usage_tree
    fast = level <= 5
    length = block.shape[0]
    out = BufferStream()
    enc = RangeCoder(out)
    enc.encode_start(0, 0)

    bit_model_factory = NoModel.factory(enc)
    len_model = LogDistanceModel(level * 100000, 0,
                                 bit_model_factory, bit_model_factory)
    if pre is not None:
        U, pidx = pre
        U = np.asarray(U, dtype=np.uint8)
    else:
        U = np.zeros(length, dtype=np.uint8)
        A = np.zeros(length, dtype=np.int32)
        pidx = bwt_ops.bwtransform(block, U, A, length, 256)
    len_model.encode(length)
    len_model.encode(pidx)
    used = np.zeros(256, dtype=np.int64)
    used[U] = 1
    _encode_usage_tree(enc, used)
    alphabet = np.nonzero(used)[0].astype(np.uint8)
    asize = len(alphabet)
    mtf_seq = mtf_ops.mtf_encode(U, alphabet)

    if _native is not None and _native.available():
        st = enc.export_enc_state()
        payload = _native.bwtc_encode_block(mtf_seq, asize, fast, st)
        out.write_array(payload)
        enc.import_enc_state(st)
    else:
        model = (DefSumModel(enc, asize + 1) if fast else
                 FenwickModel(enc, asize + 1, F_PROB_MAX, F_PROB_INCR))
        run = 0
        for c in mtf_seq.tolist():
            if c == 0:
                run += 1
            else:
                if run:
                    for d in rle_ops.runab_encode_lengths(run):
                        model.encode(d)
                    run = 0
                model.encode(c + 1)
        if run:
            for d in rle_ops.runab_encode_lengths(run):
                model.encode(d)
    enc.encode_finish()
    return out.get_buffer()


def _decode_block(payload, level):
    from .bwtc import _decode_usage_tree
    fast = level <= 5
    ins = ArrayInputStream(payload)
    dec = RangeCoder(ins)
    dec.decode_start()
    bit_model_factory = NoModel.factory(dec)
    len_model = LogDistanceModel(level * 100000, 0,
                                 bit_model_factory, bit_model_factory)
    length = len_model.decode()
    pidx = len_model.decode()
    used = _decode_usage_tree(dec)
    alphabet = np.nonzero(used)[0].astype(np.uint8)
    if _native is not None and _native.available():
        st = dec.export_dec_state(ins.pos)
        b = _native.bwtc_decode_block(ins.data, st, len(alphabet), fast,
                                      length)
        ins.pos = dec.import_dec_state(st)
    else:
        model = (DefSumModel(dec, len(alphabet) + 1, True) if fast else
                 FenwickModel(dec, len(alphabet) + 1, F_PROB_MAX,
                              F_PROB_INCR))
        b = np.empty(length, dtype=np.uint8)
        i = 0
        val = 1
        while i < length:
            c = model.decode()
            if c == 0:
                b[i:i + val] = 0
                i += val
                val *= 2
            elif c == 1:
                b[i:i + 2 * val] = 0
                i += 2 * val
                val *= 2
            else:
                val = 1
                b[i] = c - 1
                i += 1
    mb = mtf_ops.mtf_decode(b, alphabet)
    U = np.zeros(length, dtype=np.uint8)
    A = np.zeros(length, dtype=np.int32)
    bwt_ops.unbwtransform(mb, U, A, length, pidx)
    return U[:length]


def _level_of(props):
    """Clamped level from the props argument (default 9)."""
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
    pre_map = _PRE_BWT.get() or {}
    workers = min(8, os.cpu_count() or 2)
    if len(blocks) > 1:
        with ThreadPoolExecutor(workers) as ex:
            payloads = list(ex.map(
                lambda i: _encode_block(blocks[i], level, pre_map.get(i)),
                range(len(blocks))))
    else:
        payloads = [_encode_block(b, level) for b in blocks]

    util.write_unsigned_number(out_stream, len(payloads))
    for p in payloads:
        util.write_unsigned_number(out_stream, len(p))
    for p in payloads:
        out_stream.write_array(p) if hasattr(out_stream, 'write_array') \
            else out_stream.write(p, 0, len(p))


def _decompress_guts(in_stream, out_stream, file_size):
    level = in_stream.read_byte()
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
            outs = list(ex.map(lambda p: _decode_block(p, level),
                               payloads))
    else:
        outs = [_decode_block(p, level) for p in payloads]
    for o in outs:
        out_stream.write(o, 0, len(o))


compress_file = util.compress_file_helper(MAGIC, _compress_guts)
decompress_file = util.decompress_file_helper(MAGIC, _decompress_guts)


class BWTCP:
    MAGIC = MAGIC
    compress_file = staticmethod(compress_file)
    decompress_file = staticmethod(decompress_file)
