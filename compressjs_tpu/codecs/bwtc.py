"""BWTC — modernized bzip2-style codec: EOF-terminated BWT + MTF + RLE2
through one adaptive order-0 model over a range coder.

Format-compatible with the reference (/root/reference/lib/BWTC.js):
'bwtc' container with suppressed final byte, range-coded level byte, one
RangeCoder instance spanning all blocks, 3-way block indicators, block
length and BWT pidx through a LogDistanceModel over NoModel, the 512-node
alphabet usage tree with full/empty pruning, and FenwickModel (DefSumModel
at level <= 5) for the RLE2 symbol stream.

Block transforms (BWT, MTF, zero-run digits) run as vectorized array
stages; only the adaptive entropy coding is sequential per stream, which
the parallel path batches across independent streams.
"""

from __future__ import annotations

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
from ..utils.stream import EOF

try:
    from .. import native as _native
except Exception:  # pragma: no cover
    _native = None

MAGIC = 'bwtc'
F_PROB_MAX = 0xFF00
F_PROB_INCR = 0x0100

# per-call BWT override (thread-local): lets a pipeline substitute
# precomputed (e.g. device) BWTs without touching shared module state
import contextvars
_BWT_HOOK = contextvars.ContextVar('bwtc_bwt_hook', default=None)


def _encode_usage_tree(encoder, used):
    """Binary usage tree over the 256-symbol alphabet: internal nodes carry
    subtree counts, coded 3-way (empty/partial/full) with known-full/empty
    pruning (reference BWTC.js:58-79)."""
    tree = np.zeros(512, dtype=np.int64)
    tree[256:512] = used
    for i in range(255, 0, -1):
        tree[i] = tree[2 * i] + tree[2 * i + 1]
    tree[0] = 1  # sentinel
    for i in range(1, 512):
        parent = tree[i >> 1]
        full = 1 << (9 - util.fls(i))
        if parent == 0 or parent == full * 2:
            continue  # known full/empty
        if i >= 256:
            encoder.encode_bit(int(tree[i]))
        else:
            v = 0 if tree[i] == 0 else (2 if tree[i] == full else 1)
            encoder.encode_freq(1, v, 3)


def _decode_usage_tree(decoder):
    tree = np.zeros(512, dtype=np.int64)
    tree[0] = 1
    for i in range(1, 512):
        parent = tree[i >> 1]
        full = 1 << (9 - util.fls(i))
        if parent == 0 or parent == full * 2:
            tree[i] = parent >> 1
        elif i >= 256:
            tree[i] = decoder.decode_bit()
        else:
            v = decoder.decode_cul_freq(3)
            decoder.decode_update(1, v, 3)
            tree[i] = full if v == 2 else v
    return tree[256:512] != 0


def _compress_guts(in_stream, out_stream, file_size, props, final_byte):
    encoder = RangeCoder(out_stream)
    encoder.encode_start(final_byte, 1)

    level = 9
    if isinstance(props, (int, float)) and not isinstance(props, bool) \
            and 1 <= int(props) <= 9:
        level = int(props)
    encoder.encode_byte(level)
    fast = level <= 5
    block_size = level * 100000

    bit_model_factory = NoModel.factory(encoder)
    len_model = LogDistanceModel(block_size, 0,
                                 bit_model_factory, bit_model_factory)
    block = np.zeros(block_size, dtype=np.uint8)

    # The range coder's state spans blocks (BWTC.js:13-14), so the coder
    # loop is strictly sequential — but each block's transform (BWT +
    # MTF) is independent.  Blocks are read ahead and transformed on a
    # small thread pool while the coder drains them in order: encode
    # wall time per block becomes ~max(transform, coder) instead of
    # their sum.  The BWT hook is resolved HERE (it is a ContextVar,
    # invisible to pool threads) and captured by the job.
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    bwt_fn = _BWT_HOOK.get() or bwt_ops.bwtransform

    def transform_job(b):
        n = b.shape[0]
        U = np.zeros(n, dtype=np.uint8)
        A = np.zeros(n, dtype=np.int32)
        pidx = bwt_fn(b, U, A, n, 256)
        used = np.zeros(256, dtype=np.int64)
        used[U] = 1
        alphabet = np.nonzero(used)[0].astype(np.uint8)
        mtf_seq = mtf_ops.mtf_encode(U, alphabet)
        return pidx, used, alphabet, mtf_seq

    workers = max(1, min(4, os.cpu_count() or 1))
    ex = ThreadPoolExecutor(workers)
    pending = deque()
    eof = False
    try:
        while True:
            while not eof and len(pending) <= workers:
                length = in_stream.read(block, 0, block_size)
                if length == 0:
                    eof = True
                    break
                pending.append((length, ex.submit(transform_job,
                                                  block[:length].copy())))
                if length != block_size:
                    eof = True  # a short block is always the last one
            if not pending:
                break
            length, fut = pending.popleft()
            pidx, used, alphabet, mtf_seq = fut.result()
            _encode_block(encoder, len_model, out_stream, fast, block_size,
                          length, pidx, used, alphabet, mtf_seq)
    finally:
        ex.shutdown(wait=True)

    encoder.encode_freq(1, 2, 3)  # no more blocks
    encoder.encode_finish()


def _encode_block(encoder, len_model, out_stream, fast, block_size,
                  length, pidx, used, alphabet, mtf_seq):
    """Sequential coder half of one BWTC block (op order is the format:
    indicator, [short length], pidx, usage tree, payload)."""
    if length == block_size:
        encoder.encode_freq(1, 0, 3)  # full-size block
    else:
        encoder.encode_freq(1, 1, 3)  # short block
        len_model.encode(length)
    len_model.encode(pidx)
    _encode_usage_tree(encoder, used)
    alphabet_size = len(alphabet)

    if _native is not None and _native.available() and \
            hasattr(out_stream, 'write_array'):
        # native fused RLE2+model loop sharing the coder state
        st = encoder.export_enc_state()
        payload = _native.bwtc_encode_block(mtf_seq, alphabet_size,
                                            fast, st)
        out_stream.write_array(payload)
        encoder.import_enc_state(st)
    else:
        if fast:
            model = DefSumModel(encoder, alphabet_size + 1)
        else:
            model = FenwickModel(encoder, alphabet_size + 1,
                                 F_PROB_MAX, F_PROB_INCR)
        # RLE2: zero runs as RUNA/RUNB digits, literals as c+1 (no EOB)
        encode = model.encode
        run_length = 0
        for c in mtf_seq.tolist():
            if c == 0:
                run_length += 1
            else:
                if run_length:
                    for d in rle_ops.runab_encode_lengths(run_length):
                        encode(d)
                    run_length = 0
                encode(c + 1)
        if run_length:
            for d in rle_ops.runab_encode_lengths(run_length):
                encode(d)


def _decompress_guts(in_stream, out_stream, file_size):
    decoder = RangeCoder(in_stream)
    decoder.decode_start(True)
    level = decoder.decode_byte()
    assert 1 <= level <= 9
    fast = level <= 5
    block_size = level * 100000

    bit_model_factory = NoModel.factory(decoder)
    len_model = LogDistanceModel(block_size, 0,
                                 bit_model_factory, bit_model_factory)
    U = np.zeros(block_size, dtype=np.uint8)
    A = np.zeros(block_size, dtype=np.int32)

    while True:
        indicator = decoder.decode_cul_freq(3)
        decoder.decode_update(1, indicator, 3)
        if indicator == 0:
            length = block_size
        elif indicator == 1:
            length = len_model.decode()
        else:  # 2: done
            break
        pidx = len_model.decode()
        used = _decode_usage_tree(decoder)
        alphabet = np.nonzero(used)[0].astype(np.uint8)

        from ..utils.stream import ArrayInputStream
        if _native is not None and _native.available() and \
                isinstance(in_stream, ArrayInputStream):
            st = decoder.export_dec_state(in_stream.pos)
            b = _native.bwtc_decode_block(in_stream.data, st,
                                          len(alphabet), fast, length)
            in_stream.pos = decoder.import_dec_state(st)
        else:
            if fast:
                model = DefSumModel(decoder, len(alphabet) + 1, True)
            else:
                model = FenwickModel(decoder, len(alphabet) + 1,
                                     F_PROB_MAX, F_PROB_INCR)
            decode = model.decode
            b = np.empty(length, dtype=np.uint8)
            i = 0
            val = 1  # current zero-run weight
            while i < length:
                c = decode()
                if c == 0:    # RUNA
                    b[i:i + val] = 0
                    i += val
                    val *= 2
                elif c == 1:  # RUNB
                    b[i:i + 2 * val] = 0
                    i += 2 * val
                    val *= 2
                else:
                    val = 1
                    b[i] = c - 1
                    i += 1
        # MTF undo then inverse BWT
        mb = mtf_ops.mtf_decode(b, alphabet)
        bwt_ops.unbwtransform(mb, U, A, length, pidx)
        out_stream.write(U, 0, length)
    decoder.decode_finish()


compress_file = util.compress_file_helper(MAGIC, _compress_guts, True)
decompress_file = util.decompress_file_helper(MAGIC, _decompress_guts)


class BWTC:
    MAGIC = MAGIC
    compress_file = staticmethod(compress_file)
    decompress_file = staticmethod(decompress_file)
