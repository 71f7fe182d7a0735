"""Block-parallel bzip2 decode.

The seek-bzip block index (bit-addressed block starts) is the sharding
manifest for decode (SURVEY.md §5): blocks decode independently, so the
decoder scans for the 48-bit block magic at every bit alignment
(vectorized), decodes all candidate blocks concurrently (the native
decode loop releases the GIL), and assembles by chaining exact bit
positions: block i+1 must begin at the bit where block i's decode
ended, and the chain must terminate in the end-of-stream magic whose
stored CRC matches the rolling stream CRC — so the output is exactly
what the sequential decoder would produce (false-positive magics inside
payloads and bytes appended after the end magic are ignored).  Any
inconsistency falls back to the sequential decoder.

The same scan powers `block_index()`, a fast alternative to
`Bzip2.table()` when only positions (not uncompressed sizes) are needed.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
import os

import numpy as np

from ..codecs import bzip2 as bz
from ..utils.crc32 import stream_crc_combine
from ..utils.stream import coerce_output_stream

_MAGIC_BITS = np.array([0x31, 0x41, 0x59, 0x26, 0x53, 0x59],
                       dtype=np.uint8)
_END_MAGIC_BITS = np.array([0x17, 0x72, 0x45, 0x38, 0x50, 0x90],
                           dtype=np.uint8)


def _scan_magic(data, pattern):
    """All bit positions where the 48-bit `pattern` occurs.

    One raw-byte equality pass per bit alignment — the anchor is the
    first data byte fully covered by the pattern at that alignment —
    then gather-verification of the remaining bytes on the (rare)
    anchor hits.  ~25x faster than materializing a shifted byte stream
    per alignment and comparing all six pattern bytes over full length
    (4.6s -> 0.2s on a 23MB stream)."""
    n = int(data.shape[0])
    if n < 7:
        return np.zeros(0, dtype=np.int64)
    P = 0
    for b in pattern:
        P = (P << 8) | int(b)
    hits = []
    for s in range(8):
        if s == 0:
            # byte-aligned: all six pattern bytes are full data bytes
            cand = np.nonzero(data[:n - 5] == pattern[0])[0]
            for k in range(1, 6):
                if cand.size == 0:
                    break
                cand = cand[data[cand + k] == pattern[k]]
            hits.append(cand.astype(np.int64) * 8)
            continue
        # window bytes i..i+6 hold pattern bits [0,48) at in-byte offset
        # s; bytes i+1..i+5 are fully determined, bytes i and i+6 carry
        # the partial low (8-s) / high s pattern-edge bits
        cand = np.nonzero(
            data[1:n - 5] == (P >> (32 + s)) & 0xFF)[0]
        for k in range(2, 6):
            if cand.size == 0:
                break
            cand = cand[data[cand + k] == (P >> (40 - 8 * k + s)) & 0xFF]
        if cand.size:
            cand = cand[(data[cand] & ((1 << (8 - s)) - 1))
                        == P >> (40 + s)]
        if cand.size:
            cand = cand[(data[cand + 6] >> (8 - s)) == (P & ((1 << s) - 1))]
        hits.append(cand.astype(np.int64) * 8 + s)
    out = np.concatenate(hits)
    out.sort()
    return out


def block_index(data):
    """Candidate (bit_position) list of block starts (after the 48-bit
    magic the position points AT the magic itself, matching table())."""
    if not isinstance(data, np.ndarray):
        data = np.frombuffer(bytes(data), dtype=np.uint8)
    return _scan_magic(data, _MAGIC_BITS)


_FORK_DATA = {}


def _decode_at(data, pos, dbuf_size):
    """Decode one candidate block at bit `pos`; returns
    (output, crc, end_bit) or None (end magic / undecodable)."""
    rr = bz._BitReader(data)
    rr.seek_bit(pos)
    try:
        res = bz._decode_one_block(rr, dbuf_size)
    except ValueError:
        return None
    if res is None:
        return None
    out, crc = res
    return out, crc, rr.tell_bit()


def _decode_at_fork(args):
    key, pos, dbuf_size = args
    return _decode_at(_FORK_DATA[key], pos, dbuf_size)


def _parse_candidates(data):
    """Shared front half of the parallel decoders: returns (dbuf_size,
    first_block_pos, candidate bit positions bounded by the first
    end-of-stream magic), or None when the input should take the
    sequential path."""
    r = bz._BitReader(data)
    dbuf_size = bz._start(r)
    first_block_pos = r.tell_bit()
    candidates = [int(p) for p in block_index(data)
                  if p >= first_block_pos]
    if not candidates or candidates[0] != first_block_pos:
        return None
    end_hits = _scan_magic(data, _END_MAGIC_BITS)
    end_hits = end_hits[end_hits >= first_block_pos]
    if end_hits.size == 0:
        return None
    end_bound = int(end_hits[0])
    candidates = [p for p in candidates if p < end_bound]
    if not candidates:
        return None
    return dbuf_size, first_block_pos, candidates


def _pow2_at_least(x, lo):
    v = lo
    while v < x:
        v *= 2
    return v


def _device_entropy_launch(data, pos, bound, dbuf_size):
    """Launch one candidate block's device symbol decode: host parses
    the (tiny) header, ops/device_huffman runs the parallel canonical-
    Huffman walk, and rle2_decode + mtf_decode rebuild the BWT column —
    no host pass over the payload.  `bound` is the next candidate/end
    magic bit position (the symbol stream cannot extend past it).
    Returns un-synced device handles (JAX dispatch is async, so all
    candidates' walks overlap) or None on a host-parse failure."""
    import jax.numpy as jnp
    from ..ops import device_huffman as dh
    from ..ops import jax_kernels as jk

    rr = bz._BitReader(data)
    rr.seek_bit(pos)
    if rr.read_bits(48) != bz.WHOLEPI:
        return None
    target_crc = rr.read_bits(32)
    try:
        orig_ptr, sym_to_byte, selectors, groups = bz._parse_block_header(
            rr, dbuf_size)
    except ValueError:
        return None
    sym_start = rr.pos
    if bound <= sym_start:
        return None
    byte0 = sym_start >> 3
    bit0 = sym_start & 7
    nbits_cap = _pow2_at_least(bound - sym_start + 1, 1 << 12)
    s_cap = _pow2_at_least(len(selectors), 64)
    payload = jnp.asarray(
        data[byte0:byte0 + ((nbits_cap + bit0 + 7) >> 3) + 8])
    limits, bases, perms, mins = dh.tables_for_device(groups, len(groups))
    sel = jnp.zeros(s_cap, dtype=jnp.int32).at[:len(selectors)].set(
        jnp.asarray(selectors, dtype=jnp.int32))
    eob = len(sym_to_byte) + 1
    syms, count, end_bit = dh.huffman_walk_dev(
        payload, bit0, int(nbits_cap), int(s_cap), len(groups),
        limits, bases, perms, mins, sel, jnp.int32(len(selectors)),
        jnp.int32(eob))
    idx, total = jk.rle2_decode(syms, dbuf_size, count)
    dense = jk.mtf_decode(idx, dbuf_size)
    s2b = np.zeros(256, dtype=np.uint8)
    s2b[:len(sym_to_byte)] = sym_to_byte
    U = jnp.asarray(s2b)[dense]        # uint8: 4x smaller download
    return dict(U=U, total=total, count=count, end_bit=end_bit,
                byte0=byte0, orig_ptr=orig_ptr, target_crc=target_crc)


def _device_entropy_collect(h, bound, dbuf_size):
    """Sync one launched block; validate against its payload bound.
    Returns (dbuf, orig_pointer, target_crc, end_bit) or None."""
    if h is None:
        return None
    end_bit = int(h['end_bit']) + h['byte0'] * 8
    count = int(h['count'])
    total = int(h['total'])
    if count == 0 or end_bit > bound:
        return None
    if not (0 < total <= dbuf_size) or h['orig_ptr'] >= total:
        return None
    dbuf = np.asarray(h['U'])[:total]
    return dbuf, h['orig_ptr'], h['target_crc'], end_bit


def decompress_file_mesh(input_data, output=None, mesh=None,
                         n_workers=None, entropy='host'):
    """Mesh-parallel bzip2 decode: per-candidate-block symbol decode,
    then the DEVICE mesh inverts the ragged BWT columns
    (sharded_ragged_inverse_bwt — the pointer-chase walk as log-round
    orbit doubling per lane), and the host undoes RLE1 + checks CRCs.

    entropy='host' (default): the native canonical-Huffman walk parses
    headers+symbols per candidate on a thread pool.
    entropy='device': only the tiny header parse stays on the host; the
    payload never sees a host loop — ops/device_huffman's parallel walk
    + device rle2_decode/mtf_decode rebuild each BWT column in HBM.

    RLE1-undo stays host-side by design: the pre-RLE1 form is the
    smaller one, so the device->host transfer happens at the smallest
    point in the pipeline.  Falls back to the sequential decoder on any
    anomaly — byte-exact either way."""
    from ..ops import rle as rle_ops
    from ..utils.crc32 import crc32_bzip2
    from .mesh import make_mesh, sharded_ragged_inverse_bwt

    data = bz._slurp(input_data)
    parsed = _parse_candidates(data)
    if parsed is None:
        return bz.decompress_file(data, output, _sequential=True)
    dbuf_size, first_block_pos, candidates = parsed

    def parse_at(pos):
        rr = bz._BitReader(data)
        rr.seek_bit(pos)
        try:
            res = bz._read_block_header(rr, dbuf_size)
        except ValueError:
            return None
        if res is None:
            return None
        dbuf, orig_pointer, target_crc = res
        return dbuf, orig_pointer, target_crc, rr.tell_bit()

    if entropy == 'device':
        end_hits = _scan_magic(data, _END_MAGIC_BITS)
        end_bound = int(end_hits[end_hits >= first_block_pos][0])
        bounds = [candidates[i + 1] if i + 1 < len(candidates)
                  else end_bound for i in range(len(candidates))]
        # launch every candidate's device walk first (async dispatch),
        # sync afterwards — block i's walk overlaps block i+1's upload
        launched = [_device_entropy_launch(data, p, b, dbuf_size)
                    for p, b in zip(candidates, bounds)]
        results = []
        for p, b, h in zip(candidates, bounds, launched):
            res = _device_entropy_collect(h, b, dbuf_size)
            if res is None and b != end_bound and \
                    end_bound - p <= (64 << 20):
                # a true block's symbols end exactly at the next TRUE
                # magic; a false-positive candidate in between makes the
                # first bound too tight — retry against the stream end
                # bound (bounded at 64 Mbit to keep speculative arrays
                # sane; larger means this candidate takes the fallback).
                res = _device_entropy_collect(
                    _device_entropy_launch(data, p, end_bound,
                                           dbuf_size),
                    end_bound, dbuf_size)
            results.append(res)
    else:
        n_workers = n_workers or min(8, 2 * (os.cpu_count() or 2))
        with ThreadPoolExecutor(n_workers) as ex:
            results = list(ex.map(parse_at, candidates))

    by_pos = {}
    for pos, res in zip(candidates, results):
        if res is not None and res[3] > pos:
            by_pos[pos] = res
    chain = []
    pos = first_block_pos
    while pos in by_pos:
        chain.append(by_pos.pop(pos))
        pos = chain[-1][3]
    if not chain:
        return bz.decompress_file(data, output, _sequential=True)

    # device mesh: ragged inverse BWT, one lane per block
    mesh = mesh if mesh is not None else make_mesh()
    B = len(chain)
    Us = np.zeros((B, dbuf_size), dtype=np.uint8)
    ns = np.zeros(B, dtype=np.int32)
    pidxs = np.zeros(B, dtype=np.int32)
    for i, (dbuf, op, _, _) in enumerate(chain):
        Us[i, :dbuf.shape[0]] = dbuf
        ns[i] = dbuf.shape[0]
        pidxs[i] = op
    packed = np.asarray(sharded_ragged_inverse_bwt(mesh, Us, ns, pidxs))

    # host: RLE1 undo + CRC validation + end-of-stream check
    pieces = []
    stream_crc = 0
    for i, (_, _, target_crc, _) in enumerate(chain):
        out = rle_ops.rle1_decode(packed[i, :ns[i]])
        if crc32_bzip2(out) != target_crc:
            return bz.decompress_file(data, output, _sequential=True)
        pieces.append(out)
        stream_crc = stream_crc_combine(stream_crc, target_crc)
    rr = bz._BitReader(data)
    rr.seek_bit(pos)
    if rr.read_bits(48) != bz.SQRTPI or rr.read_bits(32) != stream_crc:
        return bz.decompress_file(data, output, _sequential=True)
    o = coerce_output_stream(output)
    for piece in pieces:
        if hasattr(o.stream, 'write_array'):
            o.stream.write_array(piece)
        else:
            o.stream.write(piece, 0, len(piece))
    return o.retval


def decompress_file_parallel(input_data, output=None, n_workers=None,
                             executor='thread'):
    """Parallel bzip2 decode; falls back to sequential on any anomaly.

    executor='thread' (default) runs the native decode loops — which
    release the GIL — on an oversubscribed pool; it wins at every
    measured scale.  executor='process' forks workers that inherit the
    input copy-on-write (Linux); forking a process that has already
    initialized JAX (multithreaded) risks deadlock, so it is opt-in."""
    data = bz._slurp(input_data)
    # Resource bound inside _parse_candidates: the sequential decoder
    # never reads past the end-of-stream magic, so neither does the
    # candidate scan — a crafted tail of decodable blocks appended after
    # the end magic would otherwise be fully decoded and discarded (~9x
    # CPU/memory amplification per appended block).  Candidates at or
    # beyond the first end-magic occurrence are dropped before any
    # decoding; a false-positive end magic inside a payload
    # (p ~ bits * 2^-48) only breaks the chain check below, which falls
    # back to the sequential decoder.
    parsed = _parse_candidates(data)
    if parsed is None:
        return bz.decompress_file(data, output, _sequential=True)
    dbuf_size, first_block_pos, candidates = parsed

    # oversubscribe the thread pool: the native LF walk is memory-
    # latency bound, so extra threads hide pointer-chase stalls (2 cores:
    # 4 workers decode ~20% faster than 2)
    n_workers = n_workers or min(8, 2 * (os.cpu_count() or 2))
    if executor == 'process' and len(candidates) > 2 and n_workers > 1:
        import multiprocessing as mp
        key = id(data)
        _FORK_DATA[key] = data
        try:
            ctx = mp.get_context('fork')
            with ctx.Pool(n_workers) as pool:
                results = pool.map(
                    _decode_at_fork,
                    [(key, p, dbuf_size) for p in candidates],
                    chunksize=max(1, len(candidates) // (4 * n_workers)))
        finally:
            del _FORK_DATA[key]
    else:
        with ThreadPoolExecutor(n_workers) as ex:
            results = list(ex.map(
                lambda pos: _decode_at(data, pos, dbuf_size), candidates))

    # Assemble by CHAINING exact bit positions — block i+1 must start at
    # the bit where block i's decode ended, exactly as the sequential
    # reader would encounter it.  Candidates off the chain (false-
    # positive magics inside payloads, or data appended after the end
    # magic) are ignored, so the parallel path accepts exactly the
    # prefix the sequential decoder would produce and nothing more.
    by_pos = {}
    for pos, res in zip(candidates, results):
        if res is not None and res[2] > pos:
            by_pos[pos] = res
    pieces = []
    stream_crc = 0
    pos = first_block_pos
    while pos in by_pos:
        out, crc, end = by_pos.pop(pos)
        pieces.append(out)
        stream_crc = stream_crc_combine(stream_crc, crc)
        pos = end
    if not pieces:
        return bz.decompress_file(data, output, _sequential=True)
    # the chain must terminate in the 48-bit end-of-stream magic followed
    # by the combined stream CRC, at the exact bit the last block ended
    rr = bz._BitReader(data)
    rr.seek_bit(pos)
    if rr.read_bits(48) != bz.SQRTPI or rr.read_bits(32) != stream_crc:
        return bz.decompress_file(data, output, _sequential=True)
    o = coerce_output_stream(output)
    for piece in pieces:
        if hasattr(o.stream, 'write_array'):
            o.stream.write_array(piece)
        else:
            o.stream.write(piece, 0, len(piece))
    return o.retval
