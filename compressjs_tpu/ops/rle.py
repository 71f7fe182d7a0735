"""Run-length stages of the bzip2 pipeline, vectorized.

RLE1 is bzip2's initial byte-level run packing (runs of 4 identical bytes
followed by a count byte 0-251); RLE2 is the bijective base-2 RUNA/RUNB
coding of MTF zero runs.  Semantics match the reference encoder loops
(/root/reference/lib/Bzip2.js:636-667 and :779-814) including the lazy
count-byte emission and its interaction with block-boundary cuts — but
expressed as run-segmented array math rather than byte loops.
"""

from __future__ import annotations

import numpy as np

try:
    from .. import native as _native
except Exception:  # pragma: no cover
    _native = None


def run_lengths(data):
    """(values, lengths) run-length encoding of a uint8 array."""
    data = np.asarray(data)
    n = data.shape[0]
    if n == 0:
        return (np.zeros(0, dtype=np.uint8), np.zeros(0, dtype=np.int64))
    starts = np.ones(n, dtype=bool)
    starts[1:] = data[1:] != data[:-1]
    idx = np.nonzero(starts)[0]
    lengths = np.diff(np.append(idx, n))
    return data[idx], lengths


def _rle1_out_len(lengths):
    """Output bytes a fully-emitted run occupies: pieces of <=255 input
    bytes; a piece of p>=4 always costs 5 output bytes (4 literals + count),
    p<4 costs p."""
    k = lengths // 255
    r = lengths % 255
    return 5 * k + np.where(r < 4, r, 5)


def rle1_encode(data, start, block_size):
    """bzip2 RLE1 block fill.  Reads input bytes from data[start:], packs
    runs, and stops when block_size output bytes are produced or input ends.

    Returns (block, consumed) where block is the packed uint8 array
    (len <= block_size) and consumed is the count of input bytes used.
    CRC is computed by the caller over data[start:start+consumed]."""
    data = np.asarray(data)
    avail = data.shape[0] - start
    if avail <= 0:
        return np.zeros(0, dtype=np.uint8), 0
    if _native is not None and _native.available() and avail > 4096:
        return _native.rle1_encode(data[start:], block_size)
    # adaptive window: RLE1 output ~= input except on run-heavy data (5
    # output bytes can consume up to 255 input).  Start near block_size
    # and grow only when the window's total output underfills the block.
    wsize = block_size + 4096
    while True:
        window = data[start:start + wsize]
        vals, lens = run_lengths(window)
        if window.shape[0] >= avail:
            break  # covered all remaining input
        if int(_rle1_out_len(lens).sum()) > block_size:
            break  # window certainly fills the block
        wsize *= 8
    out_lens = _rle1_out_len(lens)
    cum_out = np.cumsum(out_lens)
    cum_in = np.cumsum(lens)
    # number of runs that fit entirely
    nfit = int(np.searchsorted(cum_out, block_size, side='right'))
    # a run whose output ends exactly at the block boundary may still be
    # cut there (a count byte written as the final block byte ends the
    # loop before its extras are consumed) — route it through the exact
    # partial-run state machine
    if nfit > 0 and int(cum_out[nfit - 1]) == block_size:
        nfit -= 1
    out_parts = []
    consumed = int(cum_in[nfit - 1]) if nfit > 0 else 0
    emitted = int(cum_out[nfit - 1]) if nfit > 0 else 0
    if nfit > 0:
        out_parts.append(_emit_full_runs(vals[:nfit], lens[:nfit],
                                         int(cum_out[nfit - 1])))
    if nfit < len(vals) and emitted < block_size:
        # the next run is cut by remaining capacity
        cap = block_size - emitted
        part, used = _emit_partial_run(int(vals[nfit]), int(lens[nfit]), cap)
        out_parts.append(part)
        consumed += used
    if out_parts:
        block = np.concatenate(out_parts)
    else:
        block = np.zeros(0, dtype=np.uint8)
    # if input ran out exactly at a full window we'd mis-handle; the caller
    # sizes window >> block, so a short block here means true input end
    return block, consumed


def _emit_full_runs(vals, lens, total_out):
    """Emit fully-fitting runs, fully vectorized via piece decomposition:
    each run splits into <=255-input pieces; a piece of p>=4 input bytes
    emits [v,v,v,v,p-4], a shorter piece emits p literals."""
    k = lens // 255
    r = lens % 255
    simple = (k == 0) & (r < 4)
    if simple.all():
        return np.repeat(vals, lens.astype(np.int64))
    pieces_per_run = k + (r > 0)
    run_id = np.repeat(np.arange(len(vals)), pieces_per_run)
    within = _within_positions(pieces_per_run)
    piece_in = np.where(within < k[run_id], 255, r[run_id])
    piece_v = vals[run_id]
    piece_out = np.where(piece_in >= 4, 5, piece_in)
    lit = np.minimum(piece_in, 4)
    po = np.cumsum(piece_out) - piece_out
    out = np.empty(total_out, dtype=np.uint8)
    lit_idx = _segment_positions(po, lit)
    out[lit_idx] = np.repeat(piece_v, lit)
    counted = piece_in >= 4
    out[po[counted] + 4] = (piece_in[counted] - 4).astype(np.uint8)
    assert int(piece_out.sum()) == total_out
    return out


def _emit_partial_run(v, L, cap):
    """Emit as much of a run of `v` (length L) as fits in cap output bytes,
    with the reference loop's exact cut semantics: literals are
    capacity-checked per byte; a count byte needs one slot at loop top; the
    counted extras consume input without consuming output space.
    Returns (bytes, used_input)."""
    out = []
    used = 0
    remaining = L
    dangling = False
    while remaining > 0:
        # new piece: up to 4 literal bytes, capacity checked before each
        lit = min(remaining, 4)
        take = min(lit, cap)
        out.extend([v] * take)
        cap -= take
        used += take
        remaining -= take
        if take < lit or remaining == 0:
            # capacity ran out mid-literals, or run ended; 4 literals
            # without a count byte would dangle
            dangling = take == 4 and cap == 0
            break
        # count byte requires one output slot (checked at loop top)
        if cap == 0:
            dangling = True
            break  # extras (and the rest of the run) go to the next block
        cap -= 1
        if cap == 0:
            # the count byte is the final block byte: the loop breaks
            # right after writing it, before any extra is read
            out.append(0)
            break
        extras = min(remaining, 251)
        out.append(extras)
        used += extras
        remaining -= extras
        # if the run continues, the 256th byte starts a new piece; its
        # literal needs capacity, checked at the top of this loop
    if dangling:
        # never end the block with a 4-run whose count byte didn't fit:
        # C bzip2 reads the count from the same block (the JS reference
        # dangles the run — a reference bug); defer the 4th byte
        out.pop()
        used -= 1
    return np.array(out, dtype=np.uint8), used


def rle1_decode(block):
    """Undo RLE1: after 4 consecutive equal bytes, the next byte is an
    extras count (whatever its value).  Run-segmented state machine: the
    only cross-run state is whether a pending count byte eats the first
    byte of the next run."""
    block = np.asarray(block, dtype=np.uint8)
    n = block.shape[0]
    if n == 0:
        return block
    vals, lens = run_lengths(block)
    if (lens < 4).all():
        return block.copy()  # no count bytes anywhere
    out = []
    pending_val = -1  # value whose count byte is expected next
    for ridx in range(len(vals)):
        v = int(vals[ridx])
        m = int(lens[ridx])
        if pending_val >= 0:
            # first byte of this run is the count byte: v extras of pending
            if v:
                out.append(np.full(v, pending_val, dtype=np.uint8))
            m -= 1
            pending_val = -1
            if m == 0:
                continue
        # within a same-value stretch: groups of [4 literals + count byte
        # (== v, so v extras)], then a tail
        full_groups, tail = divmod(m, 5)
        if full_groups:
            out.append(np.full(full_groups * (4 + v), v, dtype=np.uint8))
        if tail == 4:
            out.append(np.full(4, v, dtype=np.uint8))
            pending_val = v  # count byte comes from the next run (or EOF)
        elif tail:
            out.append(np.full(tail, v, dtype=np.uint8))
    return np.concatenate(out) if out else np.zeros(0, dtype=np.uint8)


# ---------------------------------------------------------------------------
# RLE2: RUNA/RUNB bijective base-2 run coding of MTF zeros

RUNA = 0
RUNB = 1


def runab_digits_length(run_lengths_arr):
    """Number of RUNA/RUNB digits for each zero-run length L:
    floor(log2(L+1))."""
    L = np.asarray(run_lengths_arr, dtype=np.int64)
    return np.int64(np.floor(np.log2(L + 1)))  # exact for L < 2^52


def runab_encode_lengths(L):
    """Bijective base-2 digits (LSB first) for one run length: bit i of
    (L+1) selects RUNB (1) or RUNA (0); digit count = fls(L+1)-1."""
    L = int(L)
    k = (L + 1).bit_length() - 1
    return [((L + 1) >> i) & 1 for i in range(k)]


def mtf_rle2_encode(mtf_seq, eob):
    """Transform an MTF index sequence into the bzip2 symbol stream:
    zero runs -> RUNA/RUNB digits, nonzero j -> symbol j+1, then EOB.
    Vectorized over runs.  Returns uint16 symbol array."""
    mtf_seq = np.asarray(mtf_seq)
    n = mtf_seq.shape[0]
    if n == 0:
        return np.array([eob], dtype=np.uint16)
    vals, lens = run_lengths(mtf_seq.astype(np.uint8) if mtf_seq.dtype != np.uint8 and mtf_seq.max(initial=0) < 256 else mtf_seq)
    is_zero = vals == 0
    # output length per run: zero-run -> digits, other value -> lens (each
    # occurrence emits one symbol val+1)
    digit_counts = np.where(is_zero, runab_digits_length(lens), lens)
    total = int(digit_counts.sum()) + 1
    out = np.empty(total, dtype=np.uint16)
    offs = np.concatenate(([0], np.cumsum(digit_counts)[:-1]))
    # nonzero runs: repeat val+1
    nz = ~is_zero
    if nz.any():
        # scatter repeated values
        idx = _segment_positions(offs[nz], lens[nz])
        out[idx] = np.repeat(vals[nz].astype(np.uint16) + 1, lens[nz])
    if is_zero.any():
        zoffs = offs[is_zero]
        zlens = lens[is_zero]
        kdig = runab_digits_length(zlens)
        idx = _segment_positions(zoffs, kdig)
        # digit j of run: bit j of (L+1)
        within = _within_positions(kdig)
        Lrep = np.repeat(zlens + 1, kdig)
        out[idx] = ((Lrep >> within) & 1).astype(np.uint16)  # RUNA=0/RUNB=1
    out[-1] = eob
    return out


def _segment_positions(offsets, lengths):
    """Flat output indices for segments given start offsets and lengths."""
    total = int(lengths.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    seg_ids = np.repeat(np.arange(len(lengths)), lengths)
    within = _within_positions(lengths)
    return offsets[seg_ids] + within


def _within_positions(lengths):
    total = int(np.sum(lengths))
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    ends = np.cumsum(lengths)
    starts = ends - lengths
    return np.arange(total) - np.repeat(starts, lengths)
