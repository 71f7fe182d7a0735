"""bzip2 static-Huffman block stages, vectorized.

Covers the encoder-side table machinery of the reference
(/root/reference/lib/Bzip2.js:551-733): canonical length-limited tables
from frequencies, group-count thresholds, the greedy split-the-busiest-
group refinement, per-50-symbol selector assignment, and canonical code
assignment.  Cost scans and selector argmins are batched matrix ops
(symbols gathered through a (groups x alphabet) length matrix) instead of
the reference's per-symbol loops — the same math XLA runs on device in
compressjs_tpu.ops.jax_kernels.
"""

from __future__ import annotations

import numpy as np

from ..coders.huffman_allocator import allocate_huffman_code_lengths

try:
    from .. import native as _native
except Exception:  # pragma: no cover
    _native = None


def _nat():
    return _native is not None and _native.available()

MAX_HUFCODE_BITS = 20
GROUP_SIZE = 50
MIN_GROUPS = 2
MAX_GROUPS = 6


def code_lengths_from_freqs(freq, alphabet_size):
    """Length-limited canonical Huffman code lengths for `freq`
    (reference StaticHuffman ctor, Bzip2.js:551-579): sort (freq<<9|sym),
    allocate in place, invert the sort.  Called ~44x per block by the
    group-optimization loop, so the allocator runs native when
    available."""
    freq = np.asarray(freq, dtype=np.int64)[:alphabet_size]
    if _nat():
        return _native.huff_code_lengths(freq, MAX_HUFCODE_BITS)
    merged = (freq << 9) | np.arange(alphabet_size, dtype=np.int64)
    merged_sorted = np.sort(merged)
    arr = (merged_sorted >> 9).tolist()
    allocate_huffman_code_lengths(arr, MAX_HUFCODE_BITS)
    lengths = np.zeros(alphabet_size, dtype=np.uint8)
    lengths[merged_sorted & 0x1FF] = arr
    return lengths


def canonical_codes(code_lengths):
    """Canonical code assignment sorted by (length, symbol)
    (reference Bzip2.js:581-600)."""
    alphabet_size = len(code_lengths)
    merged = ((code_lengths.astype(np.int64) << 9)
              | np.arange(alphabet_size, dtype=np.int64))
    order = np.argsort(merged, kind='stable')
    lens_sorted = code_lengths[order].astype(np.int64)
    codes = np.zeros(alphabet_size, dtype=np.uint32)
    code = 0
    prev_len = 0
    for i in range(alphabet_size):
        cur = int(lens_sorted[i])
        code <<= (cur - prev_len)
        codes[order[i]] = code
        code += 1
        prev_len = cur
    return codes


def target_group_count(mtf_len):
    """Group-count thresholds on the MTF-output length
    (reference Bzip2.js:826-830)."""
    if mtf_len >= 2400:
        return 6
    if mtf_len >= 1200:
        return 5
    if mtf_len >= 600:
        return 4
    if mtf_len >= 200:
        return 3
    return 2


def group_costs(length_matrix, syms):
    """(n_chunks, n_groups) bit-cost of coding each 50-symbol chunk with
    each group's table.  length_matrix: (n_groups, alphabet)."""
    if _nat() and syms.shape[0] > 4096:
        return _native.group_costs(syms, length_matrix)
    n = syms.shape[0]
    n_groups = length_matrix.shape[0]
    per_sym = length_matrix[:, syms]             # (n_groups, n)
    n_chunks = (n + GROUP_SIZE - 1) // GROUP_SIZE
    pad = n_chunks * GROUP_SIZE - n
    if pad:
        per_sym = np.pad(per_sym, ((0, 0), (0, pad)))
    chunked = per_sym.reshape(n_groups, n_chunks, GROUP_SIZE).sum(axis=2)
    return chunked.T.astype(np.int64)            # (n_chunks, n_groups)


def assign_selectors(length_matrix, syms):
    """Best table per 50-symbol chunk; first minimum wins (the reference's
    strict `<` scan, Bzip2.js:671-684)."""
    return np.argmin(group_costs(length_matrix, syms), axis=1).astype(np.uint8)


def chunk_freqs(syms, selectors, n_groups, alphabet_size):
    """Per-group symbol frequencies given chunk selectors."""
    if _nat() and syms.shape[0] > 4096:
        return _native.chunk_freqs(syms, selectors, n_groups,
                                   alphabet_size)
    n = syms.shape[0]
    chunk_of_sym = np.repeat(np.arange(len(selectors)), GROUP_SIZE)[:n]
    sel_of_sym = selectors[chunk_of_sym].astype(np.int64)
    flat = sel_of_sym * alphabet_size + syms.astype(np.int64)
    counts = np.bincount(flat, minlength=n_groups * alphabet_size)
    return counts.reshape(n_groups, alphabet_size)


def optimize_groups(syms, alphabet_size, initial_freq):
    """Build MAX_GROUPS-bounded Huffman tables with the reference's greedy
    refinement (Bzip2.js:685-733, 823-843): start from a global-frequency
    table plus a flat table; repeatedly split the most-used group at the
    median chunk cost and rebuild all tables from reassigned frequencies.
    Returns (length_matrix, selectors)."""
    target = target_group_count(len(syms))
    tables = [code_lengths_from_freqs(initial_freq, alphabet_size),
              code_lengths_from_freqs(np.ones(alphabet_size, dtype=np.int64),
                                      alphabet_size)]
    length_matrix = np.stack(tables)
    selectors = assign_selectors(length_matrix, syms)
    while length_matrix.shape[0] < target:
        selectors = assign_selectors(length_matrix, syms)
        counts = np.bincount(selectors, minlength=length_matrix.shape[0])
        which = int(np.argmax(counts))  # first max, like indexOf
        # cost of each chunk assigned to `which`; split the top half
        # (stable ascending cost sort, ties keep chunk order)
        costs = group_costs(length_matrix, syms)[:, which]
        members = np.nonzero(selectors == which)[0]
        order = members[np.argsort(costs[members], kind='stable')]
        top_half = order[len(order) >> 1:]
        selectors = selectors.copy()
        selectors[top_half] = length_matrix.shape[0]
        n_groups = length_matrix.shape[0] + 1
        freqs = chunk_freqs(syms, selectors, n_groups, alphabet_size)
        length_matrix = np.stack([
            code_lengths_from_freqs(freqs[g], alphabet_size)
            for g in range(n_groups)])
    selectors = assign_selectors(length_matrix, syms)

    # Lloyd-style refinement beyond the reference heuristic (the C
    # implementation's sendMTFValues iterates similarly): alternate
    # min-cost selector assignment and table rebuild from the resulting
    # per-group frequencies.  Each step cannot increase the total payload
    # cost, so a few rounds converge; the format carries the tables, so
    # any grouping decodes — this only shrinks output (sample5 -9:
    # 274,768 -> 273,937, vs the JS reference's 275,087).
    n_groups = length_matrix.shape[0]
    prev_cost = None
    for _ in range(4):
        freqs = chunk_freqs(syms, selectors, n_groups, alphabet_size)
        group_counts = np.bincount(selectors, minlength=n_groups)
        length_matrix = np.stack([
            code_lengths_from_freqs(freqs[g], alphabet_size)
            if group_counts[g] else length_matrix[g]   # keep empty groups
            for g in range(n_groups)])
        costs = group_costs(length_matrix, syms)
        selectors = np.argmin(costs, axis=1).astype(np.uint8)
        cost = int(costs[np.arange(costs.shape[0]), selectors].sum())
        if prev_cost is not None and cost >= prev_cost:
            break
        prev_cost = cost
    return length_matrix, selectors


def emit_table_deltas(code_lengths):
    """Delta-coded length table bits (reference Bzip2.js:610-629):
    5-bit start, then per symbol 2-bit inc(2)/dec(3) steps and a 0 stop
    bit.  Returns a uint8 0/1 bit array."""
    bits = []
    current = int(code_lengths[0])
    for i in range(4, -1, -1):
        bits.append((current >> i) & 1)
    for l in code_lengths:
        l = int(l)
        step = [1, 0] if current < l else [1, 1]
        for _ in range(abs(l - current)):
            bits.extend(step)
        bits.append(0)
        current = l
    return np.array(bits, dtype=np.uint8)


def payload_bytes(syms, selectors, length_matrix, code_matrix):
    """Huffman payload packed straight into bytes via u64 word assembly:
    each code (<= 20 bits) lands in at most two consecutive 32-bit output
    words, so a left-aligned u64 split into hi/lo halves OR-accumulated at
    the word index packs the whole stream in O(n) without materializing
    per-bit arrays.  Returns (bytes, total_bits)."""
    if _nat() and syms.shape[0] > 4096:
        return _native.payload_pack(syms, selectors, length_matrix,
                                    code_matrix)
    n = syms.shape[0]
    chunk_of_sym = np.repeat(np.arange(len(selectors)), GROUP_SIZE)[:n]
    sel = selectors[chunk_of_sym].astype(np.int64)
    lens = length_matrix[sel, syms].astype(np.int64)
    codes = code_matrix[sel, syms].astype(np.uint64)
    offsets = np.cumsum(lens) - lens
    total = int(offsets[-1] + lens[-1]) if n else 0
    nwords = (total + 31) // 32 + 1
    wi = (offsets >> 5).astype(np.int64)
    bo = (offsets & 31).astype(np.uint64)
    chunk64 = codes << (np.uint64(64) - bo - lens.astype(np.uint64))
    hi = (chunk64 >> np.uint64(32)).astype(np.uint32)
    lo = (chunk64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    words = np.zeros(nwords, dtype=np.uint32)
    np.bitwise_or.at(words, wi, hi)
    np.bitwise_or.at(words, wi + 1, lo)
    out = words.byteswap().view(np.uint8)  # big-endian bit order
    return out[:(total + 7) // 8], total


def selector_mtf_bits(selectors, n_groups):
    """Selectors MTF'd then unary-coded (reference Bzip2.js:849-862)."""
    if _nat():
        return _native.selector_mtf(selectors, n_groups)
    lst = list(range(n_groups))
    bits = []
    for s in selectors:
        j = lst.index(int(s))
        if j:
            del lst[j]
            lst.insert(0, int(s))
        bits.extend([1] * j)
        bits.append(0)
    return np.array(bits, dtype=np.uint8)
