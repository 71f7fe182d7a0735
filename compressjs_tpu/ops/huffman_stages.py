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

import os

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


def _v8_sort(a):
    """In-place emulation of v8 3.11 `Array.prototype.sort` (the engine
    in node 0.8.22, which produced the reference's published sizes):
    insertion sort for segments <= 10 elements, otherwise median-of-three
    quicksort with v8 array.js's exact partition mechanics.  The sort is
    unstable, and WHICH equal-cost chunks land in the top half of the
    median split (reference Bzip2.js:710-716) is exactly what this
    reproduces.  `a` is a list of (cost, chunk_index) pairs compared by
    cost alone, like the reference's `s1.cost - s2.cost` comparator."""
    def insertion(frm, to):
        for i in range(frm + 1, to):
            element = a[i]
            j = i - 1
            while j >= frm:
                tmp = a[j]
                if tmp[0] - element[0] > 0:
                    a[j + 1] = tmp
                    j -= 1
                else:
                    break
            a[j + 1] = element

    stack = [(0, len(a))]
    while stack:
        frm, to = stack.pop()
        if to - frm <= 10:
            insertion(frm, to)
            continue
        middle = frm + ((to - frm) >> 1)
        v0, v1, v2 = a[frm], a[to - 1], a[middle]
        if v0[0] - v1[0] > 0:
            v0, v1 = v1, v0                  # v0 <= v1
        if v0[0] - v2[0] >= 0:
            v0, v1, v2 = v2, v0, v1          # v2 <= v0 <= v1: rotate
        elif v1[0] - v2[0] > 0:
            v1, v2 = v2, v1                  # v0 < v2 < v1
        a[frm] = v0          # v0/v2 already in final position
        a[to - 1] = v2
        pivot = v1
        low_end = frm + 1    # upper bound of elements < pivot
        high_start = to - 1  # lower bound of elements > pivot
        a[middle] = a[low_end]
        a[low_end] = pivot
        i = low_end + 1      # [low_end, i) equal pivot; [i, high_start) unseen
        broke = False
        while i < high_start:
            element = a[i]
            order = element[0] - pivot[0]
            if order < 0:
                a[i] = a[low_end]
                a[low_end] = element
                low_end += 1
            elif order > 0:
                while True:
                    high_start -= 1
                    if high_start == i:
                        broke = True
                        break
                    top = a[high_start]
                    order = top[0] - pivot[0]
                    if not order > 0:
                        break
                if broke:
                    break
                a[i] = a[high_start]
                a[high_start] = element
                if order < 0:
                    element = a[i]
                    a[i] = a[low_end]
                    a[low_end] = element
                    low_end += 1
            i += 1
        stack.append((frm, low_end))
        stack.append((high_start, to))


def _ref_ties_default():
    return os.environ.get('COMPRESSJS_TPU_BZ2_REF_TIES',
                          '0') not in ('0', '', 'false')


def optimize_groups(syms, alphabet_size, initial_freq, ref_ties=None):
    """Build MAX_GROUPS-bounded Huffman tables with the reference's greedy
    refinement (Bzip2.js:685-733, 823-843): start from a global-frequency
    table plus a flat table; repeatedly split the most-used group at the
    median chunk cost and rebuild all tables from reassigned frequencies.
    Returns (length_matrix, selectors).

    `ref_ties` (default: env COMPRESSJS_TPU_BZ2_REF_TIES) switches to
    reference-parity mode: the median split orders equal-cost chunks the
    way node 0.8.22's unstable v8 sort did (see `_v8_sort`) and the
    Lloyd refinement below — our extension beyond the reference
    heuristic — is skipped, reproducing the reference encoder's exact
    grouping (and with it, its exact output sizes)."""
    if ref_ties is None:
        ref_ties = _ref_ties_default()
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
        if ref_ties:
            pairs = [(int(costs[m]), int(m)) for m in members]
            _v8_sort(pairs)
            order = np.array([m for _, m in pairs], dtype=np.int64)
        else:
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
    if ref_ties:   # the reference stops at the final assignment above
        return length_matrix, selectors

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
