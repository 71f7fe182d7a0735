"""Burrows-Wheeler transform via prefix-doubling suffix sort.

API-compatible with the reference transform layer
(/root/reference/lib/BWT.js:305-417): `suffixsort`, the EOF-terminated
`bwtransform`/`unbwtransform` pair used by BWTC, and the cyclic
`bwtransform2` used by bzip2.

The construction is NOT the reference's SA-IS induced sort: induced
sorting's scatter chains are hostile to vectorization, so this framework
uses prefix doubling (Manber-Myers): log2(n) rounds of key sorting and
rank assignment, which maps onto sort/permute primitives that both numpy
(host path, here) and XLA (device path, compressjs_tpu.ops.suffix_sort)
execute at full bandwidth.  The inverse transform's LF pointer chase is
parallelized by orbit doubling (log2(n) permutation compositions).
"""

from __future__ import annotations

import numpy as np

try:
    from .. import native as _native
except Exception:  # pragma: no cover
    _native = None


# native SA-IS works in int32 (the cyclic path sorts a doubled string);
# larger inputs route to the numpy paths, which are O(n log n) but
# index in int64
_NATIVE_MAX_N = (1 << 30) - 2


def _use_native(n=0):
    return (_native is not None and _native.available()
            and n < _NATIVE_MAX_N)


def suffix_array(T, n=None):
    """Suffix array of T[0..n-1] (uint8/int array), treating the string as
    EOF-terminated: shorter suffixes that are prefixes of longer ones sort
    first.  Returns int32 array of suffix start positions in sorted order."""
    T = np.asarray(T)
    if n is None:
        n = T.shape[0]
    T = T[:n]
    if n == 0:
        return np.zeros(0, dtype=np.int32)
    if n == 1:
        return np.zeros(1, dtype=np.int32)
    # initial ranks from the characters themselves
    rank = T.astype(np.int64)
    sa = np.argsort(rank, kind='stable').astype(np.int64)
    # refine ranks by doubling; rank2 of -1 (past end) sorts first
    k = 1
    rank = _ranks_from_keys(rank[sa], sa, n)
    while k < n:
        rank2 = np.full(n, -1, dtype=np.int64)
        idx = np.arange(n - k)
        rank2[idx] = rank[idx + k]
        order = np.lexsort((rank2, rank))
        sa = order
        key1 = rank[sa]
        key2 = rank2[sa]
        newrank = np.empty(n, dtype=np.int64)
        diff = np.ones(n, dtype=bool)
        diff[1:] = (key1[1:] != key1[:-1]) | (key2[1:] != key2[:-1])
        newrank[sa] = np.cumsum(diff) - 1
        rank = newrank
        if rank[sa[-1]] == n - 1:  # all ranks distinct
            break
        k <<= 1
    return sa.astype(np.int32)


def _ranks_from_keys(sorted_keys, order, n):
    rank = np.empty(n, dtype=np.int64)
    diff = np.ones(n, dtype=bool)
    diff[1:] = sorted_keys[1:] != sorted_keys[:-1]
    rank[order] = np.cumsum(diff) - 1
    return rank


def cyclic_suffix_array(T, n=None):
    """Sort the n cyclic rotations of T[0..n-1]; ties (identical rotations)
    broken by start index, matching what a doubled-string suffix sort
    produces.  Returns int32 rotation start indices in sorted order."""
    T = np.asarray(T)
    if n is None:
        n = T.shape[0]
    T = T[:n]
    if n <= 1:
        return np.zeros(max(n, 0), dtype=np.int32)
    rank = T.astype(np.int64)
    k = 1
    while k < n:
        idx = np.arange(n, dtype=np.int64)
        rank2 = rank[(idx + k) % n]
        order = np.lexsort((rank2, rank))
        key1 = rank[order]
        key2 = rank2[order]
        diff = np.ones(n, dtype=bool)
        diff[1:] = (key1[1:] != key1[:-1]) | (key2[1:] != key2[:-1])
        newrank = np.empty(n, dtype=np.int64)
        newrank[order] = np.cumsum(diff) - 1
        rank = newrank
        if rank[order[-1]] == n - 1:
            break
        k <<= 1
    # final order; if identical rotations remain (period divides n), break
    # ties by DESCENDING start index: in the reference's doubled-string
    # construction (BWT.js:372-417) the shorter (later-starting) suffix of
    # T+T is a proper prefix of the longer one and sorts first
    idx = np.arange(n, dtype=np.int64)
    order = np.lexsort((-idx, rank))
    return order.astype(np.int32)


# ---------------------------------------------------------------------------
# public API (reference signatures)

def suffixsort(T, SA, n, alphabet_size=256):
    """Fill SA[0..n-1] with the suffix array of T.  Returns 0."""
    if _use_native(n) and n > 4096:
        SA[:n] = _native.suffix_sort(np.asarray(T)[:n])
        return 0
    sa = suffix_array(T, n)
    SA[:n] = sa
    return 0


def bwtransform(T, U, A, n, alphabet_size=256):
    """EOF-terminated BWT (reference BWT.js:328-350): U[0]=T[n-1]; the
    first-sorting implicit EOF suffix contributes T[n-1]; returns pidx+1
    where pidx is the position of suffix 0 in the SA."""
    T = np.asarray(T)
    if n <= 1:
        if n == 1:
            U[0] = T[0]
        return n
    if _use_native(n) and n > 4096:
        Un, pidx = _native.bwt_eof(T[:n])
        U[:n] = Un
        return pidx
    sa = suffix_array(T, n)
    A[:n] = sa
    pidx = int(np.nonzero(sa == 0)[0][0])
    out = np.empty(n, dtype=np.uint8)
    out[0] = T[n - 1]
    prev = T[(sa - 1) % n]           # T[sa-1]; sa==0 slot is the hole
    out[1:pidx + 1] = prev[:pidx]
    out[pidx + 1:] = prev[pidx + 1:]
    U[:n] = out
    return pidx + 1


def unbwtransform(T, U, LF, n, pidx):
    """Invert the EOF-terminated BWT (reference BWT.js:352-363).

    The reference walks the LF chain byte-by-byte from the end; here the
    chain is a permutation orbit, computed by orbit doubling: log2(n)
    rounds of `seq = concat(seq, f[seq])` with `f = f∘f` — all gathers.
    The native runtime's direct LF walk is used when present."""
    T = np.asarray(T)[:n]
    if _use_native(n) and n > 4096:
        U[:n] = _native.inverse_bwt_eof(T, pidx)
        # LF is caller scratch (as in the reference, which leaves its A
        # full of occ counts nothing reads) — don't spend a pass on it
        return
    counts = np.bincount(T, minlength=256)
    occ = _exclusive_running_count(T)           # LF[i] in the reference
    LF[:n] = occ
    C = np.concatenate(([0], np.cumsum(counts)))[:256]  # first-index table
    # f(t) = occ[t] + C[T[t]], then +1 if result < pidx
    f = occ + C[T]
    f = f + (f < pidx)
    # when suffix 0 sorts last (pidx == n), the walk's final position maps
    # to n — the reference computes that value but never dereferences it
    # (the loop ends first); the orbit precomputation must clamp it
    np.minimum(f, n - 1, out=f)
    # orbit of t0=0 under f, length n; U[i] = T[t_{i+1}] read back-to-front
    orbit = _orbit(f.astype(np.int64), 0, n)
    # reference loop: for i=n-1..0: t = f(t_prev); U[i] = T[t_before_update]
    # i.e. U[n-1-j] = T[orbit[j]] where orbit[0]=f(0) applied j+1 times? --
    # reproduce exactly: t=0; for i=n-1..0: U[i]=T[t]; t=f(t)
    seq = _orbit_from(f.astype(np.int64), 0, n)
    U[:n] = T[seq[::-1]]


def _exclusive_running_count(T):
    """occ[i] = number of j<i with T[j]==T[i] (vectorized counting sort)."""
    n = T.shape[0]
    order = np.argsort(T, kind='stable')
    ranks = np.empty(n, dtype=np.int64)
    sorted_T = T[order]
    # position within each equal-value run
    starts = np.ones(n, dtype=bool)
    starts[1:] = sorted_T[1:] != sorted_T[:-1]
    run_ids = np.cumsum(starts) - 1
    run_start_pos = np.nonzero(starts)[0]
    within = np.arange(n) - run_start_pos[run_ids]
    ranks[order] = within
    return ranks


def _orbit_from(f, t0, n):
    """[t0, f(t0), f^2(t0), ..., f^{n-1}(t0)] via doubling."""
    seq = np.array([t0], dtype=np.int64)
    g = f
    while seq.shape[0] < n:
        take = min(seq.shape[0], n - seq.shape[0])
        seq = np.concatenate([seq, g[seq[:take]]])
        if seq.shape[0] < n:
            g = g[g]
    return seq


def _orbit(f, t0, n):
    return _orbit_from(f, f[t0], n)


def bwtransform2(T, U, n, alphabet_size=256):
    """Cyclic BWT (reference BWT.js:372-417): sort all rotations; U[j] is
    the last character of the j-th sorted rotation; returns pidx, the sorted
    position of rotation 0."""
    T = np.asarray(T)
    if n <= 1:
        if n == 1:
            U[0] = T[0]
        return 0
    if _use_native(n) and n > 4096:
        Un, pidx = _native.bwt_cyclic(T[:n])
        U[:n] = Un
        return pidx
    order = cyclic_suffix_array(T, n)
    pidx = int(np.nonzero(order == 0)[0][0])
    U[:n] = T[(order - 1) % n]
    return pidx


def inverse_bwt_cyclic(U, n, pidx):
    """Invert the cyclic BWT (decoder side of bzip2; reference decodes via
    the byteCount/LF chain in Bzip2.js:369-394).  Returns the original
    block as uint8."""
    U = np.asarray(U)[:n]
    if _use_native(n) and n > 4096:
        return _native.inverse_bwt(np.ascontiguousarray(U, dtype=np.uint8),
                                   int(pidx))
    occ = _exclusive_running_count(U)
    counts = np.bincount(U, minlength=256)
    C = np.concatenate(([0], np.cumsum(counts)))[:256]
    # LF[i]: sorted row of the rotation starting one char earlier; walking
    # it from pidx emits the text back-to-front
    lf = (C[U] + occ).astype(np.int64)
    seq = _orbit_from(lf, pidx, n)
    return U[seq][::-1]
