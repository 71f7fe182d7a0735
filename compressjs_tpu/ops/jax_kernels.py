"""Device (XLA/TPU) kernels for the block-compression pipeline.

These are the jittable, fixed-shape builds of the transform stages:

* `cyclic_suffix_sort` / `eof_suffix_sort` — prefix-doubling sorts:
  log2(n) rounds of two-key `lax.sort` + rank compression.  This replaces
  the reference's sequential SA-IS (BWT.js:197-300), whose induced-
  scatter chains cannot be vectorized; sorting is what the TPU does at
  full HBM bandwidth.
* `mtf_encode` — chunked move-to-front: per-chunk start states are
  reconstructed from an associative recency merge (a tiny scan over
  chunks), then all chunks run the 256-wide position-update scan in
  parallel (vmap over chunks inside a `lax.scan` over chunk length).
* `rle2_encode` — RUNA/RUNB zero-run digits via segment math, fixed
  shape with a valid-count.
* `group_costs_dev` / `chunk_freqs_dev` / `payload_pack_dev` — the
  Huffman group-refinement scans and payload bit packing, for the
  all-on-device mode (the host/native build of the same math is the
  default production path).

All shapes are static; ragged results carry explicit counts so the
multi-chip path (compressjs_tpu.parallel) can shard blocks with
`shard_map` and gather `(bits, nbits)` pairs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


# ---------------------------------------------------------------------------
# suffix sort (cyclic, for bzip2)

# --- quad prefix doubling: each round sorts (rank, rank@k, rank@2k,
# rank@3k), extending the context 4x.  Measured on v5e (900 KB block): a
# 5-array 4-key sort costs only ~25% more than the 3-array 2-key sort,
# so quad rounds cut total sort count ~40% (91.8 ms -> 71.5 ms); a
# compacted Larsson-Sadakane tail phase was tried and REJECTED — at
# 100-150 K tied elements its per-round random gathers + scatter cost
# as much as a full quad sort round, and it ballooned XLA compile time.
# Ranks use GROUP-START semantics (rank = first index of the group in
# sorted order); when the loop exits with all groups singleton, the
# last round's sort order IS the final suffix order, so no final sort
# is needed on the common path.

def _seg_start(diff, n):
    """Index of the current segment's first element, per sorted slot."""
    pos = jnp.arange(n, dtype=jnp.int32)
    return lax.associative_scan(jnp.maximum, jnp.where(diff, pos, 0))


def _tied_count(diff, n):
    """Number of elements in groups of size > 1 given sorted diff flags."""
    nxt = jnp.concatenate([diff[1:], jnp.ones(1, dtype=jnp.bool_)])
    singleton = diff & nxt
    return n - jnp.sum(singleton.astype(jnp.int32))


def _seed_ranks_start4(k1, k2, k3, k4, idx, n):
    """Seed (rank, order, tied) from four sort keys (group-start
    semantics)."""
    s1, s2, s3, s4, order0 = lax.sort((k1, k2, k3, k4, idx), num_keys=4)
    diff = jnp.ones(n, dtype=jnp.bool_)
    diff = diff.at[1:].set((s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1]) |
                           (s3[1:] != s3[:-1]) | (s4[1:] != s4[:-1]))
    start = _seg_start(diff, n)
    rank = jnp.zeros(n, dtype=jnp.int32).at[order0].set(start)
    return rank, order0, _tied_count(diff, n)


def _quad_double(rank0, order0, tied0, idx, n, k0, shift_fn):
    """Quad doubling rounds until all ranks are distinct (or k >= n for
    pathological periodic input).  Returns (rank, order, tied): when
    tied == 0, `order` is the final sorted order."""

    def cond(state):
        rank, order, k, tied = state
        return (tied > 0) & (k < n)

    def body(state):
        rank, order, k, _ = state
        r2 = shift_fn(rank, k)
        r3 = shift_fn(rank, 2 * k)
        r4 = shift_fn(rank, 3 * k)
        s1, s2, s3, s4, order = lax.sort((rank, r2, r3, r4, idx),
                                         num_keys=4)
        diff = jnp.ones(n, dtype=jnp.bool_)
        diff = diff.at[1:].set((s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1]) |
                               (s3[1:] != s3[:-1]) | (s4[1:] != s4[:-1]))
        start = _seg_start(diff, n)
        new_rank = jnp.zeros(n, dtype=jnp.int32).at[order].set(start)
        return new_rank, order, k * 4, _tied_count(diff, n)

    return lax.while_loop(cond, body, (rank0, order0, jnp.int32(k0),
                                       tied0))


def pack_cyclic_seed_keys(bu):
    """Two uint32 sort keys packing 8 bytes of cyclic context per
    position (shared by the single-chip kernel and the CP sharded
    sort); seeding the doubling at k=8 saves two full sort rounds."""
    def at(d):
        return jnp.roll(bu, -d)

    hi = (bu << 24) | (at(1) << 16) | (at(2) << 8) | at(3)
    lo = (at(4) << 24) | (at(5) << 16) | (at(6) << 8) | at(7)
    return hi, lo


def _seed_ranks(hi, lo, idx, n):
    """Initial rank compression from per-position (hi, lo) seed keys."""
    s1, s2, order0 = lax.sort((hi, lo, idx), num_keys=2)
    diff0 = jnp.ones(n, dtype=jnp.int32)
    diff0 = diff0.at[1:].set(
        ((s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])).astype(jnp.int32))
    rank0 = jnp.zeros(n, dtype=jnp.int32)
    rank0 = rank0.at[order0].set(jnp.cumsum(diff0) - 1)
    return rank0


@functools.partial(jax.jit, static_argnums=(1,))
def cyclic_suffix_sort(block, n):
    """Sorted rotation start indices of block[0:n] (uint8), ties broken by
    descending index (matching the doubled-string construction the
    reference uses, BWT.js:372-417).

    Quad prefix doubling with data-dependent early exit: real data
    resolves all ranks after ~log4(max repeat length) rounds.  Ranks are
    seeded from SIXTEEN bytes of context (four packed uint32 sort keys);
    the loop exits as soon as all groups are singletons, at which point
    the last round's sort order is already the answer — the final
    tie-break sort only runs for pathological periodic blocks.

    Negative results (measured, v5e): (a) 'discarding' prefix doubling
    (sort only still-tied positions through compacted buffers) loses —
    re-tested in round 2 with a fully-static in-jit compact tail
    (capacity n/4, cumsum-scatter routing, chained timing so dispatch
    overhead cannot pollute the comparison): 155 ms vs 64.7 ms dense on
    the 900 KB sample5 block, i.e. each compact round's ~5 random
    C-element gathers/scatters from n-arrays cost ~3x a full dense
    quad-sort round even at C = 57K..17K tied (the tail profile is
    568K -> 158K -> 57K -> 26K -> 17K -> 0 over 5 rounds); (b) doubling
    (2-key) rounds lose to quad rounds 91.8 ms vs 71.5 ms."""
    bu = block[:n].astype(jnp.uint32)
    idx = jnp.arange(n, dtype=jnp.int32)

    def word(d):
        return ((jnp.roll(bu, -d) << 24) | (jnp.roll(bu, -(d + 1)) << 16) |
                (jnp.roll(bu, -(d + 2)) << 8) | jnp.roll(bu, -(d + 3)))

    rank, order, tied = _seed_ranks_start4(
        word(0), word(4), word(8), word(12), idx, n)
    rank, order, _, tied = _quad_double(
        rank, order, tied, idx, n, 16,
        lambda r, d: jnp.roll(r, -d))
    # periodic blocks exit with ties: break by (rank asc, index desc)
    return lax.cond(
        tied > 0,
        lambda a: lax.sort((a[0], -idx, idx), num_keys=2)[2],
        lambda a: a[1], (rank, order))


@functools.partial(jax.jit, static_argnums=(1,))
def eof_suffix_sort(block, n):
    """EOF-terminated suffix array of block[:n]: a virtual sentinel
    smaller than every byte terminates the string, so shorter suffixes
    that are prefixes sort first (the semantics BWTC's bwtransform needs).
    Same early-exit quad prefix doubling as the cyclic variant, with -1
    rank padding past the end instead of cyclic wrap.  Ranks are seeded
    from TWELVE bytes of context: three 9-bit fields per int32 key
    (byte+1, with 0 as the sentinel).

    The explicit sentinel field is LOAD-BEARING: seeding from raw
    0-padded bytes is wrong — a suffix shorter than k0 ties with a
    longer one whose next real bytes are 0, and the doubling cannot fix
    it later because k only visits k0*4^t, which can skip the window
    where the -1 rank padding would separate positions (differential-
    tested failure: all-zero input).  The seed must already order
    truncated-to-k0 suffixes with shorter-is-prefix-first semantics."""
    b32 = block[:n].astype(jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)
    b1 = b32 + 1  # 1..256; 0 is the virtual sentinel

    def at(d):
        return jnp.where(idx < n - d, jnp.roll(b1, -d), 0)

    def key(d):
        return (at(d) << 18) | (at(d + 1) << 9) | at(d + 2)

    rank, order, tied = _seed_ranks_start4(
        key(0), key(3), key(6), key(9), idx, n)
    rank, order, _, tied = _quad_double(
        rank, order, tied, idx, n, 12,
        lambda r, d: jnp.where(idx < n - d, jnp.roll(r, -d), -1))
    # EOF suffixes always resolve (distinct lengths), but keep the
    # stable-tie fallback for safety; ranks are a permutation when
    # tied == 0, so `order` is the suffix array directly
    return lax.cond(
        tied > 0,
        lambda a: jnp.argsort(a[0]),
        lambda a: a[1], (rank, order))


@functools.partial(jax.jit, static_argnums=(1,))
def bwt_eof_block(block, n):
    """EOF-terminated BWT (reference bwtransform contract): (U, pidx+1)
    with U[0]=T[n-1] and the suffix-0 slot skipped."""
    sa = eof_suffix_sort(block, n)
    pidx = jnp.argmax(sa == 0).astype(jnp.int32)
    prev = block[:n][(sa - 1) % n]
    idx = jnp.arange(n, dtype=jnp.int32)
    # U[0]=T[n-1]; U[i+1]=prev[i] for i<pidx; U[i]=prev[i] for i>pidx
    U = jnp.full(n, block[n - 1], dtype=block.dtype)
    U = jnp.where((idx > 0) & (idx <= pidx), prev[jnp.maximum(idx - 1, 0)],
                  U)
    U = jnp.where(idx > pidx, prev[idx], U)
    return U, pidx + 1


@functools.partial(jax.jit, static_argnums=(1,))
def bwt_block(block, n):
    """Cyclic BWT of one block: (U, pidx).  The hybrid pipeline's device
    stage — rotation sort stays on chip, the rest on the host."""
    order = cyclic_suffix_sort(block, n)
    U = block[:n][(order - 1) % n]
    pidx = jnp.argmax(order == 0).astype(jnp.int32)
    return U, pidx


def _lf_mapping(U32, n):
    """LF[i] = C[U[i]] + occ[i] as the inverse of the stable
    (char, index) sort permutation — two device sorts, no scatter
    conflicts."""
    idx = jnp.arange(n, dtype=jnp.int32)
    _, order = lax.sort((U32, idx), num_keys=2)
    lf = jnp.zeros(n, dtype=jnp.int32).at[order].set(idx)
    return lf


# Round-5 sweep on the real v5e (900 KB block, cap=2^20,
# tools/walk_tune_r5.py ibwt): m=1024 158.5 ms, 4096 171.9, 16384
# 186.3, full doubling 226.1 — composition gathers dominate, so the
# smallest cursor set that keeps the chase scan short wins.
ORBIT_CURSORS = 1024


def _orbit_from_dev(f, t0, n, m=None):
    """[t0, f(t0), ..., f^{n-1}(t0)] — the TPU form of the sequential
    LF-chain walk (Bzip2.js:405-439), in two phases:

    1. doubling to m cursors: seq doubles via g = f^(2^r) composition
       rounds (each one full n-gather) until it holds the first m orbit
       elements — log2(m) compositions instead of the log2(n) a full
       orbit doubling pays;
    2. m-cursor chase: one more squaring gives g = f^m, then a
       ceil(n/m)-step `lax.scan` advances all m cursors at once — O(n)
       total gather ELEMENTS (each step one m-wide gather), the
       k-cursor sampled-entry-point walk of SURVEY §5 with the entry
       points produced by phase 1 rather than stored in the format.

    Measured v5e (900 KB block): full doubling 163 ms; m=4096 two-phase
    ~105 ms — composition gathers dominate either way (~8 ms per full
    n-gather at the chip's ~0.11 G/s random-gather issue rate), the
    chase's n/m scan steps cost ~45 us each.  Static n and m, so all
    shapes fix at trace time."""
    if m is None:
        m = ORBIT_CURSORS
    mm = min(m, n)
    seq = jnp.array([t0], dtype=jnp.int32)
    g = f
    while seq.shape[0] < mm:
        take = min(seq.shape[0], mm - seq.shape[0])
        seq = jnp.concatenate([seq, g[seq[:take]]])
        if seq.shape[0] < mm:
            g = g[g]
    if mm >= n:
        return seq[:n]
    g = g[g]  # f^(mm/2) -> f^mm
    steps = -(-n // mm) - 1
    # unroll the chase body: scan-step overhead (~45 us) dominates the
    # ~10 us m-wide dependent gather, so U gathers per step cut the
    # step count U-fold for the same chain
    U = 4
    n_iter = -(-steps // U)

    def step(frontier, _):
        outs = []
        for _ in range(U):
            frontier = g[frontier]
            outs.append(frontier)
        return frontier, jnp.stack(outs)

    _, rows = lax.scan(step, seq, None, length=n_iter)
    return jnp.concatenate([seq, rows.reshape(-1)])[:n]


@functools.partial(jax.jit, static_argnums=(1,))
def inverse_bwt_block(U, n, pidx):
    """Invert the cyclic BWT on device (decoder dual of bwt_block):
    returns the original block.  Mirrors ops.bwt.inverse_bwt_cyclic
    (reference LF chain, Bzip2.js:369-394)."""
    U = U[:n]
    lf = _lf_mapping(U.astype(jnp.int32), n)
    seq = _orbit_from_dev(lf, pidx, n)
    return U[seq][::-1]


@functools.partial(jax.jit, static_argnums=(1,))
def inverse_bwt_block_masked(U, cap, n, pidx):
    """inverse_bwt_block with a TRACED valid length n <= cap (static):
    the decode-side blocks of one stream are ragged (RLE1 packing makes
    every block a different length), so the mesh decode pads them to one
    capacity and each lane inverts only its first n entries.  Entries at
    index >= n of the result are zero."""
    idx = jnp.arange(cap, dtype=jnp.int32)
    valid = idx < n
    key = jnp.where(valid, U[:cap].astype(jnp.int32), 300)
    _, order = lax.sort((key, idx), num_keys=2)  # pads sort last
    lf = jnp.zeros(cap, dtype=jnp.int32).at[order].set(idx)
    lf = jnp.minimum(lf, cap - 1)
    seq = _orbit_from_dev(lf, jnp.minimum(pidx, cap - 1), cap)
    # reversed gather of the first n walk entries
    j = jnp.clip(n - 1 - idx, 0, cap - 1)
    out = U[:cap][seq[j]]
    return jnp.where(valid, out, 0).astype(U.dtype)


@functools.partial(jax.jit, static_argnums=(1,))
def inverse_bwt_eof_block(T, n, pidx):
    """Invert the EOF-terminated BWT on device (decoder dual of
    bwt_eof_block; reference BWT.js:352-363 contract): returns the
    original block given the unbwtransform-style (T, pidx)."""
    T = T[:n]
    f = _lf_mapping(T.astype(jnp.int32), n)
    f = f + (f < pidx).astype(jnp.int32)
    f = jnp.minimum(f, n - 1)   # pidx == n: computed but never walked
    seq = _orbit_from_dev(f, jnp.int32(0), n)
    return T[seq][::-1]


@functools.partial(jax.jit, static_argnums=(1,))
def bwt_block_batch(blocks, n):
    """Cyclic BWT of a (B, n) batch of equal-length blocks in ONE
    dispatch: (U (B, n) uint8, pidx (B,) int32).

    Batching the independent blocks into a single compiled program is
    the single-chip form of the DP-over-blocks axis (the mesh path
    shards the same batch over devices): one host->device transfer, one
    launch, one fetch for the whole file instead of a tunnel round-trip
    per block.  The prefix-doubling while_loop runs until the slowest
    block's ranks resolve; the lockstep cost is small because rounds
    needed ~ log2(max repeat length), similar across blocks of one
    file."""
    return jax.vmap(lambda b: bwt_block(b, n))(blocks)


# ---------------------------------------------------------------------------
# move-to-front

def _chunk_start_positions(chunks, n_chunks, chunk_len, width=256):
    """Start-state symbol positions for every chunk.

    The MTF list before chunk t is all symbols ordered by the global
    position of their most recent occurrence in chunks[0:t] (most recent
    first), with never-seen symbols keeping identity order — modeled as
    virtual occurrences at -(c+1).  So start states fall out of an
    exclusive max-scan of per-chunk last-occurrence vectors (elementwise,
    fully parallel over chunks) plus one batched rank-within-row sort —
    no sequential per-chunk merge."""
    # last occurrence of each symbol within each chunk, global coords
    # (-1 if absent)
    pos_in_chunk = jnp.broadcast_to(
        jnp.arange(chunk_len, dtype=jnp.int32), (n_chunks, chunk_len))
    gpos = pos_in_chunk + (jnp.arange(n_chunks, dtype=jnp.int32)
                           * chunk_len)[:, None]
    last_occ = jnp.full((n_chunks, width), -1, dtype=jnp.int32)
    last_occ = last_occ.at[
        jnp.arange(n_chunks, dtype=jnp.int32)[:, None], chunks
    ].max(gpos)

    # exclusive max-scan over chunks -> last occurrence before chunk t
    virt = -1 - jnp.arange(width, dtype=jnp.int32)  # identity initial list
    shifted = jnp.concatenate(
        [jnp.broadcast_to(virt[None, :] - width, (1, width)),
         last_occ[:-1]], axis=0)
    before = lax.associative_scan(jnp.maximum, shifted, axis=0)
    before = jnp.maximum(before, virt[None, :])

    # rank within each row by descending recency = start position
    # (all values distinct: real positions are unique, virtuals too)
    order = jnp.argsort(-before, axis=1)
    starts = jnp.zeros((n_chunks, width), dtype=jnp.int32)
    starts = starts.at[
        jnp.arange(n_chunks, dtype=jnp.int32)[:, None], order
    ].set(jnp.broadcast_to(jnp.arange(width, dtype=jnp.int32)[None, :],
                           (n_chunks, width)))
    return starts  # (n_chunks, width): position of each symbol at chunk start


def _rank_of(keys):
    """Rank (0-based) of each element under ascending stable sort."""
    order = jnp.argsort(keys, stable=True)
    ranks = jnp.zeros_like(order)
    return ranks.at[order].set(jnp.arange(keys.shape[0], dtype=order.dtype))


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def mtf_encode(data, n, chunk_len=512, width=256):
    """MTF indices of data[:n] (dense symbols < width) with the identity
    initial list.  Parallel across n/chunk_len chunks; each scan step
    updates all chunks' width-entry position tables at once.  `width` is
    the alphabet bucket (64/128/256): the scan's work is linear in it.

    The per-step update is pure vector math on a uint8 state: positions
    are < 256 so the state is u8 (4x less scan traffic than i32); the
    coded index comes from a masked max instead of a per-row gather and
    the front-move from a masked select instead of a 1-element scatter.
    Measured on v5e, 900 KB block: 45.1 -> 31.7 ms vs the i32
    gather/scatter step; a K-wide unrolled step was tried and REJECTED
    (50.3 ms at K=8 — the scan is traffic-bound, not step-count-bound,
    and unrolling only grows the live set)."""
    n_chunks = -(-n // chunk_len)
    padded = n_chunks * chunk_len
    # pad with symbol 0 (harmless: outputs past n are discarded)
    d = jnp.zeros(padded, dtype=jnp.int32)
    d = d.at[:n].set(data[:n].astype(jnp.int32))
    chunks = d.reshape(n_chunks, chunk_len)

    starts = _chunk_start_positions(chunks, n_chunks, chunk_len,
                                    width).astype(jnp.uint8)
    sym_iota = jnp.arange(width, dtype=jnp.int32)[None, :]

    def step(pos, s):
        # pos: (n_chunks, width) u8; s: (n_chunks,) this step's symbol
        hit = sym_iota == s[:, None]
        j = jnp.max(jnp.where(hit, pos, jnp.uint8(0)), axis=1)
        pos = jnp.where(hit, jnp.uint8(0),
                        pos + (pos < j[:, None]).astype(jnp.uint8))
        return pos, j

    _, outs = lax.scan(step, starts, chunks.T)  # scan over chunk_len
    return outs.T.reshape(padded)[:n].astype(jnp.int32)


# ---------------------------------------------------------------------------
# RLE2 (RUNA/RUNB) symbol stream

@functools.partial(jax.jit, static_argnums=(1, 4))
def encode_block_core(block, n, remap, eob, width=256):
    """Fused device path for one bzip2 block: cyclic BWT -> dense-alphabet
    remap -> MTF -> RLE2.  Returns (pidx, syms, count, freq).

    `remap` maps byte values to dense used-alphabet indices (host-computed
    u8[256]); `eob` is the end-of-block symbol (traced scalar); `width` is
    the MTF alphabet bucket (>= used alphabet size)."""
    order = cyclic_suffix_sort(block, n)
    U = block[:n][(order - 1) % n]
    pidx = jnp.argmax(order == 0).astype(jnp.int32)
    dense = remap[U.astype(jnp.int32)]
    mtf_seq = mtf_encode(dense, n, 512, width)
    syms, count, freq = rle2_encode(mtf_seq, n, eob)
    return pidx, syms, count, freq


@functools.partial(jax.jit, static_argnums=(1,))
def rle2_encode(mtf_seq, n, eob):
    """bzip2 symbol stream from MTF indices: zero runs become bijective
    base-2 RUNA/RUNB digits (digit i of run length L = bit i of L+1,
    digit count = fls(L+1)-1), value j becomes symbol j+1, then EOB.
    Returns (syms[n+1] padded with eob, count, freq[260])."""
    seq = mtf_seq[:n].astype(jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)
    is_zero = seq == 0
    # first index of the current zero run = 1 + last nonzero position
    marker = jnp.where(~is_zero, idx + 1, 0)
    run_start = lax.associative_scan(jnp.maximum, marker)
    # a zero run ends where the next symbol is nonzero (or at n-1)
    nxt_nonzero = jnp.concatenate(
        [seq[1:] != 0, jnp.ones(1, dtype=jnp.bool_)])
    run_end = is_zero & nxt_nonzero
    run_len = jnp.where(run_end, idx - run_start + 1, 0)
    # digit count = bit_length(L+1) - 1; float32 exponent is exact for
    # L+1 <= 2^24 >> the 900001 block-size bound
    k_digits = jnp.frexp((run_len + 1).astype(jnp.float32))[1] - 1
    k_digits = jnp.where(run_end, k_digits.astype(jnp.int32), 0)

    out_count = jnp.where(is_zero, k_digits, 1)
    offsets = jnp.cumsum(out_count) - out_count
    total = jnp.sum(out_count)

    # gather formulation (a scatter of n*21 digit candidates measured 5x
    # slower on v5e): each producer (literal or run end) claims its first
    # output slot via one n-element scatter-max, a running max then tells
    # every output slot which producer covers it, and symbol values are
    # computed by gathers — literal j -> j+1, digit d of a run -> bit d
    # of run_len+1 (the bijective base-2 digits)
    out_idx = jnp.arange(n + 1, dtype=jnp.int32)
    producer = out_count > 0
    mark = jnp.zeros(n + 1, dtype=jnp.int32)
    mark = mark.at[jnp.where(producer, offsets, n + 1)].max(
        idx, mode='drop')
    iat = lax.associative_scan(jnp.maximum, mark)
    digit = out_idx - offsets[iat]
    s = seq[iat]
    sym = jnp.where(s != 0, s + 1, ((run_len[iat] + 1) >> digit) & 1)
    # slots >= total are eob padding; slot `total` is the real EOB
    syms = jnp.where(out_idx < total, sym, eob)
    count = total + 1
    # histogram; positions >= count hold eob padding — subtract it
    freq = jnp.bincount(syms, length=260)
    freq = freq.at[eob].add(-((n + 1) - count))
    return syms.astype(jnp.int16), count, freq


# ---------------------------------------------------------------------------
# decode-side kernels (device duals used by the mesh-parallel decode:
# host native Huffman walk -> device RLE2-undo -> device inverse MTF ->
# device inverse BWT; RLE1-undo stays on the host on purpose — the
# pre-RLE1 form is the SMALLER one, so stopping there minimizes the
# device->host download)

@functools.partial(jax.jit, static_argnums=(1,))
def rle2_decode(syms, out_cap, count):
    """Invert rle2_encode: RUNA/RUNB digit groups -> zero runs, literal
    j+1 -> j.  syms excludes the EOB (caller passes count = EOB index).
    Returns (mtf indices int32[out_cap], out_count)."""
    n = syms.shape[0]
    s = syms.astype(jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = idx < count
    is_digit = (s < 2) & valid
    # digit position within its run group (consecutive digits)
    nondigit_mark = jnp.where(~is_digit, idx + 1, 0)
    grp_start = lax.associative_scan(jnp.maximum, nondigit_mark)
    dpos = idx - grp_start
    # bijective base-2: L = sum (digit_i + 1) << i, accumulated by a
    # segmented sum: contribution of each digit
    contrib = jnp.where(is_digit, (s + 1) << jnp.minimum(dpos, 30), 0)
    csum = jnp.cumsum(contrib)
    grp_end = is_digit & jnp.concatenate(
        [~is_digit[1:], jnp.ones(1, dtype=jnp.bool_)])
    seg_base = jnp.where(grp_start > 0,
                         csum[jnp.maximum(grp_start - 1, 0)], 0)
    run_len = jnp.where(grp_end, csum - seg_base, 0)
    # per-input output counts: last digit of a group emits the zero run,
    # literals emit one symbol
    out_cnt = jnp.where(is_digit, run_len, jnp.where(valid, 1, 0))
    offsets = jnp.cumsum(out_cnt) - out_cnt
    total = jnp.sum(out_cnt)
    # producer covering each output slot (scatter-max + running max)
    out_idx = jnp.arange(out_cap, dtype=jnp.int32)
    mark = jnp.zeros(out_cap + 1, dtype=jnp.int32)
    mark = mark.at[jnp.where(out_cnt > 0, offsets, out_cap + 1)].max(
        idx, mode='drop')
    iat = lax.associative_scan(jnp.maximum, mark[:out_cap])
    val = jnp.where(s[iat] < 2, 0, s[iat] - 1)
    out = jnp.where(out_idx < total, val, 0)
    return out, total


@functools.partial(jax.jit, static_argnums=(1,))
def rle1_decode_dev(block, out_cap, count):
    """Undo bzip2 RLE1 on device: after 4 consecutive equal bytes the
    next byte is an extras count (Bzip2.js:405-439 semantics).

    Whether byte i is a count byte is decided by a 5-state DFA whose
    per-position transition depends only on eq[i] = (b[i] == b[i-1]):
    states 1..4 = current same-value run phase, 0 = "this byte is the
    count".  Each position's transition is one of two fixed 5-entry
    lookup tables, and function composition of lookup tables is
    associative — so the whole state sequence comes from one
    `lax.associative_scan` instead of a byte loop.  Expansion then uses
    the same producer-covering scatter-max as rle2_decode.

    block: uint8[cap] with `count` valid bytes; out_cap: static output
    capacity.  Returns (out uint8[out_cap], out_count)."""
    n = block.shape[0]
    b = block.astype(jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = idx < count
    eq = jnp.concatenate([jnp.zeros(1, jnp.bool_), b[1:] == b[:-1]])
    f_eq = jnp.array([1, 2, 3, 4, 0], dtype=jnp.int8)
    f_ne = jnp.array([1, 1, 1, 1, 0], dtype=jnp.int8)
    maps = jnp.where(eq[:, None], f_eq[None, :], f_ne[None, :])

    def compose(a, c):
        # c[a] with a 5-state alphabet: an unrolled select chain beats
        # take_along_axis by ~20x on v5e (random gathers are issue-
        # rate-bound at ~0.11 G/s; 5 selects stream at HBM speed)
        out = c[:, :1] * jnp.zeros_like(a)
        for s in range(5):
            out = jnp.where(a == s, c[:, s:s + 1], out)
        return out

    states = lax.associative_scan(compose, maps, axis=0)[:, 1]
    is_count = (states == 0) & valid
    prev_val = jnp.concatenate([b[:1], b[:-1]])
    out_cnt = jnp.where(is_count, b, jnp.where(valid, 1, 0))
    vals = jnp.where(is_count, prev_val, b)
    offsets = jnp.cumsum(out_cnt) - out_cnt
    total = jnp.sum(out_cnt)
    out_idx = jnp.arange(out_cap, dtype=jnp.int32)
    mark = jnp.zeros(out_cap + 1, dtype=jnp.int32)
    mark = mark.at[jnp.where(out_cnt > 0, offsets, out_cap + 1)].max(
        idx, mode='drop')
    iat = lax.associative_scan(jnp.maximum, mark[:out_cap])
    out = jnp.where(out_idx < total, vals[iat], 0).astype(jnp.uint8)
    return out, total


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def mtf_decode(indices, n, chunk_len=512, width=256):
    """Invert mtf_encode on device: the effect of a chunk on the MTF
    list is a permutation determined ONLY by the chunk's indices, so
    per-chunk permutations are built in parallel, chunk-start lists come
    from one associative composition scan, and all chunks then decode in
    parallel.  Permutation state is uint8 with masked-select updates
    (same constants as mtf_encode).  Returns dense symbol values
    int32[n]."""
    n_chunks = -(-n // chunk_len)
    padded = n_chunks * chunk_len
    d = jnp.zeros(padded, dtype=jnp.int32)
    d = d.at[:n].set(indices[:n].astype(jnp.int32))
    chunks = d.reshape(n_chunks, chunk_len)

    pos = jnp.arange(width, dtype=jnp.int32)[None, :]

    def mtf_at(perm, js):
        # move-to-front at index js (per chunk): new[0] = old[j],
        # new[1..j] = old[0..j-1], new[j+1..] = old[j+1..]
        hit = pos == js[:, None]
        out = jnp.max(jnp.where(hit, perm, jnp.uint8(0)), axis=1)
        shifted = jnp.roll(perm, 1, axis=1)
        return jnp.where(pos == 0, out[:, None],
                         jnp.where(pos <= js[:, None], shifted,
                                   perm)), out

    def perm_step(perm, js):
        perm, _ = mtf_at(perm, js)
        return perm, None

    init = jnp.broadcast_to(
        jnp.arange(width, dtype=jnp.int32).astype(jnp.uint8)[None, :],
        (n_chunks, width))
    chunk_perm, _ = lax.scan(perm_step, init, chunks.T)

    # exclusive composition scan: list_before_c = L0[pi_1][pi_2]...
    # On TPU, composition out[c, i] = a[c, b[c, i]] runs as a batched
    # one-hot matmul instead of take_along_axis: the row-wise gathers
    # are issue-rate-bound (~0.11 G/s -> ~45 ms over the scan's
    # log-levels for a 900 KB block) while the MXU eats the (m, 256,
    # 256) one-hot contraction at full rate.  EXACT in bfloat16: the
    # one-hot rows select a single value <= 255, and integers up to
    # 256 are representable in bf16's 8-bit mantissa.  CPU keeps the
    # gather (its one-hot would materialize ~230 MB per scan level).
    width_iota = jnp.arange(width, dtype=jnp.int32)
    on_tpu = jax.default_backend() == 'tpu'

    def compose(a, b):
        if not on_tpu:
            return jnp.take_along_axis(a, b.astype(jnp.int32), axis=1)
        onehot = (b.astype(jnp.int32)[:, :, None] ==
                  width_iota[None, None, :]).astype(jnp.bfloat16)
        out = jnp.einsum('mij,mj->mi', onehot,
                         a.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return out.astype(jnp.uint8)

    inclusive = lax.associative_scan(compose, chunk_perm, axis=0)
    start_lists = jnp.concatenate([init[:1], inclusive[:-1]], axis=0)

    def decode_step(lists, js):
        lists, out = mtf_at(lists, js)
        return lists, out

    _, outs = lax.scan(decode_step, start_lists, chunks.T)
    return outs.T.reshape(padded)[:n].astype(jnp.int32)


# ---------------------------------------------------------------------------
# Huffman group stages on device (syms stay resident in HBM; the host only
# sees the tiny cost/frequency matrices and the final packed bytes)

GROUP_SIZE = 50


@jax.jit
def group_costs_dev(syms, count, length_matrix):
    """(n_chunks, n_groups) bit cost of coding each 50-symbol chunk with
    each table.  Padding symbols (>= count) cost 0."""
    syms = syms.astype(jnp.int32)
    n = syms.shape[0]
    valid = jnp.arange(n) < count
    per_sym = jnp.where(valid[None, :], length_matrix[:, syms], 0)
    n_chunks = -(-n // GROUP_SIZE)
    pad = n_chunks * GROUP_SIZE - n
    per_sym = jnp.pad(per_sym, ((0, 0), (0, pad)))
    return per_sym.reshape(length_matrix.shape[0], n_chunks,
                           GROUP_SIZE).sum(axis=2).T


@functools.partial(jax.jit, static_argnums=(2,))
def chunk_freqs_dev(syms, count, n_groups, selectors, alphabet_size):
    """Per-group symbol frequency matrix given chunk selectors."""
    syms = syms.astype(jnp.int32)
    n = syms.shape[0]
    valid = jnp.arange(n) < count
    chunk_of_sym = jnp.arange(n) // GROUP_SIZE
    sel = selectors[chunk_of_sym]
    flat = jnp.where(valid, sel * 260 + syms, n_groups * 260)
    counts = jnp.bincount(flat, length=n_groups * 260 + 1)
    return counts[:n_groups * 260].reshape(n_groups, 260)


@jax.jit
def payload_pack_dev(syms, count, selectors, length_matrix, code_matrix):
    """Huffman payload as packed bytes: per-symbol (len, code) gather from
    the (groups x 260) tables via chunk selectors, bit expansion, scatter
    into the bit array, then 8:1 pack.  Returns (bytes, total_bits)."""
    syms = syms.astype(jnp.int32)
    n = syms.shape[0]
    valid = jnp.arange(n) < count
    chunk_of_sym = jnp.arange(n) // GROUP_SIZE
    sel = selectors[chunk_of_sym]
    lens = jnp.where(valid, length_matrix[sel, syms].astype(jnp.int32), 0)
    codes = code_matrix[sel, syms].astype(jnp.int32)
    offsets = jnp.cumsum(lens) - lens
    total = jnp.sum(lens)
    max_bits = ((n * 20 + 7) // 8) * 8
    t = jnp.arange(20, dtype=jnp.int32)
    shifts = lens[:, None] - 1 - t[None, :]
    bit_valid = shifts >= 0
    bits = ((codes[:, None] >> jnp.maximum(shifts, 0)) & 1).astype(jnp.uint8)
    positions = jnp.where(bit_valid, offsets[:, None] + t[None, :], max_bits)
    out = jnp.zeros(max_bits + 1, dtype=jnp.uint8)
    out = out.at[positions.reshape(-1)].set(bits.reshape(-1), mode='drop')
    # pack bits MSB-first into bytes
    weights = (jnp.uint8(1) << (7 - jnp.arange(8, dtype=jnp.uint8)))
    packed = (out[:max_bits].reshape(-1, 8) *
              weights[None, :]).sum(axis=1).astype(jnp.uint8)
    return packed, total
