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

def _prefix_double(rank0, idx, n, rank2_of, k0):
    """Shared prefix-doubling loop: refine ranks by sorting
    (rank, rank2_of(rank, k)) pairs until all ranks are distinct (early
    exit) or k reaches n.  rank2_of supplies the variant semantics
    (cyclic wrap vs EOF padding); k0 is the context length the seed
    ranks already encode."""

    def cond(state):
        rank, k, maxrank = state
        return (maxrank < n - 1) & (k < n)

    def body(state):
        rank, k, _ = state
        rank2 = rank2_of(rank, k)
        s1, s2, order = lax.sort((rank, rank2, idx), num_keys=2)
        diff = jnp.ones(n, dtype=jnp.int32)
        diff = diff.at[1:].set(
            ((s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])).astype(jnp.int32))
        csum = jnp.cumsum(diff)
        new_rank = jnp.zeros(n, dtype=jnp.int32)
        new_rank = new_rank.at[order].set(csum - 1)
        return new_rank, k * 2, csum[-1] - 1

    rank, _, _ = lax.while_loop(
        cond, body, (rank0, jnp.int32(k0), jnp.max(rank0)))
    return rank


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

    Prefix doubling with data-dependent early exit: real data resolves all
    ranks after ~log2(max repeat length) rounds, far below the log2(n)
    worst case, so the doubling runs in a lax.while_loop that stops once
    ranks are unique.  Ranks are seeded from EIGHT bytes of context (two
    packed uint32 sort keys), saving two full doubling rounds over a
    digram seed.

    Negative result (measured, v5e): 'discarding' prefix doubling (sort
    only still-tied positions through compacted n/4..n/64 buffers) was
    neutral on text and 1.8x SLOWER on run-structured data — the tied
    set only collapses below n/4 around the round where dense rounds
    finish anyway, so the gather/compact/scatter machinery never pays
    for itself at 900 KB block scale.  Keep the rounds dense."""
    bu = block[:n].astype(jnp.uint32)
    idx = jnp.arange(n, dtype=jnp.int32)
    hi, lo = pack_cyclic_seed_keys(bu)
    rank0 = _seed_ranks(hi, lo, idx, n)
    rank = _prefix_double(rank0, idx, n,
                          lambda rank, k: jnp.roll(rank, -k), 8)
    # final order: (rank asc, index desc) — resolves periodic ties
    _, _, order = lax.sort((rank, -idx, idx), num_keys=2)
    return order


@functools.partial(jax.jit, static_argnums=(1,))
def eof_suffix_sort(block, n):
    """EOF-terminated suffix array of block[:n]: a virtual sentinel
    smaller than every byte terminates the string, so shorter suffixes
    that are prefixes sort first (the semantics BWTC's bwtransform needs).
    Same early-exit prefix doubling as the cyclic variant, with -1 rank
    padding past the end instead of cyclic wrap.  Ranks are seeded from
    SIX bytes of context: three 9-bit fields per int32 key (byte+1, with
    0 as the sentinel), saving ~1.5 doubling rounds over a digram seed.

    The explicit sentinel field is LOAD-BEARING: seeding from raw
    0-padded bytes (8 per key pair) is wrong — a suffix shorter than k0
    ties with a longer one whose next real bytes are 0, and the
    doubling cannot fix it later because k only visits k0*2^t, which
    can skip the window [n-j, n-i) where the -1 rank padding would
    separate positions i < j (differential-tested failure: all-zero
    input).  The seed must already order truncated-to-k0 suffixes with
    shorter-is-prefix-first semantics."""
    b32 = block[:n].astype(jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)
    b1 = b32 + 1  # 1..256; 0 is the virtual sentinel

    def at(d):
        return jnp.where(idx < n - d, jnp.roll(b1, -d), 0)

    hi = (b1 << 18) | (at(1) << 9) | at(2)
    lo = (at(3) << 18) | (at(4) << 9) | at(5)
    rank0 = _seed_ranks(hi, lo, idx, n)
    rank = _prefix_double(
        rank0, idx, n,
        lambda rank, k: jnp.where(idx < n - k, jnp.roll(rank, -k), -1), 6)
    order = jnp.argsort(rank)  # ranks are a permutation here
    return order


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


def _orbit_from_dev(f, t0, n):
    """[t0, f(t0), ..., f^{n-1}(t0)] by doubling: ceil(log2 n) gather
    rounds, each O(n) parallel work — the TPU form of the sequential
    LF-chain walk (static n, so the concat shapes unroll at trace
    time)."""
    seq = jnp.array([t0], dtype=jnp.int32)
    g = f
    while seq.shape[0] < n:
        take = min(seq.shape[0], n - seq.shape[0])
        seq = jnp.concatenate([seq, g[seq[:take]]])
        if seq.shape[0] < n:
            g = g[g]
    return seq


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

    After a chunk is processed, the MTF list is (chunk's distinct symbols,
    most-recent first) followed by the prior list's remaining symbols in
    order.  That merge is computed per chunk from last-occurrence indices,
    then folded left-to-right with a small scan over chunks."""
    # last occurrence of each symbol within each chunk (-1 if absent)
    pos_in_chunk = jnp.broadcast_to(
        jnp.arange(chunk_len, dtype=jnp.int32), (n_chunks, chunk_len))
    last_occ = jnp.full((n_chunks, width), -1, dtype=jnp.int32)
    last_occ = last_occ.at[
        jnp.arange(n_chunks, dtype=jnp.int32)[:, None], chunks
    ].max(pos_in_chunk)

    def merge(pos, last):
        """pos: (256,) symbol->position before this chunk; last: (256,)
        chunk last-occurrence indices.  After the chunk, its symbols sit
        at the front ordered by recency, survivors follow in prior
        order."""
        in_chunk = last >= 0
        n_in = jnp.sum(in_chunk.astype(jnp.int32))
        big = jnp.int32(1) << 24
        rank_in = _rank_of(jnp.where(in_chunk, -last, big))
        rank_surv = _rank_of(jnp.where(in_chunk, big, pos))
        new_pos = jnp.where(in_chunk, rank_in, n_in + rank_surv)
        return new_pos, pos

    init = jnp.arange(width, dtype=jnp.int32)  # identity: alphabet order
    _, starts = lax.scan(merge, init, last_occ)
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

    chunk_len=512 measured fastest on v5e for 900 KB blocks (7.9 MB/s vs
    3.4 at 2048, 6.9 at 256): shorter chunks mean more parallel lanes
    and fewer sequential scan steps, until start-state composition and
    per-step overhead win below ~512."""
    n_chunks = -(-n // chunk_len)
    padded = n_chunks * chunk_len
    # pad with symbol 0 (harmless: outputs past n are discarded)
    d = jnp.zeros(padded, dtype=jnp.int32)
    d = d.at[:n].set(data[:n].astype(jnp.int32))
    chunks = d.reshape(n_chunks, chunk_len)

    starts = _chunk_start_positions(chunks, n_chunks, chunk_len, width)

    def step(pos, syms):
        # pos: (n_chunks, 256); syms: (n_chunks,) this step's symbol
        j = jnp.take_along_axis(pos, syms[:, None], axis=1)[:, 0]
        bump = (pos < j[:, None]).astype(jnp.int32)
        pos = pos + bump
        pos = pos.at[jnp.arange(n_chunks), syms].set(0)
        return pos, j

    _, outs = lax.scan(step, starts, chunks.T)  # scan over chunk_len
    return outs.T.reshape(padded)[:n]


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
