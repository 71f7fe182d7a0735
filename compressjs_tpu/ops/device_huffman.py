"""Device canonical-Huffman symbol decode for bzip2 blocks.

The reference decodes symbols with a sequential bit-by-bit table walk
(Bzip2.js:288-361): read min_len bits, extend while the running value
exceeds ``limit[len]``, then look the symbol up through base/permute.
That loop is length-n sequential.  The TPU build inverts it into four
parallel stages:

1. **Speculative decode at every bit offset.**  For each offset ``p``
   and each Huffman group ``g``, the canonical-code property gives the
   code length directly: it is the smallest ``L >= min_len[g]`` with
   ``bits[p:p+L] <= limit[g][L]``.  This is 20 vectorized
   compare/selects over the whole payload — no walk, no data
   dependence.  From it, ``nxt_g[p] = p + len_g[p]`` is the "if a
   symbol starts at p under table g, the next starts at nxt_g[p]" map.
2. **50th-power composition.**  Tables switch every GROUP_SIZE=50
   symbols (the selector list), so the only transition needed between
   chunk boundaries is ``nxt_g`` applied 50 times.  Pointer doubling
   builds ``F_g = nxt_g^50`` in ceil(log2(50)) + popcount(50) - 1
   gathers per group.
3. **Selector chase.**  Chunk-boundary bit positions follow
   ``p[c+1] = F[sel[c]][p[c]]`` — one short ``lax.scan`` over the
   ~n/50 selectors (the only sequential stage left: ~18K steps for a
   900 KB block instead of ~900K bit-walk steps).
4. **Chunk-parallel symbol walk.**  With all chunk start offsets
   known, every chunk decodes its 50 symbols in lock-step: a 50-step
   scan whose state is the per-chunk bit cursor (all chunks advance
   together), each step a handful of small gathers.

The output is the raw bzip2 symbol stream (RUNA=0/RUNB=1, literal
j+1, EOB) plus the EOB index and the exact end bit — exactly what
`jax_kernels.rle2_decode` + `mtf_decode` + the device inverse BWT
consume, so a block's payload never needs a host entropy pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

MAX_CODE_BITS = 20     # bzip2 code lengths are 1..20 (MAX_HUFCODE_BITS)
GROUP_SIZE = 50
BIG_LIMIT = (1 << 28)  # stands in for the reference's int64-max sentinel


def payload_words(payload_bytes, n_words):
    """Pack payload bytes into MSB-first uint32 words, zero-padded (reads
    past the end of data yield zero bits, BitStream.js:86-89)."""
    b = payload_bytes.astype(jnp.uint32)
    cap = n_words * 4
    take = min(b.shape[0], cap)
    b = jnp.zeros(cap, dtype=jnp.uint32).at[:take].set(b[:take])
    q = b.reshape(n_words, 4)
    return (q[:, 0] << 24) | (q[:, 1] << 16) | (q[:, 2] << 8) | q[:, 3]


def _window_vals(words, bit0, nbits):
    """val[p] = the MAX_CODE_BITS bits starting at bit ``bit0 + p`` of
    the word array, as the high bits of a right-aligned int32.

    words[p >> 5] is each word repeated 32 times consecutively, so the
    expansion is a broadcast-reshape (`jnp.repeat`) + slice — pure HBM
    bandwidth — NOT a random gather.  The gather formulation measured
    ~76 ms at cap=4.19M on the v5e (two cap-wide gathers at the chip's
    ~0.11 G/s issue rate) vs ~1 ms for this build."""
    nw = words.shape[0]
    p = jnp.arange(nbits, dtype=jnp.int32) + bit0
    sh = (p & 31).astype(jnp.uint32)
    # repeat + dynamic slice [bit0, bit0+nbits) (bit0 is traced; it is
    # < 8 so one word of headroom suffices; words is already padded
    # past the payload)
    bit0 = jnp.asarray(bit0, jnp.int32)
    left = lax.dynamic_slice(jnp.repeat(words, 32), (bit0,), (nbits,))
    words_r = jnp.concatenate([words[1:], jnp.zeros(1, words.dtype)])
    right = lax.dynamic_slice(jnp.repeat(words_r, 32), (bit0,),
                              (nbits,))
    lo = jnp.where(sh > 0, right >> ((32 - sh) & 31), 0)
    return (((left << sh) | lo) >> (32 - MAX_CODE_BITS)).astype(jnp.int32)


def _group_lengths(val, limit_row, min_len):
    """Code length at every offset under one group's table: the smallest
    L >= min_len with (val >> (W-L)) <= limit[L].  Offsets where no
    valid code fits (corrupt data / zero padding) get MAX_CODE_BITS and
    are caught by the caller's CRC check."""
    ln = jnp.full(val.shape, MAX_CODE_BITS, dtype=jnp.int32)
    found = jnp.zeros(val.shape, dtype=jnp.bool_)
    for L in range(1, MAX_CODE_BITS + 1):
        j = val >> (MAX_CODE_BITS - L)
        ok = (L >= min_len) & (j <= limit_row[L])
        ln = jnp.where(ok & ~found, L, ln)
        found = found | ok
    return ln


def _power_k_gather(nxt, cap, k):
    """nxt composed k times by binary powering (e.g. 50 = 32+16+2).
    nxt is (G, cap) — all groups advance through each doubling level in
    ONE flat 1-D gather (row-offset indices; 2-D take_along_axis on
    these shapes measured ~8x slower on v5e).  ~92 M random gathers at
    k=50 — on the TPU's ~0.11 G/s gather issue rate that is ~760 ms, so
    the windowed build wins there; on CPU gathers run at memory speed
    and this build wins."""
    G = nxt.shape[0]
    row_off = (jnp.arange(G, dtype=jnp.int32) * cap)[:, None]

    def comp(a, b):
        return a.reshape(-1)[row_off + b]

    powers = []
    b, kk = nxt, 1
    while kk <= k:
        powers.append((kk, b))
        if kk * 2 <= k:
            b = comp(b, b)
        kk *= 2
    out, need = None, k
    for kk, arr in reversed(powers):
        if kk <= need:
            out = arr if out is None else comp(arr, out)
            need -= kk
    assert need == 0
    return out


def _compose_windowed(a, b, blo, bhi, cap):
    """c[g, p] = a[g, b[g, p]] exploiting the bounded jump window:
    b[g, p] - p is in [blo, bhi] (code lengths are 1..20 bits, so
    nxt^k jumps k..20k).  Instead of `cap` random gathers per group,
    sweep the (bhi - blo + 1) possible offsets with a dynamic-slice +
    select — pure sequential HBM traffic, which this chip moves ~70x
    faster than random gathers.  Positions whose jump was clipped at
    the array tail select a clamped (junk but in-range) value; the
    selector chase never reaches them (they sit past the block's EOB).
    """
    G = a.shape[0]
    d = jnp.clip(b - jnp.arange(cap, dtype=jnp.int32)[None, :],
                 blo, bhi).astype(jnp.int32)
    a_pad = jnp.concatenate(
        [a, jnp.broadcast_to(a[:, -1:], (G, bhi + 1))], axis=1)

    def body(off, c):
        sl = lax.dynamic_slice(a_pad, (0, off), (G, cap))
        return jnp.where(d == off, sl, c)

    init = lax.dynamic_slice(a_pad, (0, blo), (G, cap))
    return lax.fori_loop(blo + 1, bhi + 1, body, init)


def _compose_build():
    """Composition build choice (env: COMPRESSJS_TPU_COMPOSE).

    'pallas' (default on TPU, round 5): ops/pallas_compose runs the
    windowed sweep inside VMEM — measured 7.7 ms per [2,40] level at
    bench shapes (G=6, cap=2^21, tr=128) vs 114 ms for the gather
    build, with seconds of Mosaic compile.
    'gather' (default off-TPU): binary-powering random gathers — on
    CPU gathers run at memory speed and this build wins.
    'windowed': the XLA dynamic-slice sweep.  Kept as the differential
    reference; its 374 s server-side compile at k=50 is what timed out
    round 3's bench (ARCHITECTURE.md negative (h)) — opt-in only."""
    import os
    env = os.environ.get('COMPRESSJS_TPU_COMPOSE')
    if env in ('pallas', 'gather', 'windowed'):
        return env
    try:
        on_tpu = jax.devices()[0].platform in ('tpu', 'axon')
    except Exception:  # pragma: no cover
        on_tpu = False
    return 'pallas' if on_tpu else 'gather'


def _power_k(nxt, cap, k):
    """nxt composed k times (k in {1,2,5,10,25,50} or a power of 2
    dividing 50) via windowed compositions: squaring ladder plus
    minimal-inner-window combines (window of nxt^j is [j, 20j] — code
    lengths are 1..20 bits).  The sweep itself runs as the Pallas VMEM
    kernel on TPU, the XLA dynamic-slice build on request, or random
    gathers off-TPU (see _compose_build)."""
    if k == 1:
        return nxt
    build = _compose_build()
    if build == 'gather':
        return _power_k_gather(nxt, cap, k)
    if build == 'pallas':
        # tile must divide cap and exceed the widest window (20k);
        # production caps are pow2 >= 4096 so this always holds there,
        # but tests drive the walk at exact tiny caps — fall back to
        # the gather build for shapes the kernel can't tile
        tr = min(128, cap // 128)
        if tr == 0 or cap % (tr * 128) != 0 or 20 * k >= tr * 128:
            return _power_k_gather(nxt, cap, k)
        from .pallas_compose import compose_windowed

        def compose(a, b, blo, bhi):
            return compose_windowed(a, b, blo, bhi, tr)
    else:
        def compose(a, b, blo, bhi):
            return _compose_windowed(a, b, blo, bhi, cap)
    p = {1: nxt}
    kk = 1
    while 2 * kk <= k:
        p[2 * kk] = compose(p[kk], p[kk], kk, 20 * kk)
        kk *= 2
    # combine remaining bits, smallest power innermost-last so every
    # compose keeps the smallest possible inner window
    out, need = None, k
    for kk in sorted(p, reverse=True):
        if kk <= need:
            out = p[kk] if out is None else compose(out, p[kk], kk,
                                                    20 * kk)
            need -= kk
    assert need == 0, k
    return out


def _power50(nxt, cap):
    return _power_k(nxt, cap, GROUP_SIZE)


# Default composition power.  Round-5 sweep on the real v5e with the
# Pallas VMEM compose, PRODUCTION shapes (cap=2^22, s_cap=8192,
# tools/walk_tune_r5.py): k=2 481 ms, 5 287, **10 233**, 25 258,
# 50 347 — the VMEM sweep makes composition cheap enough that k=10
# (4 compose levels, 5 chase sub-steps/selector) beats round 4's
# gather-built k=2 (693 ms at the same shapes) by 3x.  All variants
# compile in 16-28 s.  (Round-4 gather-build sweep, 2.18M exact cap:
# k=2 433 ms was the then-optimum; the 374-481 s XLA windowed compile
# that killed round 3 is retired by the Pallas build.)
POWER_K_DEFAULT = 10

# Chase-scan body width: each lax.scan step runs this many dependent
# scalar gathers unrolled.  Round-5 sweep: 32/64/128 all measure the
# same walk time (the chase is bound by the ~1.4 us dependent-gather
# latency chain, not scan-step dispatch), so keep the smallest.
CHASE_UNROLL = 32


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 12))
def huffman_walk_dev(payload_bytes, bit0, nbits_cap, s_cap, n_groups,
                     limits, bases, permutes, min_lens, selectors,
                     n_selectors, eob, power_k=POWER_K_DEFAULT):
    """Decode a bzip2 block's Huffman payload into its symbol stream.

    payload_bytes: uint8, the data from the byte containing the first
        symbol bit; ``bit0`` = that bit's offset within the first byte.
    nbits_cap / s_cap: static caps on payload bits and selector count.
    limits (G, MAX+2), bases (G, MAX+1), permutes (G, 258), min_lens
    (G,): int32 per-group decode tables (bzip2._decode_tables, with the
    int64 sentinel clamped to BIG_LIMIT).
    selectors (>= s_cap,) int32, n_selectors: per-chunk group choices.
    eob: the end-of-block symbol value (sym_total + 1).

    Returns (syms int32[s_cap*50], count, end_bit): the symbol stream,
    the EOB's flat index (== symbol count before EOB), and the bit
    offset just past the EOB relative to payload_bytes' bit 0.
    """
    n_words = (nbits_cap + MAX_CODE_BITS + 31) // 32 + 1
    words = payload_words(payload_bytes, n_words)
    val = _window_vals(words, bit0, nbits_cap)
    pos0 = jnp.arange(nbits_cap, dtype=jnp.int32)

    nxt = jnp.stack([
        jnp.clip(pos0 + _group_lengths(val, limits[g], min_lens[g]),
                 0, nbits_cap - 1)
        for g in range(n_groups)])
    assert GROUP_SIZE % power_k == 0, power_k
    sub = GROUP_SIZE // power_k
    F = _power_k(nxt, nbits_cap, power_k)

    # selector chase: val-relative chunk-boundary bit offsets through
    # F = nxt^power_k, `sub` sub-steps per chunk (the chase is the only
    # sequential stage; its steps amortize across vmapped lanes, so
    # smaller power_k — cheaper composition, longer chase — wins for
    # batched decode).  Unlike the MTF scan (traffic-bound), each chase
    # step is one scalar gather — pure per-step overhead — so a K-wide
    # unrolled body is ~K times fewer dispatches for the same work.
    sel_arr = selectors[:s_cap].astype(jnp.int32)
    sel_sub = jnp.repeat(sel_arr, sub) if sub > 1 else sel_arr
    n_steps = s_cap * sub
    pad_s = -n_steps % CHASE_UNROLL
    sel_padded = jnp.concatenate(
        [sel_sub, jnp.zeros(pad_s, jnp.int32)]) if pad_s else sel_sub

    F_flat = F.reshape(-1)

    def chase(p, sel_k):
        outs = []
        for t in range(CHASE_UNROLL):
            outs.append(p)
            p = F_flat[sel_k[t] * nbits_cap + p]
        return p, jnp.stack(outs)

    _, starts = lax.scan(
        chase, jnp.int32(0),
        sel_padded.reshape(-1, CHASE_UNROLL))
    starts = starts.reshape(-1)[:n_steps:sub] if sub > 1 \
        else starts.reshape(-1)[:s_cap]

    # chunk-parallel 50-symbol walk.  Per-lane tables are gathered once;
    # permute lookups go through a flat index (lane tables are small but
    # re-gathering 258-wide rows every step would be ~1 GB of traffic).
    lim_l = limits[sel_arr]          # (s_cap, MAX+2)
    base_l = bases[sel_arr]          # (s_cap, MAX+1)
    ml_l = min_lens[sel_arr]         # (s_cap,)
    perm_flat = permutes.reshape(-1)
    perm_w = permutes.shape[1]

    def step(pos, _):
        vp = val[pos]
        ln = jnp.full(vp.shape, MAX_CODE_BITS, dtype=jnp.int32)
        found = jnp.zeros(vp.shape, dtype=jnp.bool_)
        for L in range(1, MAX_CODE_BITS + 1):
            ok = (L >= ml_l) & ((vp >> (MAX_CODE_BITS - L)) <=
                                lim_l[:, L])
            ln = jnp.where(ok & ~found, L, ln)
            found = found | ok
        j = (vp >> (MAX_CODE_BITS - ln)) - jnp.take_along_axis(
            base_l, ln[:, None], axis=1)[:, 0]
        sym = perm_flat[sel_arr * perm_w +
                        jnp.clip(j, 0, perm_w - 1)]
        nxt = jnp.clip(pos + ln, 0, nbits_cap - 1)
        return nxt, (sym, pos + ln)

    _, (sym_steps, end_steps) = lax.scan(
        step, starts, None, length=GROUP_SIZE)
    syms = sym_steps.T.reshape(-1)                  # (s_cap*50,)
    ends = end_steps.T.reshape(-1)
    valid_chunk = jnp.arange(s_cap, dtype=jnp.int32) < n_selectors
    flat_valid = jnp.repeat(valid_chunk, GROUP_SIZE,
                            total_repeat_length=s_cap * GROUP_SIZE)
    is_eob = (syms == eob) & flat_valid
    count = jnp.argmax(is_eob).astype(jnp.int32)
    end_bit = ends[count] + bit0
    return syms, count, end_bit


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 16))
def decode_block_full_dev(payload_bytes, bit0, nbits_cap, s_cap,
                          n_groups, dbuf_cap, out_cap,
                          limits, bases, permutes, min_lens, selectors,
                          n_selectors, eob, sym_to_byte, pidx,
                          power_k=POWER_K_DEFAULT):
    """All-device bzip2 block decode: parallel Huffman walk -> RLE2
    undo -> MTF undo -> used-alphabet map -> inverse BWT -> RLE1 undo.
    The mirror of device_entropy.encode_block_full: the host supplies
    the (tiny) parsed header and downloads only the final bytes.

    Returns (out uint8[out_cap], out_count, end_bit).  `pidx` is the
    block's origPtr; `out_cap` bounds the RLE1-expanded size (callers
    that know block sizes — e.g. via table() — can pass a tight cap).
    Corrupt payloads produce wrong bytes, caught by the caller's CRC."""
    from . import jax_kernels as jk
    syms, count, end_bit = huffman_walk_dev(
        payload_bytes, bit0, nbits_cap, s_cap, n_groups, limits, bases,
        permutes, min_lens, selectors, n_selectors, eob, power_k)
    idx, total = jk.rle2_decode(syms, dbuf_cap, count)
    dense = jk.mtf_decode(idx, dbuf_cap)
    U = sym_to_byte[dense]
    packed = jk.inverse_bwt_block_masked(U, dbuf_cap, total,
                                         jnp.minimum(pidx, total - 1))
    out, out_count = jk.rle1_decode_dev(packed, out_cap, total)
    return out, out_count, end_bit


def tables_for_device(groups, n_groups):
    """Stack bzip2._decode_tables outputs into the padded int32 arrays
    huffman_walk_dev takes (the int64 limit sentinel clamps to
    BIG_LIMIT; j values are < 2^20 so any value > 2^20 is 'never')."""
    limits = np.full((n_groups, MAX_CODE_BITS + 2), -1, dtype=np.int64)
    bases = np.zeros((n_groups, MAX_CODE_BITS + 1), dtype=np.int64)
    perms = np.zeros((n_groups, 258), dtype=np.int32)
    mins = np.zeros(n_groups, dtype=np.int32)
    for g, (min_len, max_len, limit, base, permute) in enumerate(groups):
        lim = np.asarray(limit[:MAX_CODE_BITS + 2], dtype=np.int64)
        limits[g, :lim.shape[0]] = lim
        ba = np.asarray(base[:MAX_CODE_BITS + 1], dtype=np.int64)
        bases[g, :ba.shape[0]] = ba
        pe = np.asarray(permute[:258], dtype=np.int32)
        perms[g, :pe.shape[0]] = pe
        mins[g] = min_len
        # lengths below min_len must never match
        limits[g, :min_len] = -1
    limits = np.clip(limits, -1, BIG_LIMIT).astype(np.int32)
    bases = np.clip(bases, -(1 << 28), BIG_LIMIT).astype(np.int32)
    return (jnp.asarray(limits), jnp.asarray(bases), jnp.asarray(perms),
            jnp.asarray(mins))
