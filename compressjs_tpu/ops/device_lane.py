"""All-device BWTC-L block encode/decode (the lane-interleaved format).

This is where the batched coder/model kernels finally run at their
design point (SURVEY.md §2 'interleaved entropy streams'): L=128+ lanes
per block, so every `lax.scan` step advances 128 independent
coder/model chains instead of one.  Per block:

encode:  EOF BWT -> MTF -> RLE2 -> round-robin lane split ->
         fenwick_encode_streams -> batched_range_encode ->
         token_bytes -> ragged_concat (one bucketed download)
decode:  lane payload matrix -> fenwick_decode_streams (lock-step
         L-lane walk) -> interleave -> RLE2 undo -> MTF undo ->
         inverse EOF BWT (one fixed-size download)

Byte-identical to codecs.bwtcl's host implementation (pinned in
tests/test_bwtcl.py via the kernel seam, and end-to-end in
tests/test_device_lane.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from . import device_coder as dc
from . import device_model as dm
from . import jax_kernels as jk

F_PROB_MAX = 0xFF00
F_PROB_INCR = 0x0100
MAX_N = 258          # fenwick tree bucket (asize+2 <= 258)


def lane_caps(bs, lanes):
    """(T, tok_cap, lane_byte_cap) static shapes for a block size."""
    T = -(-(bs + 1) // lanes)
    # 2 triple slots per symbol can each emit <= 1 token; plus the
    # 5-token finish tail.  (Typical text uses ~0.3*T tokens.)
    tok_cap = 2 * T + 8
    return T, tok_cap, 3 * T + 64


@functools.partial(jax.jit, static_argnums=(2,))
def ragged_concat(byts, lens, out_cap):
    """Concatenate L ragged rows (byts (L, W) uint8, valid prefix
    lens) into one (out_cap,) array + total — so a block's lane
    payloads download in ONE transfer."""
    L, W = byts.shape
    lens = lens.astype(jnp.int32)
    offsets = jnp.cumsum(lens) - lens
    total = jnp.sum(lens)
    out_idx = jnp.arange(out_cap, dtype=jnp.int32)
    mark = jnp.zeros(out_cap + 1, dtype=jnp.int32)
    mark = mark.at[jnp.where(lens > 0, offsets, out_cap + 1)].max(
        jnp.arange(L, dtype=jnp.int32), mode='drop')
    lane_at = lax.associative_scan(jnp.maximum, mark[:out_cap])
    pos = out_idx - offsets[lane_at]
    flat = byts.reshape(-1)
    val = flat[lane_at * W + jnp.clip(pos, 0, W - 1)]
    return jnp.where(out_idx < total, val, 0).astype(jnp.uint8), total


@functools.partial(jax.jit, static_argnums=(1, 2))
def encode_block_lanes(block, bs, lanes, remap, asize):
    """One BWTC-L block, all stages on device.

    block: uint8[bs]; remap: int32[256] byte->dense map; asize: traced
    used-alphabet size.  Returns (pidx, S, lane_lens (lanes,), flat
    bytes (cap,), total_bytes, max_tok) — max_tok > tok_cap or
    total > cap signals overflow (host fallback)."""
    T, tok_cap, _ = lane_caps(bs, lanes)
    U, pidx = jk.bwt_eof_block(block, bs)
    dense = remap[U.astype(jnp.int32)]
    mtf = jk.mtf_encode(dense, bs, 512, 256)
    syms, cnt, _ = jk.rle2_encode(mtf, bs, jnp.int32(0))
    S = cnt - 1                       # drop the bzip2-style EOB slot
    pad = T * lanes - (bs + 1)
    padded = jnp.concatenate(
        [syms.astype(jnp.int32), jnp.zeros(pad, jnp.int32)]) \
        if pad else syms.astype(jnp.int32)
    lanemat = padded.reshape(T, lanes).T          # lane l slot t
    slot = (jnp.arange(T, dtype=jnp.int32)[None, :] * lanes +
            jnp.arange(lanes, dtype=jnp.int32)[:, None])
    valid = slot < S
    Ns = jnp.full(lanes, asize + 2, jnp.int32)
    sy, lt, tot, v = dm.fenwick_encode_streams(
        lanemat, valid, Ns, MAX_N, F_PROB_MAX, F_PROB_INCR)
    tokens, tok_n, bc = dc.batched_range_encode(
        sy, lt, tot, v, jnp.zeros(lanes, jnp.uint32),
        jnp.zeros(lanes, jnp.uint32), tok_cap)
    _, _, cap = lane_caps(bs, lanes)
    byts, lens = dc.token_bytes(tokens, tok_n, bc, cap)
    flat_cap = bs + (bs >> 1) + 4096
    flat, total = ragged_concat(byts, lens, flat_cap)
    return pidx, S, lens, flat, total, jnp.max(tok_n)


@functools.partial(jax.jit, static_argnums=(1, 2))
def decode_block_lanes(paymat, bs, lanes, S, pidx, asize, sym_map):
    """Invert encode_block_lanes: paymat (lanes, lane_byte_cap) uint8
    (each row one lane's stream, zero-padded), sym_map int32[256]
    dense->byte.  Returns the block bytes uint8[bs]."""
    T, _, _ = lane_caps(bs, lanes)
    low, rng, buf, pos = dc.dec_start_state(
        paymat, jnp.ones(lanes, jnp.int32))
    st = jnp.stack([low, rng, buf, pos.astype(jnp.uint32)], axis=1)
    slot = (jnp.arange(T, dtype=jnp.int32)[None, :] * lanes +
            jnp.arange(lanes, dtype=jnp.int32)[:, None])
    valid = slot < S
    Ns = jnp.full(lanes, asize + 2, jnp.int32)
    symmat, _ = dm.fenwick_decode_streams(
        paymat, st, Ns, MAX_N, F_PROB_MAX, F_PROB_INCR,
        step_valid=valid)
    syms_flat = symmat.T.reshape(-1)              # slot t*lanes + l
    mtf_idx, total = jk.rle2_decode(
        jnp.where(jnp.arange(T * lanes) < S, syms_flat, 2).astype(
            jnp.int16), bs, S)
    dense = jk.mtf_decode(mtf_idx, bs)
    U = sym_map[dense]
    out = jk.inverse_bwt_eof_block(U.astype(jnp.uint8), bs, pidx)
    return out, total
