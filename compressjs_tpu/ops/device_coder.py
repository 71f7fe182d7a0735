"""Batched (lane-parallel) Schindler range coder on device.

One range coder's carry chain is inherently sequential, so the TPU form
batches INDEPENDENT streams: lane l encodes its own (sy_f, lt_f, tot_f)
triple stream with byte-exact reference semantics
(coders.range_coder.RangeCoder, reference RangeCoder.js:14-225).  Lanes
are bzip2/BWTCP blocks, or the interleaved sub-streams of one block in
the lane-parallel BWTC-class mode (SURVEY.md §2 'interleaved entropy
streams').

Emission is tokenized: each normalize iteration appends at most one
(byte, run_length, fill) token per lane — the pending-carry 0xFF/0x00
runs become run tokens instead of data-dependent writes — and the byte
streams materialize afterwards with the standard offsets/segment-gather
expansion.  encode_shift is folded into encode_freq (identical
arithmetic when tot_f = 1 << shift, including the range update branch).

Scaling note: throughput = lanes / step-latency; with L equal to the
block count this kernel is a correctness/parity build (hundreds of
thousands of sequential scan steps), with L in the hundreds (interleaved
mode) it becomes a real encoder.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

TOP = jnp.uint32(1 << 31)
BOTTOM = jnp.uint32(1 << 23)
SHIFT_BITS = 23
MASK32 = jnp.uint32(0xFFFFFFFF)


def _normalize_iter(state, tokens, tok_n, lane_ids, active_lane):
    """One enc_normalize loop iteration for every lane (masked)."""
    low, rng, buffer, help_, bytecount = state
    need = (rng <= BOTTOM) & active_lane
    cond1 = low < jnp.uint32(0xFF << SHIFT_BITS)
    cond2 = (low & TOP) != 0
    emit = need & (cond1 | cond2)
    byte = jnp.where(cond1, buffer, (buffer + 1) & 0xFF)
    fill = jnp.where(cond1, jnp.uint32(0xFF), jnp.uint32(0x00))
    # append token (byte, help run, fill) at this lane's token cursor
    col = jnp.where(emit, tok_n, tokens.shape[1])
    tokens = tokens.at[lane_ids, col, 0].set(byte, mode='drop')
    tokens = tokens.at[lane_ids, col, 1].set(help_, mode='drop')
    tokens = tokens.at[lane_ids, col, 2].set(fill, mode='drop')
    tok_n = tok_n + emit.astype(jnp.int32)
    buffer = jnp.where(emit, (low >> SHIFT_BITS) & 0xFF, buffer)
    help_ = jnp.where(emit, 0, jnp.where(need, help_ + 1, help_))
    rng = jnp.where(need, (rng << 8) & MASK32, rng)
    low = jnp.where(need, (low << 8) & (TOP - 1), low)
    bytecount = jnp.where(need, bytecount + 1, bytecount)
    return (low, rng, buffer, help_, bytecount), tokens, tok_n


@functools.partial(jax.jit, static_argnums=(6,))
def batched_range_encode(sy_f, lt_f, tot_f, step_valid, first_byte,
                         init_len, tok_cap=None, init_state=None):
    """Encode L independent triple streams.

    sy_f/lt_f/tot_f: (L, T) uint32 (tot_f < 2^23; encode_shift calls are
    expressed as tot_f = 1 << shift); step_valid: (L, T) bool (lanes may
    be ragged); first_byte: (L,) the encode_start free byte; init_len:
    (L,) initial bytecount.  init_state (L, 5) int64 — exported host
    coder states (low, range, buffer, help, bytecount), the same seam
    the native runtime uses (RangeCoder.export_enc_state) — overrides
    first_byte/init_len to continue mid-stream coders on device.

    Returns (tokens (L, cap, 3) uint32, tok_counts (L,), bytecounts
    (L,)) — materialize with token_bytes()."""
    L, T = sy_f.shape
    cap = tok_cap if tok_cap is not None else 3 * T + 8
    lane_ids = jnp.arange(L, dtype=jnp.int32)
    tokens = jnp.zeros((L, cap, 3), dtype=jnp.uint32)
    tok_n = jnp.zeros(L, dtype=jnp.int32)
    if init_state is not None:
        st = init_state.astype(jnp.uint32)
        state = (st[:, 0], st[:, 1], st[:, 2], st[:, 3], st[:, 4])
    else:
        state = (jnp.zeros(L, jnp.uint32),                 # low
                 jnp.full(L, TOP, jnp.uint32),             # range
                 first_byte.astype(jnp.uint32),            # buffer
                 jnp.zeros(L, jnp.uint32),                 # help
                 init_len.astype(jnp.uint32))              # bytecount

    def step(carry, xs):
        state, tokens, tok_n = carry
        sy, lt, tot, valid = xs
        # enc_normalize: at most 3 iterations bring range above BOTTOM
        for _ in range(3):
            state, tokens, tok_n = _normalize_iter(
                state, tokens, tok_n, lane_ids, valid)
        low, rng, buffer, help_, bytecount = state
        r = rng // jnp.maximum(tot, 1)
        tmp = r * lt
        low2 = low + tmp
        rng2 = jnp.where(lt + sy < tot, r * sy, rng - tmp)
        low = jnp.where(valid, low2, low)
        rng = jnp.where(valid, rng2, rng)
        return ((low, rng, buffer, help_, bytecount), tokens, tok_n), None

    (state, tokens, tok_n), _ = lax.scan(
        step, (state, tokens, tok_n),
        (sy_f.T.astype(jnp.uint32), lt_f.T.astype(jnp.uint32),
         tot_f.T.astype(jnp.uint32), step_valid.T))

    # encode_finish: final normalize, then the 5-byte tail
    always = jnp.ones(L, dtype=jnp.bool_)
    for _ in range(3):
        state, tokens, tok_n = _normalize_iter(
            state, tokens, tok_n, lane_ids, always)
    low, rng, buffer, help_, bytecount = state
    bytecount = bytecount + 5
    tmp = low >> SHIFT_BITS
    round_up = (low & (BOTTOM - 1)) >= ((bytecount & 0xFFFFFF) >> 1)
    tmp = tmp + round_up.astype(jnp.uint32)
    carry = tmp > 0xFF
    byte = jnp.where(carry, (buffer + 1) & 0xFF, buffer)
    fill = jnp.where(carry, jnp.uint32(0x00), jnp.uint32(0xFF))
    tokens = tokens.at[lane_ids, tok_n, 0].set(byte, mode='drop')
    tokens = tokens.at[lane_ids, tok_n, 1].set(help_, mode='drop')
    tokens = tokens.at[lane_ids, tok_n, 2].set(fill, mode='drop')
    tok_n = tok_n + 1
    # four literal tail bytes: tmp & 0xFF, then the 24-bit bytecount
    for val in (tmp & 0xFF, (bytecount >> 16) & 0xFF,
                (bytecount >> 8) & 0xFF, bytecount & 0xFF):
        tokens = tokens.at[lane_ids, tok_n, 0].set(val, mode='drop')
        tokens = tokens.at[lane_ids, tok_n, 1].set(0, mode='drop')
        tok_n = tok_n + 1
    return tokens, tok_n, bytecount


EXTRA_BITS = 7   # (CODE_BITS - 2) % 8 + 1, RangeCoder.js:16


def dec_start_state(payload, pos):
    """Per-lane decoder state after decode_start(skip_initial_read):
    payload (L, B) uint8, pos (L,) byte index of the first coder byte.
    Returns (low, range, buffer, pos) uint32/int32 lane vectors."""
    L = payload.shape[0]
    lanes = jnp.arange(L, dtype=jnp.int32)
    buf = payload[lanes, jnp.minimum(pos, payload.shape[1] - 1)] \
        .astype(jnp.uint32)
    low = buf >> (8 - EXTRA_BITS)
    rng = jnp.full(L, 1 << EXTRA_BITS, jnp.uint32)
    return low, rng, buf, pos + 1


def _dec_normalize(state, payload, active):
    """Masked _dec_normalize for every lane (<=4 iterations bring range
    above BOTTOM; reads past the payload end yield the host coder's
    EOF semantics: read_byte() -> -1, whose masked uint32 bits are what
    the reference's JS >>> arithmetic sees)."""
    low, rng, buf, pos = state
    L, B = payload.shape
    lanes = jnp.arange(L, dtype=jnp.int32)
    for _ in range(4):
        need = (rng <= BOTTOM) & active
        nxt = jnp.where(
            pos < B,
            payload[lanes, jnp.minimum(pos, B - 1)].astype(jnp.uint32),
            jnp.uint32(0xFFFFFFFF))          # EOF byte -1
        low2 = ((low << 8) | ((buf << EXTRA_BITS) & 0xFF)) & MASK32
        low2 = (low2 | (nxt >> (8 - EXTRA_BITS))) & MASK32
        low = jnp.where(need, low2, low)
        buf = jnp.where(need, nxt & 0xFF, buf)
        pos = jnp.where(need, pos + 1, pos)
        rng = jnp.where(need, (rng << 8) & MASK32, rng)
    return low, rng, buf, pos


def dec_cul_freq(state, payload, tot, active):
    """decode_cul_freq for every lane: returns (state', help, cul)."""
    low, rng, buf, pos = _dec_normalize(state, payload, active)
    help_ = rng // jnp.maximum(tot, 1)
    tmp = low // jnp.maximum(help_, 1)
    cul = jnp.where(tmp >= tot, tot - 1, tmp)
    return (low, rng, buf, pos), help_, cul


def dec_update(state, help_, sy, lt, tot):
    """decode_update for every lane."""
    low, rng, buf, pos = state
    tmp = help_ * lt
    low = (low - tmp) & MASK32
    rng = jnp.where(lt + sy < tot, help_ * sy, rng - tmp)
    return (low, rng, buf, pos)


@functools.partial(jax.jit, static_argnums=(3,))
def token_bytes(tokens, tok_counts, bytecounts, out_cap):
    """Materialize per-lane byte streams from (byte, run, fill) tokens.
    Returns (bytes (L, out_cap) uint8, lengths (L,)).  The first token's
    byte is the encode_start free byte, exactly as the host coder's
    first write_byte."""
    L, cap, _ = tokens.shape

    def one_lane(toks, n_tok):
        t_idx = jnp.arange(cap, dtype=jnp.int32)
        tvalid = t_idx < n_tok
        out_cnt = jnp.where(tvalid, 1 + toks[:, 1].astype(jnp.int32), 0)
        offsets = jnp.cumsum(out_cnt) - out_cnt
        total = jnp.sum(out_cnt)
        out_idx = jnp.arange(out_cap, dtype=jnp.int32)
        mark = jnp.zeros(out_cap + 1, dtype=jnp.int32)
        mark = mark.at[jnp.where(out_cnt > 0, offsets, out_cap + 1)].max(
            t_idx, mode='drop')
        iat = lax.associative_scan(jnp.maximum, mark[:out_cap])
        is_first = out_idx == offsets[iat]
        val = jnp.where(is_first, toks[iat, 0], toks[iat, 2])
        out = jnp.where(out_idx < total, val, 0)
        return out.astype(jnp.uint8), total

    return jax.vmap(one_lane)(tokens, tok_counts)
