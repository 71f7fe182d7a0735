"""Batched adaptive FenwickModel on device (SURVEY.md §7 step 5).

The host model's heap-layout u32 tree (models.fenwick_model, reference
FenwickModel.js:13-172) maps directly to a (L, 2*maxN) device array: L
independent lanes (BWTCP blocks, or interleaved sub-streams) walk their
trees leaf->root per symbol, emitting (sy_f, lt_f, tot_f) triples for
the batched device range coder (ops.device_coder).  Semantics are
bit-exact with the host model — escape sub-encode first, the
last-escape removal rule, and the halving rescale with re-escape — so a
device-encoded BWTCP block payload equals the host's byte for byte.

Lanes may have different alphabet sizes (N per lane, padded to a static
maxN); masks keep each lane's walk inside its own tree.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

ESC_MASK = jnp.uint32(0x0000FFFF)
SYM_MASK = jnp.uint32(0xFFFF0000)
SYM_SHIFT = 16
SCALE_MASK = jnp.uint32(0xFFFEFFFE)


def fenwick_init(Ns, max_n, increment):
    """Initial (L, 2*max_n) trees for per-lane num_syms Ns (host
    FenwickModel.__init__): leaves esc=1 for the size=N-1 symbols, the
    escape leaf carries the increment, then the bottom-up sum."""
    L = Ns.shape[0]
    width = 2 * max_n
    cols = jnp.arange(width, dtype=jnp.int32)[None, :]
    N = Ns[:, None]
    leaf = (cols >= N) & (cols < N + (N - 1))          # symbols 0..size-1
    esc_leaf = cols == (2 * N - 1)                     # the escape symbol
    tree = jnp.where(leaf, jnp.uint32(1), jnp.uint32(0))
    tree = jnp.where(esc_leaf, jnp.uint32(increment) << SYM_SHIFT, tree)
    return _sum_tree(tree, Ns, max_n)


def _sum_tree(tree, Ns, max_n):
    """Bottom-up internal sums, exactly the host loop i = N-1 .. 1 —
    level by level so every parent reads already-final children; nodes
    >= each lane's N are that lane's leaves and must not be touched."""
    width = tree.shape[1]
    N = Ns[:, None]
    # iterate levels [2^k, 2^{k+1}) from the deepest internal level down
    k = (max_n - 1).bit_length()
    for lev in range(k, -1, -1):
        lo = 1 << lev
        hi = min(lo * 2, 2 * max_n)
        idx = jnp.arange(lo, hi, dtype=jnp.int32)
        child = 2 * idx
        c0 = jnp.where(child < width, child, 0)
        c1 = jnp.where(child + 1 < width, child + 1, 0)
        s = (jnp.where(child[None, :] < width, tree[:, c0], 0) +
             jnp.where(child[None, :] + 1 < width, tree[:, c1], 0))
        internal = idx[None, :] < N                    # per-lane mask
        tree = tree.at[:, lo:hi].set(
            jnp.where(internal, s, tree[:, lo:hi]))
    return tree


def _walk_update(tree, lane_ids, Ns, sym, update, active, max_n):
    """Leaf->root walk for one symbol per lane: accumulates the raw
    left-sibling sum, adds `update` along the path including the root.
    Returns (tree, raw_leaf, raw_lt, raw_tot)."""
    width = 2 * max_n
    i = Ns + sym
    raw_leaf = tree[lane_ids, jnp.minimum(i, width - 1)]
    lt = jnp.zeros_like(raw_leaf)
    depth = (2 * max_n - 1).bit_length()
    for _ in range(depth):
        cont = (i > 1) & active
        is_right = (i & 1) == 1
        left_sib = tree[lane_ids, jnp.maximum(i - 1, 0)]
        lt = jnp.where(cont & is_right, lt + left_sib, lt)
        col = jnp.where(cont, i, width)
        tree = tree.at[lane_ids, col].add(
            jnp.where(cont, update, 0), mode='drop')
        i = jnp.where(cont, i >> 1, i)
    raw_tot = tree[lane_ids, 1]
    tree = tree.at[lane_ids, jnp.where(active, 1, width)].add(
        jnp.where(active, update, 0), mode='drop')
    return tree, raw_leaf, lt, raw_tot


def _rescale(tree, Ns, max_n, increment):
    """Host _rescale, vectorized: halve symbol leaves (kept if carrying
    an escape), re-escape zeros, special-case the escape leaf, resum."""
    width = 2 * max_n
    cols = jnp.arange(width, dtype=jnp.int32)[None, :]
    N = Ns[:, None]
    sym_leaf = (cols >= N) & (cols < 2 * N - 1)
    esc_leaf = cols == 2 * N - 1
    prob = tree
    has_esc = (prob & ESC_MASK) != 0
    halved = (prob & SCALE_MASK) >> 1
    newly = sym_leaf & ~has_esc & (halved == 0)
    new_sym = jnp.where(has_esc, prob, jnp.where(newly, jnp.uint32(1),
                                                 halved))
    escape_pending = sym_leaf & (has_esc | newly)
    no_escape = ~jnp.any(escape_pending, axis=1)
    e_halved = (prob & SCALE_MASK) >> 1
    new_esc = jnp.where(no_escape[:, None], jnp.uint32(0),
                        jnp.where(e_halved == 0,
                                  jnp.uint32(1) << SYM_SHIFT, e_halved))
    tree = jnp.where(sym_leaf, new_sym,
                     jnp.where(esc_leaf, new_esc, tree))
    return _sum_tree(tree, Ns, max_n)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def fenwick_decode_streams(payload, coder_state, Ns, max_n, max_prob,
                           increment, step_valid=None):
    """Decode (L, T) symbol streams through per-lane Fenwick models —
    the decode mirror of fenwick_encode_streams, with the range DECODER
    fused into the scan (the root->leaf walk depends on each decoded
    cumulative frequency, so coder and model cannot be split the way
    the encode side splits them).

    payload: (L, B) uint8 per-lane coder bytes; coder_state: (L, 4+)
    int64/int32 (low, range, buffer, next_pos) — the host coder's
    export_dec_state seam, so a host-started stream continues on
    device.  step_valid (L, T): mask of steps to actually decode (a
    lane's coder/model state stops advancing once invalid).

    Returns (symbols (L, T) int32, state tuple (low, rng, buffer,
    next_pos)) — symbols in [0, N-2] (escapes are resolved internally,
    exactly host FenwickModel.decode())."""
    from . import device_coder as dc
    L = payload.shape[0]
    lane_ids = jnp.arange(L, dtype=jnp.int32)
    Ns = Ns.astype(jnp.int32)
    tree0 = fenwick_init(Ns, max_n, increment)
    upd_sym = jnp.uint32(increment) << SYM_SHIFT
    width = 2 * max_n
    depth = (2 * max_n - 1).bit_length()
    st0 = coder_state.astype(jnp.uint32)
    state0 = (st0[:, 0], st0[:, 1], st0[:, 2],
              coder_state[:, 3].astype(jnp.int32))

    def sub_decode(tree, state, plane_esc, active):
        """One host _decode(is_escape) for the active lanes."""
        mask = jnp.where(plane_esc, ESC_MASK, SYM_MASK)
        shift = jnp.where(plane_esc, 0, SYM_SHIFT).astype(jnp.uint32)
        update = jnp.where(plane_esc, upd_sym - 1, upd_sym)
        tot = (tree[lane_ids, 1] & mask) >> shift
        state, help_, cul = dc.dec_cul_freq(state, payload, tot, active)
        i = jnp.ones(L, dtype=jnp.int32)
        lt = jnp.zeros(L, dtype=jnp.uint32)
        for _ in range(depth):
            cont = (i < Ns) & active
            col = jnp.where(cont, i, width)
            tree = tree.at[lane_ids, col].add(
                jnp.where(cont, update, 0), mode='drop')
            left = (tree[lane_ids, jnp.minimum(2 * i, width - 1)]
                    & mask) >> shift
            go_right = (cul - lt) >= left
            lt = jnp.where(cont & go_right, lt + left, lt)
            i = jnp.where(cont, 2 * i + go_right.astype(jnp.int32), i)
        symbol = i - Ns
        leaf_col = jnp.minimum(i, width - 1)
        sy = (tree[lane_ids, leaf_col] & mask) >> shift
        tree = tree.at[lane_ids, jnp.where(active, i, width)].add(
            jnp.where(active, update, 0), mode='drop')
        new_state = dc.dec_update(state, help_, sy, lt, tot)
        state = tuple(jnp.where(active, n, o)
                      for n, o in zip(new_state, state))
        # last-escape removal (host _decode tail)
        last = active & (symbol == Ns - 1) & \
            ((tree[lane_ids, 1] & ESC_MASK) == 1)
        negupd = jnp.uint32(0) - tree[lane_ids, leaf_col]
        j = jnp.where(last, i, 0)
        for _ in range(depth + 1):
            cont2 = j >= 1
            col = jnp.where(cont2, j, width)
            tree = tree.at[lane_ids, col].add(
                jnp.where(cont2, negupd, 0), mode='drop')
            j = j >> 1
        need = jnp.any((((tree[:, 1] & SYM_MASK) >> SYM_SHIFT)
                        >= max_prob) & active)
        tree = lax.cond(
            need,
            lambda t: jnp.where(
                ((((t[:, 1] & SYM_MASK) >> SYM_SHIFT) >= max_prob)
                 & active)[:, None],
                _rescale(t, Ns, max_n, increment), t),
            lambda t: t, tree)
        return tree, state, symbol

    def step(carry, active):
        tree, state = carry
        tree, state, sym1 = sub_decode(
            tree, state, jnp.zeros(L, jnp.bool_), active)
        escaped = active & (sym1 == Ns - 1)
        tree, state, sym2 = sub_decode(
            tree, state, jnp.ones(L, jnp.bool_), escaped)
        sym = jnp.where(escaped, sym2, sym1)
        return (tree, state), sym

    (tree, state), syms = lax.scan(step, (tree0, state0), step_valid.T)
    return syms.T.astype(jnp.int32), state


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def fenwick_encode_streams(symbols, step_valid, Ns, max_n, max_prob,
                           increment):
    """Encode (L, T) symbol streams through per-lane Fenwick models.

    Returns (sy, lt, tot, valid) of shape (L, 2*T): two triple slots per
    input symbol (escape + literal; the first is masked invalid when no
    escape fired).  Feed to ops.device_coder.batched_range_encode."""
    L, T = symbols.shape
    lane_ids = jnp.arange(L, dtype=jnp.int32)
    Ns = Ns.astype(jnp.int32)
    tree0 = fenwick_init(Ns, max_n, increment)
    upd_sym = jnp.uint32(increment) << SYM_SHIFT

    def sub_encode(tree, sym, plane_esc, active, raw_pre=None):
        """One host encode() body WITHOUT the recursive escape part:
        plane_esc picks the plane; caller guarantees no further escape.
        raw_pre: the leaf value read BEFORE the escape recursion — the
        host masks sy_f from that stale read (a quirk a rescale inside
        the recursion makes observable), so the caller passes it in."""
        width = 2 * max_n
        i = Ns + sym
        raw = tree[lane_ids, jnp.minimum(i, width - 1)]
        root = tree[lane_ids, 1]
        # last-escape removal: encoding the escape symbol as a literal
        # while exactly one escape remains zeroes its leaf
        last_esc = (~plane_esc) & (sym == Ns - 1) & \
            ((root & ESC_MASK) == 1)
        update = jnp.where(plane_esc, upd_sym - 1,
                           jnp.where(last_esc, jnp.uint32(0) - raw,
                                     upd_sym))
        tree, raw_leaf, raw_lt, raw_tot = _walk_update(
            tree, lane_ids, Ns, sym, update, active, max_n)
        sy_src = raw_leaf if raw_pre is None else raw_pre
        mask = jnp.where(plane_esc, ESC_MASK, SYM_MASK)
        shift = jnp.where(plane_esc, 0, SYM_SHIFT).astype(jnp.uint32)
        sy = (sy_src & mask) >> shift
        lt = (raw_lt & mask) >> shift
        tot = (raw_tot & mask) >> shift
        # host rescales at the end of every encode() call
        need = jnp.any(((tree[:, 1] & SYM_MASK) >> SYM_SHIFT)
                       >= max_prob)
        tree = lax.cond(
            need,
            lambda t: jnp.where(
                (((t[:, 1] & SYM_MASK) >> SYM_SHIFT)
                 >= max_prob)[:, None],
                _rescale(t, Ns, max_n, increment), t),
            lambda t: t, tree)
        return tree, sy, lt, tot

    def step(tree, xs):
        sym, active = xs
        width = 2 * max_n
        raw = tree[lane_ids, jnp.minimum(Ns + sym, width - 1)]
        escapes = ((raw & SYM_MASK) == 0) & active
        # sub-step 1: the escape symbol (SYM plane) for escaping lanes
        tree, sy1, lt1, tot1 = sub_encode(
            tree, jnp.where(escapes, Ns - 1, sym), jnp.zeros_like(escapes),
            escapes)
        # sub-step 2: the symbol itself, in ESC plane if it escaped;
        # sy_f comes from the pre-recursion leaf read (host quirk)
        tree, sy2, lt2, tot2 = sub_encode(tree, sym, escapes, active,
                                          raw_pre=raw)
        return tree, (sy1, lt1, tot1, escapes, sy2, lt2, tot2, active)

    _, outs = lax.scan(step, tree0, (symbols.T.astype(jnp.int32),
                                     step_valid.T))
    sy1, lt1, tot1, v1, sy2, lt2, tot2, v2 = outs
    # interleave the two slots: (T, L) pairs -> (L, 2T)
    sy = jnp.stack([sy1, sy2], axis=1).reshape(2 * T, L).T
    lt = jnp.stack([lt1, lt2], axis=1).reshape(2 * T, L).T
    tot = jnp.stack([tot1, tot2], axis=1).reshape(2 * T, L).T
    valid = jnp.stack([v1, v2], axis=1).reshape(2 * T, L).T
    return sy, lt, tot, valid
