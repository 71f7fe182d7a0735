"""Context-parallel suffix sort: one block's rotation sort sharded over a
device mesh with O(n/d) per-device memory.

This is the CP axis from SURVEY.md §2/§5: when a single block is too
large for one chip, the prefix-doubling rounds run with every array —
block bytes, ranks, sort keys — sharded over the mesh.  Nothing is ever
all-gathered (round 1 gathered the full rank vector every round, which
made per-device memory O(n) and defeated the purpose).

Design:
* **Distributed sort = compare-split bitonic network over shards.**
  Each comparator ppermutes a full shard to its hypercube partner,
  merges locally (one lax.sort of 2s elements), and keeps the low or
  high half.  Any sorting network stays correct when comparators are
  replaced by merge-splits on locally-sorted blocks (0-1 principle), so
  the memory bound is a strict 2s per operand — no sample-sort bucket
  slabs, no skew overflow cases.  d must be a power of two.
* **Shifted ranks via two ring ppermutes.**  rank[(i+k) mod n] for a
  contiguous position shard is a contiguous window spanning at most two
  neighbor shards; with the round schedule unrolled (k static per
  round), the source devices are static ppermute pairs.
* **Quad rounds** (sort by rank@0,k,2k,3k — the same 4-key trick as the
  single-chip kernel) with replicated early-exit: rounds are statically
  unrolled and gated by a psum-derived predicate every device agrees
  on, so skipped rounds skip their collectives safely.
* **Seed keys sharded**: 16 bytes of context per position needs only
  the next shard's first 15 bytes (one ring ppermute).
* **Rank routing back to position order is another bitonic sort** keyed
  by position: positions are a permutation, so the sorted result is
  exactly evenly distributed — no padded all_to_all.

Every collective is a standard XLA primitive (`ppermute`, `psum`, tiny
`all_gather` of per-shard scalars) inside `shard_map`, so the same
program runs on the CPU test mesh and on a real multi-chip slice.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

AXIS = 'dp'


def _ppermute_to(x, pairs):
    return lax.ppermute(x, AXIS, pairs)


def _bitonic_shard_sort(arrays, num_keys, n_dev):
    """Sort shard-distributed arrays globally (ascending, device-major).

    arrays: tuple of (s,) arrays forming lexicographic (key..., payload)
    triples.  Returns same-shape arrays holding the globally sorted
    sequence's shard for this device.  Strict O(s) memory: each network
    comparator is one shard ppermute + one local 2s merge-split."""
    me = lax.axis_index(AXIS)
    arrays = lax.sort(arrays, num_keys=num_keys)
    size = 2
    while size <= n_dev:
        stride = size >> 1
        while stride >= 1:
            pairs = [(i, i ^ stride) for i in range(n_dev)]
            partner = me ^ stride
            received = tuple(_ppermute_to(a, pairs) for a in arrays)
            # canonical (low-device, high-device) concatenation: both
            # partners must sort the IDENTICAL sequence, or tied keys
            # (lax.sort is unstable across payloads) make the kept
            # halves non-complementary and elements duplicate/vanish
            am_low = me < partner
            merged = tuple(
                lax.cond(am_low,
                         lambda ab: jnp.concatenate([ab[0], ab[1]]),
                         lambda ab: jnp.concatenate([ab[1], ab[0]]),
                         (a, b))
                for a, b in zip(arrays, received))
            merged = lax.sort(merged, num_keys=num_keys)
            s = arrays[0].shape[0]
            ascending = (me & size) == 0
            keep_low = (me < partner) == ascending
            arrays = tuple(
                lax.cond(keep_low,
                         lambda m: m[:s],
                         lambda m: m[s:], m)
                for m in merged)
            stride >>= 1
        size <<= 1
    return arrays


def _shifted_window(rank_shard, k, s, n, n_dev):
    """rank[(base + j + k) mod n] for j in [0, s) — the contiguous
    window starting k past this shard, assembled from (at most) two
    statically-known source shards.  k, s, n, n_dev are Python ints at
    trace time (rounds are unrolled)."""
    dev_off = (k // s) % n_dev
    off = k % s
    src1 = [(j, (j - dev_off) % n_dev) for j in range(n_dev)]
    a = _ppermute_to(rank_shard, src1)
    if off == 0:
        return a
    src2 = [(j, (j - dev_off - 1) % n_dev) for j in range(n_dev)]
    b = _ppermute_to(rank_shard, src2)
    return lax.dynamic_slice(jnp.concatenate([a, b]), (off,), (s,))


def _distributed_rank_compress(keys, n_dev, s):
    """Group-start ranks for globally sorted key tuples: diff flags with
    the previous device's boundary, local segment-start scan seeded by a
    carried boundary start, plus tied count.  Returns (rank_sorted,
    tied_psum)."""
    me = lax.axis_index(AXIS)
    base = me * s
    prevs = [
        _ppermute_to(kk[-1], [(i, (i + 1) % n_dev) for i in range(n_dev)])
        for kk in keys]
    first_diff = jnp.where(
        me == 0, True,
        jnp.stack([kk[0] != pv for kk, pv in zip(keys, prevs)]).any())
    diff = jnp.zeros(s, dtype=jnp.bool_).at[0].set(first_diff)
    for kk in keys:
        d = jnp.zeros(s, dtype=jnp.bool_)
        d = d.at[1:].set(kk[1:] != kk[:-1])
        diff = diff | d
    gpos = base + jnp.arange(s, dtype=jnp.int32)
    # local segment starts; positions before the first local diff belong
    # to a segment starting on an earlier device — its start index is
    # the max over earlier devices of their last segment start, carried
    # by a ring max-scan over shards (log-free: one all_gather of one
    # scalar per device)
    local_start = lax.associative_scan(
        jnp.maximum, jnp.where(diff, gpos, -1))
    last_start = local_start[-1]   # >= 0 iff any diff on or before here
    all_last = lax.all_gather(last_start, AXIS, tiled=False)  # (d,)
    carry = jnp.max(jnp.where(jnp.arange(n_dev) < me, all_last, -1))
    rank_sorted = jnp.where(local_start >= 0, local_start, carry)
    # tied count: elements whose group has size > 1.  With group-start
    # ranks an element is a singleton iff a diff flag sits on it AND on
    # its successor (next element anywhere in the global order).
    nxt_first = _ppermute_to(diff[0],
                             [(i, (i - 1) % n_dev) for i in range(n_dev)])
    nxt = jnp.concatenate(
        [diff[1:], jnp.where(me == n_dev - 1, True, nxt_first)[None]])
    singleton = diff & nxt
    tied = lax.psum(s - jnp.sum(singleton.astype(jnp.int32)), AXIS)
    return rank_sorted, tied


def _route_to_positions(vi, vals, n_dev, s):
    """Scatter (position, value) pairs back to position-sharded layout
    via a bitonic sort keyed by position (a permutation, so the result
    is exactly even)."""
    vi2, vals2 = _bitonic_shard_sort((vi, vals), 1, n_dev)
    return vals2


def sharded_cyclic_suffix_sort(mesh, block, rounds=None, gather=True):
    """Cyclic rotation sort of `block` (uint8[n]) with every array
    sharded over the mesh; per-device live memory is O(n/d).  n must
    divide evenly by the mesh size, which must be a power of two.
    Returns the sorted rotation order: replicated (int32[n]) when
    gather=True, position-of-rank sharded otherwise."""
    n = int(block.shape[0])
    n_dev = int(mesh.devices.size)
    assert n % n_dev == 0, 'block length must divide the mesh size'
    assert n_dev & (n_dev - 1) == 0, 'mesh size must be a power of two'
    s = n // n_dev
    k0 = 16
    # static quad-round schedule: k0 * 4^t until the context covers n
    ks = []
    k = k0
    while k < n:
        ks.append(k)
        k *= 4
    if rounds is not None:
        ks = ks[:rounds]

    def program(block_sharded):
        me = lax.axis_index(AXIS)
        base = me * s
        gpos = base + jnp.arange(s, dtype=jnp.int32)
        # --- seed keys: 16 bytes of cyclic context per position; the
        # tail needs the next shard's first 15 bytes (one ring ppermute)
        nxt = _ppermute_to(block_sharded,
                           [(i, (i - 1) % n_dev) for i in range(n_dev)])
        ext = jnp.concatenate([block_sharded, nxt[:15]]).astype(jnp.uint32)

        def word(d):
            return ((ext[d:d + s] << 24) | (ext[d + 1:d + 1 + s] << 16) |
                    (ext[d + 2:d + 2 + s] << 8) | ext[d + 3:d + 3 + s])

        keys = (word(0), word(4), word(8), word(12))
        srt = _bitonic_shard_sort(keys + (gpos,), 4, n_dev)
        rank_sorted, tied = _distributed_rank_compress(srt[:4], n_dev, s)
        order = srt[4]
        rank_shard = _route_to_positions(order, rank_sorted, n_dev, s)

        # --- unrolled quad rounds, each gated by the replicated tied
        # count (all devices agree, so skipping collectives is safe)
        for k in ks:
            def round_body(args):
                rank_shard, order = args
                r2 = _shifted_window(rank_shard, k, s, n, n_dev)
                r3 = _shifted_window(rank_shard, 2 * k % n, s, n, n_dev)
                r4 = _shifted_window(rank_shard, 3 * k % n, s, n, n_dev)
                srt = _bitonic_shard_sort(
                    (rank_shard, r2, r3, r4, gpos), 4, n_dev)
                rank_sorted, tied2 = _distributed_rank_compress(
                    srt[:4], n_dev, s)
                new_rank = _route_to_positions(srt[4], rank_sorted,
                                               n_dev, s)
                return new_rank, srt[4]

            rank_shard, order = lax.cond(
                tied > 0, round_body, lambda a: a, (rank_shard, order))
            # recompute tied lazily: piggyback on next round's compress
            # would be cheaper, but the predicate must be current
            if k != ks[-1]:
                tied = lax.cond(
                    tied > 0,
                    lambda rs: _recount_tied(rs, n_dev, s),
                    lambda rs: tied, rank_shard)

        # --- final order with (rank asc, index desc) tie-break for
        # pathological periodic blocks
        _, _, order = _bitonic_shard_sort((rank_shard, -gpos, gpos), 2,
                                          n_dev)
        if gather:
            return lax.all_gather(order, AXIS, tiled=True)
        return order

    out_spec = P() if gather else P(AXIS)
    f = shard_map(program, mesh=mesh, in_specs=P(AXIS),
                  out_specs=out_spec, check_vma=False)
    return jax.jit(f)(block)


def _recount_tied(rank_shard, n_dev, s):
    """Tied-element count from position-sharded group-start ranks: an
    element is tied iff another element shares its rank.  Ranks with
    group-start semantics make this local-checkable after one sort."""
    gpos = (lax.axis_index(AXIS) * s
            + jnp.arange(s, dtype=jnp.int32))
    r_sorted, _ = _bitonic_shard_sort((rank_shard, gpos), 1, n_dev)
    prev = _ppermute_to(r_sorted[-1],
                        [(i, (i + 1) % n_dev) for i in range(n_dev)])
    nxt = _ppermute_to(r_sorted[0],
                       [(i, (i - 1) % n_dev) for i in range(n_dev)])
    me = lax.axis_index(AXIS)
    left = jnp.concatenate(
        [jnp.where(me == 0, -1, prev)[None], r_sorted[:-1]])
    right = jnp.concatenate(
        [r_sorted[1:], jnp.where(me == n_dev - 1, -2, nxt)[None]])
    tied_local = (r_sorted == left) | (r_sorted == right)
    return lax.psum(jnp.sum(tied_local.astype(jnp.int32)), AXIS)
