"""Context-parallel suffix sort: one block's rotation sort sharded over a
device mesh.

This is the CP axis from SURVEY.md §2/§5: when a single block is too
large (or too slow) for one chip, the prefix-doubling rounds run with the
rank array sharded over the mesh.  Each round is:

  1. shifted ranks  — `jnp.roll` by the doubling distance across shards
     (implemented on the all-gathered rank vector; the exchange rides the
     ICI as one all-gather per round)
  2. distributed two-key sort — sample sort: local sort, splitter
     selection via gathered samples, bucket partition, padded
     `lax.all_to_all` exchange, local refine
  3. rank recompression — boundary-aware diff flags plus a distributed
     exclusive scan (local cumsum + shard-offset exchange)
  4. rank scatter — routed back to position-sharded layout with a second
     padded `all_to_all`

Every collective is a standard XLA primitive (`all_gather`,
`all_to_all`, `ppermute`) inside `shard_map`, so the same program runs
on the CPU test mesh and on a real multi-chip slice.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import jax_kernels as jk

AXIS = 'dp'


def _dist_sort_triples(k1, k2, vi, n_dev, pad_factor=3):
    """Distributed two-key sort of (k1, k2, vi) shards via sample sort.

    Each device holds s items.  Returns the device's shard of the
    globally sorted sequence (exactly s items, even redistribution)."""
    s = k1.shape[0]
    me = lax.axis_index(AXIS)

    # local sort
    k1, k2, vi = lax.sort((k1, k2, vi), num_keys=2)

    # splitters: sample s/n_dev evenly from each device, gather, sort,
    # take every n_dev-th as the global splitter set
    n_samples = max(n_dev, 1)
    step = max(s // n_samples, 1)
    samples1 = k1[::step][:n_samples]
    samples2 = k2[::step][:n_samples]
    all1 = lax.all_gather(samples1, AXIS, tiled=True)
    all2 = lax.all_gather(samples2, AXIS, tiled=True)
    all1, all2 = lax.sort((all1, all2), num_keys=2)
    idxs = (jnp.arange(1, n_dev, dtype=jnp.int32) * n_samples)
    split1 = all1[idxs]          # (n_dev-1,)
    split2 = all2[idxs]

    # destination bucket of each local item: count of splitters <= item
    # (lexicographic two-key compare)
    less = ((split1[None, :] < k1[:, None]) |
            ((split1[None, :] == k1[:, None]) &
             (split2[None, :] <= k2[:, None])))
    dest = jnp.sum(less.astype(jnp.int32), axis=1)      # (s,) in [0,n_dev)

    # pack buckets into (n_dev, cap) padded slabs; local data is sorted so
    # buckets are contiguous runs.  cap = s is the safe bound: with heavy
    # key skew (periodic blocks collapse many ranks) one bucket can take a
    # device's whole shard, and a dropped element corrupts the sort.
    cap = s
    counts = jnp.bincount(dest, length=n_dev)
    offsets = jnp.cumsum(counts) - counts               # bucket starts
    within = jnp.arange(s) - offsets[dest]
    slot = dest * cap + within
    PAD1 = jnp.int32(2147483647)
    slab1 = jnp.full(n_dev * cap, PAD1, dtype=jnp.int32)
    slab2 = jnp.full(n_dev * cap, PAD1, dtype=jnp.int32)
    slabv = jnp.full(n_dev * cap, -1, dtype=jnp.int32)
    slab1 = slab1.at[slot].set(k1, mode='drop')
    slab2 = slab2.at[slot].set(k2, mode='drop')
    slabv = slabv.at[slot].set(vi, mode='drop')

    # exchange: device d receives every device's bucket d
    r1 = lax.all_to_all(slab1.reshape(n_dev, cap), AXIS, 0, 0, tiled=False)
    r2 = lax.all_to_all(slab2.reshape(n_dev, cap), AXIS, 0, 0, tiled=False)
    rv = lax.all_to_all(slabv.reshape(n_dev, cap), AXIS, 0, 0, tiled=False)
    r1 = r1.reshape(-1)
    r2 = r2.reshape(-1)
    rv = rv.reshape(-1)

    # local refine: sort received (pads sort to the end)
    r1, r2, rv = lax.sort((r1, r2, rv), num_keys=2)
    my_count = jnp.sum(rv >= 0)

    # redistribution to exactly s items/device: global position of each
    # valid item = my bucket's global start + local index
    all_counts = lax.all_gather(my_count, AXIS, tiled=False)  # (n_dev,)
    my_start = jnp.sum(jnp.where(jnp.arange(n_dev) < me, all_counts, 0))
    gpos = my_start + jnp.arange(r1.shape[0])
    valid = rv >= 0
    tgt_dev = jnp.where(valid, gpos // s, n_dev)          # n_dev = drop
    tgt_slot = jnp.where(valid, gpos % s, 0)
    # pack per-destination again (items for one destination are contiguous
    # in gpos, at most ceil(cap*n_dev/s)+2 go anywhere -- but each device
    # receives exactly s total, and from THIS device at most s... use cap2)
    cap2 = s  # a single source can contribute at most s items overall
    within2 = tgt_slot - (tgt_dev * s - my_start)
    # within2 = local index within this device's run for that destination:
    # compute robustly: index among my items targeted at tgt_dev
    run_start_gpos = tgt_dev * s
    within2 = jnp.where(valid, gpos - jnp.maximum(run_start_gpos,
                                                  my_start), 0)
    slot2 = tgt_dev * cap2 + within2
    f1 = jnp.full((n_dev + 1) * cap2, PAD1, dtype=jnp.int32)
    f2 = jnp.full((n_dev + 1) * cap2, PAD1, dtype=jnp.int32)
    fv = jnp.full((n_dev + 1) * cap2, -1, dtype=jnp.int32)
    f1 = f1.at[slot2].set(jnp.where(valid, r1, PAD1), mode='drop')
    f2 = f2.at[slot2].set(jnp.where(valid, r2, PAD1), mode='drop')
    fv = fv.at[slot2].set(jnp.where(valid, rv, -1), mode='drop')
    g1 = lax.all_to_all(f1[:n_dev * cap2].reshape(n_dev, cap2), AXIS, 0, 0)
    g2 = lax.all_to_all(f2[:n_dev * cap2].reshape(n_dev, cap2), AXIS, 0, 0)
    gv = lax.all_to_all(fv[:n_dev * cap2].reshape(n_dev, cap2), AXIS, 0, 0)
    g1, g2, gv = (g1.reshape(-1), g2.reshape(-1), gv.reshape(-1))
    # each device now holds its s items (plus pads); final local sort
    g1, g2, gv = lax.sort((g1, g2, gv), num_keys=2)
    return g1[:s], g2[:s], gv[:s]


def _sharded_round(rank_shard, k, n, n_dev):
    """One prefix-doubling round on rank shards.  Returns (new_rank_shard,
    max_rank)."""
    s = rank_shard.shape[0]
    me = lax.axis_index(AXIS)
    base = me * s
    # shifted ranks via the gathered vector (one ICI all-gather)
    full_rank = lax.all_gather(rank_shard, AXIS, tiled=True)      # (n,)
    idx_local = base + jnp.arange(s, dtype=jnp.int32)
    rank2_shard = full_rank[(idx_local + k) % n]

    s1, s2, vi = _dist_sort_triples(rank_shard, rank2_shard, idx_local,
                                    n_dev)

    # diff flags with the previous device's boundary keys
    prev1 = lax.ppermute(s1[-1], AXIS,
                         [(i, (i + 1) % n_dev) for i in range(n_dev)])
    prev2 = lax.ppermute(s2[-1], AXIS,
                         [(i, (i + 1) % n_dev) for i in range(n_dev)])
    first_diff = jnp.where(me == 0, 1,
                           ((s1[0] != prev1) | (s2[0] != prev2))
                           .astype(jnp.int32))
    diff = jnp.ones(s, dtype=jnp.int32)
    diff = diff.at[0].set(first_diff)
    diff = diff.at[1:].set(
        ((s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])).astype(jnp.int32))
    local_cum = jnp.cumsum(diff)
    totals = lax.all_gather(local_cum[-1], AXIS, tiled=False)  # (n_dev,)
    offset = jnp.sum(jnp.where(jnp.arange(n_dev) < me, totals, 0))
    new_rank_sorted = local_cum + offset - 1                  # (s,)
    max_rank = jnp.sum(totals) - 1

    # scatter new ranks back to position-sharded layout
    tgt_dev = vi // s
    tgt_slot = vi % s
    slab = jnp.full(n_dev * s, 0, dtype=jnp.int32)
    slab = slab.at[tgt_dev * s + tgt_slot].set(new_rank_sorted,
                                               mode='drop')
    # all_to_all then combine: each device receives n_dev slabs of its
    # positions; since destinations partition the items, sum works
    recv = lax.all_to_all(slab.reshape(n_dev, s), AXIS, 0, 0)
    new_rank_shard = jnp.sum(recv, axis=0)
    return new_rank_shard, max_rank


def sharded_cyclic_suffix_sort(mesh, block, rounds=None):
    """Cyclic rotation sort of `block` (uint8[n]) with the rank state
    sharded over the mesh.  n must divide evenly by the mesh size.
    Returns the sorted rotation order (int32[n], replicated)."""
    n = int(block.shape[0])
    n_dev = mesh.devices.size
    assert n % n_dev == 0, 'block length must divide the mesh size'
    if rounds is None:
        rounds = max(1, int(np.ceil(np.log2(max(n, 2)))))

    def program(block_sharded):
        s = block_sharded.shape[0]
        me = lax.axis_index(AXIS)
        base = me * s
        # seed ranks from 8 bytes of cyclic context (cross-shard bytes
        # come from the gather), matching the single-chip kernel: two
        # packed uint32 keys save two doubling rounds over a digram seed
        full = lax.all_gather(block_sharded, AXIS, tiled=True)
        hi, lo = jk.pack_cyclic_seed_keys(full.astype(jnp.uint32))
        # initial rank compression, replicated (cheap, one pass)
        idx0 = jnp.arange(n, dtype=jnp.int32)
        rank_full = jk._seed_ranks(hi, lo, idx0, n)
        rank_shard = lax.dynamic_slice(rank_full, (base,), (s,))

        def cond(state):
            rank_shard, k, max_rank = state
            return (max_rank < n - 1) & (k < n)

        def body(state):
            rank_shard, k, _ = state
            new_rank, max_rank = _sharded_round(rank_shard, k, n, n_dev)
            return new_rank, k * 2, max_rank

        rank_shard, _, _ = lax.while_loop(
            cond, body, (rank_shard, jnp.int32(8), jnp.max(rank_full)))

        # final order (rank asc, index desc), replicated result
        rank_full = lax.all_gather(rank_shard, AXIS, tiled=True)
        idx = jnp.arange(n, dtype=jnp.int32)
        _, _, order = lax.sort((rank_full, -idx, idx), num_keys=2)
        return order

    f = shard_map(program, mesh=mesh, in_specs=P(AXIS),
                  out_specs=P(), check_vma=False)
    return jax.jit(f)(block)
