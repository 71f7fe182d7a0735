"""Device (XLA) build of the bzip2 static-Huffman entropy stages.

Byte-identical counterpart of ops.huffman_stages (the host/native build)
running entirely on device, so a block's symbols never leave HBM between
the RLE2 output and the packed Huffman payload: the host only downloads
the payload bytes plus the tiny (selectors, length tables, pidx, counts)
matrices it needs to write headers.

Pieces:
* `alloc_lengths_dev` — exact lax port of the in-place length-limited
  allocator (coders.huffman_allocator, reference HuffmanAllocator.js:52-222):
  sequential phases become fori/while loops over a static 260-slot buffer
  with a traced logical length, vmapped over the <=6 group tables.
* `code_lengths_from_freqs_dev` / `canonical_codes_dev` — the
  (freq<<9|sym) sort trick and the closed-form canonical code assignment
  (code_i = exclusive-sum of 2^(20-l_j), shifted), matching
  huffman_stages.code_lengths_from_freqs / canonical_codes.
* `chunk_hist_dev` — per-50-symbol-chunk histograms; every later cost /
  frequency reduction is then a tiny (chunks x 260) @ (260 x 6) matmul
  (exact: integer-valued f32 with HIGHEST precision, all values < 2^24).
* `optimize_groups_dev` — the reference greedy split + Lloyd refinement
  (huffman_stages.optimize_groups, reference Bzip2.js:685-733) with the
  same tie-breaking, so outputs are byte-identical to the host encoder.

All arrays are fixed shape: G=6 group slots (inactive groups carry +inf
cost), 260-symbol alphabet buffers masked by the traced alphabet size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

N = 260            # static alphabet buffer (bzip2 max 258 + slack)
MAX_LEN = 20       # MAX_HUFCODE_BITS
G = 6              # MAX_GROUPS
GROUP_SIZE = 50

_HIGH = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# length-limited allocator (exact port; array is the static N buffer,
# m the traced logical length)

def _iota():
    return jnp.arange(N, dtype=jnp.int32)


def _read_at(array, i):
    """array[i] as a masked reduce — on TPU a (N,) select+sum is a
    couple of vector passes, several times cheaper inside a scan step
    than a dynamic-slice gather (measured: the allocator's per-step
    dynamic ops made one 258-step table build cost 5.5 ms; the masked
    form cuts the whole group-optimization stage several-fold)."""
    return jnp.sum(jnp.where(_iota() == i, array, 0))


def _write_at(array, i, value, pred):
    """array[i] = value when pred (full-array select, no scatter)."""
    return jnp.where((_iota() == i) & pred, value, array)


def _first_dev(array, i, nodes_to_move, m):
    """Port of huffman_allocator._first: smallest k with
    nodes_to_move <= k <= i and i <= array[k] % m."""
    limit = i
    k = m - 2

    def c1(st):
        i, k = st
        return (i >= nodes_to_move) & \
            (_read_at(array, jnp.clip(i, 0, N - 1)) % m > limit)

    def b1(st):
        i, k = st
        return i - (limit - i + 1), i

    i, k = lax.while_loop(c1, b1, (i, k))
    i = jnp.maximum(nodes_to_move - 1, i)

    def c2(st):
        i, k = st
        return k > i + 1

    def b2(st):
        i, k = st
        mid = (i + k) >> 1
        pred = _read_at(array, jnp.clip(mid, 0, N - 1)) % m > limit
        return jnp.where(pred, i, mid), jnp.where(pred, mid, k)

    i, k = lax.while_loop(c2, b2, (i, k))
    return k


def _set_extended_parent_pointers_dev(array, m):
    array = array.at[0].add(array[1])

    def step(carry, tail):
        array, head, top = carry
        active = tail < m - 1
        a_head = _read_at(array, head)
        a_top = _read_at(array, jnp.clip(top, 0, N - 1))
        c1 = (top >= m) | (a_head < a_top)
        total = jnp.where(c1, a_head, a_top)
        array = _write_at(array, head, tail, c1 & active)
        head1 = head + jnp.where(c1, 1, 0)
        top1 = top + jnp.where(c1, 0, 1)
        a_head1 = _read_at(array, head1)
        a_top1 = _read_at(array, jnp.clip(top1, 0, N - 1))
        c2 = (top1 >= m) | ((head1 < tail) & (a_head1 < a_top1))
        total = total + jnp.where(c2, a_head1, a_top1)
        array = _write_at(array, head1, tail + m, c2 & active)
        array = _write_at(array, tail, total, active)
        head2 = jnp.where(active, head1 + jnp.where(c2, 1, 0), head)
        top2 = jnp.where(active, top1 + jnp.where(c2, 0, 1), top)
        return (array, head2, top2), None

    (array, _, _), _ = lax.scan(
        step, (array, jnp.int32(0), jnp.int32(2)),
        jnp.arange(1, N - 1, dtype=jnp.int32))
    return array


def _find_nodes_to_relocate_dev(array, m, maximum_length):
    def cond(st):
        node, depth = st
        return (depth < maximum_length - 1) & (node > 1)

    def body(st):
        node, depth = st
        return _first_dev(array, node - 1, jnp.int32(0), m), depth + 1

    node, _ = lax.while_loop(
        cond, body, (m - 2, jnp.int32(1)))
    return node


def _fill_down(array, next_node, cnt, depth):
    """array[next_node-cnt+1 .. next_node] = depth (masked write)."""
    iota = jnp.arange(N, dtype=jnp.int32)
    mask = (iota <= next_node) & (iota > next_node - cnt)
    return jnp.where(mask, depth, array), next_node - cnt


def _allocate_node_lengths_dev(array, m):
    def cond(st):
        array, first_node, next_node, depth, available = st
        return available > 0

    def body(st):
        array, first_node, next_node, depth, available = st
        last_node = first_node
        first_node = _first_dev(array, last_node - 1, jnp.int32(0), m)
        cnt = available - (last_node - first_node)
        array, next_node = _fill_down(array, next_node, cnt, depth)
        return (array, first_node, next_node, depth + 1,
                (last_node - first_node) << 1)

    array, _, _, _, _ = lax.while_loop(
        cond, body,
        (array, m - 2, m - 1, jnp.int32(1), jnp.int32(2)))
    return array


def _allocate_with_relocation_dev(array, m, nodes_to_move, insert_depth):
    depth0 = jnp.where(insert_depth == 1, 2, 1)
    ltm0 = jnp.where(insert_depth == 1, nodes_to_move - 2, nodes_to_move)

    def cond(st):
        array, first_node, next_node, depth, available, ltm = st
        return available > 0

    def body(st):
        array, first_node, next_node, depth, available, ltm = st
        last_node = first_node
        searched = _first_dev(array, last_node - 1, nodes_to_move, m)
        first_node = jnp.where(first_node <= nodes_to_move,
                               first_node, searched)
        shift = jnp.clip(depth - insert_depth, 0, 30)
        off_ge = jnp.minimum(ltm, jnp.int32(1) << shift)
        offset = jnp.where(depth >= insert_depth, off_ge,
                           jnp.where(depth == insert_depth - 1, 1, 0))
        bump = (depth == insert_depth - 1) & \
            (_read_at(array, jnp.clip(first_node, 0, N - 1))
             == last_node)
        first_node = first_node + jnp.where(bump, 1, 0)
        cnt = available - (last_node - first_node + offset)
        array, next_node = _fill_down(array, next_node, cnt, depth)
        ltm = ltm - offset
        available = (last_node - first_node + offset) << 1
        return array, first_node, next_node, depth + 1, available, ltm

    array, _, _, _, _, _ = lax.while_loop(
        cond, body,
        (array, m - 2, m - 1, depth0.astype(jnp.int32),
         (depth0 << 1).astype(jnp.int32), ltm0.astype(jnp.int32)))
    return array


def _bit_length(x):
    return jnp.where(x > 0, 32 - lax.clz(jnp.maximum(x, 1)), 0)


def alloc_lengths_dev(array, m, maximum_length=MAX_LEN):
    """Exact device port of allocate_huffman_code_lengths: `array` is a
    static N-buffer whose first m slots hold sorted frequencies; returns
    the buffer with those slots replaced by code lengths."""
    iota = jnp.arange(N, dtype=jnp.int32)

    def small(array):
        return jnp.where(iota < m, 1, array)

    def full(array):
        array = _set_extended_parent_pointers_dev(array, m)
        ntr = _find_nodes_to_relocate_dev(array, m, maximum_length)
        insert_depth = maximum_length - _bit_length(ntr - 1)
        return lax.cond(
            array[0] % m >= ntr,
            lambda a: _allocate_node_lengths_dev(a, m),
            lambda a: _allocate_with_relocation_dev(a, m, ntr,
                                                    insert_depth),
            array)

    return lax.cond(m <= 2, small, full, array)


# --- Pallas build of the allocator: the XLA lax.scan build above pays
# ~20 us of loop machinery per step (258 steps x ~10 sequential builds
# made the group-optimization stage ~100 ms of the fused block kernel);
# a Pallas kernel runs the same scalar loops against an SMEM-resident
# table at hardware loop cost.  Selected via alloc_impl='pallas' on
# TPU; the lax build remains the CPU/test path.

def _alloc_kernel(m_ref, arr_ref, out_ref):
    import jax.experimental.pallas as pl
    N_ = out_ref.shape[2]
    m = m_ref[0, 0, 0]

    # SMEM only supports scalar loads/stores (no full-array copy, and
    # input_output_aliases aliases the HBM buffers, leaving the SMEM
    # out block uninitialized) — seed out_ref element-wise.
    def _cp(i, c):
        out_ref[0, 0, i] = arr_ref[0, 0, i]
        return c

    lax.fori_loop(0, N_, _cp, jnp.int32(0))

    def rd(i):
        return out_ref[0, 0, i]

    def wr(i, v):
        out_ref[0, 0, i] = v

    def first(i, nodes_to_move):
        limit = i
        k = m - 2

        def c1(st):
            i, k = st
            return (i >= nodes_to_move) & \
                (rd(jnp.clip(i, 0, N_ - 1)) % m > limit)

        def b1(st):
            i, k = st
            return i - (limit - i + 1), i

        i, k = lax.while_loop(c1, b1, (i, k))
        i = jnp.maximum(nodes_to_move - 1, i)

        def c2(st):
            i, k = st
            return k > i + 1

        def b2(st):
            i, k = st
            mid = (i + k) >> 1
            pred = rd(jnp.clip(mid, 0, N_ - 1)) % m > limit
            return jnp.where(pred, i, mid), jnp.where(pred, mid, k)

        i, k = lax.while_loop(c2, b2, (i, k))
        return k

    def fill_down(next_node, cnt, depth):
        def body(j, nn):
            wr(jnp.clip(nn, 0, N_ - 1), depth)
            return nn - 1
        return lax.fori_loop(0, jnp.maximum(cnt, 0), body, next_node)

    def small(_):
        @pl.when(m >= 1)
        def _():
            wr(0, 1)

        @pl.when(m == 2)
        def _():
            wr(1, 1)

    def full(_):
        # phase 1: extended parent pointers
        wr(0, rd(0) + rd(1))

        def p1(tail, carry):
            head, top = carry
            a_head = rd(head)
            a_top = rd(jnp.clip(top, 0, N_ - 1))
            c1 = (top >= m) | (a_head < a_top)
            total = jnp.where(c1, a_head, a_top)

            @pl.when(c1)
            def _():
                wr(head, tail)
            head1 = head + jnp.where(c1, 1, 0)
            top1 = top + jnp.where(c1, 0, 1)
            a_head1 = rd(jnp.clip(head1, 0, N_ - 1))
            a_top1 = rd(jnp.clip(top1, 0, N_ - 1))
            c2 = (top1 >= m) | ((head1 < tail) & (a_head1 < a_top1))
            total = total + jnp.where(c2, a_head1, a_top1)

            @pl.when(c2)
            def _():
                wr(head1, tail + m)
            wr(tail, total)
            return (head1 + jnp.where(c2, 1, 0),
                    top1 + jnp.where(c2, 0, 1))

        lax.fori_loop(1, m - 1, p1, (jnp.int32(0), jnp.int32(2)))

        # phase 2: nodes to relocate
        def p2c(st):
            node, depth = st
            return (depth < MAX_LEN - 1) & (node > 1)

        def p2b(st):
            node, depth = st
            return first(node - 1, jnp.int32(0)), depth + 1

        ntr, _ = lax.while_loop(p2c, p2b, (m - 2, jnp.int32(1)))

        # phase 3
        def alloc_plain(_):
            def cond(st):
                first_node, next_node, depth, available = st
                return available > 0

            def body(st):
                first_node, next_node, depth, available = st
                last_node = first_node
                first_node = first(last_node - 1, jnp.int32(0))
                cnt = available - (last_node - first_node)
                next_node = fill_down(next_node, cnt, depth)
                return (first_node, next_node, depth + 1,
                        (last_node - first_node) << 1)

            lax.while_loop(cond, body,
                           (m - 2, m - 1, jnp.int32(1), jnp.int32(2)))

        def alloc_reloc(_):
            insert_depth = MAX_LEN - _bit_length(ntr - 1)
            depth0 = jnp.where(insert_depth == 1, 2, 1).astype(jnp.int32)
            ltm0 = jnp.where(insert_depth == 1, ntr - 2,
                             ntr).astype(jnp.int32)

            def cond(st):
                first_node, next_node, depth, available, ltm = st
                return available > 0

            def body(st):
                first_node, next_node, depth, available, ltm = st
                last_node = first_node
                searched = first(last_node - 1, ntr)
                first_node = jnp.where(first_node <= ntr, first_node,
                                       searched)
                shift = jnp.clip(depth - insert_depth, 0, 30)
                off_ge = jnp.minimum(ltm, jnp.int32(1) << shift)
                offset = jnp.where(
                    depth >= insert_depth, off_ge,
                    jnp.where(depth == insert_depth - 1, 1, 0))
                bump = (depth == insert_depth - 1) & \
                    (rd(jnp.clip(first_node, 0, N_ - 1)) == last_node)
                first_node = first_node + jnp.where(bump, 1, 0)
                cnt = available - (last_node - first_node + offset)
                next_node = fill_down(next_node, cnt, depth)
                return (first_node, next_node, depth + 1,
                        (last_node - first_node + offset) << 1,
                        ltm - offset)

            lax.while_loop(cond, body,
                           (m - 2, m - 1, depth0, depth0 << 1, ltm0))

        lax.cond(rd(0) % m >= ntr, alloc_plain, alloc_reloc, None)

    lax.cond(m <= 2, small, full, None)


def alloc_lengths_pallas(arrs, ms, interpret=False):
    """Pallas build of alloc_lengths_dev over a batch: arrs (B, N) i32
    sorted frequencies, ms (B,) logical lengths -> (B, N) lengths."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    B = arrs.shape[0]
    out = pl.pallas_call(
        _alloc_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, N), jnp.int32),
        interpret=interpret,
    )(ms.astype(jnp.int32).reshape(-1, 1, 1),
      arrs.astype(jnp.int32).reshape(B, 1, N))
    return out.reshape(B, N)


def code_lengths_from_freqs_dev(freq, m):
    """Device build of huffman_stages.code_lengths_from_freqs: sort
    (freq<<9|sym), allocate in place, invert the sort.  freq: (N,) i32
    buffer; returns (N,) i32 lengths by symbol (zeros past m)."""
    sym = jnp.arange(N, dtype=jnp.int32)
    merged = jnp.where(sym < m, (freq << 9) | sym, jnp.int32(0x7FFFFFFF))
    merged = lax.sort(merged)
    arr = jnp.where(sym < m, merged >> 9, 0)
    arr = alloc_lengths_dev(arr, m)
    lengths = jnp.zeros(N, dtype=jnp.int32)
    lengths = lengths.at[jnp.where(sym < m, merged & 0x1FF, N)].set(
        jnp.where(sym < m, arr, 0), mode='drop')
    return lengths


def code_lengths_batch(freqs, m, alloc_impl='xla'):
    """Batched table builds: freqs (B, N) i32 -> (B, N) lengths.
    alloc_impl='pallas' runs the allocator loops as a Pallas SMEM
    kernel (TPU); 'xla' is the lax build (CPU tests, parity)."""
    B = freqs.shape[0]
    sym = jnp.arange(N, dtype=jnp.int32)[None, :]
    merged = jnp.where(sym < m, (freqs << 9) | sym,
                       jnp.int32(0x7FFFFFFF))
    merged = lax.sort(merged, dimension=1)
    arrs = jnp.where(sym < m, merged >> 9, 0)
    if alloc_impl in ('pallas', 'pallas_interpret'):
        arrs = alloc_lengths_pallas(
            arrs, jnp.broadcast_to(jnp.asarray(m), (B,)),
            interpret=(alloc_impl == 'pallas_interpret'))
    else:
        arrs = jax.vmap(lambda a: alloc_lengths_dev(a, m))(arrs)
    lengths = jnp.zeros((B, N), dtype=jnp.int32)
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    lengths = lengths.at[rows, jnp.where(sym < m, merged & 0x1FF, N)].set(
        jnp.where(sym < m, arrs, 0), mode='drop')
    return lengths


def canonical_codes_dev(lengths, m):
    """Canonical code assignment sorted by (length, symbol) — closed
    form: code_i = (exclusive-sum of 2^(MAX_LEN - l_j)) >> (MAX_LEN -
    l_i).  Matches huffman_stages.canonical_codes."""
    sym = jnp.arange(N, dtype=jnp.int32)
    merged = jnp.where(sym < m, (lengths << 9) | sym,
                       jnp.int32(0x7FFFFFFF))
    merged = lax.sort(merged)
    lens_sorted = jnp.where(sym < m, merged >> 9, 0)
    weights = jnp.where(sym < m, jnp.int32(1) << (MAX_LEN - lens_sorted),
                        0)
    prefix = jnp.cumsum(weights) - weights   # exclusive
    codes_sorted = prefix >> (MAX_LEN - lens_sorted)
    codes = jnp.zeros(N, dtype=jnp.int32)
    codes = codes.at[jnp.where(sym < m, merged & 0x1FF, N)].set(
        jnp.where(sym < m, codes_sorted, 0), mode='drop')
    return codes


# ---------------------------------------------------------------------------
# group optimization on chunk histograms

def chunk_hist_dev(syms, count, n_chunks):
    """(n_chunks, N) int32 histogram of each 50-symbol chunk (symbols at
    index >= count are excluded).

    chunk(i) = i // 50 is block-diagonal, so on TPU the histogram is a
    compare-and-reduce over a (n_chunks, 50) reshape — a fused VPU
    reduction — instead of a scatter-add over 900 K duplicate-heavy
    (chunk, symbol) indices (duplicates serialize TPU scatters).  On
    CPU the compare-reduce materializes the (n_chunks, 50, N) one-hot
    (~1 GB at block scale) and LOSES badly, so the scatter-add build
    stays the off-TPU path (mesh-scaling CPU validation regressed
    3.5x before this gate)."""
    n = syms.shape[0]
    syms = syms.astype(jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = idx < count
    if jax.default_backend() != 'tpu':
        chunk = idx // GROUP_SIZE
        hist = jnp.zeros((n_chunks, N), dtype=jnp.int32)
        return hist.at[jnp.where(valid, chunk, n_chunks),
                       jnp.where(valid, syms, 0)].add(1, mode='drop')
    s = jnp.where(valid, syms, N)   # invalid -> out of range
    pad = n_chunks * GROUP_SIZE - n
    if pad > 0:
        s = jnp.concatenate([s, jnp.full(pad, N, jnp.int32)])
    elif pad < 0:
        s = s[:n_chunks * GROUP_SIZE]
    s3 = s.reshape(n_chunks, GROUP_SIZE)
    return (s3[:, :, None] ==
            jnp.arange(N, dtype=jnp.int32)[None, None, :]) \
        .astype(jnp.int32).sum(axis=1)


def _costs_from_hist(hist_f, lens, active):
    """(n_chunks, G) i32 bit costs; inactive groups get +inf."""
    c = jax.lax.dot_general(hist_f, lens.astype(jnp.float32),
                            (((1,), (1,)), ((), ())),
                            precision=_HIGH)
    c = c.astype(jnp.int32)
    return jnp.where(active[None, :], c, jnp.int32(0x3FFFFFFF))


def _freqs_by_group(hist_f, selectors, valid_chunk):
    """(G, N) i32 per-group symbol frequencies via one-hot matmul."""
    onehot = (selectors[:, None] == jnp.arange(G)[None, :]) & \
        valid_chunk[:, None]
    f = jax.lax.dot_general(onehot.astype(jnp.float32), hist_f,
                            (((0,), (0,)), ((), ())),
                            precision=_HIGH)
    return f.astype(jnp.int32)


def _rank_stable(keys, n):
    """Stable ascending rank of each element (ties by index)."""
    order = jnp.argsort(keys, stable=True)
    ranks = jnp.zeros(n, dtype=jnp.int32)
    return ranks.at[order].set(jnp.arange(n, dtype=jnp.int32))


@functools.partial(jax.jit, static_argnums=(2, 5))
def optimize_groups_dev(syms, count, n_chunks, freq, m,
                        alloc_impl='xla'):
    """Device build of huffman_stages.optimize_groups: returns
    (length_matrix (G, N) i32, n_groups i32, selectors (n_chunks,) i32,
    code_matrix (G, N) i32).  Rows >= n_groups are inactive.

    syms: (n_syms,) symbol stream (padded); count: valid symbols;
    n_chunks: static chunk capacity (= ceil(len(syms)/50)); freq: (>=N,)
    global frequency; m: alphabet size (traced, = eob+1)."""
    hist = chunk_hist_dev(syms, count, n_chunks)
    hist_f = hist.astype(jnp.float32)
    chunk_idx = jnp.arange(n_chunks, dtype=jnp.int32)
    nvc = (count + GROUP_SIZE - 1) // GROUP_SIZE
    valid_chunk = chunk_idx < nvc

    target = (2 + (count >= 200).astype(jnp.int32)
              + (count >= 600).astype(jnp.int32)
              + (count >= 1200).astype(jnp.int32)
              + (count >= 2400).astype(jnp.int32))

    freq = freq.astype(jnp.int32)
    if freq.shape[0] >= N:
        fbuf = freq[:N]
    else:
        fbuf = jnp.pad(freq, (0, N - freq.shape[0]))
    # zero out entries past the alphabet (they must not affect tables)
    fbuf = jnp.where(jnp.arange(N) < m, fbuf, 0)
    ones = jnp.ones(N, dtype=jnp.int32)
    # one batched dispatch builds both initial tables (sequential build
    # rounds are the expensive unit here)
    row01 = code_lengths_batch(jnp.stack([fbuf, ones]), m, alloc_impl)
    row0, row1 = row01[0], row01[1]
    lens = jnp.stack([row0, row1] + [row1] * (G - 2))

    def split_iter(i, carry):
        lens, g = carry

        def do_split(args):
            lens, g = args
            active = jnp.arange(G) < g
            costs = _costs_from_hist(hist_f, lens, active)
            sel = jnp.argmin(costs, axis=1).astype(jnp.int32)
            counts = jnp.sum(
                ((sel[:, None] == jnp.arange(G)[None, :]) &
                 valid_chunk[:, None]).astype(jnp.int32), axis=0)
            counts = jnp.where(active, counts, -1)
            which = jnp.argmax(counts).astype(jnp.int32)
            member = (sel == which) & valid_chunk
            mcount = jnp.sum(member.astype(jnp.int32))
            wcosts = jnp.take_along_axis(
                costs, jnp.full((n_chunks, 1), which), axis=1)[:, 0]
            keys = jnp.where(member, wcosts, jnp.int32(0x7FFFFFFF))
            rank = _rank_stable(keys, n_chunks)
            sel = jnp.where(member & (rank >= (mcount >> 1)), g, sel)
            freqs = _freqs_by_group(hist_f, sel, valid_chunk)
            new_lens = code_lengths_batch(freqs, m, alloc_impl)
            keep = jnp.arange(G) <= g
            lens = jnp.where(keep[:, None], new_lens, lens)
            return lens, g + 1

        return lax.cond(g < target, do_split, lambda a: a, (lens, g))

    lens, g = lax.fori_loop(0, G - 2, split_iter, (lens, jnp.int32(2)))

    active = jnp.arange(G) < g
    costs = _costs_from_hist(hist_f, lens, active)
    sel = jnp.argmin(costs, axis=1).astype(jnp.int32)

    # Lloyd refinement with the host's early break (huffman_stages
    # optimize_groups tail): iterate while total cost strictly improves,
    # at most 4 rounds; empty groups keep their previous table.
    def lloyd_cond(st):
        lens, sel, prev_cost, i, go = st
        return (i < 4) & go

    def lloyd_body(st):
        lens, sel, prev_cost, i, go = st
        freqs = _freqs_by_group(hist_f, sel, valid_chunk)
        gcounts = jnp.sum(
            ((sel[:, None] == jnp.arange(G)[None, :]) &
             valid_chunk[:, None]).astype(jnp.int32), axis=0)
        new_lens = code_lengths_batch(freqs, m, alloc_impl)
        lens = jnp.where((active & (gcounts > 0))[:, None],
                         new_lens, lens)
        costs = _costs_from_hist(hist_f, lens, active)
        sel = jnp.argmin(costs, axis=1).astype(jnp.int32)
        chosen = jnp.take_along_axis(costs, sel[:, None], axis=1)[:, 0]
        cost = jnp.sum(jnp.where(valid_chunk, chosen, 0))
        return lens, sel, cost, i + 1, cost < prev_cost

    lens, sel, _, _, _ = lax.while_loop(
        lloyd_cond, lloyd_body,
        (lens, sel, jnp.int32(0x7FFFFFFF), jnp.int32(0), jnp.bool_(True)))

    codes = jax.vmap(lambda l: canonical_codes_dev(l, m))(lens)
    return lens, g, sel, codes


# ---------------------------------------------------------------------------
# payload packing

def payload_cap_bytes(n):
    """Static payload buffer bound for an n-byte block: 1.5n + slack,
    rounded to a word multiple.  Real bzip2 payloads are ~0.3n for text
    and ~1.06n for incompressible data; a block exceeding this cap is
    reported via total_bits and must take the host path."""
    return (n + (n >> 1) + 2048 + 3) & ~3


@functools.partial(jax.jit, static_argnums=(5,))
def payload_pack_words_dev(syms, count, selectors, lens, codes, cap_bytes):
    """Huffman payload as packed big-endian bytes, scatter-add build.

    Each code (<= 20 bits) lands in at most two consecutive u32 words;
    every output bit belongs to exactly one symbol, so the two per-symbol
    word contributions can be scatter-ADDed (add == OR on disjoint bit
    ranges) — no (n x 20) bit materialization.  Returns
    (bytes u8[cap_bytes], total_bits).  The u64 word math of the host
    build (huffman_stages.payload_bytes) is split into explicit hi/lo
    u32 halves because x64 is disabled under jit."""
    n = syms.shape[0]
    syms = syms.astype(jnp.int32)
    valid = jnp.arange(n, dtype=jnp.int32) < count
    chunk_of_sym = jnp.arange(n, dtype=jnp.int32) // GROUP_SIZE
    sel = selectors[chunk_of_sym]
    if jax.default_backend() == 'tpu':
        # Per-symbol (len, code) via one-hot MXU contraction instead
        # of a 900 K random gather from the (G, N) tables (gathers
        # issue at ~0.11 G/s on this chip; the matmul runs the same
        # lookup as a (n, N) x (N, 3G) one-hot contraction).  EXACT in
        # float32: the one-hot selects a single value per row, lengths
        # are <= 20, and codes split into two 10-bit halves (< 2^24).
        # Off-TPU the one-hot materializes (~1 GB) and the gather is
        # memory-speed anyway, so CPU keeps the gather build below.
        W = jnp.concatenate([lens.T, (codes >> 10).T,
                             (codes & 0x3FF).T],
                            axis=1).astype(jnp.float32)  # (N, 3G)
        onehot = (syms[:, None] ==
                  jnp.arange(N, dtype=jnp.int32)[None, :]).astype(
                      jnp.float32)
        proj = jax.lax.dot_general(onehot, W, (((1,), (0,)), ((), ())),
                                   precision=_HIGH)      # (n, 3G)
        proj = proj.astype(jnp.int32)

        def pick(base):
            out = proj[:, base]
            for g in range(1, G):
                out = jnp.where(sel == g, proj[:, base + g], out)
            return out

        ln = jnp.where(valid, pick(0), 0)
        cd = jnp.where(valid, (pick(G) << 10) | pick(2 * G),
                       0).astype(jnp.uint32)
    else:
        packed_tbl = (lens << 20) | codes                # (G, N)
        pv = packed_tbl[sel, syms]
        ln = jnp.where(valid, pv >> 20, 0)
        cd = jnp.where(valid, pv & 0xFFFFF, 0).astype(jnp.uint32)
    offsets = jnp.cumsum(ln) - ln
    total = jnp.sum(ln)
    wi = (offsets >> 5).astype(jnp.int32)
    bo = (offsets & 31).astype(jnp.int32)
    # aligned u64 value = code << (64 - bo - ln), split into hi/lo words
    sh_hi = 32 - bo - ln    # [-19, 31] for valid lanes (ln >= 1);
    # invalid lanes have cd == 0, so the clamped shift is harmless
    hi = jnp.where(sh_hi >= 0,
                   cd << jnp.clip(sh_hi, 0, 31).astype(jnp.uint32),
                   cd >> jnp.clip(-sh_hi, 0, 31).astype(jnp.uint32))
    spill = (bo + ln) > 32
    sh_lo = jnp.clip(64 - bo - ln, 0, 31).astype(jnp.uint32)
    lo = jnp.where(spill, cd << sh_lo, jnp.uint32(0))
    # Combine the ~7 codes that share each output word BEFORE touching
    # HBM: wi is non-decreasing, so a log-stride shifted-OR accumulates
    # each equal-wi run's bits into its last element (the running OR is
    # numerically monotone within a run — bits only get added), and one
    # unique-index scatter per stream writes run totals.  A plain
    # scatter-add over the duplicate-heavy wi indices measured ~5x
    # slower on v5e (duplicates serialize the scatter).
    nwords = cap_bytes // 4
    # pad lanes (ln == 0, always a contiguous tail) get a sentinel word
    # index so the last REAL element of every run is its run end
    wi_eff = jnp.where(valid & (ln > 0), wi, nwords)
    stride = 1
    while stride < 32:   # hi-runs hold <= 32 codes (each >= 1 bit)
        same = jnp.zeros(n, dtype=jnp.bool_)
        same = same.at[stride:].set(wi_eff[stride:] == wi_eff[:-stride])
        hi = hi | jnp.where(same, jnp.concatenate(
            [jnp.zeros(stride, jnp.uint32), hi[:-stride]]), 0)
        lo = lo | jnp.where(same, jnp.concatenate(
            [jnp.zeros(stride, jnp.uint32), lo[:-stride]]), 0)
        stride <<= 1
    is_end = jnp.ones(n, dtype=jnp.bool_)
    is_end = is_end.at[:-1].set(wi_eff[1:] != wi_eff[:-1])
    idx_hi = jnp.where(is_end, wi_eff, nwords)
    idx_lo = jnp.where(is_end & (wi_eff < nwords), wi_eff + 1, nwords)
    words = jnp.zeros(nwords, dtype=jnp.uint32)
    words = words.at[idx_hi].set(hi, mode='drop', unique_indices=True)
    words = words | jnp.zeros(nwords, dtype=jnp.uint32).at[idx_lo].set(
        lo, mode='drop', unique_indices=True)
    # big-endian byte split
    b = jnp.stack([(words >> 24) & 0xFF, (words >> 16) & 0xFF,
                   (words >> 8) & 0xFF, words & 0xFF],
                  axis=1).astype(jnp.uint8)
    return b.reshape(-1), total


@functools.partial(jax.jit, static_argnums=(1, 4, 5, 6))
def encode_block_full(block, n, remap, eob, width=256, mtf_impl='xla',
                      alloc_impl=None):
    """All-device bzip2 block encode: rotation sort -> BWT -> MTF ->
    RLE2 -> group optimization -> canonical tables -> packed payload.
    The host downloads only (pidx, payload prefix, lens, n_groups,
    selectors, count) — a block's symbols never leave HBM.

    Returns (pidx, payload_bytes, total_bits, lens (G,N), n_groups,
    selectors, count, freq)."""
    from . import jax_kernels as jk
    order = jk.cyclic_suffix_sort(block, n)
    U = block[:n][(order - 1) % n]
    pidx = jnp.argmax(order == 0).astype(jnp.int32)
    dense = remap[U.astype(jnp.int32)]
    if mtf_impl == 'pallas':
        from . import pallas_kernels as pk
        mtf_seq = pk.mtf_encode_pallas(dense, n, 512, width,
                                       interpret=False)
    else:
        mtf_seq = jk.mtf_encode(dense, n, 512, width)
    syms, count, freq = jk.rle2_encode(mtf_seq, n, eob)
    n_chunks = -(-(n + 1) // GROUP_SIZE)
    if alloc_impl is None:
        alloc_impl = 'pallas' if mtf_impl == 'pallas' else 'xla'
    lens, g, sel, codes = optimize_groups_dev(
        syms, count, n_chunks, freq, eob + 1, alloc_impl)
    payload, total_bits = payload_pack_words_dev(
        syms, count, sel, lens, codes, payload_cap_bytes(n))
    return pidx, payload, total_bits, lens, g, sel, count, freq
