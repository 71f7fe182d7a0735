"""Multi-chip data-parallel block encoding over a jax.sharding.Mesh.

Blocks are the DP axis (SURVEY.md §2: bzip2 blocks share only the rolling
stream CRC and bit alignment, both host-side).  Each device runs the fused
transform kernel on its block shard; the per-block compressed sizes are
exchanged with an `all_gather` over the mesh axis so every device knows
the output ordering (the ragged-gather manifest), and payload assembly
happens on the host in file order.

Scaling axes:
* dp   — blocks across devices (this module)
* intra-block parallelism — the sort/scan kernels themselves vectorize
  across the sequence dimension (ops.jax_kernels)
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import jax_kernels as jk


def make_mesh(devices=None, axis='dp'):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def _pad_block(n):
    """Pad-lane filler block whose outputs are discarded.  Deterministic
    PRNG bytes make every 8-byte context distinct with overwhelming
    probability, so the lane's prefix-doubling while_loop exits after the
    seed round — a pad lane costs one sort instead of recomputing a real
    block (the round-1 duplicate-block padding)."""
    return np.random.default_rng(0x42).integers(
        0, 256, size=n, dtype=np.uint8)


def _ring_order(n_blocks, n_dev):
    """Round-robin block->device assignment (block i on device i mod d).

    shard_map shards the leading axis contiguously, so the permutation
    places blocks {d, d+n_dev, ...} in device d's slice.  Interleaving
    decorrelates per-block sort difficulty (file regions cluster repeat
    structure) across devices when blocks >> chips, balancing the
    per-device vmapped while_loop depth.  Returns (perm, inv_perm)."""
    perm = np.concatenate([np.arange(d, n_blocks, n_dev)
                           for d in range(n_dev)])
    inv = np.empty_like(perm)
    inv[perm] = np.arange(n_blocks)
    return perm, inv


def sharded_block_encode(mesh, blocks, remaps, eobs):
    """Encode B equal-length blocks sharded over the mesh's 'dp' axis.

    blocks: (B, n) uint8; remaps: (B, 256) int32; eobs: (B,) int32.
    Returns (pidxs (B,), syms (B, n+1), counts (B,), freqs (B, 260),
    all_counts (B, B_total)) with outputs sharded the same way."""
    n = blocks.shape[1]

    def per_shard(blocks_s, remaps_s, eobs_s):
        core = jax.vmap(lambda b, r, e: jk.encode_block_core(b, n, r, e))
        pidx, syms, count, freq = core(blocks_s, remaps_s, eobs_s)
        # exchange symbol counts across the mesh: the ordered-assembly
        # manifest (every device learns all block sizes via ICI)
        all_counts = lax.all_gather(count, 'dp', tiled=True)
        return pidx, syms, count, freq, all_counts

    f = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P('dp', None), P('dp', None), P('dp')),
        out_specs=(P('dp'), P('dp', None), P('dp'), P('dp', None), P(None)),
        check_vma=False)
    return jax.jit(f)(blocks, remaps, eobs)


def sharded_block_encode_full(mesh, blocks, remaps, eobs):
    """Encode B equal-length blocks ENTIRELY on the mesh — transforms
    AND the static-Huffman entropy stage (ops.device_entropy
    encode_block_full per lane), so no host entropy drain exists at all:
    the host receives packed payload bytes plus header matrices.
    Returns (pidx (B,), payload (B, cap) u8, bits (B,), lens (B, G, N),
    n_groups (B,), selectors (B, nc), count (B,))."""
    from ..ops import device_entropy as de
    n = blocks.shape[1]
    impl = 'pallas' if all(d.platform == 'tpu' for d in mesh.devices.flat) \
        else 'xla'

    def per_shard(blocks_s, remaps_s, eobs_s):
        f = jax.vmap(lambda b, r, e: de.encode_block_full(
            b, n, r, e, 256, impl))
        pidx, payload, bits, lens, g, sel, count, freq = f(
            blocks_s, remaps_s, eobs_s)
        # exchange payload bit sizes across the mesh: the ordered-
        # assembly manifest (every device learns all sizes via ICI)
        all_bits = lax.all_gather(bits, 'dp', tiled=True)
        return pidx, payload, bits, lens, g, sel, count, all_bits

    f = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P('dp', None), P('dp', None), P('dp')),
        out_specs=(P('dp'), P('dp', None), P('dp'), P('dp', None, None),
                   P('dp'), P('dp', None), P('dp'), P(None)),
        check_vma=False)
    return jax.jit(f)(blocks, remaps, eobs)


def mesh_compress_bzip2(mesh, data, level=9):
    """End-to-end data-parallel bzip2 encode over the mesh: host RLE1
    block split -> shard_map FULL block encode (transform + entropy per
    device lane, sharded_block_encode_full) -> ordered host gather of
    payload bytes + header matrices -> bit-concatenated standard
    container.  Output is byte-identical to the host codec.

    The round-1 design drained MTF/RLE2 symbols through the host
    entropy stage sequentially after the gather; now the only host work
    per block is writing ~100 header bits and splicing payload bits.
    Equal-length full blocks ride the mesh; the odd-length tail (if
    any) takes the native host path."""
    import numpy as np
    from ..codecs.bzip2 import WHOLEPI, SQRTPI
    from ..parallel import pipeline as pl
    from ..utils.crc32 import stream_crc_combine
    from ..utils.stream import BitStream, coerce_output_stream

    data = np.asarray(data, dtype=np.uint8) \
        if isinstance(data, np.ndarray) \
        else np.frombuffer(bytes(data), dtype=np.uint8)
    block_size = level * 100000 - 19
    blocks = pl._split_blocks(data, block_size)

    n_dev = mesh.devices.size
    full = [(i, b, c) for i, (b, c) in enumerate(blocks)
            if b.shape[0] == block_size]
    results = {}
    if full:
        # pad the full-block list to a multiple of the mesh size with a
        # cheap filler block (outputs discarded, sort exits after the
        # seed round), then ring-rotate blocks across devices for load
        # balance when blocks >> chips
        idxs = [i for i, _, _ in full]
        raw = [b for _, b, _ in full]
        while len(raw) % n_dev:
            raw.append(_pad_block(block_size))
        perm, inv = _ring_order(len(raw), n_dev)
        braw, remaps, eobs = prepare_blocks([raw[p] for p in perm])
        pidx, payload, bits, lens, g, sel, count, _ = \
            sharded_block_encode_full(
                mesh, jnp.asarray(braw), jnp.asarray(remaps),
                jnp.asarray(eobs))
        pidx = np.asarray(pidx)[inv]
        payload = np.asarray(payload)[inv]
        bits = np.asarray(bits)[inv]
        lens = np.asarray(lens)[inv]
        g = np.asarray(g)[inv]
        sel = np.asarray(sel)[inv]
        count = np.asarray(count)[inv]
        for k, i in enumerate(idxs):
            results[i] = (int(pidx[k]), payload[k], int(bits[k]),
                          lens[k], int(g[k]), sel[k], int(count[k]))

    o = coerce_output_stream(None)
    out = BitStream(o.stream)
    for ch in 'BZh':
        out.write_byte(ord(ch))
    out.write_byte(ord('0') + level)
    stream_crc = 0
    for i, (block, crc) in enumerate(blocks):
        used, alphabet_size, _ = pl._block_meta(block)
        if i in results and \
                results[i][2] <= results[i][1].shape[0] * 8:
            p, pay, total_bits, lns, ng, slc, cnt = results[i]
            header_bits = pl._device_block_header(
                p, lns, ng, slc, cnt, alphabet_size, used)
            payload_bits = np.unpackbits(
                pay[:(total_bits + 7) // 8], count=total_bits)
        else:  # odd-length tail (or payload-cap overflow) on the host
            from ..ops import bwt as bwt_ops
            n = block.shape[0]
            U = np.zeros(n, dtype=np.uint8)
            p = bwt_ops.bwtransform2(block, U, n, 256)
            alphabet = np.nonzero(used)[0].astype(np.uint8)
            s, fq = pl._mtf_rle2(U, alphabet, alphabet_size)
            header_bits, (pay, total_bits) = pl._finish_block(
                block, p, s, len(s), fq, alphabet_size, used)
            payload_bits = np.unpackbits(pay, count=total_bits)
        stream_crc = stream_crc_combine(stream_crc, crc)
        out.write_bits(48, WHOLEPI)
        out.write_bits(32, crc)
        out.write_bit_array(header_bits)
        out.write_bit_array(payload_bits)
    out.write_bits(48, SQRTPI)
    out.write_bits(32, stream_crc)
    out.flush()
    return o.retval


def sharded_block_decode(mesh, Us, pidxs, eof=False):
    """Decode-side dual of sharded_block_encode: invert B equal-length
    BWT columns sharded over the mesh's 'dp' axis (one block batch per
    device, orbit-doubling LF walk on each lane).

    Us: (B, n) uint8 BWT output columns; pidxs: (B,) int32.  eof=False
    inverts the cyclic transform (bzip2, ops.jax_kernels.bwt_block),
    eof=True the EOF-terminated one (BWTC, bwt_eof_block).  B is padded
    to a mesh multiple internally (pad lanes repeat the last block and
    are sliced off), matching the encode duals.  Returns the original
    (B, n) blocks."""
    B = int(np.asarray(Us).shape[0])
    n = np.asarray(Us).shape[1]
    n_dev = mesh.devices.size
    if B % n_dev:
        pad = n_dev - B % n_dev
        Us = jnp.concatenate([jnp.asarray(Us),
                              jnp.broadcast_to(jnp.asarray(Us)[-1:],
                                               (pad, n))])
        pidxs = jnp.concatenate([jnp.asarray(pidxs),
                                 jnp.broadcast_to(jnp.asarray(pidxs)[-1:],
                                                  (pad,))])
    inv = jk.inverse_bwt_eof_block if eof else jk.inverse_bwt_block

    def per_shard(U_s, pidx_s):
        return jax.vmap(lambda u, p: inv(u, n, p))(U_s, pidx_s)

    f = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P('dp', None), P('dp')),
        out_specs=P('dp', None),
        check_vma=False)
    return jax.jit(f)(Us, pidxs)[:B]


def sharded_ragged_inverse_bwt(mesh, Us, ns, pidxs):
    """Invert B RAGGED cyclic-BWT columns sharded over the 'dp' axis:
    Us (B, cap) uint8 padded columns, ns (B,) valid lengths, pidxs (B,).
    Decode-side blocks of one stream differ in length (RLE1 packing), so
    each lane masks to its own n (ops.jax_kernels.inverse_bwt_block_
    masked).  B is padded to a mesh multiple internally.  Returns the
    (B, cap) original blocks (zero past each n)."""
    B = int(np.asarray(Us).shape[0])
    cap = int(np.asarray(Us).shape[1])
    n_dev = mesh.devices.size
    Us = jnp.asarray(Us)
    ns = jnp.asarray(ns, dtype=jnp.int32)
    pidxs = jnp.asarray(pidxs, dtype=jnp.int32)
    if B % n_dev:
        pad = n_dev - B % n_dev
        Us = jnp.concatenate(
            [Us, jnp.zeros((pad, cap), dtype=Us.dtype)])
        ns = jnp.concatenate([ns, jnp.zeros(pad, dtype=jnp.int32)])
        pidxs = jnp.concatenate([pidxs, jnp.zeros(pad, dtype=jnp.int32)])

    def per_shard(U_s, n_s, p_s):
        return jax.vmap(
            lambda u, nn, p: jk.inverse_bwt_block_masked(u, cap, nn, p)
        )(U_s, n_s, p_s)

    f = shard_map(per_shard, mesh=mesh,
                  in_specs=(P('dp', None), P('dp'), P('dp')),
                  out_specs=P('dp', None),
                  check_vma=False)
    return jax.jit(f)(Us, ns, pidxs)[:B]


def sharded_bwt_eof(mesh, blocks):
    """EOF-terminated BWT of B equal-length blocks over the dp axis:
    returns (U (B, n) uint8, pidx (B,) int32) — the transform stage of
    the mesh BWTC/BWTCP encoders."""
    n = blocks.shape[1]

    def per_shard(blocks_s):
        return jax.vmap(lambda b: jk.bwt_eof_block(b, n))(blocks_s)

    f = shard_map(per_shard, mesh=mesh,
                  in_specs=P('dp', None),
                  out_specs=(P('dp', None), P('dp')),
                  check_vma=False)
    return jax.jit(f)(blocks)


def mesh_compress_bwtcp(mesh, data, level=9):
    """Data-parallel BWTC-P encode over the mesh: the per-block BWTs run
    sharded on devices (sharded_bwt_eof) and everything else —
    per-block independent range coders on host threads, container
    serialization, level clamping — is the real codec
    (BWTCP.compress_file with the _PRE_BWT hook supplying the device
    transforms).  Byte-identical by construction."""
    from ..codecs import bwtcp as bwtcp_mod

    data = np.asarray(data, dtype=np.uint8) \
        if isinstance(data, np.ndarray) \
        else np.frombuffer(bytes(data), dtype=np.uint8)
    bs = bwtcp_mod._level_of(level) * 100000

    # device transform for the equal-length full blocks (padded to a
    # mesh multiple; pad lanes discarded)
    n_full = len(data) // bs
    pre = {}
    if n_full > 1:
        raw = [data[i * bs:(i + 1) * bs] for i in range(n_full)]
        n_dev = mesh.devices.size
        while len(raw) % n_dev:
            raw.append(_pad_block(bs))
        perm, inv = _ring_order(len(raw), n_dev)
        U_all, pidx_all = sharded_bwt_eof(
            mesh, jnp.asarray(np.stack([raw[p] for p in perm])))
        U_all = np.asarray(U_all)[inv]
        pidx_all = np.asarray(pidx_all)[inv]
        for i in range(n_full):
            pre[i] = (U_all[i], int(pidx_all[i]))

    token = bwtcp_mod._PRE_BWT.set(pre)
    try:
        return bwtcp_mod.BWTCP.compress_file(data, None, level)
    finally:
        bwtcp_mod._PRE_BWT.reset(token)


def prepare_blocks(raw_blocks):
    """Host prep: dense-alphabet remap tables and EOB symbols per block."""
    remaps = []
    eobs = []
    for b in raw_blocks:
        used = np.zeros(256, dtype=bool)
        used[b] = True
        remap = np.zeros(256, dtype=np.int32)
        remap[np.nonzero(used)[0]] = np.arange(int(used.sum()))
        remaps.append(remap)
        eobs.append(int(used.sum()) + 1)
    return (np.stack(raw_blocks), np.stack(remaps),
            np.asarray(eobs, dtype=np.int32))
