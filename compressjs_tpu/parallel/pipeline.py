"""Device-accelerated, block-parallel bzip2 encoder.

The TPU execution model for this framework (SURVEY.md §2 parallel table):

* **DP over blocks** — bzip2 blocks are independent (they share only the
  rolling stream CRC and output bit alignment), so blocks are batched on
  one chip (vmap) or sharded across a `jax.sharding.Mesh` (shard_map,
  see mesh.py); each device runs the fused transform kernel
  (`ops.jax_kernels.encode_block_core`: rotation sort -> BWT -> MTF ->
  RLE2).
* **Host boundary** — RLE1 packing, CRC (zlib-reflection path, GB/s),
  Huffman table construction (O(258) per group), and final bit stitching
  stay on the host: they are bandwidth-trivial next to the O(n log n)
  sort and O(n·256) MTF work.

The output is byte-identical to codecs.bzip2.compress_file.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..codecs.bzip2 import WHOLEPI, SQRTPI, BitArrayWriter
from ..ops import huffman_stages as hs
from ..ops import jax_kernels as jk
from ..ops import rle as rle_ops
from ..utils.crc32 import crc32_bzip2, stream_crc_combine
from ..utils.stream import BitStream, coerce_output_stream


def _split_blocks(data, block_size):
    """Host RLE1 pass: returns list of (packed_block, crc)."""
    out = []
    start = 0
    while True:
        block, consumed = rle_ops.rle1_encode(data, start, block_size)
        if block.shape[0] == 0:
            break
        crc = crc32_bzip2(data[start:start + consumed])
        out.append((block, crc))
        start += consumed
        if block.shape[0] != block_size:
            break
    return out


def _finish_block_host(block, pidx, syms, count, freq):
    """Host entropy stage: Huffman groups, selectors, tables, payload.
    Returns the block's bit array after the 48-bit magic + CRC."""
    used = np.zeros(256, dtype=bool)
    used[block] = True
    alphabet_size = int(used.sum())
    end_of_block = alphabet_size + 1

    syms = syms[:count]
    freq = freq[:end_of_block + 1]
    length_matrix, selectors = hs.optimize_groups(syms, end_of_block + 1,
                                                  freq)
    n_groups = length_matrix.shape[0]
    code_matrix = np.stack([hs.canonical_codes(length_matrix[g])
                            for g in range(n_groups)])

    w = BitArrayWriter()
    w.write_bit(0)  # not randomized
    w.write_bits(24, int(pidx))
    compact = used.reshape(16, 16).any(axis=1)
    for i in range(16):
        w.write_bit(bool(compact[i]))
    for i in range(16):
        if compact[i]:
            for j in range(16):
                w.write_bit(bool(used[(i << 4) | j]))
    w.write_bits(3, n_groups)
    w.write_bits(15, len(selectors))
    w.append(hs.selector_mtf_bits(selectors, n_groups))
    for g in range(n_groups):
        w.append(hs.emit_table_deltas(length_matrix[g]))
    w.append(hs.payload_bits(syms, selectors, length_matrix, code_matrix))
    return w.bits()


class DeviceBzip2Encoder:
    """bzip2 encoder with the block transforms on device.

    batch > 1 vmaps the fused kernel over same-length blocks, keeping the
    chip busy; distinct tail lengths compile once each (cached)."""

    def __init__(self, level=9, batch=1):
        if not 1 <= level <= 9:
            raise ValueError('Invalid block size multiplier')
        self.level = level
        self.block_size = level * 100000 - 19
        self.batch = batch

    def _run_core(self, blocks):
        """Run encode_block_core on a list of equal-length blocks."""
        n = blocks[0].shape[0]
        remaps = []
        eobs = []
        for b in blocks:
            used = np.zeros(256, dtype=bool)
            used[b] = True
            remap = np.zeros(256, dtype=np.int32)
            remap[np.nonzero(used)[0]] = np.arange(int(used.sum()))
            remaps.append(remap)
            eobs.append(int(used.sum()) + 1)
        if len(blocks) == 1:
            pidx, syms, count, freq = jk.encode_block_core(
                jnp.asarray(blocks[0]), n, jnp.asarray(remaps[0]),
                jnp.int32(eobs[0]))
            return [(int(pidx), np.asarray(syms), int(count),
                     np.asarray(freq))]
        core = jax.vmap(lambda b, r, e: jk.encode_block_core(b, n, r, e))
        pidxs, syms, counts, freqs = core(
            jnp.asarray(np.stack(blocks)), jnp.asarray(np.stack(remaps)),
            jnp.asarray(eobs, dtype=jnp.int32))
        return [(int(pidxs[i]), np.asarray(syms[i]), int(counts[i]),
                 np.asarray(freqs[i])) for i in range(len(blocks))]

    def compress(self, data, output=None):
        data = np.asarray(data, dtype=np.uint8) if isinstance(data, np.ndarray) \
            else np.frombuffer(bytes(data), dtype=np.uint8)
        o = coerce_output_stream(output)
        out = BitStream(o.stream)
        for ch in 'BZh':
            out.write_byte(ord(ch))
        out.write_byte(ord('0') + self.level)

        blocks = _split_blocks(data, self.block_size)
        stream_crc = 0
        i = 0
        while i < len(blocks):
            # group same-length blocks for batching
            group = [blocks[i]]
            while (len(group) < self.batch and i + len(group) < len(blocks)
                   and blocks[i + len(group)][0].shape[0]
                   == group[0][0].shape[0]):
                group.append(blocks[i + len(group)])
            results = self._run_core([g[0] for g in group])
            for (block, crc), (pidx, syms, count, freq) in zip(group,
                                                               results):
                stream_crc = stream_crc_combine(stream_crc, crc)
                out.write_bits(48, WHOLEPI)
                out.write_bits(32, crc)
                out.write_bit_array(
                    _finish_block_host(block, pidx, syms, count, freq))
            i += len(group)

        out.write_bits(48, SQRTPI)
        out.write_bits(32, stream_crc)
        out.flush()
        return o.retval


def compress_file_device(data, output=None, level=9, batch=1):
    return DeviceBzip2Encoder(level, batch).compress(data, output)
