"""Device-accelerated, block-parallel bzip2 encoder.

The TPU execution model (SURVEY.md §2 parallel table):

* **DP over blocks** — bzip2 blocks are independent (they share only the
  rolling stream CRC and output bit alignment, both host-side), so blocks
  are batched on one chip (vmap) or sharded across a `jax.sharding.Mesh`
  (shard_map, see mesh.py).
* **Two device splits** — 'full' runs the fused transform kernel
  (`ops.jax_kernels.encode_block_core`: rotation sort -> BWT -> MTF ->
  RLE2) entirely in HBM (what the mesh path shards); 'hybrid' keeps the
  O(n log n) sort on device and runs the latency-bound sequential
  stages on the native host runtime — the faster split on a
  tunnel-attached chip.
* **Host boundary** — RLE1 packing and CRC (zlib-reflection path, GB/s),
  length-limited Huffman allocation (O(258) per group), and final bit
  stitching.

Output is byte-identical to codecs.bzip2.compress_file.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..codecs.bzip2 import WHOLEPI, SQRTPI, BitArrayWriter
from ..ops import huffman_stages as hs
from ..ops import jax_kernels as jk
from ..ops import mtf as mtf_ops
from ..ops import rle as rle_ops
from ..utils.crc32 import crc32_bzip2, stream_crc_combine
from ..utils.stream import BitStream, coerce_output_stream

GROUP_SIZE = hs.GROUP_SIZE

try:
    from .. import native as _native
except Exception:  # pragma: no cover
    _native = None


from ..codecs.bzip2 import mtf_rle2 as _mtf_rle2  # shared fused scan


def _split_blocks(data, block_size):
    """Host RLE1 pass: returns list of (packed_block, crc)."""
    out = []
    start = 0
    n = np.asarray(data).shape[0]
    while start < n:
        block, consumed = rle_ops.rle1_encode(data, start, block_size)
        if block.shape[0] == 0 or consumed == 0:
            break
        crc = crc32_bzip2(data[start:start + consumed])
        out.append((block, crc))
        # termination by input position: mid-stream blocks may be short
        # of block_size (RLE1 count-byte back-off defers a byte)
        start += consumed
    return out


def _block_meta(block):
    used = np.zeros(256, dtype=bool)
    used[block] = True
    alphabet = np.nonzero(used)[0]
    remap = np.zeros(256, dtype=np.int32)
    remap[alphabet] = np.arange(len(alphabet))
    return used, len(alphabet), remap


def _finish_block(block, pidx, syms, count, freq, alphabet_size, used):
    """Host entropy stage (reference heuristics, vectorized scans, u64
    payload assembly).  Returns (header_bits, (payload_bytes, nbits))."""
    end_of_block = alphabet_size + 1
    syms = syms[:count].astype(np.int64)
    length_matrix, selectors = hs.optimize_groups(
        syms, end_of_block + 1, freq[:end_of_block + 1])
    n_groups = length_matrix.shape[0]
    code_matrix = np.stack([hs.canonical_codes(length_matrix[g])
                            for g in range(n_groups)])
    payload, total_bits = hs.payload_bytes(syms, selectors, length_matrix,
                                           code_matrix)

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
    return w.bits(), (payload, total_bits)


def _device_block_header(pidx, lens, n_groups, sel, count, alphabet_size,
                         used):
    """Block header bits from the matrices an encode_block_full download
    provides (same layout as _finish_block writes)."""
    nvc = (count + GROUP_SIZE - 1) // GROUP_SIZE
    selectors = np.asarray(sel[:nvc], dtype=np.uint8)
    m = alphabet_size + 2
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
        w.append(hs.emit_table_deltas(
            np.asarray(lens[g, :m], dtype=np.uint8)))
    return w.bits()


class DeviceBzip2Encoder:
    """bzip2 encoder with block transforms on device.

    mode='full'   — the ENTIRE block encode on device, entropy stage
                    included (ops.device_entropy.encode_block_full):
                    the host downloads packed payload bytes + tiny
                    header matrices, never the symbols.  Minimum
                    download (~compressed size) — the right mode when
                    the host<->device link is the bottleneck.
    mode='core'   — sort+BWT+MTF+RLE2 on device (encode_block_core),
                    Huffman group optimization on the native host from
                    the downloaded symbol stream.
    mode='hybrid' — sort+BWT on device (the O(n log n) make-or-break
                    kernel), MTF/RLE2/Huffman on the native host runtime.
                    The best split when host cores are free and the
                    link is fast.

    Cores for all blocks are dispatched up front (async) so the chip
    computes ahead of the host assembly loop."""

    def __init__(self, level=9, mode='hybrid', self_check=False,
                 batch=False, fixed_width=None):
        if not 1 <= level <= 9:
            raise ValueError('Invalid block size multiplier')
        self.level = level
        self.block_size = level * 100000 - 19
        self.mode = mode
        # One MTF width for every block.  The per-alphabet 64/128/256
        # ladder tripled the compiled-program surface, and over the axon
        # tunnel each encode_block_full variant costs 100-500 s of
        # server-side XLA compile that no local cache avoids (measured
        # round 4) — warm_device would warm width 256 (random data) and
        # the first real text block would then stall the timed region
        # compiling the width-128 variant.  The narrow widths' MTF-scan
        # saving is small next to that; default to the universal 256 on
        # TPU, ladder only where compiles are cheap (CPU tests).
        if fixed_width is None:
            fixed_width = 256 if jax.default_backend() == 'tpu' else 0
        self.fixed_width = fixed_width
        # batch=True dispatches all full-size blocks as ONE vmapped
        # device call (jk.bwt_block_batch).  Measured on a single v5e:
        # the async per-block dispatch already hides transfer latency
        # and the vmapped while_loop runs lockstep to the slowest
        # block, so batching is ~2x SLOWER there (0.72s vs 0.38s on
        # sample5) — it is the single-chip form of the mesh sharding
        # (each mesh device gets one lane), not a one-chip win, hence
        # default False.
        self.batch = batch
        # sanitizer mode (the framework's analog of the reference's dense
        # console.assert checking): every device block result is
        # cross-checked against the host transform before being used
        self.self_check = self_check

    def _submit(self, block, alphabet_size, remap):
        n = block.shape[0]
        if n != self.block_size:
            # odd-length tail: each distinct shape would cost a fresh XLA
            # compile; the native host BWT handles it instead
            return ('host', block)
        width = self.fixed_width or \
            (64 if alphabet_size + 2 <= 64 else
             128 if alphabet_size + 2 <= 128 else 256)
        if self.mode == 'full':
            # all-device block encode: the host only sees packed payload
            # bytes + the tiny header matrices (ops.device_entropy)
            from ..ops import device_entropy as de
            mtf_impl = 'pallas' if jax.default_backend() == 'tpu' \
                else 'xla'
            return ('full', de.encode_block_full(
                jnp.asarray(block), n, jnp.asarray(remap),
                jnp.int32(alphabet_size + 1), width, mtf_impl))
        if self.mode == 'core':
            # device transforms, host entropy (downloads the symbol
            # stream instead of the 2x larger BWT column)
            return jk.encode_block_core(
                jnp.asarray(block), n, jnp.asarray(remap),
                jnp.int32(alphabet_size + 1), width)
        return jk.bwt_block(jnp.asarray(block), n)

    def compress(self, data, output=None):
        data = np.asarray(data, dtype=np.uint8) \
            if isinstance(data, np.ndarray) \
            else np.frombuffer(bytes(data), dtype=np.uint8)
        o = coerce_output_stream(output)
        out = BitStream(o.stream)
        for ch in 'BZh':
            out.write_byte(ord(ch))
        out.write_byte(ord('0') + self.level)

        blocks = _split_blocks(data, self.block_size)

        # batched dispatch: one vmapped call for every full-size block
        full_rows = [i for i, (b, _) in enumerate(blocks)
                     if b.shape[0] == self.block_size]
        use_batch = (self.batch and self.mode == 'hybrid'
                     and len(full_rows) > 1)
        batch_dev = None
        if use_batch:
            stacked = jnp.asarray(
                np.stack([blocks[i][0] for i in full_rows]))
            batch_dev = jk.bwt_block_batch(stacked, self.block_size)
        row_of = {i: r for r, i in enumerate(full_rows)}

        submitted = []
        for i, (block, crc) in enumerate(blocks):
            used, alphabet_size, remap = _block_meta(block)
            if use_batch and i in row_of:
                core = ('batch', row_of[i])
            else:
                core = self._submit(block, alphabet_size, remap)
            submitted.append((block, crc, used, alphabet_size, core))

        # prefetch device results in the background: the transfer for
        # block k+1 overlaps the host entropy stage for block k
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(2)
        batch_np = pool.submit(
            lambda: (np.asarray(batch_dev[0]), np.asarray(batch_dev[1]))) \
            if use_batch else None

        def fetch(core):
            if isinstance(core, tuple) and len(core) == 2 and \
                    isinstance(core[0], str):
                if core[0] == 'batch':
                    U_all, p_all = batch_np.result()
                    return (U_all[core[1]], p_all[core[1]])
                if core[0] == 'full':
                    return self._fetch_full(core[1])
                return core
            return tuple(np.asarray(x) for x in core)

        try:
            fetched = [pool.submit(fetch, s[4]) for s in submitted]
            return self._assemble(o, out, submitted, fetched)
        finally:
            pool.shutdown(wait=False)

    # payload fetch sizes are BUCKETED to this ladder: a concrete-size
    # device slice compiles one executable PER DISTINCT SIZE, and over
    # the axon tunnel each fresh compile costs seconds to minutes — a
    # per-block exact-size slice (round 2) recompiled for every block
    # and made the hetero scheduler 3x slower than host-only.  A fixed
    # ladder costs <= 128 KB of extra transfer (~7 ms) and compiles
    # each bucket once per process (persistent-cached thereafter).
    FETCH_BUCKET = 128 * 1024

    def _fetch_full(self, dev):
        """Download an encode_block_full result: small matrices plus only
        the payload prefix that is real (two-step fetch: the byte count
        arrives first, then a bucket-size device slice transfers about
        total_bits/8 bytes instead of the 1.5n-byte buffer)."""
        pidx, payload, bits, lens, g, sel, count, freq = dev
        bits = int(bits)
        if bits > payload.shape[0] * 8:  # payload cap exceeded
            return ('hostfull',)         # (pathological block; recompute)
        nbytes = (bits + 7) // 8
        bucket = min(-(-nbytes // self.FETCH_BUCKET) * self.FETCH_BUCKET,
                     payload.shape[0])
        pay = np.asarray(payload[:bucket])[:nbytes]
        return ('fullres', int(pidx), pay, bits, np.asarray(lens),
                int(g), np.asarray(sel), int(count))

    def _assemble(self, o, out, submitted, fetched):
        from .profiling import stage_timer
        timer = stage_timer()
        stream_crc = 0
        for (block, crc, used, alphabet_size, _), fut in zip(submitted,
                                                             fetched):
            with timer.stage('device wait+fetch'):
                core = fut.result()
            if self.self_check:
                self._check_block(block, used, core)
            tag = core[0] if isinstance(core, tuple) and \
                isinstance(core[0], str) else None
            if tag == 'fullres':
                with timer.stage('host header stage'):
                    _, pidx, payload, total_bits, lens, g, sel, count = \
                        core
                    header_bits = _device_block_header(
                        pidx, lens, g, sel, count, alphabet_size, used)
                stream_crc = stream_crc_combine(stream_crc, crc)
                out.write_bits(48, WHOLEPI)
                out.write_bits(32, crc)
                out.write_bit_array(header_bits)
                out.write_bit_array(
                    np.unpackbits(payload, count=total_bits))
                continue
            if tag in ('host', 'hostfull'):
                from ..ops import bwt as bwt_ops
                n = block.shape[0]
                U = np.zeros(n, dtype=np.uint8)
                pidx = bwt_ops.bwtransform2(block, U, n, 256)
                alphabet = np.nonzero(used)[0].astype(np.uint8)
                syms, freq = _mtf_rle2(U, alphabet, alphabet_size)
                count = len(syms)
            elif self.mode == 'core':
                pidx, syms_dev, count_dev, freq_dev = core
                count = int(count_dev)
                freq = np.asarray(freq_dev)
                syms = np.asarray(syms_dev)
            else:
                U_dev, pidx = core
                U = np.asarray(U_dev)
                alphabet = np.nonzero(used)[0].astype(np.uint8)
                syms, freq = _mtf_rle2(U, alphabet, alphabet_size)
                count = len(syms)
            with timer.stage('host entropy stage'):
                header_bits, (payload, total_bits) = _finish_block(
                    block, int(pidx), syms, count, freq, alphabet_size,
                    used)
            stream_crc = stream_crc_combine(stream_crc, crc)
            out.write_bits(48, WHOLEPI)
            out.write_bits(32, crc)
            out.write_bit_array(header_bits)
            out.write_bit_array(
                np.unpackbits(payload, count=total_bits))

        out.write_bits(48, SQRTPI)
        out.write_bits(32, stream_crc)
        out.flush()
        timer.report()
        return o.retval

    def _check_block(self, block, used, core):
        """Sanitizer: re-run the block transform on the host and compare
        (the race/assert-mode analog from SURVEY.md §5)."""
        from ..ops import bwt as bwt_ops
        tag = core[0] if isinstance(core, tuple) and \
            isinstance(core[0], str) else None
        if tag in ('host', 'hostfull'):
            return  # host path: nothing to cross-check
        n = block.shape[0]
        U_ref = np.zeros(n, dtype=np.uint8)
        pidx_ref = bwt_ops.bwtransform2(block, U_ref, n, 256)
        if tag == 'fullres':
            pidx = int(core[1])
        elif self.mode == 'core':
            pidx = int(core[0])
        else:
            pidx = int(core[1])
            U = np.asarray(core[0])
            if not (U == U_ref).all():
                raise AssertionError('device BWT mismatch vs host')
        if pidx != pidx_ref:
            raise AssertionError('device pidx mismatch vs host')


def compress_file_device(data, output=None, level=9, mode='hybrid',
                         batch=False):
    return DeviceBzip2Encoder(level, mode=mode,
                              batch=batch).compress(data, output)


def bwtcp_compress_device(data, output=None, level=9, batch=8):
    """BWTCP encode with the ENTIRE per-block body on device: EOF BWT,
    MTF, RLE2, the adaptive FenwickModel and the Schindler range coder
    all run as batched device kernels (ops.device_model /
    ops.device_coder), seeded with the host coder's exported state after
    the tiny header fields (length, pidx, usage tree) — the same
    mid-stream seam the native C++ runtime uses.  Byte-identical to
    BWTCP.compress_file at levels >= 6 (Fenwick blocks; levels <= 5
    select DefSum and take the host path).

    This is the SURVEY §7 step-5 milestone: the heap-layout Fenwick tree
    as a device array driving the batched coder, consuming BWTCP's
    independent per-block streams (`batch` lanes per dispatch)."""
    import jax.numpy as jnp
    from ..codecs import bwtcp as bwtcp_mod
    from ..codecs.bwtc import _encode_usage_tree
    from ..coders.range_coder import RangeCoder
    from ..models.log_distance_model import LogDistanceModel
    from ..models.no_model import NoModel
    from ..ops import device_coder as dcoder
    from ..ops import device_model as dmodel
    from ..utils import util
    from ..utils.stream import BufferStream

    level = bwtcp_mod._level_of(level)
    data = np.ascontiguousarray(data, dtype=np.uint8) \
        if isinstance(data, np.ndarray) \
        else np.frombuffer(bytes(data), dtype=np.uint8)
    if level <= 5:
        return bwtcp_mod.BWTCP.compress_file(data, output, level)
    bs = level * 100000
    blocks = [data[i:i + bs] for i in range(0, max(len(data), 1), bs)] \
        if len(data) else []

    full = [i for i, b in enumerate(blocks) if b.shape[0] == bs]
    payloads = [None] * len(blocks)

    for group_start in range(0, len(full), batch):
        idxs = full[group_start:group_start + batch]
        L = len(idxs)
        stacked = jnp.asarray(np.stack([blocks[i] for i in idxs]))
        U_all, pidx_all = jax.vmap(
            lambda b: jk.bwt_eof_block(b, bs))(stacked)
        pidx_np = np.asarray(pidx_all)
        # host: header fields through the real models, then export the
        # coder state for the device to continue
        heads, states, Ns, remaps = [], [], [], []
        for k, i in enumerate(idxs):
            out = BufferStream()
            enc = RangeCoder(out)
            enc.encode_start(0, 0)
            nm = NoModel.factory(enc)
            len_model = LogDistanceModel(level * 100000, 0, nm, nm)
            len_model.encode(bs)
            len_model.encode(int(pidx_np[k]))
            used = np.zeros(256, dtype=np.int64)
            used[blocks[i]] = 1
            _encode_usage_tree(enc, used)
            alphabet = np.nonzero(used)[0]
            remap = np.zeros(256, dtype=np.int32)
            remap[alphabet] = np.arange(len(alphabet))
            heads.append(out.buffer[:out.pos].copy())
            states.append(enc.export_enc_state())
            Ns.append(len(alphabet) + 2)   # model size asize+1
            remaps.append(remap)
        # device: MTF -> RLE2 (minus EOB) -> Fenwick -> coder -> bytes
        T = bs + 1
        dense = jax.vmap(lambda u, r: r[u.astype(jnp.int32)])(
            U_all, jnp.asarray(np.stack(remaps)))
        mtf = jax.vmap(lambda d: jk.mtf_encode(d, bs, 512, 256))(dense)
        syms, counts, _ = jax.vmap(
            lambda m: jk.rle2_encode(m, bs, jnp.int32(0)))(mtf)
        valid = (jnp.arange(T)[None, :] <
                 (counts - 1)[:, None])      # drop the EOB slot
        sy, lt, tot, v = dmodel.fenwick_encode_streams(
            syms, valid, jnp.asarray(np.array(Ns, np.int32)), 258,
            bwtcp_mod.F_PROB_MAX, bwtcp_mod.F_PROB_INCR)
        tok_cap = bs + (bs >> 2) + 64    # tokens <= final bytecount
        tokens, tok_n, bc = dcoder.batched_range_encode(
            sy, lt, tot, v, jnp.zeros(L, jnp.uint32),
            jnp.zeros(L, jnp.uint32), tok_cap,
            init_state=jnp.asarray(np.stack(states)))
        tok_np = np.asarray(tok_n)
        byts, lens = dcoder.token_bytes(tokens, tok_n, bc,
                                        bs + (bs >> 1) + 4096)
        byts = np.asarray(byts)
        lens = np.asarray(lens)
        for k, i in enumerate(idxs):
            if tok_np[k] > tok_cap:      # token overflow: host fallback
                continue
            payloads[i] = np.concatenate(
                [heads[k], byts[k, :lens[k]]]).astype(np.uint8)

    for i, b in enumerate(blocks):
        if payloads[i] is None:          # tail / overflow: host path
            payloads[i] = bwtcp_mod._encode_block(b, level)

    # container via the shared helper (byte-identical to
    # bwtcp.compress_file by construction)
    def guts(in_stream, out_stream, file_size, props, final_byte):
        out_stream.write_byte(level)
        util.write_unsigned_number(out_stream, len(payloads))
        for p in payloads:
            util.write_unsigned_number(out_stream, len(p))
        for p in payloads:
            if hasattr(out_stream, 'write_array'):
                out_stream.write_array(np.asarray(p, dtype=np.uint8))
            else:
                out_stream.write(p, 0, len(p))

    return util.compress_file_helper(bwtcp_mod.MAGIC, guts)(
        data, output, level)


def bwtcl_compress_device(data, output=None, level=9, lanes=None):
    """BWTC-L encode with the ENTIRE per-block body on device — EOF
    BWT, MTF, RLE2, the 128-lane Fenwick models and the batched range
    coder all in HBM (ops.device_lane.encode_block_lanes); the host
    writes headers and the container.  Byte-identical to
    codecs.bwtcl.compress_file; short tail blocks take the host path."""
    from ..codecs import bwtcl as bl
    from ..ops import device_lane as dl
    from ..utils import util
    from ..utils.stream import BufferStream

    if lanes is None:
        lanes = bl.LANES
    level = bl._level_of(level)
    data = np.ascontiguousarray(data, dtype=np.uint8) \
        if isinstance(data, np.ndarray) \
        else np.frombuffer(bytes(data), dtype=np.uint8)
    bs = level * 100000
    blocks = [data[i:i + bs] for i in range(0, max(len(data), 1), bs)] \
        if len(data) else []

    # dispatch all full blocks ahead (async), then assemble
    T, tok_cap, lane_cap = dl.lane_caps(bs, lanes)
    flat_cap = bs + (bs >> 1) + 4096
    devres = {}
    metas = {}
    for i, b in enumerate(blocks):
        if b.shape[0] != bs:
            continue
        used = np.zeros(256, dtype=bool)
        used[b] = True
        alphabet = np.nonzero(used)[0]
        remap = np.zeros(256, dtype=np.int32)
        remap[alphabet] = np.arange(len(alphabet))
        metas[i] = (used, len(alphabet))
        devres[i] = dl.encode_block_lanes(
            jnp.asarray(b), bs, lanes, jnp.asarray(remap),
            jnp.int32(len(alphabet)))

    BUCKET = 128 * 1024
    payloads = [None] * len(blocks)
    for i, b in enumerate(blocks):
        if i not in devres:
            payloads[i] = bl.encode_block(b, lanes)
            continue
        pidx, S, lens, flat, total, max_tok = devres[i]
        total = int(total)
        if int(max_tok) > tok_cap or total > flat_cap or \
                int(jnp.max(lens)) > lane_cap:
            payloads[i] = bl.encode_block(b, lanes)   # overflow fallback
            continue
        bucket = min(-(-total // BUCKET) * BUCKET, flat_cap)
        body = np.asarray(flat[:bucket])[:total]
        lens_np = np.asarray(lens)
        used, asize = metas[i]
        head = BufferStream()
        util.write_unsigned_number(head, bs)
        util.write_unsigned_number(head, int(pidx))
        util.write_unsigned_number(head, int(S))
        util.write_unsigned_number(head, lanes)
        head.write_array(np.packbits(used))
        for ln in lens_np.tolist():
            util.write_unsigned_number(head, int(ln))
        payloads[i] = np.concatenate(
            [head.get_buffer(), body]).astype(np.uint8)

    def guts(in_stream, out_stream, file_size, props, final_byte):
        out_stream.write_byte(level)
        util.write_unsigned_number(out_stream, len(payloads))
        for p in payloads:
            util.write_unsigned_number(out_stream, len(p))
        for p in payloads:
            if hasattr(out_stream, 'write_array'):
                out_stream.write_array(np.asarray(p, dtype=np.uint8))
            else:
                out_stream.write(p, 0, len(p))

    return util.compress_file_helper(bl.MAGIC, guts)(data, output, level)


def bwtcl_decompress_device(data, output=None):
    """BWTC-L decode with the per-block body on device: the lock-step
    L-lane Fenwick/coder walk, RLE2/MTF undo, and the inverse EOF BWT
    all in HBM (ops.device_lane.decode_block_lanes); the host parses
    headers and validates lengths.  Blocks whose shape doesn't match
    the compiled caps (tails, foreign lane counts) take the host path."""
    from ..codecs import bwtcl as bl
    from ..ops import device_lane as dl
    from ..utils import util
    from ..utils.stream import ArrayInputStream, coerce_output_stream

    data = np.frombuffer(bytes(data), dtype=np.uint8) \
        if not isinstance(data, np.ndarray) else data
    ins = ArrayInputStream(np.ascontiguousarray(data, dtype=np.uint8))
    for ch in bl.MAGIC:
        if ins.read_byte() != ord(ch):
            raise ValueError('bad magic')
    util.read_unsigned_number(ins)            # fileSize+1 (unused)
    level = ins.read_byte()
    bs = level * 100000
    n_blocks = util.read_unsigned_number(ins)
    sizes = [util.read_unsigned_number(ins) for _ in range(n_blocks)]
    payloads = []
    for sz in sizes:
        buf = np.zeros(sz, dtype=np.uint8)
        ins.read(buf, 0, sz)
        payloads.append(buf)

    results = [None] * n_blocks
    pending = []
    for i, p in enumerate(payloads):
        length, pidx, S, lanes, used, lane_payloads = \
            bl.parse_block_header(p)
        T, _, lane_cap = dl.lane_caps(bs, lanes)
        if length != bs or max((len(x) for x in lane_payloads),
                               default=0) > lane_cap:
            results[i] = bl.decode_block(p)
            continue
        paymat = np.zeros((lanes, lane_cap), dtype=np.uint8)
        for l, lp in enumerate(lane_payloads):
            paymat[l, :len(lp)] = lp
        alphabet = np.nonzero(used)[0]
        sym_map = np.zeros(256, dtype=np.int32)
        sym_map[:len(alphabet)] = alphabet
        dev = dl.decode_block_lanes(
            jnp.asarray(paymat), bs, lanes, jnp.int32(S),
            jnp.int32(pidx), jnp.int32(len(alphabet)),
            jnp.asarray(sym_map))
        pending.append((i, dev))
    for i, (out, total) in pending:
        if int(total) != bs:
            raise ValueError('BWTC-L device block expands to %d != %d'
                             % (int(total), bs))
        results[i] = np.asarray(out)

    o = coerce_output_stream(output)
    for r in results:
        o.stream.write(r, 0, len(r))
    return o.retval


class DeviceBWTCEncoder:
    """BWTC encoder with the per-block EOF-terminated BWT on device.

    BWTC's range coder spans all blocks (BWTC.js:13-14), so the entropy
    stream is inherently sequential — but each block's BWT is independent:
    all device sorts are dispatched ahead and fetched in the background
    while the shared coder streams earlier blocks.  Output is
    byte-identical to codecs.bwtc.BWTC.compress_file."""

    def __init__(self, level=9):
        if not 1 <= level <= 9:
            raise ValueError('invalid level')
        self.level = level
        self.block_size = level * 100000

    def compress(self, data, output=None):
        import compressjs_tpu.codecs.bwtc as bwtc_mod
        from ..ops import bwt as bwt_ops

        # ascontiguousarray: the digest keys below hash buffer views
        data = np.ascontiguousarray(data, dtype=np.uint8) \
            if isinstance(data, np.ndarray) \
            else np.frombuffer(bytes(data), dtype=np.uint8)

        # precompute device BWTs for the full-size blocks, keyed by a
        # digest of the block CONTENT: the codec's own prefetch pool
        # calls the hook from multiple threads in nondeterministic
        # order, so call-order bookkeeping would hand blocks each
        # other's transforms (two identical blocks sharing one future
        # is correct — same bytes, same BWT).  A 32-byte blake2b key
        # instead of the bytes themselves keeps retained memory O(1)
        # per block on large inputs.
        import hashlib

        def block_key(a):
            return hashlib.blake2b(a, digest_size=32).digest()

        bs = self.block_size
        n_full = len(data) // bs
        futures = {}
        if n_full:
            from concurrent.futures import ThreadPoolExecutor
            pool = ThreadPoolExecutor(2)
            for b in range(n_full):
                blk = data[b * bs:(b + 1) * bs]
                dev = jk.bwt_eof_block(jnp.asarray(blk), bs)
                futures[block_key(blk)] = pool.submit(
                    lambda d: (np.asarray(d[0]), int(d[1])), dev)

        # route this call's bwtransform through the precomputed results
        # (thread-local hook: concurrent compressions stay independent)
        def bwt_with_cache(T, U, A, n, alphabet_size=256):
            fut = futures.get(block_key(T)) if n == bs else None
            if fut is not None:
                Un, pidx = fut.result()
                U[:n] = Un
                return pidx
            return bwt_ops.bwtransform(T, U, A, n, alphabet_size)

        token = bwtc_mod._BWT_HOOK.set(bwt_with_cache)
        try:
            return bwtc_mod.BWTC.compress_file(data, output, self.level)
        finally:
            bwtc_mod._BWT_HOOK.reset(token)
            if n_full:
                pool.shutdown(wait=False)
