"""Heterogeneous bzip2 encode: host cores and the TPU share one block
queue.

The tunnel-attached chip cannot beat N host cores alone (its uplink and
downlink cap block throughput), but it can ADD throughput: blocks are
independent, so the device pipeline (all-device encode_block_full, with
several blocks in flight to hide the ~30 ms dispatch latency) drains the
front of the queue while host workers (native C++ entropy pipeline)
drain the back.  Output is byte-identical to codecs.bzip2.compress_file.

This is the single-host form of the DP axis: same block-level split the
mesh path shards over chips, with the host pool standing in for extra
devices.
"""

from __future__ import annotations

import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..codecs.bzip2 import WHOLEPI, SQRTPI
from ..utils.crc32 import stream_crc_combine
from ..utils.stream import BitStream, coerce_output_stream
from . import pipeline as pl


class _BlockQueue:
    """Two-ended index queue: the device takes from the front, host
    workers from the back, until they meet."""

    def __init__(self, n):
        self._dq = deque(range(n))
        self._lock = threading.Lock()

    def pop_front(self):
        with self._lock:
            return self._dq.popleft() if self._dq else None

    def pop_back(self):
        with self._lock:
            return self._dq.pop() if self._dq else None


def hetero_compress_bzip2(data, output=None, level=9, host_workers=2,
                          device=True, device_inflight=3,
                          device_mode='full'):
    """Encode `data` with host workers + (optionally) the device pipeline
    pulling blocks from a shared queue.  Returns the compressed bytes
    (or writes to `output`)."""
    import jax
    import jax.numpy as jnp

    data = np.asarray(data, dtype=np.uint8) \
        if isinstance(data, np.ndarray) \
        else np.frombuffer(bytes(data), dtype=np.uint8)
    block_size = level * 100000 - 19
    blocks = pl._split_blocks(data, block_size)
    nblocks = len(blocks)
    queue = _BlockQueue(nblocks)
    results = {}
    res_lock = threading.Lock()
    res_ready = threading.Condition(res_lock)

    metas = []
    for block, crc in blocks:
        used, alphabet_size, remap = pl._block_meta(block)
        metas.append((used, alphabet_size, remap))

    def host_block(i):
        block, crc = blocks[i]
        used, alphabet_size, remap = metas[i]
        from ..ops import bwt as bwt_ops
        n = block.shape[0]
        U = np.zeros(n, dtype=np.uint8)
        pidx = bwt_ops.bwtransform2(block, U, n, 256)
        alphabet = np.nonzero(used)[0].astype(np.uint8)
        syms, freq = pl._mtf_rle2(U, alphabet, alphabet_size)
        header_bits, (payload, total_bits) = pl._finish_block(
            block, int(pidx), syms, len(syms), freq, alphabet_size, used)
        return header_bits, payload, total_bits

    def host_worker():
        while True:
            i = queue.pop_back()
            if i is None:
                return
            r = host_block(i)
            with res_ready:
                results[i] = r
                res_ready.notify_all()

    def device_worker():
        enc = pl.DeviceBzip2Encoder(level, mode=device_mode)
        inflight = deque()

        def finish(i, core):
            ctag = core[0] if isinstance(core, tuple) and core and \
                isinstance(core[0], str) else None
            if ctag == 'full':
                fetched = enc._fetch_full(core[1])
            elif ctag is not None:        # ('host', block) tail
                fetched = core
            else:
                fetched = tuple(np.asarray(x) for x in core)
            block, crc = blocks[i]
            used, alphabet_size, remap = metas[i]
            tag = fetched[0] if isinstance(fetched, tuple) and fetched \
                and isinstance(fetched[0], str) else None
            if tag == 'fullres':
                _, pidx, payload, total_bits, lens, g, sel, count = \
                    fetched
                header_bits = pl._device_block_header(
                    pidx, lens, g, sel, count, alphabet_size, used)
                r = (header_bits, payload, total_bits)
            elif tag in ('host', 'hostfull'):
                r = host_block(i)
            else:
                U, pidx = fetched
                alphabet = np.nonzero(used)[0].astype(np.uint8)
                syms, freq = pl._mtf_rle2(np.asarray(U), alphabet,
                                          alphabet_size)
                header_bits, (payload, total_bits) = pl._finish_block(
                    block, int(pidx), syms, len(syms), freq,
                    alphabet_size, used)
                r = (header_bits, payload, total_bits)
            with res_ready:
                results[i] = r
                res_ready.notify_all()

        while True:
            while len(inflight) < device_inflight:
                i = queue.pop_front()
                if i is None:
                    break
                block, crc = blocks[i]
                used, alphabet_size, remap = metas[i]
                inflight.append((i, enc._submit(block, alphabet_size,
                                                remap)))
            if not inflight:
                return
            i, core = inflight.popleft()
            finish(i, core)

    threads = []
    if device:
        t = threading.Thread(target=device_worker, daemon=True)
        t.start()
        threads.append(t)
    for _ in range(host_workers):
        t = threading.Thread(target=host_worker, daemon=True)
        t.start()
        threads.append(t)

    # ordered assembly while workers run
    o = coerce_output_stream(output)
    out = BitStream(o.stream)
    for ch in 'BZh':
        out.write_byte(ord(ch))
    out.write_byte(ord('0') + level)
    stream_crc = 0
    for i in range(nblocks):
        with res_ready:
            while i not in results:
                res_ready.wait()
            header_bits, payload, total_bits = results.pop(i)
        crc = blocks[i][1]
        stream_crc = stream_crc_combine(stream_crc, crc)
        out.write_bits(48, WHOLEPI)
        out.write_bits(32, crc)
        out.write_bit_array(header_bits)
        out.write_bit_array(np.unpackbits(payload, count=total_bits))
    out.write_bits(48, SQRTPI)
    out.write_bits(32, stream_crc)
    out.flush()
    for t in threads:
        t.join()
    return o.retval
