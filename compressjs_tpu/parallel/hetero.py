"""Heterogeneous bzip2 encode: host cores and the TPU share one block
queue, and the device can NEVER extend the makespan.

The tunnel-attached chip cannot beat N host cores alone (its uplink and
downlink cap block throughput), but it can ADD throughput: bzip2 blocks
are independent (Bzip2.js:913-922 — they share only the rolling stream
CRC and bit alignment, both host-side), so the device pipeline (the
all-device encode_block_full, several blocks in flight to hide the
~30 ms dispatch latency) drains the BACK of the queue while host
workers (native C++ entropy pipeline) drain the FRONT in file order —
the ordered assembly loop streams right behind the host workers and
only waits on the device for the file's tail blocks.

Round-2 regression and the three guards that fix it (the measured
failure was hetero at 5.48 MB/s vs 16.23 host-only — the device
SUBTRACTED throughput):

1. **No data-dependent device shapes.**  The per-block exact-size
   payload fetch compiled a fresh executable per block over the axon
   tunnel (seconds..minutes each).  Fetches now use a fixed bucket
   ladder (DeviceBzip2Encoder.FETCH_BUCKET).
2. **Self-calibrating claims.**  The device worker claims a block only
   while the host workers still have enough queue left to stay busy for
   the device's own expected service time (EWMA of observed per-block
   completion gaps, safety-factored).  A slow device therefore idles
   instead of hoarding blocks; it can slow nothing down.
3. **Work stealing.**  A claimed-but-unfinished device block can be
   recomputed by an idle host worker (first result wins), so even a
   device that stalls outright (cold compile, tunnel hang) is capped at
   costing zero: the host path proceeds as if the device were absent.

Output is byte-identical to codecs.bzip2.compress_file.  This is the
single-host form of the DP axis: the same block-level split the mesh
path shards over chips, with the host pool standing in for extra
devices.
"""

from __future__ import annotations

import os
import sys
import threading
import time
from collections import deque

import numpy as np

from ..codecs.bzip2 import WHOLEPI, SQRTPI
from ..utils.crc32 import stream_crc_combine
from ..utils.stream import BitStream, coerce_output_stream
from . import pipeline as pl


class _Scheduler:
    """Shared queue + claim/steal bookkeeping (all under one lock).

    Blocks are FED INCREMENTALLY (feed/close): the RLE1 split of a
    100 MB input costs ~0.45 s of native work, which round 3 measured
    as a fully serial prefix before any worker started — the feeder
    thread now discovers blocks while workers drain them."""

    def __init__(self, n, host_workers, safety=1.3, min_queue_factor=8,
                 claimable=None):
        self._dq = deque(range(n))
        self._lock = threading.Lock()
        self._more = threading.Condition(self._lock)
        self.closed = n > 0   # pre-filled queues start closed
        self.total = n if n else None
        # device-claimable predicate (full-size blocks only: tails route
        # to the host path inside the encoder anyway, wasting a device
        # slot AND poisoning the service-time EWMA with a host-speed
        # sample)
        self.claimable = claimable if claimable is not None \
            else (lambda i: True)
        self.host_workers = max(1, host_workers)
        self.safety = safety
        # tail_guard=0 drops the claim->done latency term from the
        # claim gate (throughput condition only): the work-stealing
        # path makes a tail overrun cost one duplicated ~0.1 s block on
        # an otherwise-IDLE host, so refusing the last ~lat*rate blocks
        # trades real device work for insurance that stealing already
        # provides (A/B knob: COMPRESSJS_TPU_TAIL_GUARD)
        # (string compare, not int(): a malformed value must not crash
        # compression at scheduler init over a tuning knob)
        self.tail_guard = 0 if os.environ.get(
            'COMPRESSJS_TPU_TAIL_GUARD') == '0' else 1
        self.min_queue = min_queue_factor * self.host_workers
        # EWMA service times (seconds/block); None until observed
        self.t_host = None
        self.t_dev = None
        # EWMA claim->done LATENCY (includes in-flight queue wait):
        # the tail-guard bound — the last claimed block completes about
        # this long after its claim, and host workers must have at
        # least that much queue left or they idle at the file tail
        # waiting on the device (round-3 measured tail stall ~0.5 s)
        self.t_dev_lat = None
        self.dev_done = 0
        self.dev_claimed = {}       # i -> True while device owns i
        self.stolen = set()
        self.stats = {'host': 0, 'device': 0, 'stolen': 0,
                      'dev_claims_denied': 0}

    def feed(self, i):
        """Feeder thread: block i discovered (appended in file order)."""
        with self._lock:
            self._dq.append(i)
            self._more.notify_all()

    def close(self, total):
        with self._lock:
            self.closed = True
            self.total = total
            self._more.notify_all()

    def pop_host(self):
        """Host work: next block in FILE ORDER (waiting on the feeder if
        it is still discovering blocks), else steal from the device's
        claimed-but-unfinished set."""
        with self._lock:
            while True:
                if self._dq:
                    return self._dq.popleft(), False
                if not self.closed:
                    self._more.wait()
                    continue
                for i in self.dev_claimed:
                    if i not in self.stolen:
                        self.stolen.add(i)
                        self.stats['stolen'] += 1
                        return i, True
                return None, False

    def try_claim_device(self):
        """Claim the LAST queued block for the device iff the hosts keep
        enough work to cover the device's expected service time (so a
        device claim can never idle a host worker before the queue would
        have drained anyway)."""
        with self._lock:
            q = len(self._dq)
            if q == 0:
                return None
            if self.dev_done <= 1:
                # uncalibrated (or single warm sample that may include
                # executable-load time): only claim against a deep queue
                if q < self.min_queue:
                    self.stats['dev_claims_denied'] += 1
                    return None
            else:
                t_h = self.t_host if self.t_host is not None else 0.25
                # after this claim the hosts have q-1 blocks of runway;
                # it must cover BOTH the device's pipelined service time
                # (throughput condition) and the full claim->done
                # latency of this block (tail condition — otherwise the
                # last in-flight device blocks outlive the queue and
                # the ordered assembly stalls on them)
                drain = (q - 1) * t_h / self.host_workers
                lat = self.t_dev_lat if self.t_dev_lat is not None \
                    else self.t_dev
                # throughput condition carries the safety factor; the
                # latency (tail) condition runs at margin 1.0 — if the
                # last device block overruns slightly, an idle host
                # steals it for one duplicated ~0.1 s block instead of
                # the device idling a ~1.4 s runway every file tail
                bound = self.safety * self.t_dev if self.tail_guard == 0 \
                    else max(self.safety * self.t_dev, lat)
                if self.t_dev is None or bound > drain:
                    self.stats['dev_claims_denied'] += 1
                    return None
            # unclaimable tails sit at the BACK (file end) — skip past
            # at most a few of them to the first claimable block
            for off in range(1, min(q, 4) + 1):
                i = self._dq[-off]
                if self.claimable(i):
                    del self._dq[-off]
                    self.dev_claimed[i] = True
                    return i
            self.stats['dev_claims_denied'] += 1
            return None

    def queue_len(self):
        with self._lock:
            return len(self._dq)

    def host_finished(self, dt):
        with self._lock:
            self.stats['host'] += 1
            self.t_host = dt if self.t_host is None else \
                0.7 * self.t_host + 0.3 * dt

    _dev_last_finish = None

    def device_finished(self, i, t_claim):
        now = time.perf_counter()
        with self._lock:
            self.dev_claimed.pop(i, None)
            self.dev_done += 1
            self.stats['device'] += 1
            # service time of a pipelined server = gap since it last
            # produced (or since this block's claim if it sat idle);
            # claim->finish alone would count inflight queue wait and
            # triple the estimate
            base = t_claim if self._dev_last_finish is None else \
                max(t_claim, self._dev_last_finish)
            dt = now - base
            self._dev_last_finish = now
            self.t_dev = dt if self.t_dev is None else \
                0.5 * self.t_dev + 0.5 * dt
            lat = now - t_claim
            self.t_dev_lat = lat if self.t_dev_lat is None else \
                0.5 * self.t_dev_lat + 0.5 * lat

    def device_abandoned(self, i):
        """Device exits with i claimed but unfinished: requeue unless a
        host worker already stole it."""
        with self._lock:
            self.dev_claimed.pop(i, None)
            if i not in self.stolen:
                self._dq.appendleft(i)


def warm_device(level=9, mode='full'):
    """Compile every device shape hetero will use (one synthetic block
    through the DeviceBzip2Encoder, fetch included) WITHOUT the claim
    heuristics — bench/warmup helper; the scheduler itself never force-
    feeds the device.

    The block is TEXT-LIKE, not random: a random block is incompressible,
    so its payload fetch lands in the top bucket and the 2-4 buckets
    real blocks hit (~128-512 KB payloads) would each compile their
    slice program MID-RUN, stalling the device pipeline for seconds per
    first-seen bucket.  The remaining bucket ladder is force-compiled
    below via direct payload slices."""
    rng = np.random.default_rng(0)
    block_size = level * 100000 - 19
    words = (b'the quick brown fox jumps over the lazy dog ',
             b'pack my box with five dozen liquor jugs ',
             b'0123456789 abcdefghijklmnopqrstuvwxyz ')
    base = b''.join(words[i % 3] for i in range(64))
    reps = -(-(block_size + 4) // len(base))
    data = np.frombuffer(base * reps, dtype=np.uint8)[:block_size + 4]
    enc = pl.DeviceBzip2Encoder(level, mode=mode)
    out = bytes(enc.compress(data))
    if mode == 'full':
        # force-compile every fetch-bucket slice on a device payload
        # buffer (cheap slice programs, but seconds each if first seen
        # while the scheduler is live)
        import jax.numpy as jnp
        from ..ops import device_entropy as de
        cap = de.payload_cap_bytes(block_size)
        payload = jnp.zeros(cap, dtype=jnp.uint8)
        # realistic text compresses to ~130-450 KB/block: warm the four
        # low buckets + the cap (each first-seen bucket otherwise costs
        # a multi-second slice compile while the scheduler is live)
        b = enc.FETCH_BUCKET
        while b <= min(4 * enc.FETCH_BUCKET, cap):
            np.asarray(payload[:b])
            b += enc.FETCH_BUCKET
        np.asarray(payload[:cap])
        # noise data exercises the top bucket + overflow guard path
        noise = rng.integers(0, 256, size=block_size + 4, dtype=np.uint8)
        out = bytes(enc.compress(noise))
    return out


def hetero_compress_bzip2(data, output=None, level=9, host_workers=2,
                          device=True, device_inflight=5,
                          device_mode='full', safety=1.3,
                          min_queue_factor=8, _encoder_factory=None):
    """Encode `data` with host workers + (optionally) the device pipeline
    pulling blocks from a shared queue.  Returns the compressed bytes
    (or writes to `output`).  Guaranteed-additive: see module docstring.

    `_encoder_factory` is a test hook (returns a DeviceBzip2Encoder-like
    object with `_submit` and `_fetch_full`).

    device_inflight=5 from the round-4 sweep (tools/hetero_tune.py,
    100 MB corpus, real v5e): 3 -> 5 cut claim denials 27 -> 8 and
    measured the best rate (17.47 MB/s vs 15.92 baseline; host-only
    15.2-17.0 across the same session, so treat deltas under ~1 MB/s
    as noise).  Deeper in-flight queues (8) started stealing; hybrid
    mode was not better than full."""
    data = np.asarray(data, dtype=np.uint8) \
        if isinstance(data, np.ndarray) \
        else np.frombuffer(bytes(data), dtype=np.uint8)
    block_size = level * 100000 - 19
    blocks = []   # grows as the feeder splits (appends under the GIL;
    #               workers only index entries the scheduler handed out)
    sched = _Scheduler(
        0, host_workers, safety, min_queue_factor,
        claimable=lambda i: blocks[i][0].shape[0] == block_size)

    def feeder():
        """Incremental RLE1 split: ~0.45 s of native work at 100 MB
        that used to run as a serial prefix before any worker."""
        from ..ops import rle as rle_ops
        from ..utils.crc32 import crc32_bzip2
        start = 0
        n = data.shape[0]
        try:
            while start < n:
                block, consumed = rle_ops.rle1_encode(data, start,
                                                      block_size)
                if block.shape[0] == 0 or consumed == 0:
                    break
                crc = crc32_bzip2(data[start:start + consumed])
                blocks.append((block, crc))
                sched.feed(len(blocks) - 1)
                start += consumed
        finally:
            sched.close(len(blocks))
            with res_ready:              # wake the assembly loop so it
                res_ready.notify_all()   # can observe the close

    results = {}
    res_lock = threading.Lock()
    res_ready = threading.Condition(res_lock)
    debug = bool(os.environ.get('COMPRESSJS_TPU_HETERO_DEBUG'))
    events = []

    meta_cache = {}
    meta_lock = threading.Lock()

    def meta(i):
        with meta_lock:
            m = meta_cache.get(i)
        if m is None:
            m = pl._block_meta(blocks[i][0])
            with meta_lock:
                meta_cache[i] = m
        return m

    def publish(i, r, source, t0):
        with res_ready:
            fresh = i not in results
            if fresh:
                results[i] = r
            if debug:
                events.append((i, source, t0, time.perf_counter(),
                               fresh))
            res_ready.notify_all()
        return fresh

    def host_block(i):
        block, crc = blocks[i]
        used, alphabet_size, remap = meta(i)
        from ..ops import bwt as bwt_ops
        n = block.shape[0]
        U = np.zeros(n, dtype=np.uint8)
        pidx = bwt_ops.bwtransform2(block, U, n, 256)
        alphabet = np.nonzero(used)[0].astype(np.uint8)
        syms, freq = pl._mtf_rle2(U, alphabet, alphabet_size)
        header_bits, (payload, total_bits) = pl._finish_block(
            block, int(pidx), syms, len(syms), freq, alphabet_size, used)
        # expand to the final bit array HERE (in the worker): the
        # ordered assembly loop is the serial stage, so per-block
        # unpackbits there was ~0.2 s of critical-path work at 100 MB
        return np.concatenate([
            header_bits, np.unpackbits(payload, count=total_bits)])

    errors = []

    # Thread priority split (Linux: niceness is per-LWP, so
    # os.setpriority with who=0 affects the calling thread only).  The
    # device driver thread's work is short bursts of dispatch/fetch
    # glue, but on a host whose every core runs a busy worker it wakes
    # late and the measured device service time doubles (~0.25 ->
    # ~0.5 s/block).  Deprioritizing the host workers a notch lets the
    # driver preempt for its bursts.  Opt-out: COMPRESSJS_TPU_NICE=0.
    _nice_spread = int(os.environ.get('COMPRESSJS_TPU_NICE', '2'))

    def _renice(delta):
        # Linux-only: setpriority(PRIO_PROCESS, 0) is per-THREAD there
        # (the assumption the comment above relies on); on other POSIX
        # platforms it renices the whole interpreter, cumulatively and
        # irreversibly for an unprivileged process.
        if not _nice_spread or delta == 0 or sys.platform != 'linux':
            return
        try:
            os.setpriority(os.PRIO_PROCESS, 0,
                           os.getpriority(os.PRIO_PROCESS, 0) + delta)
        except (OSError, AttributeError):
            pass

    def host_worker():
        # everything — including the renice preamble — inside the try:
        # an exception that escapes before the loop would kill the
        # thread without notifying the assembly loop, hanging the call
        try:
            _renice(_nice_spread)
            while True:
                i, was_steal = sched.pop_host()
                if i is None:
                    return
                t0 = time.perf_counter()
                r = host_block(i)
                dt = time.perf_counter() - t0
                if not was_steal:
                    sched.host_finished(dt)
                publish(i, r, 'steal' if was_steal else 'host', t0)
        except BaseException as e:  # propagate to the assembly loop
            with res_ready:
                errors.append(e)
                res_ready.notify_all()
            raise

    def device_worker():
        enc = _encoder_factory() if _encoder_factory is not None \
            else pl.DeviceBzip2Encoder(level, mode=device_mode)
        inflight = deque()

        def finish(i, core, t_claim):
            ctag = core[0] if isinstance(core, tuple) and core and \
                isinstance(core[0], str) else None
            if ctag == 'full':
                fetched = enc._fetch_full(core[1])
            elif ctag is not None:        # ('host', block) tail
                fetched = core
            else:
                fetched = tuple(np.asarray(x) for x in core)
            block, crc = blocks[i]
            used, alphabet_size, remap = meta(i)
            tag = fetched[0] if isinstance(fetched, tuple) and fetched \
                and isinstance(fetched[0], str) else None
            if tag == 'fullres':
                _, pidx, payload, total_bits, lens, g, sel, count = \
                    fetched
                header_bits = pl._device_block_header(
                    pidx, lens, g, sel, count, alphabet_size, used)
                r = np.concatenate([
                    header_bits,
                    np.unpackbits(payload, count=total_bits)])
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
                r = np.concatenate([
                    header_bits,
                    np.unpackbits(payload, count=total_bits)])
            sched.device_finished(i, t_claim)
            publish(i, r, 'device', t_claim)

        while True:
            while len(inflight) < device_inflight:
                i = sched.try_claim_device()
                if i is None:
                    break
                block, crc = blocks[i]
                used, alphabet_size, remap = meta(i)
                inflight.append((i, enc._submit(block, alphabet_size,
                                                remap),
                                 time.perf_counter()))
            if inflight:
                i, core, t_claim = inflight.popleft()
                try:
                    finish(i, core, t_claim)
                except Exception:
                    # device failure: release the block back to the
                    # hosts and stop using the device
                    sched.device_abandoned(i)
                    for j, _, _ in inflight:
                        sched.device_abandoned(j)
                    return
                continue
            if sched.closed and sched.queue_len() == 0:
                return
            # queue has work (or the feeder is still discovering
            # blocks) but the claim heuristic says the hosts will
            # drain it before we could help — wait and re-check
            # (after close the queue only shrinks, so this terminates)
            time.sleep(0.02)

    feed_thread = threading.Thread(target=feeder, daemon=True)
    feed_thread.start()
    host_threads = []
    dev_thread = None
    if device and data.shape[0] > block_size:
        dev_thread = threading.Thread(target=device_worker, daemon=True)
        dev_thread.start()
    for _ in range(host_workers):
        t = threading.Thread(target=host_worker, daemon=True)
        t.start()
        host_threads.append(t)

    # ordered assembly while workers run (host workers produce blocks in
    # file order, so this streams; only tail blocks wait on the device)
    o = coerce_output_stream(output)
    out = BitStream(o.stream)
    for ch in 'BZh':
        out.write_byte(ord(ch))
    out.write_byte(ord('0') + level)
    stream_crc = 0
    i = 0
    while True:
        with res_ready:
            while i not in results and not (
                    sched.closed and sched.total is not None and
                    i >= sched.total):
                if errors:
                    raise errors[0]
                res_ready.wait()
            if i not in results:
                break                    # past the last block
            bits = results.pop(i)
        crc = blocks[i][1]
        i += 1
        stream_crc = stream_crc_combine(stream_crc, crc)
        out.write_bits(48, WHOLEPI)
        out.write_bits(32, crc)
        out.write_bit_array(bits)
    out.write_bits(48, SQRTPI)
    out.write_bits(32, stream_crc)
    out.flush()
    for t in host_threads:
        t.join()
    if dev_thread is not None:
        # every block is assembled; a device thread still stuck in a
        # fetch can contribute nothing — don't let it block the return
        # (it is a daemon thread)
        dev_thread.join(timeout=5.0)
    if debug:
        t_min = min(e[2] for e in events) if events else 0.0
        for i, src, t0, t1, fresh in sorted(events, key=lambda e: e[3]):
            print('# blk %3d %-7s claim=%7.3f done=%7.3f dt=%6.3f%s'
                  % (i, src, t0 - t_min, t1 - t_min, t1 - t0,
                     '' if fresh else ' (dup)'), file=sys.stderr)
        print('# hetero stats: %s' % sched.stats, file=sys.stderr)
    hetero_compress_bzip2.last_stats = sched.stats
    return o.retval
