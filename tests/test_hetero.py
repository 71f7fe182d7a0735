"""Hetero scheduler tests (CPU-only: the device is replaced by fakes).

Round-2 regression: hetero measured 5.48 MB/s vs 16.23 host-only — the
component built to ADD the chip's throughput subtracted 2/3 of the
host's.  These tests pin the never-lose contract without TPU hardware:

* scaffolding produces byte-identical output to the plain host codec
  (with and without a device worker),
* a device that stalls outright cannot extend the makespan (host
  workers steal its claimed blocks),
* the claim heuristic starves a too-slow device instead of feeding it.
"""

import time

import numpy as np
import pytest

from compressjs_tpu.codecs import bzip2
from compressjs_tpu.parallel import hetero
from compressjs_tpu.parallel.hetero import _Scheduler, \
    hetero_compress_bzip2

SAMPLES = '/root/reference/test'


def _corpus(nbytes):
    data = np.fromfile(SAMPLES + '/sample5.ref', dtype=np.uint8)
    reps = -(-nbytes // len(data))
    return np.tile(data, reps)[:nbytes]


class FakeHostRouteEncoder:
    """Device stand-in whose results are host-computed (tag 'host'):
    byte-exact by construction, with controllable latency."""

    def __init__(self, submit_delay=0.0, fetch_delay=0.0):
        self.submit_delay = submit_delay
        self.fetch_delay = fetch_delay
        self.submitted = []

    def _submit(self, block, alphabet_size, remap):
        if self.submit_delay:
            time.sleep(self.submit_delay)
        self.submitted.append(block.shape[0])
        return ('host', block)

    def _fetch_full(self, dev):  # pragma: no cover - not used by 'host'
        raise AssertionError('host-tagged results never fetch')


class StuckEncoder(FakeHostRouteEncoder):
    """Simulates a device wedged in a cold compile: the first fetch
    blocks for `stall` seconds."""

    def __init__(self, stall=8.0):
        super().__init__()
        self.stall = stall

    def _submit(self, block, alphabet_size, remap):
        self.submitted.append(block.shape[0])
        return ('full', block)

    def _fetch_full(self, dev):
        time.sleep(self.stall)
        return ('hostfull',)   # after the stall, host-recompute


def test_hetero_no_device_matches_host():
    data = _corpus(450000)
    ref = bytes(bzip2.compress_file(data, None, 1))
    got = bytes(hetero_compress_bzip2(data, None, 1, device=False))
    assert got == ref


def test_hetero_fake_device_matches_host_and_participates():
    data = _corpus(1200000)   # 13 level-1 blocks
    ref = bytes(bzip2.compress_file(data, None, 1))
    enc = FakeHostRouteEncoder()
    got = bytes(hetero_compress_bzip2(
        data, None, 1, device=True, min_queue_factor=1,
        _encoder_factory=lambda: enc))
    assert got == ref
    stats = hetero_compress_bzip2.last_stats
    assert stats['device'] >= 1, stats


def test_hetero_stuck_device_never_extends_makespan():
    """A device that wedges on its first block must not stall the file:
    hosts steal the claimed blocks and assembly completes."""
    data = _corpus(1200000)
    ref = bytes(bzip2.compress_file(data, None, 1))
    t0 = time.perf_counter()
    got = bytes(hetero_compress_bzip2(
        data, None, 1, device=True, min_queue_factor=1,
        device_inflight=2,
        _encoder_factory=lambda: StuckEncoder(stall=8.0)))
    wall = time.perf_counter() - t0
    assert got == ref
    stats = hetero_compress_bzip2.last_stats
    # the stuck blocks were recovered by host workers
    assert stats['stolen'] >= 1, stats
    # generous bound: far below the 8 s/block a device-serialized
    # schedule would cost (2 claimed blocks -> 16 s+), even on a
    # loaded CI host
    assert wall < 14.0, (wall, stats)


def test_claim_heuristic_starves_slow_device():
    s = _Scheduler(20, host_workers=2, min_queue_factor=2)
    # calibrated: hosts do 0.1 s/block, device needs 3 s/block
    s.t_host = 0.1
    s.t_dev = 3.0
    s.dev_done = 2
    # queue of 20 drains in 20*0.1/2 = 1.0 s < 1.3*3.0 -> deny
    assert s.try_claim_device() is None
    assert s.stats['dev_claims_denied'] == 1
    # a fast device (0.2 s/block) is allowed
    s.t_dev = 0.2
    i = s.try_claim_device()
    assert i == 19   # claims from the back
    # host order is preserved from the front
    assert s.pop_host() == (0, False)


def test_claim_heuristic_uncalibrated_needs_deep_queue():
    s = _Scheduler(5, host_workers=2, min_queue_factor=8)
    assert s.try_claim_device() is None      # 5 < 16
    s2 = _Scheduler(40, host_workers=2, min_queue_factor=8)
    assert s2.try_claim_device() == 39


def test_steal_and_abandon():
    s = _Scheduler(3, host_workers=1, min_queue_factor=1)
    i = s.try_claim_device()
    assert i == 2
    assert s.pop_host() == (0, False)
    assert s.pop_host() == (1, False)
    # queue empty -> host steals the device's claimed block
    assert s.pop_host() == (2, True)
    # abandoning a stolen block must NOT requeue it
    s.device_abandoned(2)
    assert s.pop_host() == (None, False)
