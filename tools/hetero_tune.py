"""Round-4 hetero scheduler tuning: the chip contributes 12/112 blocks
(BENCH_r04) with 46 claims denied — sweep the knobs that control how
hard the device may pull (inflight depth, safety factor, device mode)
and report corpus rate + scheduler stats per variant.

Run on the real chip: python tools/hetero_tune.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: F401

import bench  # noqa: E402  (corpus builder)


def main():
    from compressjs_tpu.codecs import bzip2
    from compressjs_tpu.parallel.hetero import hetero_compress_bzip2, \
        warm_device
    corpus = bench.build_corpus()
    mb = len(corpus) / 1e6

    t0 = time.perf_counter()
    warm_device(9)
    print('warm: %.0fs' % (time.perf_counter() - t0), flush=True)
    # hybrid-mode warm (bwt_block only)
    t0 = time.perf_counter()
    warm_device(9, mode='hybrid')
    print('warm hybrid: %.0fs' % (time.perf_counter() - t0), flush=True)

    def host_only():
        return bytes(bzip2.compress_file(corpus, None, 9))

    t0 = time.perf_counter()
    ref = host_only()
    print('host-only: %5.2f MB/s' % (mb / (time.perf_counter() - t0)),
          flush=True)

    variants = [
        ('baseline inflight=3', dict()),
        ('inflight=5', dict(device_inflight=5)),
        ('inflight=5 safety=1.15',
         dict(device_inflight=5, safety=1.15)),
        ('inflight=8 safety=1.15',
         dict(device_inflight=8, safety=1.15)),
        ('hybrid inflight=3', dict(device_mode='hybrid')),
        ('hybrid inflight=6', dict(device_mode='hybrid',
                                   device_inflight=6)),
    ]
    for name, kw in variants:
        best = None
        stats = None
        for _ in range(2):
            t0 = time.perf_counter()
            comp = bytes(hetero_compress_bzip2(corpus, None, 9, **kw))
            dt = time.perf_counter() - t0
            assert comp == ref, name
            if best is None or dt < best:
                best = dt
                stats = dict(hetero_compress_bzip2.last_stats)
        print('%-24s %5.2f MB/s  stats=%s' % (name, mb / best, stats),
              flush=True)

    t0 = time.perf_counter()
    ref2 = host_only()
    assert ref2 == ref
    print('host-only (again): %5.2f MB/s'
          % (mb / (time.perf_counter() - t0)), flush=True)


if __name__ == '__main__':
    main()
