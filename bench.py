"""Benchmark: bzip2 -9 encode throughput on the device pipeline.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "MB/s", "vs_baseline": N}

Baseline: the reference (cscott/compressjs) encodes sample5.ref at
bzip2 -9 in 22.57 s (README.md:42) = 0.0944 MB/s.  vs_baseline is our
throughput over that number.  Runs on whatever platform JAX selects
(the real TPU chip under axon; CPU as fallback).
"""

import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

SAMPLE = '/root/reference/test/sample5.ref'
BASELINE_SECONDS = 22.57  # reference bzip2 -9 on sample5 (README.md:42)


def main():
    data = np.fromfile(SAMPLE, dtype=np.uint8)
    from compressjs_tpu.parallel.pipeline import DeviceBzip2Encoder
    from compressjs_tpu.codecs import bzip2 as bzip2_host

    enc = DeviceBzip2Encoder(level=9)

    # warmup: compile all block shapes once
    t0 = time.time()
    comp = bytes(enc.compress(data))
    warm = time.time() - t0

    # timed run
    t0 = time.time()
    comp = bytes(enc.compress(data))
    elapsed = time.time() - t0

    # verify correctness before reporting any number
    out = bytes(bzip2_host.decompress_file(comp))
    assert out == data.tobytes(), 'roundtrip failed'
    assert len(comp) <= 275087, 'compressed size exceeds reference'

    mb = len(data) / 1e6
    mbs = mb / elapsed
    baseline_mbs = mb / BASELINE_SECONDS
    print(json.dumps({
        'metric': 'bzip2 -9 encode throughput (sample5, device pipeline)',
        'value': round(mbs, 4),
        'unit': 'MB/s',
        'vs_baseline': round(mbs / baseline_mbs, 2),
    }))
    print('# warmup %.1fs, timed %.1fs, %d -> %d bytes'
          % (warm, elapsed, len(data), len(comp)), file=sys.stderr)


if __name__ == '__main__':
    main()
