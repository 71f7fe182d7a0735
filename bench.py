"""Benchmark: bzip2 -9 encode throughput.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "MB/s", "vs_baseline": N}

Baseline: the reference (cscott/compressjs) encodes sample5.ref at
bzip2 -9 in 22.57 s (README.md:42) = 0.0944 MB/s; vs_baseline is our
throughput over that.

The primary path is the hybrid device pipeline (rotation-sort/BWT on the
TPU chip, native host entropy stages).  XLA compiles over the axon tunnel
can take minutes and occasionally stall, so the device run happens in a
subprocess with a hard timeout; if it doesn't come back, the host-native
path's number is reported instead.  Either way the compressed output is
verified (roundtrip + size <= the reference's 275,087 B) before any
number is printed.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

SAMPLE = '/root/reference/test/sample5.ref'
BASELINE_SECONDS = 22.57  # reference bzip2 -9 on sample5 (README.md:42)
DEVICE_TIMEOUT = 480


def _measure(compress, data):
    # bytes() forces materialization: if a device path ever returns a
    # lazily-realized result, the warmup must still absorb compile and
    # dispatch work (block_until_ready does not wait over the tunnel)
    bytes(compress(data))  # warmup (compiles)
    runs = [_timed(compress, data) for _ in range(3)]
    elapsed = min(t for t, _ in runs)
    comp = bytes(runs[-1][1])  # reuse the last timed run's output
    from compressjs_tpu.codecs import bzip2 as bzip2_host
    out = bytes(bzip2_host.decompress_file(comp))
    assert out == data.tobytes(), 'roundtrip failed'
    assert len(comp) <= 275087, 'compressed size exceeds reference'
    return elapsed


def _timed(compress, data):
    t0 = time.time()
    result = compress(data)
    return time.time() - t0, result


def _report(label, elapsed, nbytes):
    mb = nbytes / 1e6
    mbs = mb / elapsed
    print(json.dumps({
        'metric': 'bzip2 -9 encode throughput (sample5, %s)' % label,
        'value': round(mbs, 4),
        'unit': 'MB/s',
        'vs_baseline': round(mbs / (mb / BASELINE_SECONDS), 2),
    }))


def device_main():
    data = np.fromfile(SAMPLE, dtype=np.uint8)
    from compressjs_tpu.parallel.pipeline import DeviceBzip2Encoder
    enc = DeviceBzip2Encoder(level=9)
    elapsed = _measure(enc.compress, data)
    _report('device pipeline', elapsed, len(data))


def host_main():
    data = np.fromfile(SAMPLE, dtype=np.uint8)
    from compressjs_tpu.codecs import bzip2
    elapsed = _measure(lambda d: bzip2.compress_file(d, None, 9), data)
    _report('native host pipeline', elapsed, len(data))


def main():
    # measure both execution modes and report the faster one — the
    # framework's own dispatch would make the same choice (the tunnel
    # round-trips dominate the device path at this input size)
    device_line = None
    try:
        r = subprocess.run([sys.executable, __file__, '--device'],
                           capture_output=True, text=True,
                           timeout=DEVICE_TIMEOUT)
        for line in (r.stdout or '').splitlines():
            if line.startswith('{'):
                device_line = json.loads(line)
                break
        if device_line is None:
            print('# device path failed (%s)'
                  % (r.stderr or '')[-200:].replace('\n', ' '),
                  file=sys.stderr)
    except subprocess.TimeoutExpired:
        print('# device path timed out', file=sys.stderr)

    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        host_main()
    host_line = json.loads(buf.getvalue())

    best = host_line
    if device_line and device_line['value'] > host_line['value']:
        best = device_line
    print(json.dumps(best))


if __name__ == '__main__':
    if '--device' in sys.argv:
        device_main()
    elif '--host' in sys.argv:
        host_main()
    else:
        main()
