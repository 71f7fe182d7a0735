"""Round-4 LANES sweep for BWTC-L (VERDICT r3 item 4/7).

The lane encode/decode scans advance all L lanes per step, so steps =
ceil((bs+1)/L): per-step work is tiny (L x 258 model state) and the
scan is LATENCY-bound — rate should scale ~linearly with L while the
compressed size pays for L-way model split + L coder tails.  This tool
measures both sides of that trade on the real chip: device encode +
decode MB/s and compressed size for each L on sample5, so LANES can be
chosen against measured numbers instead of a host-side size sweep
alone (codecs/bwtcl.py:54-58 picked 128 from size only).

Run: python tools/lane_sweep.py [--lanes=128,512,2048]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

lanes_list = [128, 512, 2048, 8192]
for a in sys.argv[1:]:
    if a.startswith('--lanes='):
        lanes_list = [int(x) for x in a.split('=', 1)[1].split(',')]

SAMPLES = '/root/reference/test'


def main():
    from compressjs_tpu.parallel.pipeline import bwtcl_compress_device, \
        bwtcl_decompress_device
    from compressjs_tpu.codecs import bwtcl as bl
    data = np.fromfile(os.path.join(SAMPLES, 'sample5.ref'), np.uint8)
    mb = len(data) / 1e6
    for L in lanes_list:
        try:
            t0 = time.perf_counter()
            comp = bytes(bwtcl_compress_device(data, None, 9, lanes=L))
            c_enc = time.perf_counter() - t0
            t0 = time.perf_counter()
            comp = bytes(bwtcl_compress_device(data, None, 9, lanes=L))
            t_enc = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = bytes(bwtcl_decompress_device(comp))
            c_dec = time.perf_counter() - t0
            assert out == data.tobytes()
            t0 = time.perf_counter()
            out = bytes(bwtcl_decompress_device(comp))
            t_dec = time.perf_counter() - t0
            assert out == data.tobytes()
            assert bytes(bl.BWTCL.decompress_file(comp)) == data.tobytes()
            print('L=%5d  size=%7d (%+5.1f%% vs bwtc 272997)  '
                  'enc %5.2f MB/s (compile %4.0fs)  dec %5.2f MB/s '
                  '(compile %4.0fs)'
                  % (L, len(comp), (len(comp) / 272997 - 1) * 100,
                     mb / t_enc, c_enc, mb / t_dec, c_dec), flush=True)
        except Exception as e:
            print('L=%5d  FAILED %s: %s'
                  % (L, type(e).__name__, str(e)[-200:]), flush=True)


if __name__ == '__main__':
    main()
