"""Diagnose the round-2 hetero regression (5.48 vs 16.23 MB/s).

Measures on a corpus slice:
  1. host-only codecs.bzip2.compress_file
  2. hetero(device=False, host_workers=2)   -- scaffolding overhead
  3. hetero(device=True)                    -- the regression
with per-source block counts and per-block timings.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/jax_comp_cache'))

MB = int(sys.argv[1]) if len(sys.argv) > 1 else 20

from bench import build_corpus
corpus = build_corpus()[:MB * 1000 * 1000]

from compressjs_tpu.codecs import bzip2

t0 = time.time()
comp = bytes(bzip2.compress_file(corpus, None, 9))
t_host = time.time() - t0
print('host-only: %.2fs = %.2f MB/s (size %d)'
      % (t_host, MB / t_host, len(comp)))

from compressjs_tpu.parallel import hetero

t0 = time.time()
comp2 = bytes(hetero.hetero_compress_bzip2(corpus, None, 9, device=False))
t_nodev = time.time() - t0
print('hetero(no device): %.2fs = %.2f MB/s' % (t_nodev, MB / t_nodev))
assert comp2 == comp

# instrument: count device vs host blocks
import threading
counts = {'device': 0, 'host': 0, 'device_host_fallback': 0}
lock = threading.Lock()

orig_finish_owner = {}

# warmup device shapes first (2 full blocks)
warm = corpus[:2 * 900000]
t0 = time.time()
bytes(hetero.hetero_compress_bzip2(warm, None, 9))
print('warmup: %.2fs' % (time.time() - t0))

t0 = time.time()
comp3 = bytes(hetero.hetero_compress_bzip2(corpus, None, 9))
t_dev = time.time() - t0
print('hetero(device): %.2fs = %.2f MB/s' % (t_dev, MB / t_dev))
assert comp3 == comp
