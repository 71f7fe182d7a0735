"""Hetero on the real device: per-block event trace + throughput."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

os.environ['COMPRESSJS_TPU_HETERO_DEBUG'] = '1'

import jax
jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/jax_comp_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)

MB = int(sys.argv[1]) if len(sys.argv) > 1 else 20

from bench import build_corpus
corpus = build_corpus()[:MB * 1000 * 1000]

from compressjs_tpu.codecs import bzip2
from compressjs_tpu.parallel import hetero

t0 = time.time()
hetero.warm_device(9)
print('warm_device: %.2fs' % (time.time() - t0), flush=True)

t0 = time.time()
comp_ref = bytes(bzip2.compress_file(corpus, None, 9))
t_host = time.time() - t0
print('host-only: %.2fs = %.2f MB/s' % (t_host, MB / t_host), flush=True)

for rep in range(2):
    t0 = time.time()
    comp = bytes(hetero.hetero_compress_bzip2(corpus, None, 9))
    t_dev = time.time() - t0
    print('hetero(device) rep%d: %.2fs = %.2f MB/s  stats=%s'
          % (rep, t_dev, MB / t_dev,
             hetero.hetero_compress_bzip2.last_stats), flush=True)
    assert comp == comp_ref
