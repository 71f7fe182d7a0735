"""Hetero regression diagnosis, pass 2: per-block event trace."""
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

from compressjs_tpu.parallel import hetero

# warmup (cache should be hot now)
warm = corpus[:2 * 900000]
t0 = time.time()
bytes(hetero.hetero_compress_bzip2(warm, None, 9))
print('warmup: %.2fs' % (time.time() - t0))

t0 = time.time()
comp3 = bytes(hetero.hetero_compress_bzip2(corpus, None, 9))
t_dev = time.time() - t0
print('hetero(device): %.2fs = %.2f MB/s' % (t_dev, MB / t_dev))
