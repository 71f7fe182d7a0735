import os
import sys

# Sharding tests run on a virtual 8-device CPU mesh; the real-TPU bench
# path sets its own platform.  Must be configured before jax import.
# COMPRESSJS_TPU_REAL=1 opts OUT of the CPU pin so the `-m tpu` perf
# floors (test_perf_regression.py) can reach the real chip:
#   COMPRESSJS_TPU_REAL=1 python -m pytest tests/test_perf_regression.py \
#       -m tpu -o addopts=""
_REAL_TPU = os.environ.get('COMPRESSJS_TPU_REAL') == '1'
if not _REAL_TPU:
    # Outside axon (no sitecustomize overriding JAX_PLATFORMS) these env
    # knobs are what actually pins the platform, so the opt-out must
    # skip them too, not just the jax.config update below.
    os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    flags = os.environ.get('XLA_FLAGS', '')
    if 'xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=8').strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize registers the TPU backend in every interpreter and
# wins over JAX_PLATFORMS; the config update below reliably pins tests to
# the virtual-device CPU mesh.
import jax  # noqa: E402
if not _REAL_TPU:
    jax.config.update('jax_platforms', 'cpu')

import pytest  # noqa: E402

REF_TEST_DIR = '/root/reference/test'


@pytest.fixture(scope='session')
def ref_samples():
    """Load reference sample files (sample0..sample5)."""
    out = {}
    for i in range(6):
        path = os.path.join(REF_TEST_DIR, 'sample%d.ref' % i)
        with open(path, 'rb') as f:
            out['sample%d' % i] = f.read()
    return out
