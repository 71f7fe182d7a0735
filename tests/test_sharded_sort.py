"""Context-parallel suffix sort over the virtual device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from compressjs_tpu.parallel.mesh import make_mesh
from compressjs_tpu.parallel.sharded_sort import sharded_cyclic_suffix_sort
from compressjs_tpu.ops import bwt as bwt_host

REF = '/root/reference/test'


def _mesh(n):
    if jax.device_count() < n:
        pytest.skip('need %d devices' % n)
    return make_mesh(jax.devices()[:n])


@pytest.mark.parametrize('n_dev', [2, 8])
@pytest.mark.parametrize('n', [1024, 16384])
def test_matches_host(n_dev, n):
    mesh = _mesh(n_dev)
    base = open(f'{REF}/sample2.ref', 'rb').read()
    data = np.frombuffer(base[:n], dtype=np.uint8)
    order = np.asarray(sharded_cyclic_suffix_sort(mesh, jnp.asarray(data)))
    assert (order == bwt_host.cyclic_suffix_array(data)).all()


def test_degenerate_inputs():
    mesh = _mesh(8)
    for data in [np.zeros(2048, np.uint8),
                 np.frombuffer(b'ab' * 1024, dtype=np.uint8),
                 np.frombuffer(b'aaab' * 512, dtype=np.uint8)]:
        order = np.asarray(sharded_cyclic_suffix_sort(mesh,
                                                      jnp.asarray(data)))
        assert (order == bwt_host.cyclic_suffix_array(data)).all()


def test_sharded_bwt_roundtrip():
    mesh = _mesh(8)
    base = open(f'{REF}/sample1.ref', 'rb').read()
    data = np.frombuffer(base[:8192], dtype=np.uint8)
    order = np.asarray(sharded_cyclic_suffix_sort(mesh, jnp.asarray(data)))
    n = len(data)
    U = data[(order - 1) % n]
    pidx = int(np.nonzero(order == 0)[0][0])
    rec = bwt_host.inverse_bwt_cyclic(U, n, pidx)
    assert rec.tobytes() == data.tobytes()
