"""Pallas kernel tests (interpret mode on the CPU test mesh)."""

import numpy as np
import jax.numpy as jnp

from compressjs_tpu.ops import pallas_kernels as pk
from compressjs_tpu.ops import mtf as mtf_host


def test_mtf_pallas_matches_host():
    data = np.fromfile('/root/reference/test/sample1.ref',
                       dtype=np.uint8)[:30000]
    alpha = mtf_host.used_alphabet(data)
    remap = np.zeros(256, np.uint8)
    remap[alpha] = np.arange(len(alpha))
    dense = remap[data]
    out = np.asarray(pk.mtf_encode_pallas(jnp.asarray(dense), len(dense)))
    host = mtf_host.mtf_encode(data, alpha)
    assert (out == host).all()


def test_mtf_pallas_small_width():
    rng = np.random.RandomState(3)
    dense = rng.randint(0, 60, 5000).astype(np.uint8)
    alpha = np.arange(64, dtype=np.uint8)
    out = np.asarray(pk.mtf_encode_pallas(jnp.asarray(dense), len(dense),
                                          chunk_len=512, width=64))
    host = mtf_host.mtf_encode(dense, alpha)
    assert (out == host).all()


def test_mtf_pallas_uneven_tail():
    rng = np.random.RandomState(4)
    dense = rng.randint(0, 250, 2048 * 3 + 77).astype(np.uint8)
    alpha = np.arange(256, dtype=np.uint8)
    out = np.asarray(pk.mtf_encode_pallas(jnp.asarray(dense), len(dense)))
    host = mtf_host.mtf_encode(dense, alpha)
    assert (out == host).all()
