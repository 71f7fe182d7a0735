"""All-device BWTC-L paths vs the host codec (CPU jax — same kernels
the TPU runs, minus speed)."""

import numpy as np

from compressjs_tpu.codecs import bwtcl
from compressjs_tpu.parallel import pipeline as pl

SAMPLES = '/root/reference/test'


def _data(n):
    d = np.fromfile(SAMPLES + '/sample5.ref', dtype=np.uint8)
    reps = -(-n // len(d))
    return np.tile(d, reps)[:n]


def test_device_encode_matches_host_single_block():
    data = _data(100000)             # exactly one level-1 block
    ref = bytes(bwtcl.compress_file(data, None, 1))
    got = bytes(pl.bwtcl_compress_device(data, None, 1))
    assert got == ref


def test_device_encode_matches_host_with_tail():
    data = _data(150000)             # one full block + 50 KB tail
    ref = bytes(bwtcl.compress_file(data, None, 1))
    got = bytes(pl.bwtcl_compress_device(data, None, 1))
    assert got == ref


def test_device_decode_roundtrip():
    data = _data(120000)
    comp = bytes(bwtcl.compress_file(data, None, 1))
    out = bytes(pl.bwtcl_decompress_device(
        np.frombuffer(comp, np.uint8)))
    assert out == data.tobytes()


def test_device_both_directions():
    data = _data(100000)
    comp = bytes(pl.bwtcl_compress_device(data, None, 1))
    out = bytes(pl.bwtcl_decompress_device(
        np.frombuffer(comp, np.uint8)))
    assert out == data.tobytes()
