"""Seeded fuzz roundtrips: structured random inputs (runs, skew, random,
periodic, near-boundary lengths) through every codec — coverage the
reference suite never had."""

import zlib

import numpy as np
import pytest

import compressjs_tpu as cz

CODECS = ['Bzip2', 'BWTC', 'Lzjb', 'LzjbR', 'Lzp3', 'Simple', 'PPM', 'Dmc',
          'Huffman', 'MTFModel', 'FenwickModel', 'DefSumModel',
          'Context1Model', 'NoModel']


def _gen(seed):
    rng = np.random.RandomState(seed)
    kind = seed % 6
    n = int(rng.randint(1, 5000))
    if kind == 0:    # uniform random
        return rng.randint(0, 256, n).astype(np.uint8).tobytes()
    if kind == 1:    # heavy runs
        vals = rng.randint(0, 4, max(n // 50, 1)).astype(np.uint8)
        reps = rng.randint(1, 300, vals.shape[0])
        return np.repeat(vals, reps)[:n].tobytes()
    if kind == 2:    # skewed text-like
        return rng.zipf(1.4, n).clip(0, 255).astype(np.uint8).tobytes()
    if kind == 3:    # periodic
        period = bytes(rng.randint(0, 256, rng.randint(1, 9)).astype(np.uint8))
        return (period * (n // max(len(period), 1) + 1))[:n]
    if kind == 4:    # tiny alphabets
        return rng.randint(0, 2, n).astype(np.uint8).tobytes()
    # sparse high-byte alphabet
    return (rng.randint(0, 4, n).astype(np.uint8) * 85).tobytes()


@pytest.mark.parametrize('name', CODECS)
def test_fuzz_roundtrip(name):
    codec = getattr(cz, name)
    for seed in range(12):
        data = _gen(seed * 31 + zlib.crc32(name.encode()) % 1000)
        level = (seed % 9) + 1
        comp = codec.compress_file(data, None, level)
        out = bytes(codec.decompress_file(comp))
        assert out == bytes(data), (name, seed, len(data))
