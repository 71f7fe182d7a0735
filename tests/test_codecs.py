"""Golden round-trip matrix over all codecs and levels — the analog of
the reference's workhorse test (test/file.js:17-46)."""

import numpy as np
import pytest

import compressjs_tpu as cz


def _codec(name):
    return getattr(cz, name)


LEVELED = ['Lzjb', 'LzjbR', 'BWTC', 'Bzip2']
UNLEVELED = ['Lzp3', 'Simple', 'PPM', 'Dmc']


def roundtrip(codec, data, level=None):
    comp = codec.compress_file(data, None, level)
    out = codec.decompress_file(comp)
    assert bytes(out) == bytes(data)
    return len(comp)


@pytest.mark.parametrize('name', LEVELED)
@pytest.mark.parametrize('level', [1, 5, 9])
def test_leveled_small(name, level, ref_samples):
    codec = _codec(name)
    roundtrip(codec, ref_samples['sample0'], level)
    roundtrip(codec, ref_samples['sample3'][:20000], level)


@pytest.mark.parametrize('name', UNLEVELED)
def test_unleveled_small(name, ref_samples):
    codec = _codec(name)
    roundtrip(codec, ref_samples['sample0'])
    roundtrip(codec, ref_samples['sample1'][:20000])


@pytest.mark.parametrize('name', LEVELED)
def test_leveled_medium(name, ref_samples):
    codec = _codec(name)
    roundtrip(codec, ref_samples['sample1'], 9)
    roundtrip(codec, ref_samples['sample2'][:100000], 1)


@pytest.mark.parametrize('name', LEVELED + UNLEVELED)
def test_binary_data(name):
    rng = np.random.RandomState(11)
    data = rng.randint(0, 256, size=12345).astype(np.uint8).tobytes()
    roundtrip(_codec(name), data)


@pytest.mark.parametrize('name', LEVELED + UNLEVELED)
def test_runs_data(name):
    data = (b'\x00' * 1000 + b'ab' * 500 + b'\xff' * 1000) * 3
    roundtrip(_codec(name), data)


@pytest.mark.slow
@pytest.mark.parametrize('name,level', [
    ('Lzjb', 1), ('Lzjb', 9), ('LzjbR', 1), ('LzjbR', 9),
    ('BWTC', 1), ('BWTC', 9), ('Bzip2', 1), ('Bzip2', 9),
    ('Lzp3', None), ('Simple', None),
])
def test_full_matrix_sample4(name, level, ref_samples):
    roundtrip(_codec(name), ref_samples['sample4'], level)


@pytest.mark.slow
@pytest.mark.parametrize('name,level,ref_size', [
    # reference README sizes on sample5 (BASELINE.md) — we must match
    # or beat each one
    ('Bzip2', 9, 275087),
    ('BWTC', 9, 272997),
    ('Lzjb', 9, 706210),
    ('LzjbR', 9, 491476),
    ('Lzp3', None, 292978),
    ('Simple', None, 1479143),
])
def test_size_parity_sample5(name, level, ref_size, ref_samples):
    size = roundtrip(_codec(name), ref_samples['sample5'], level)
    assert size <= ref_size * 1.001, (name, size, ref_size)
