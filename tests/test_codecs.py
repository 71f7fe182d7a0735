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
@pytest.mark.parametrize('name,level,ref_size,exact', [
    # reference README sizes on sample5 (BASELINE.md): codecs whose
    # adaptive pipelines are bit-exact clones must EQUAL the published
    # size; bzip2's group heuristic may differ (ours compresses smaller)
    ('Bzip2', 9, 275087, False),
    ('Bzip2', 1, 341615, False),
    ('BWTC', 9, 272997, True),
    ('BWTC', 1, 345764, True),
    ('Lzjb', 9, 706210, True),
    ('Lzjb', 1, 758467, True),
    ('LzjbR', 9, 491476, True),
    ('LzjbR', 1, 523780, True),
    ('Lzp3', None, 292978, True),
    ('PPM', None, 297220, True),
    ('Dmc', None, 434182, True),
    ('Simple', None, 1479143, True),
])
def test_size_parity_sample5(name, level, ref_size, exact, ref_samples):
    size = roundtrip(_codec(name), ref_samples['sample5'], level)
    if exact:
        assert size == ref_size, (name, size, ref_size)
    else:
        assert size <= ref_size, (name, size, ref_size)


@pytest.mark.slow
@pytest.mark.parametrize('name,ref_size', [
    ('FenwickModel', 1440645),
    ('MTFModel', 1441763),
    ('DefSumModel', 1491107),
    ('NoModel', 2130648),
    ('Huffman', 1452055),
    ('Context1Model', 939098),
])
def test_model_codec_size_parity_sample5(name, ref_size, ref_samples):
    size = roundtrip(_codec(name), ref_samples['sample5'])
    assert size == ref_size, (name, size, ref_size)


def test_bwtcp_parallel_stream_extension(ref_samples):
    """Framework extension: per-block independent coders (parallel
    encode/decode) at ~zero size cost vs sequential BWTC."""
    data = ref_samples['sample2']
    for lvl in (1, 9):
        c = bytes(cz.BWTCP.compress_file(data, None, lvl))
        assert bytes(cz.BWTCP.decompress_file(c)) == data
    c9 = bytes(cz.BWTCP.compress_file(ref_samples['sample5'], None, 9))
    cb = bytes(cz.BWTC.compress_file(ref_samples['sample5'], None, 9))
    assert len(c9) <= len(cb) * 1.001  # coder resets cost only a few bytes
    assert bytes(cz.BWTCP.decompress_file(c9)) == ref_samples['sample5']


def test_config_dataclasses():
    from compressjs_tpu import config
    assert config.DEFAULTS['lzjb'].c_compat is True
    import dataclasses
    with pytest.raises(dataclasses.FrozenInstanceError):
        config.DEFAULTS['lzp3'].use_defsum = True
