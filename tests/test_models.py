"""Model self-test codecs round-trip (the reference exercises these through
its golden file matrix, test/file.js:17-46)."""

import numpy as np
import pytest

from compressjs_tpu.coders.huffman import Huffman
from compressjs_tpu.models.mtf_model import MTFModel
from compressjs_tpu.models.fenwick_model import FenwickModel
from compressjs_tpu.models.defsum_model import DefSumModel
from compressjs_tpu.models.context1_model import Context1Model
from compressjs_tpu.models.no_model import NoModel

CODECS = [Huffman, MTFModel, FenwickModel, DefSumModel, Context1Model,
          NoModel]


def _roundtrip(codec, data):
    comp = codec.compress_file(data)
    out = codec.decompress_file(comp)
    assert bytes(out) == bytes(data)
    return len(comp)


@pytest.mark.parametrize('codec', CODECS, ids=lambda c: c.MAGIC)
def test_roundtrip_sample0(codec, ref_samples):
    _roundtrip(codec, ref_samples['sample0'])


@pytest.mark.parametrize('codec', CODECS, ids=lambda c: c.MAGIC)
def test_roundtrip_binary(codec):
    rng = np.random.RandomState(5)
    # skewed distribution exercises adaptation/rescale; embedded runs
    data = rng.zipf(1.5, size=4000).clip(0, 255).astype(np.uint8)
    data[100:200] = 0
    data[300:350] = 255
    _roundtrip(codec, data.tobytes())


@pytest.mark.parametrize('codec', CODECS, ids=lambda c: c.MAGIC)
def test_roundtrip_empty(codec):
    _roundtrip(codec, b'')


@pytest.mark.parametrize('codec', CODECS, ids=lambda c: c.MAGIC)
def test_roundtrip_sample1_slice(codec, ref_samples):
    _roundtrip(codec, ref_samples['sample1'][:8000])


def test_mtf_better_escape_roundtrip():
    from compressjs_tpu.coders.range_coder import RangeCoder
    from compressjs_tpu.utils.stream import ArrayInputStream, BufferStream
    data = b'the quick brown fox jumps over the lazy dog' * 20
    out = BufferStream()
    enc = RangeCoder(out)
    enc.encode_start(0, 0)
    m = MTFModel(enc, 256, better_escape=True)
    for b in data:
        m.encode(b)
    enc.encode_finish()
    ins = ArrayInputStream(out.get_buffer())
    dec = RangeCoder(ins)
    dec.decode_start()
    m2 = MTFModel(dec, 256, better_escape=True)
    got = bytes(m2.decode() for _ in range(len(data)))
    assert got == data


def test_log_distance_model_roundtrip():
    from compressjs_tpu.coders.range_coder import RangeCoder
    from compressjs_tpu.models.log_distance_model import LogDistanceModel
    from compressjs_tpu.models.deflate_distance_model import DeflateDistanceModel
    from compressjs_tpu.utils.stream import ArrayInputStream, BufferStream
    for cls in (LogDistanceModel, DeflateDistanceModel):
        vals = [0, 1, 2, 3, 4, 5, 100, 1023, 1024, 4095, -1]
        out = BufferStream()
        enc = RangeCoder(out)
        enc.encode_start(0, 0)
        mf = FenwickModel.factory(enc)
        m = cls(4096, 1, mf, mf)
        for v in vals:
            m.encode(v)
        enc.encode_finish()
        ins = ArrayInputStream(out.get_buffer())
        dec = RangeCoder(ins)
        dec.decode_start()
        mf2 = FenwickModel.factory(dec)
        m2 = cls(4096, 1, mf2, mf2)
        got = [m2.decode() for _ in vals]
        assert got == vals, cls.__name__
