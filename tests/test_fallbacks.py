"""Pure-Python fallback paths must stay byte-identical to the native
paths: every codec is run with the native library masked and compared.
Also covers the DummyRangeCoder model-contract sanitizer and props
handling."""

import numpy as np
import pytest

import compressjs_tpu as cz
from compressjs_tpu import native as nat


@pytest.fixture
def no_native(monkeypatch):
    monkeypatch.setattr(nat, 'available', lambda: False)


ALL_CODECS = ['Bzip2', 'BWTC', 'Lzjb', 'LzjbR', 'Lzp3', 'Simple', 'PPM',
              'Dmc', 'Huffman', 'MTFModel', 'FenwickModel', 'DefSumModel',
              'Context1Model', 'NoModel']


@pytest.mark.parametrize('name', ALL_CODECS)
def test_python_fallback_matches_native(name, monkeypatch):
    codec = getattr(cz, name)
    data = open('/root/reference/test/sample1.ref', 'rb').read()[:6000]
    comp_native = bytes(codec.compress_file(data, None, 5))
    monkeypatch.setattr(nat, 'available', lambda: False)
    comp_py = bytes(codec.compress_file(data, None, 5))
    out_py = bytes(codec.decompress_file(comp_native))
    assert comp_native == comp_py, name
    assert out_py == data, name


@pytest.mark.parametrize('name', ALL_CODECS)
def test_streaming_input_fallback(name):
    """Non-array streams (no known size for some paths) exercise the
    stream-driven loops end-to-end."""
    from compressjs_tpu.utils.stream import Stream

    data = b'stream fallback test data! ' * 40

    class ByteStream(Stream):
        def __init__(self, b):
            self.b = b
            self.i = 0

        def read_byte(self):
            if self.i >= len(self.b):
                return -1
            self.i += 1
            return self.b[self.i - 1]

    codec = getattr(cz, name)
    comp = bytes(codec.compress_file(ByteStream(data), None, 3))
    assert bytes(codec.decompress_file(comp)) == data, name


def test_dummy_range_coder_sanitizes_models():
    """The Dummy coder must round-trip the (sy_f, lt_f, tot_f) triples for
    every adaptive model — the coder/model contract check."""
    from compressjs_tpu.coders.dummy_range_coder import DummyRangeCoder
    from compressjs_tpu.utils.stream import ArrayInputStream, BufferStream

    data = open('/root/reference/test/sample0.ref', 'rb').read() * 20
    for factory_name in ['MTFModel', 'FenwickModel', 'DefSumModel']:
        cls = getattr(cz, factory_name)
        out = BufferStream()
        enc = DummyRangeCoder(out)
        enc.encode_start(0, 0)
        kwargs = {'is_decoder': False} if factory_name == 'DefSumModel' \
            else {}
        m = cls(enc, 256, **kwargs)
        for b in data:
            m.encode(b)
        ins = ArrayInputStream(out.get_buffer())
        dec = DummyRangeCoder(ins)
        dec.decode_start()
        kwargs = {'is_decoder': True} if factory_name == 'DefSumModel' \
            else {}
        m2 = cls(dec, 256, **kwargs)
        got = bytes(m2.decode() for _ in range(len(data)))
        assert got == data, factory_name


def test_dmc_props():
    data = open('/root/reference/test/sample1.ref', 'rb').read()[:5000]
    c1 = bytes(cz.Dmc.compress_file(data, None, {'m': 4, 'n': 64}))
    c2 = bytes(cz.Dmc.compress_file(data))
    assert c1 != c2  # thresholds change the model shape
    assert bytes(cz.Dmc.decompress_file(c1)) == data
    assert bytes(cz.Dmc.decompress_file(c2)) == data


def test_deflate_distance_model_is_exported():
    # toolkit parity: exported but used by no codec, as in the reference
    m = cz.DeflateDistanceModel
    assert m is not None
