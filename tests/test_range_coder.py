"""Range coder tests, mirroring reference test/range.js:6-123."""

from compressjs_tpu.coders.range_coder import RangeCoder
from compressjs_tpu.utils.stream import ArrayInputStream, BufferStream


def test_basic_roundtrip():
    out = BufferStream()
    enc = RangeCoder(out)
    enc.encode_start(0xCA, 0)
    enc.encode_freq(1, 0, 2)  # bit 0
    enc.encode_freq(1, 1, 2)  # bit 1
    enc.encode_byte(0xFE)
    enc.encode_short(0xBABE)
    size = enc.encode_finish()
    assert size == out.tell()

    ins = ArrayInputStream(out.get_buffer())
    dec = RangeCoder(ins)
    assert dec.decode_start() == 0xCA
    b1 = dec.decode_cul_freq(2)
    dec.decode_update(1, b1, 2)
    assert b1 == 0
    b2 = dec.decode_cul_freq(2)
    dec.decode_update(1, b2, 2)
    assert b2 == 1
    assert dec.decode_byte() == 0xFE
    assert dec.decode_short() == 0xBABE
    dec.decode_finish()
    assert ins.tell() == out.tell()


def test_clean_flush_0_to_33_symbols():
    # tail-byte handling sweep (reference test/range.js:67-123)
    for nbits in range(34):
        out = BufferStream()
        enc = RangeCoder(out)
        enc.encode_start(nbits, 0)
        for i in range(nbits):
            enc.encode_freq(2, i & 1, 3)
        size = enc.encode_finish()
        assert size == out.tell()

        ins = ArrayInputStream(out.get_buffer())
        dec = RangeCoder(ins)
        assert dec.decode_start() == nbits
        for i in range(nbits):
            val = i & 1
            b = dec.decode_cul_freq(3)
            b = (0 if b < 2 else 1) if val == 0 else (1 if b >= 1 else 0)
            dec.decode_update(2, val, 3)
            assert b == val
        dec.decode_finish()
        assert ins.tell() == out.tell()


def test_dummy_range_coder_contract():
    from compressjs_tpu.coders.dummy_range_coder import DummyRangeCoder
    out = BufferStream()
    enc = DummyRangeCoder(out)
    enc.encode_start(0, 0)
    enc.encode_freq(3, 4, 10)
    enc.encode_shift(1, 5, 4)
    enc.encode_finish()
    ins = ArrayInputStream(out.get_buffer())
    dec = DummyRangeCoder(ins)
    dec.decode_start()
    f = dec.decode_cul_freq(10)
    assert 4 <= f < 7
    dec.decode_update(3, 4, 10)
    f = dec.decode_cul_shift(4)
    dec.decode_update(1, 5, 16)
