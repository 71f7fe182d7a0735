"""Aux subsystems: frozen namespaces, stage profiling, coder byte
accounting, pipeline self-check mode."""

import numpy as np
import pytest

import compressjs_tpu as cz
from compressjs_tpu.utils.freeze import freeze
from compressjs_tpu.parallel.profiling import StageTimer


def test_freeze_blocks_mutation():
    ns = freeze({'x': 1, 'y': 2})
    assert ns.x == 1 and 'y' in ns
    with pytest.raises(AttributeError):
        ns.x = 5
    with pytest.raises(AttributeError):
        del ns.y
    with pytest.raises(AttributeError):
        ns.z


def test_stage_timer():
    t = StageTimer(enabled=True)
    with t.stage('a'):
        pass
    with t.stage('a'):
        pass
    with t.stage('b'):
        pass
    assert t.counts['a'] == 2 and t.counts['b'] == 1
    import io
    buf = io.StringIO()
    t.report(buf)
    assert 'stage timing' in buf.getvalue()


def test_range_coder_bytecount():
    # the reference's only profiling hook: encodeFinish returns the byte
    # count (RangeCoder.js:139)
    from compressjs_tpu.coders.range_coder import RangeCoder
    from compressjs_tpu.utils.stream import BufferStream
    out = BufferStream()
    rc = RangeCoder(out)
    rc.encode_start(0, 0)
    for i in range(100):
        rc.encode_byte(i & 0xFF)
    n = rc.encode_finish()
    assert n == out.tell()


def test_pipeline_self_check(ref_samples):
    from compressjs_tpu.parallel.pipeline import DeviceBzip2Encoder
    from compressjs_tpu.codecs import bzip2
    data = ref_samples['sample2']
    comp = bytes(DeviceBzip2Encoder(1, self_check=True).compress(data))
    assert comp == bytes(bzip2.compress_file(data, None, 1))
