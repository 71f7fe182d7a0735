"""RLE1 encode parity: the native state machine, the vectorized numpy
path, and a Python transcription of the reference readBlock loop
(Bzip2.js:636-667) must agree byte-for-byte on adversarial run patterns
and block cuts — including the count-byte-at-block-boundary case where
extras stay unconsumed.

One DELIBERATE deviation from the reference: when a block would end
with a 4-byte run whose count byte did not fit, the reference emits the
dangling run — a stream C bzip2 rejects ('Data integrity error').  All
three implementations here instead defer the run's 4th byte to the next
block (see rle.py / core.cpp), so the transcription below applies the
same back-off."""

import numpy as np
import pytest

import compressjs_tpu.ops.rle as rr


def ref_rle1(data, block_size):
    """Port of the reference loop semantics + the dangling-run fix."""
    out = []
    i = 0
    last = -1
    run = 0
    counted = False
    while len(out) < block_size:
        if run == 4:
            out.append(0)
            counted = True
            if len(out) >= block_size:
                break
        if i >= len(data):
            break
        c = int(data[i])
        i += 1
        if c != last:
            last = c
            run = 1
            counted = False
        else:
            run += 1
            if run > 4:
                if run < 256:
                    out[-1] += 1
                    continue
                run = 1
                counted = False
        out.append(c)
    if run == 4 and not counted and len(out) >= block_size and out:
        out.pop()
        i -= 1
    return np.array(out, dtype=np.uint8), i


def _cases():
    rng = np.random.RandomState(0)
    return [
        rng.randint(0, 4, 30000).astype(np.uint8),
        np.repeat(rng.randint(0, 256, 500).astype(np.uint8),
                  rng.randint(1, 600, 500)),
        np.full(50000, 7, np.uint8),
        rng.randint(0, 256, 20000).astype(np.uint8),
        np.repeat(np.arange(50, dtype=np.uint8), 255),
        np.repeat(np.arange(50, dtype=np.uint8), 256),
        np.repeat(np.arange(60, dtype=np.uint8), 300),
    ]


@pytest.mark.parametrize('bs', [5, 7, 10, 997, 5000])
def test_numpy_matches_reference_loop(bs):
    saved = rr._native
    rr._native = None
    try:
        for data in _cases():
            b_r, c_r = ref_rle1(data, bs)
            b_p, c_p = rr.rle1_encode(data, 0, bs)
            assert c_r == c_p
            assert b_r.tobytes() == b_p.tobytes()
    finally:
        rr._native = saved


def test_no_dangling_run_c_interop():
    """Run-dense inputs used to produce blocks ending with a 4-run and
    no count byte — streams C bzip2/libbz2 reject ('Invalid data
    stream') even though lenient decoders roundtrip them.  The back-off
    must keep every stream C-decodable; libbz2 is the referee."""
    import bz2
    from compressjs_tpu.codecs import bzip2 as our
    for seed in range(4):
        rng = np.random.RandomState(seed)
        data = bytes(rng.randint(0, 2, 300000, dtype=np.uint8))
        comp = bytes(our.compress_file(data, None, 1))
        assert bytes(our.decompress_file(comp)) == data, seed
        assert bz2.decompress(comp) == data, seed


@pytest.mark.parametrize('bs', [5, 7, 10, 997, 5000])
def test_native_matches_reference_loop(bs):
    from compressjs_tpu import native
    if not native.available():
        pytest.skip('no native library')
    for data in _cases():
        b_r, c_r = ref_rle1(data, bs)
        b_n, c_n = native.rle1_encode(data, bs)
        assert c_r == c_n
        assert b_r.tobytes() == b_n.tobytes()
