"""RLE1 encode parity: the native state machine (a direct transcription of
the reference readBlock loop, Bzip2.js:636-667), the vectorized numpy
path, and a Python transcription must agree byte-for-byte on adversarial
run patterns and block cuts — including the count-byte-at-block-boundary
case where extras stay unconsumed."""

import numpy as np
import pytest

import compressjs_tpu.ops.rle as rr


def ref_rle1(data, block_size):
    """Line-for-line port of the reference loop semantics."""
    out = []
    i = 0
    last = -1
    run = 0
    while len(out) < block_size:
        if run == 4:
            out.append(0)
            if len(out) >= block_size:
                break
        if i >= len(data):
            break
        c = int(data[i])
        i += 1
        if c != last:
            last = c
            run = 1
        else:
            run += 1
            if run > 4:
                if run < 256:
                    out[-1] += 1
                    continue
                run = 1
        out.append(c)
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


@pytest.mark.parametrize('bs', [5, 997, 5000])
def test_native_matches_reference_loop(bs):
    from compressjs_tpu import native
    if not native.available():
        pytest.skip('no native library')
    for data in _cases():
        b_r, c_r = ref_rle1(data, bs)
        b_n, c_n = native.rle1_encode(data, bs)
        assert c_r == c_n
        assert b_r.tobytes() == b_n.tobytes()
