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


@pytest.mark.parametrize('name', CODECS)
def test_corrupt_stream_never_crashes(name):
    """Byte-flipped or truncated compressed streams must raise or decode
    to garbage — never take down the process.  Before the rc::Dec guards
    and the LZP3 match clamp landed, lzp3 corrupted the heap (OOB match
    copy) and ppm/simple hit SIGFPE (zero totals through the range
    coder), so this runs IN-PROCESS on purpose: a regression kills
    pytest loudly."""
    codec = getattr(cz, name)
    data = open('/root/reference/test/sample1.ref', 'rb').read()[:30000]
    comp = np.asarray(codec.compress_file(data), dtype=np.uint8)
    for seed in range(12):
        rng = np.random.RandomState(zlib.crc32(name.encode()) % 99991 + seed)
        if seed % 3 == 2:    # truncation
            bad = comp[:rng.randint(1, len(comp))].copy()
        else:                # byte flips
            bad = comp.copy()
            idx = rng.randint(0, len(bad), size=rng.randint(1, 16))
            bad[idx] = rng.randint(0, 256, size=len(idx))
        try:
            codec.decompress_file(bad)
        except Exception:
            pass  # clean failure is the contract; crashing is not


def test_suffix_sort_large_structured():
    """Large structured inputs exercise the SA-IS naming equivalence:
    LMS substrings that are equal up to (but not including) their
    terminal character appear in arbitrary induced order, so a naming
    that compares the terminal char corrupts the suffix array — a bug
    class small random inputs almost never expose.  Native vs the
    independent numpy prefix-doubling path must agree exactly."""
    from compressjs_tpu import native
    if not native.available():
        pytest.skip('native library unavailable')
    from compressjs_tpu.ops.bwt import cyclic_suffix_array, suffix_array
    from compressjs_tpu.ops import bwt as bwt_ops
    rng = np.random.RandomState(99)
    text = np.fromfile('/root/reference/test/sample5.ref', dtype=np.uint8)
    for trial in range(9):
        m = int(rng.randint(4000, 20000))
        kind = trial % 3
        if kind == 0:      # tiny alphabet: dense LMS structure
            t = rng.randint(0, 4, size=m).astype(np.uint8)
        elif kind == 1:    # long-period repetition: many equal substrings
            base = rng.randint(0, 256, size=97).astype(np.uint8)
            t = np.tile(base, m // 97 + 1)[:m]
        else:              # real text
            t = text[trial * 1000:trial * 1000 + m]
        U = np.zeros(m, np.uint8)
        sa = cyclic_suffix_array(t)
        pidx = bwt_ops.bwtransform2(t, U, m, 256)
        assert np.array_equal(U, t[(sa + m - 1) % m]), ('cyclic', trial)
        assert pidx == int(np.nonzero(sa == 0)[0][0]), ('pidx', trial)
        assert np.array_equal(native.suffix_sort(t), suffix_array(t)), \
            ('eof', trial)


def test_corrupt_multiblock_bzip2_never_crashes(ref_samples):
    """Multi-block streams route through the full-native block parse and
    the block-parallel dispatch — corruption there must raise or produce
    a clean wrong-data error, never crash (the native parse returns -1
    on any anomaly and the Python parser re-runs for the exact error)."""
    data = ref_samples['sample5']
    comp = np.asarray(cz.Bzip2.compress_file(data, None, 1),
                      dtype=np.uint8)  # level 1: ~22 blocks
    assert comp.shape[0] > 65536  # must exercise the parallel dispatch
    for seed in range(30):
        rng = np.random.RandomState(7000 + seed)
        bad = comp.copy()
        if seed % 5 == 4:
            bad = bad[:rng.randint(16, len(bad))].copy()
        elif seed % 5 == 3:
            # target an early region (headers/tables) specifically
            idx = rng.randint(4, 2048, size=rng.randint(1, 8))
            bad[idx] = rng.randint(0, 256, size=len(idx))
        else:
            idx = rng.randint(0, len(bad), size=rng.randint(1, 24))
            bad[idx] = rng.randint(0, 256, size=len(idx))
        try:
            out = cz.Bzip2.decompress_file(bad)
            # parallel assembly may fall back and even "succeed" if the
            # flip landed in dead bits; any returned data must then be
            # the true plaintext (CRC-validated)
            assert bytes(out) == data
        except Exception:
            pass
    # the pristine stream still decodes after all that
    assert bytes(cz.Bzip2.decompress_file(comp)) == data


def _block_scale_cases():
    """Pathological BLOCK-SCALE inputs (the seeded fuzz above stays
    under 5 KB): RLE1 block-cut edges, all-zero/periodic full blocks,
    embedded block-magic byte patterns, exact -19 boundary lengths."""
    rng = np.random.RandomState(42)
    data = open('/root/reference/test/sample5.ref', 'rb').read()
    magic = bytes([0x31, 0x41, 0x59, 0x26, 0x53, 0x59])
    return [
        b'\x00' * 100000,                      # one all-zero block
        b'ab' * 60000,                         # period 2 across blocks
        (b'Q' * 259) * 400,                    # max RLE1 runs back-to-back
        rng.randint(0, 256, 150000, dtype=np.uint8).tobytes(),
        data[:100000 - 19],                    # exact level-1 block cut
        data[:100000 - 18],                    # one past the cut
        data[:200001],                         # multi-block + 1
        magic * 20000,                         # payload full of block magic
    ]


@pytest.mark.slow
@pytest.mark.parametrize('name', ['Bzip2', 'BWTC', 'Lzjb', 'LzjbR',
                                  'Lzp3', 'Simple', 'PPM', 'Dmc'])
def test_block_scale_pathological_roundtrip(name):
    codec = getattr(cz, name)
    levels = [1, 9] if name in ('Bzip2', 'BWTC', 'Lzjb', 'LzjbR') else [None]
    for case in _block_scale_cases():
        for lv in levels:
            comp = (codec.compress_file(case, None, lv) if lv
                    else codec.compress_file(case))
            assert bytes(codec.decompress_file(comp)) == case, (name, lv)
