"""Block-parallel bzip2 decode: the magic-scan manifest, executor paths,
false-positive candidates, and the auto-dispatch in decompress_file.

The safety story under test: parallel decode must produce byte-identical
output or fall back to the sequential decoder — never corrupt output —
even when the candidate manifest contains garbage positions.
"""

import os

import numpy as np
import pytest

from compressjs_tpu.codecs import bzip2
from compressjs_tpu.parallel import decode as pdec


@pytest.fixture(scope='module')
def multiblock(ref_samples):
    """A 3-block level-9 stream and its expected plaintext."""
    data = np.frombuffer(ref_samples['sample5'], dtype=np.uint8)
    comp = bytes(bzip2.compress_file(data, None, 9))
    return comp, ref_samples['sample5']


def test_scan_magic_exact_against_bit_bruteforce():
    rng = np.random.RandomState(11)
    pat = pdec._MAGIC_BITS
    pat_bits = np.unpackbits(pat)
    for _ in range(40):
        n = rng.randint(7, 220)
        d = rng.randint(0, 256, size=n).astype(np.uint8)
        for _ in range(rng.randint(0, 3)):
            bitpos = rng.randint(0, n * 8 - 48)
            bits = np.unpackbits(d)
            bits[bitpos:bitpos + 48] = pat_bits
            d = np.packbits(bits)
        bits = np.unpackbits(d)
        want = [i for i in range(len(bits) - 47)
                if (bits[i:i + 48] == pat_bits).all()]
        got = list(pdec._scan_magic(d, pat))
        assert got == want


def test_block_index_matches_table(multiblock):
    comp, _ = multiblock
    table_positions = []
    bzip2.table(comp, lambda pos, size: table_positions.append(pos))
    scan_positions = [int(p) for p in pdec.block_index(comp)
                      if int(p) >= 32]
    assert scan_positions == table_positions


@pytest.mark.filterwarnings('ignore::DeprecationWarning')
@pytest.mark.filterwarnings('ignore::RuntimeWarning')
@pytest.mark.parametrize('executor', ['thread', 'process'])
def test_parallel_decode_matches_sequential(multiblock, executor):
    # the 'process' case forks with JAX loaded — exactly why the thread
    # executor is the default; the fork warnings are the expected cost
    # of exercising the opt-in path
    comp, want = multiblock
    out = pdec.decompress_file_parallel(
        np.frombuffer(comp, dtype=np.uint8), None, executor=executor)
    assert bytes(out) == want


def test_parallel_decode_survives_bogus_candidates(multiblock, monkeypatch):
    """Garbage manifest entries must be skipped (failed decode) or force
    the sequential fallback (stream-CRC mismatch) — never corrupt."""
    comp, want = multiblock
    real = pdec.block_index(np.frombuffer(comp, dtype=np.uint8))

    def poisoned(data):
        bogus = np.array([33, 1000, int(real[1]) + 3,
                          len(comp) * 8 - 200], dtype=np.int64)
        return np.unique(np.concatenate([real, bogus]))

    monkeypatch.setattr(pdec, 'block_index', poisoned)
    out = pdec.decompress_file_parallel(
        np.frombuffer(comp, dtype=np.uint8), None, executor='thread')
    assert bytes(out) == want


def test_parallel_decode_first_candidate_mismatch_falls_back(
        multiblock, monkeypatch):
    comp, want = multiblock
    monkeypatch.setattr(
        pdec, 'block_index',
        lambda data: np.array([48, 99999], dtype=np.int64))
    out = pdec.decompress_file_parallel(
        np.frombuffer(comp, dtype=np.uint8), None, executor='thread')
    assert bytes(out) == want


def test_auto_dispatch_equals_sequential(multiblock):
    comp, want = multiblock
    assert bytes(bzip2.decompress_file(comp)) == want
    assert bytes(bzip2.decompress_file(comp, _sequential=True)) == want


def test_auto_dispatch_kill_switch(multiblock, monkeypatch):
    comp, want = multiblock
    monkeypatch.setenv('COMPRESSJS_TPU_NO_PARALLEL', '1')
    calls = []
    orig = pdec.decompress_file_parallel

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(pdec, 'decompress_file_parallel', spy)
    assert bytes(bzip2.decompress_file(comp)) == want
    assert calls == []


def test_streaming_output_stays_sequential(multiblock):
    comp, want = multiblock
    from compressjs_tpu.utils.stream import BufferStream
    out = BufferStream()
    bzip2.decompress_file(comp, out)
    assert bytes(out.buffer[:out.pos]) == want


def test_multistream_via_default_entry(multiblock):
    comp, want = multiblock
    out = bzip2.decompress_file(comp + comp, None, True)
    assert bytes(out) == want + want


def test_injected_blocks_after_end_magic_are_ignored(multiblock):
    """Adversarial: append a second stream's block section plus a forged
    end magic whose 32-bit CRC matches the rolling combination of ALL
    decodable blocks in the file.  The sequential/reference decoder
    stops at the true end magic; parallel assembly must too (it chains
    exact bit positions), not vacuum up every decodable block."""
    from compressjs_tpu.utils.crc32 import stream_crc_combine

    comp, want = multiblock
    extra = np.frombuffer(b'injected payload, not part of the stream. '
                          * 400, dtype=np.uint8)
    comp2 = bytes(bzip2.compress_file(extra, None, 1))
    # strip comp2's 4-byte BZh1 header so its first block magic lands
    # byte-aligned in the crafted tail
    evil = comp + comp2[4:]

    # forge a trailing end magic + CRC covering every decodable block in
    # candidate-scan order (computable by an attacker from the streams)
    folded = 0
    for blob, level in ((comp, 9), (comp2, 1)):
        r = bzip2._BitReader(np.frombuffer(blob, dtype=np.uint8))
        bzip2._start(r)
        while True:
            res = bzip2._decode_one_block(r, 100000 * level)
            if res is None:
                break
            folded = stream_crc_combine(folded, res[1])
    end_bits = (bzip2.SQRTPI << 32) | folded
    evil += int(end_bits).to_bytes(10, 'big')

    evil_arr = np.frombuffer(evil, dtype=np.uint8)
    seq = bytes(bzip2.decompress_file(evil_arr, _sequential=True))
    assert seq == want  # reference semantics: trailing bytes ignored
    par = bytes(pdec.decompress_file_parallel(evil_arr))
    assert par == want
    assert bytes(bzip2.decompress_file(evil_arr)) == want
