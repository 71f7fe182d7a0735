"""Bzip2 codec tests, mirroring the reference suite:
- cross-implementation golden decode (test/bzip2-basic.js)
- random-access block decode (test/bzip2-block.js)
- block index table (test/bzip2-table.js)
- round-trip matrix (test/file.js)
plus encode-side format interop checks the reference couldn't do (the C
bzip2 binary decodes our output)."""

import subprocess

import numpy as np
import pytest

from compressjs_tpu.codecs import bzip2

REF = '/root/reference/test'


def read(path):
    with open(path, 'rb') as f:
        return f.read()


@pytest.mark.parametrize('i', range(5))
def test_golden_decode(i):
    ref = read(f'{REF}/sample{i}.ref')
    bz = read(f'{REF}/sample{i}.bz2')
    assert bytes(bzip2.decompress_file(bz)) == ref


@pytest.mark.parametrize('name,lvl', [
    ('sample0', 1), ('sample0', 9), ('sample1', 9), ('sample2', 9),
    ('sample3', 9), ('sample4', 1),
])
def test_roundtrip(name, lvl):
    ref = read(f'{REF}/{name}.ref')
    comp = bzip2.compress_file(ref, None, lvl)
    assert bytes(bzip2.decompress_file(comp)) == ref


@pytest.mark.slow
@pytest.mark.parametrize('name,lvl', [('sample4', 9), ('sample5', 1),
                                      ('sample5', 9)])
def test_roundtrip_large(name, lvl):
    ref = read(f'{REF}/{name}.ref')
    comp = bzip2.compress_file(ref, None, lvl)
    assert bytes(bzip2.decompress_file(comp)) == ref


def test_size_parity_sample5():
    # reference README: bzip2 -9 sample5 = 275,087 bytes; ours must match
    # or beat it (BASELINE.md)
    ref = read(f'{REF}/sample5.ref')
    comp = bzip2.compress_file(ref, None, 9)
    assert len(comp) <= 275087


@pytest.mark.parametrize('sample,pos,golden', [
    ('sample2', 544888, 'sample2.544888'),
    ('sample4', 32, 'sample4.32'),
    ('sample4', 1596228, 'sample4.1596228'),
    ('sample4', 2342106, 'sample4.2342106'),
])
def test_block_decode(sample, pos, golden):
    bz = read(f'{REF}/{sample}.bz2')
    out = bzip2.decompress_block(bz, pos)
    assert bytes(out) == read(f'{REF}/{golden}')


@pytest.mark.parametrize('i', range(5))
def test_table(i):
    bz = read(f'{REF}/sample{i}.bz2')
    rows = []
    bzip2.table(bz, lambda pos, size: rows.append('%d\t%d\n' % (pos, size)))
    golden = read(f'{REF}/sample{i}.bzt').decode()
    assert ''.join(rows) == golden


def test_multistream():
    a = read(f'{REF}/sample0.ref')
    ca = bytes(bzip2.compress_file(a, None, 1))
    double = ca + ca
    out = bzip2.decompress_file(double, None, multistream=True)
    assert bytes(out) == a + a
    # without multistream flag, only the first stream decodes
    out1 = bzip2.decompress_file(double)
    assert bytes(out1) == a


def test_c_bzip2_interop(tmp_path):
    ref = read(f'{REF}/sample1.ref')
    comp = bytes(bzip2.compress_file(ref, None, 9))
    p = tmp_path / 'x.bz2'
    p.write_bytes(comp)
    out = subprocess.run(['bzip2', '-dc', str(p)], capture_output=True)
    assert out.returncode == 0
    assert out.stdout == ref


def test_bad_data_errors():
    with pytest.raises(ValueError):
        bzip2.decompress_file(b'NOTBZDATA')
    # corrupt a block payload bit: CRC must catch it
    ref = read(f'{REF}/sample0.ref')
    comp = bytearray(bytes(bzip2.compress_file(ref, None, 1)))
    comp[len(comp) // 2] ^= 0x40
    with pytest.raises(ValueError):
        bzip2.decompress_file(bytes(comp))


def test_rle1_edge_cases():
    # runs of exactly 4, 5, 255, 256, 259 bytes and run-at-block-end
    for run in [4, 5, 8, 254, 255, 256, 259, 510, 1000]:
        data = b'x' * run + b'abc' + b'y' * run
        comp = bzip2.compress_file(data, None, 1)
        assert bytes(bzip2.decompress_file(comp)) == data, run
    # all one value
    data = b'\x00' * 100000
    comp = bzip2.compress_file(data, None, 1)
    assert bytes(bzip2.decompress_file(comp)) == data


def test_empty_input():
    comp = bzip2.compress_file(b'', None, 9)
    assert bytes(bzip2.decompress_file(comp)) == b''


@pytest.mark.parametrize('level', list(range(1, 10)))
def test_c_bzip2_interop_every_level(level, tmp_path):
    """Both directions against the C binary at every block-size level;
    sample4 (~900KB) is multi-block at the low levels."""
    ref = read(f'{REF}/sample4.ref')
    # ours -> C
    comp = bytes(bzip2.compress_file(ref, None, level))
    p = tmp_path / 'x.bz2'
    p.write_bytes(comp)
    out = subprocess.run(['bzip2', '-dc', str(p)], capture_output=True)
    assert out.returncode == 0 and out.stdout == ref, level
    # C -> ours
    cb = subprocess.run(['bzip2', f'-{level}', '-c'], input=ref,
                        capture_output=True).stdout
    assert bytes(bzip2.decompress_file(cb)) == ref, level
