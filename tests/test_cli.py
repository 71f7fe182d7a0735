"""CLI contract tests (reference bin/compressjs behaviors)."""

import subprocess
import sys

import pytest

REF = '/root/reference/test'


def run_cli(args, stdin=b''):
    return subprocess.run(
        [sys.executable, '-m', 'compressjs_tpu.cli'] + args,
        input=stdin, capture_output=True, cwd='/root/repo')


def test_roundtrip_via_files(tmp_path):
    src = tmp_path / 'in.txt'
    comp = tmp_path / 'out.lzjb'
    back = tmp_path / 'back.txt'
    data = open(f'{REF}/sample0.ref', 'rb').read()
    src.write_bytes(data)
    r = run_cli(['-z', '-t', 'lzjb', '-1', str(src), str(comp)])
    assert r.returncode == 0, r.stderr
    r = run_cli(['-d', '-t', 'lzjb', str(comp), str(back)])
    assert r.returncode == 0, r.stderr
    assert back.read_bytes() == data


def test_stdin_stdout():
    data = b'hello compressjs tpu\n' * 10
    r = run_cli(['-z', '-t', 'simple'], stdin=data)
    assert r.returncode == 0, r.stderr
    r2 = run_cli(['-d', '-t', 'simple'], stdin=r.stdout)
    assert r2.returncode == 0, r2.stderr
    assert r2.stdout == data


def test_default_codec_is_lzp3():
    data = b'abcabcabc'
    r = run_cli(['-z'], stdin=data)
    assert r.returncode == 0
    assert r.stdout[:4] == b'lzp3'


def test_block_extraction(tmp_path):
    out = tmp_path / 'blk'
    r = run_cli(['-d', '-t', 'bzip2', '-b', '544888',
                 f'{REF}/sample2.bz2', str(out)])
    assert r.returncode == 0, r.stderr
    assert out.read_bytes() == open(f'{REF}/sample2.544888', 'rb').read()


def test_bad_codec_name():
    r = run_cli(['-z', '-t', 'nosuch'], stdin=b'x')
    assert r.returncode == 1
    assert b'Unknown compressor' in r.stderr


def test_conflicting_levels():
    r = run_cli(['-z', '-t', 'lzjb', '-1', '-9'], stdin=b'x')
    assert r.returncode == 1


def test_level_on_decompress_rejected():
    r = run_cli(['-d', '-t', 'lzjb', '-5'], stdin=b'x')
    assert r.returncode == 1


def test_block_with_compress_rejected():
    r = run_cli(['-z', '-b', '32'], stdin=b'x')
    assert r.returncode == 1


def test_block_on_non_random_access_codec():
    r = run_cli(['-d', '-t', 'lzjb', '-b', '32'], stdin=b'x')
    assert r.returncode == 1
    assert b'random-access' in r.stderr
    assert b'Traceback' not in r.stderr


def test_corrupt_input_clean_error():
    # wrong magic, truncated stream, and corrupt body must all produce a
    # one-line 'error: ...' and exit 1 -- never a traceback
    for args, payload in [
        (['-d', '-t', 'lzp3'], b'NOTAMAGIC'),
        (['-d', '-t', 'bzip2'], b''),
        (['-d', '-t', 'bwtc'], b'bwtc....garbage'),
    ]:
        r = run_cli(args, stdin=payload)
        assert r.returncode == 1, (args, r.stderr)
        assert b'error:' in r.stderr or b'Not bzip' in r.stderr, args
        assert b'Traceback' not in r.stderr, args


def test_missing_input_file_clean_error():
    r = run_cli(['-z', '-t', 'lzp3', '/tmp/definitely-does-not-exist'])
    assert r.returncode == 1
    assert b'error:' in r.stderr
    assert b'Traceback' not in r.stderr


@pytest.mark.parametrize('name', [
    'defsum', 'fenwick', 'mtf', 'context1', 'no', 'huffman',
    'bwtc', 'bzip2', 'dmc', 'lzjb', 'lzjbr', 'lzp3', 'ppm', 'simple'])
def test_all_dispatch_names(name):
    data = b'dispatch test data ' * 5
    r = run_cli(['-z', '-t', name, '-1'], stdin=data)
    assert r.returncode == 0, (name, r.stderr)
    r2 = run_cli(['-d', '-t', name], stdin=r.stdout)
    assert r2.returncode == 0, (name, r2.stderr)
    assert r2.stdout == data
