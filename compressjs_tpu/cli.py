"""Command-line interface, mirroring the reference CLI contract
(/root/reference/bin/compressjs:7-181): -z/-d, -t <codec> (14 dispatch
names), -1..-9 (default level 7), -b <bitpos> random-access block
extraction, file args or stdin/stdout.

Usage:  python -m compressjs_tpu.cli -z -t bzip2 -9 [infile] [outfile]
        python -m compressjs_tpu.cli -d -t bzip2 [infile] [outfile]
        python -m compressjs_tpu.cli -d -t bzip2 -b 544888 in.bz2 out
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _dispatch(name):
    import compressjs_tpu as cz
    table = {
        # models and coders (self-test codecs)
        'defsum': cz.DefSumModel,
        'fenwick': cz.FenwickModel,
        'mtf': cz.MTFModel,
        'context1': cz.Context1Model,
        'no': cz.NoModel,
        'huff': cz.Huffman,
        'huffman': cz.Huffman,
        # compression methods
        'bwtc': cz.BWTC,
        'bwtcp': cz.BWTCP,  # framework extension: parallel-stream BWTC
        'bzip': cz.Bzip2,
        'bzip2': cz.Bzip2,
        'dmc': cz.Dmc,
        'lzjb': cz.Lzjb,
        'lzjbr': cz.LzjbR,
        'lzp3': cz.Lzp3,
        'ppm': cz.PPM,
        'simple': cz.Simple,
    }
    key = name.lower()
    if key not in table:
        print('Unknown compressor: %s' % name, file=sys.stderr)
        raise SystemExit(1)
    return table[key]


def _version():
    import compressjs_tpu
    return compressjs_tpu.version


def main(argv=None):
    p = argparse.ArgumentParser(
        prog='compressjs_tpu', usage='%(prog)s -d|-z [infile] [outfile]')
    p.add_argument('-V', '--version', action='version',
                   version='%(prog)s ' + _version())
    p.add_argument('-d', '--decompress', action='store_true',
                   help='Decompress infile to outfile')
    p.add_argument('-z', '--compress', action='store_true',
                   help='Compress infile to outfile')
    p.add_argument('-b', '--block', type=int, default=-1,
                   help='Extract a single block, starting at <n> bits.')
    p.add_argument('-t', dest='codec', default=None,
                   help='Select compressor type')
    for lvl in range(1, 10):
        p.add_argument('-%d' % lvl, dest='level%d' % lvl,
                       action='store_true',
                       help=('Fastest/largest compression' if lvl == 1 else
                             'Slowest/smallest compression' if lvl == 9 else
                             argparse.SUPPRESS))
    p.add_argument('infile', nargs='?')
    p.add_argument('outfile', nargs='?')
    args = p.parse_args(argv)

    if not args.decompress:
        args.compress = True
    if args.decompress and args.compress:
        print('Must specify either -d or -z.', file=sys.stderr)
        return 1
    if args.compress and args.block >= 0:
        print('--block can only be used with decompression', file=sys.stderr)
        return 1

    level = None
    for lvl in range(1, 10):
        if getattr(args, 'level%d' % lvl):
            if level:
                print("Can't specify both -%d and -%d" % (level, lvl),
                      file=sys.stderr)
                return 1
            level = lvl
    if level and args.decompress:
        print('Compression level has no effect when decompressing.',
              file=sys.stderr)
        return 1
    if not level:
        level = 7  # default

    codec = _dispatch(args.codec) if args.codec else _dispatch('lzp3')

    try:
        if args.infile:
            import os as _os
            if _os.path.getsize(args.infile) > (64 << 20):
                # large inputs: memory-map so block codecs stream from disk
                data = np.memmap(args.infile, dtype=np.uint8, mode='r')
            else:
                with open(args.infile, 'rb') as f:
                    data = f.read()
        else:
            data = sys.stdin.buffer.read()
    except OSError as e:
        print('error: %s' % e, file=sys.stderr)
        return 1

    # with an output file, stream codec output straight to disk
    # (O(buffer) memory; block extraction returns an array and keeps
    # the in-memory path).  Output goes to a temp file renamed into
    # place on success, so a failure never truncates or deletes a
    # pre-existing file at the destination (and `cli in out` with
    # in == out cannot destroy its own input).
    import os as _os
    from .utils.stream import FileOutputStream
    sink = None
    tmp_path = None
    out = None
    try:
        if args.outfile and args.block < 0:
            tmp_path = '%s.tmp.%d' % (args.outfile, _os.getpid())
            sink_file = open(tmp_path, 'wb')
            sink = FileOutputStream(sink_file)
        if args.decompress:
            if args.block >= 0:
                if not hasattr(codec, 'decompress_block'):
                    print('--block requires a random-access codec (bzip2)',
                          file=sys.stderr)
                    return 1
                out = codec.decompress_block(data, args.block)
            else:
                out = codec.decompress_file(data, sink) if sink is not None \
                    else codec.decompress_file(data)
        else:
            out = codec.compress_file(data, sink, level)
        if sink is not None:
            sink.flush()
            sink_file.close()
            _os.replace(tmp_path, args.outfile)
            return 0
    except Exception as e:  # corrupt input / IO: clean message
        if sink is not None:   # drop the temp; the destination untouched
            try:
                sink_file.close()
                _os.unlink(tmp_path)
            except OSError:
                pass
        print('error: %s' % e, file=sys.stderr)
        return 1

    out_bytes = bytes(np.asarray(out, dtype=np.uint8))
    try:
        if args.outfile:
            with open(args.outfile, 'wb') as f:
                f.write(out_bytes)
        else:
            sys.stdout.buffer.write(out_bytes)
    except OSError as e:
        print('error: %s' % e, file=sys.stderr)
        return 1
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
