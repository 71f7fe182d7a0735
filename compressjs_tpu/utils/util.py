"""Shared runtime helpers: varint container framing, codec file helpers,
model-driving loops, and bit math.

Behavioral contract follows the reference runtime (/root/reference/lib/
Util.js:105-220, 284-321): the self-delimiting big-endian varint, the
magic+size container shared by every codec except bzip2, the "suppressed
final byte" trick that folds the last header byte into the range coder's
free first byte, and fls/log2c.  Implementations here are fresh and
array-oriented (numpy), not translations of the JS byte loops.
"""

from __future__ import annotations

import numpy as np

from .stream import (EOF, Stream, coerce_input_stream, coerce_output_stream)

__all__ = [
    'EOF', 'write_unsigned_number', 'read_unsigned_number', 'fls', 'log2c',
    'compress_file_helper', 'decompress_file_helper',
    'compress_with_model', 'decompress_with_model',
]


def write_unsigned_number(output, n):
    """Self-delimiting big-endian varint: 7 bits per byte, the final byte has
    the 0x80 end marker (Util.js:194-208).  Supports arbitrarily large ints
    (Python) — reference caps at 2^53."""
    assert n >= 0
    out = [n & 0x7F]
    n >>= 7
    while n != 0:
        out.append(n & 0x7F)
        n >>= 7
    out[0] |= 0x80
    for b in reversed(out):
        output.write_byte(b)
    return output


def read_unsigned_number(input_stream):
    n = 0
    while True:
        c = input_stream.read_byte()
        if c & 0x80:
            n += (c & 0x7F)
            break
        n = (n + c) << 7
    return n


def varint_bytes(n):
    """The varint encoding of n as a list of ints (no stream)."""
    assert n >= 0
    out = [n & 0x7F]
    n >>= 7
    while n != 0:
        out.append(n & 0x7F)
        n >>= 7
    out[0] |= 0x80
    return list(reversed(out))


# ---------------------------------------------------------------------------
# bit math

_BYTE_MSB = np.zeros(256, dtype=np.int32)
for _v in range(1, 256):
    _BYTE_MSB[_v] = _v.bit_length()


def fls(v):
    """Find-last-set: position of the most significant set bit.
    fls(0)==0, fls(1)==1 (Util.js:301-317)."""
    assert v >= 0
    return int(v).bit_length()


def fls_array(v):
    """Vectorized fls over an integer ndarray (values < 2^62)."""
    v = np.asarray(v)
    out = np.zeros(v.shape, dtype=np.int32)
    work = v.astype(np.uint64).copy()
    shift = np.zeros(v.shape, dtype=np.int32)
    mask = work > 0xFFFFFFFF
    out_dtype_work = work
    while mask.any():
        work = np.where(mask, work >> np.uint64(32), work)
        shift = shift + np.where(mask, 32, 0)
        mask = work > 0xFFFFFFFF
    w = work.astype(np.uint32)
    hi16 = (w >> np.uint32(16)).astype(np.int64)
    lo16 = (w & np.uint32(0xFFFF)).astype(np.int64)
    hi_res = np.where(hi16 > 0xFF,
                      24 + _BYTE_MSB[(hi16 >> 8) & 0xFF],
                      16 + _BYTE_MSB[hi16 & 0xFF])
    lo_res = np.where(lo16 > 0xFF,
                      8 + _BYTE_MSB[(lo16 >> 8) & 0xFF],
                      _BYTE_MSB[lo16 & 0xFF])
    return (shift + np.where(hi16 != 0, hi_res, lo_res)).astype(np.int32)


def log2c(v):
    """ceil(log2(v)); log2c(0) == -1 (Util.js:319-321)."""
    return -1 if v == 0 else fls(v - 1)


# ---------------------------------------------------------------------------
# container helpers

def compress_file_helper(magic, guts, suppress_final_byte=False):
    """Build a compressFile(input, output=None, props=None) entry point that
    writes `magic` + varint(fileSize+1) and delegates to
    guts(in_stream, out_stream, file_size, props, final_byte)
    (Util.js:105-142).  When suppress_final_byte is set, the last header
    byte is handed to guts for the range coder's free first byte."""

    def compress_file(input_data, output=None, props=None):
        in_stream = coerce_input_stream(input_data)
        o = coerce_output_stream(output)
        out_stream = o.stream

        for ch in magic:
            out_stream.write_byte(ord(ch))

        file_size = in_stream.size if getattr(in_stream, 'size', -1) >= 0 else -1

        final_byte = None
        vb = varint_bytes(file_size + 1)
        if suppress_final_byte:
            for b in vb[:-1]:
                out_stream.write_byte(b)
            final_byte = vb[-1]
        else:
            for b in vb:
                out_stream.write_byte(b)

        guts(in_stream, out_stream, file_size, props, final_byte)
        return o.retval

    return compress_file


def decompress_file_helper(magic, guts):
    """Build decompressFile(input, output=None) checking magic and reading
    the size varint (Util.js:143-166)."""

    def decompress_file(input_data, output=None):
        in_stream = coerce_input_stream(input_data)
        for ch in magic:
            if ord(ch) != in_stream.read_byte():
                raise ValueError('Bad magic')
        file_size = read_unsigned_number(in_stream) - 1
        o = coerce_output_stream(output, file_size if file_size >= 0 else None)
        guts(in_stream, o.stream, file_size)
        # the in-memory path validates the declared size via the fixed
        # BufferStream; give caller-provided streams (e.g. the CLI's
        # on-disk sink) the same corruption check when they count writes
        written = getattr(o.stream, 'count', None)
        if (output is not None and file_size >= 0 and written is not None
                and written != file_size):
            raise ValueError('output size does not match decoded input')
        return o.retval

    return decompress_file


# ---------------------------------------------------------------------------
# model-driving loops (self-test codecs; Util.js:168-191)

def compress_with_model(in_stream, file_size, model):
    in_size = 0
    while in_size != file_size:
        ch = in_stream.read_byte()
        if ch == EOF:
            model.encode(256)  # end of stream
            break
        model.encode(ch)
        in_size += 1


def decompress_with_model(out_stream, file_size, model):
    out_size = 0
    while out_size != file_size:
        ch = model.decode()
        if ch == 256:
            break
        out_stream.write_byte(ch)
        out_size += 1
