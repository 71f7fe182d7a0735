"""bzip2-flavored CRC-32 (poly 0x04C11DB7, MSB-first, init/xorout
0xFFFFFFFF, no reflection) — NOT the zlib/reflected CRC.

Matches the reference CRC (/root/reference/lib/CRC32.js:72-103) but with
two fast bulk paths the byte-loop reference lacks:

* `crc32_bzip2(data)` — O(n) at C speed: CRC-32/BZIP2 is the bit-reflected
  image of zlib's CRC-32, so we bit-reverse each input byte (table lookup),
  run zlib.crc32, and bit-reverse the 32-bit result.
* `CRC32.update_run(value, count)` — O(log count) via CRC linearity: the
  register advance for k identical bytes is an affine map over GF(2),
  composed by doubling.
"""

from __future__ import annotations

import zlib
import numpy as np

# table of bit-reversed bytes
_REV8 = np.array([int('{:08b}'.format(i)[::-1], 2) for i in range(256)],
                 dtype=np.uint8)


def _rev32(x):
    x = int(x) & 0xFFFFFFFF
    return int('{:032b}'.format(x)[::-1], 2)


# classic table for the scalar fallback
def _make_table():
    tab = np.zeros(256, dtype=np.uint64)
    for i in range(256):
        c = i << 24
        for _ in range(8):
            c = ((c << 1) ^ 0x04C11DB7) if (c & 0x80000000) else (c << 1)
            c &= 0xFFFFFFFF
        tab[i] = c
    return tab

_TABLE = _make_table()


def crc32_bzip2(data, crc=0xFFFFFFFF):
    """CRC over a bytes-like / uint8 array with the bzip2 polynomial.
    Returns the *finalized* CRC (complemented), matching
    CRC32.getCRC() after feeding `data` (reference CRC32.js:81-91)."""
    if isinstance(data, np.ndarray):
        buf = np.ascontiguousarray(data, dtype=np.uint8)
    else:
        buf = np.frombuffer(bytes(data), dtype=np.uint8)
    reflected = _REV8[buf].tobytes()
    # zlib.crc32's init/xorout are baked in; translate our register state
    # into the reflected domain, run, and translate back.
    z_init = _rev32(crc) ^ 0xFFFFFFFF
    z = zlib.crc32(reflected, z_init)
    return _rev32(z)


def crc32_raw(data, crc=0xFFFFFFFF):
    """Like crc32_bzip2 but returns the raw (uncomplemented) register."""
    return crc32_bzip2(data, crc) ^ 0xFFFFFFFF


class CRC32:
    """Incremental bzip2 CRC with the reference's interface."""

    def __init__(self):
        self.crc = 0xFFFFFFFF

    def get_crc(self):
        return (~self.crc) & 0xFFFFFFFF

    def update_crc(self, value):
        c = self.crc
        self.crc = ((c << 8) ^ int(_TABLE[((c >> 24) ^ value) & 0xFF])) & 0xFFFFFFFF

    def update(self, data):
        """Bulk update with a bytes-like / uint8 array."""
        if len(data) == 0:
            return
        self.crc = crc32_raw(data, self.crc)

    def update_crc_run(self, value, count):
        """Update with `count` copies of `value` in O(log count).

        The per-byte step for a fixed byte b is the affine GF(2) map
        crc -> M(crc) ^ c_b where M is shift-8-and-reduce.  Composing the
        map with itself doubles the run length."""
        if count <= 0:
            return
        if count < 64:
            for _ in range(count):
                self.update_crc(value)
            return
        # affine map as (matrix action via polynomial mult, constant)
        # represent M^k action by applying CRC of k zero bytes trick:
        # advance(crc, k zeros) is linear; handle value!=0 by noting a run
        # of byte b equals (run of zeros) on modified register... simpler:
        # square-and-multiply on the affine map using 32x32 bit matrices.
        M = _shift8_matrix()
        c = _byte_const(value)
        # result = A_count(crc) where A(x) = M x ^ c
        # A^k(x) = M^k x ^ (M^{k-1} ^ ... ^ I) c
        x = self.crc
        # binary decomposition
        Mk = _identity_matrix()
        acc_const = 0
        base_M = M
        base_c = c
        k = count
        while k:
            if k & 1:
                # apply current base map to accumulated map:
                # new A = base ∘ acc : x -> baseM(accM x ^ acc_c) ^ base_c
                acc_const = _mat_vec(base_M, acc_const) ^ base_c
                Mk = _mat_mul(base_M, Mk)
            # square base: x -> baseM(baseM x ^ base_c) ^ base_c
            base_c = _mat_vec(base_M, base_c) ^ base_c
            base_M = _mat_mul(base_M, base_M)
            k >>= 1
        self.crc = _mat_vec(Mk, x) ^ acc_const


# --- GF(2) 32x32 matrices encoded as 32 uint32 columns --------------------

def _identity_matrix():
    return [1 << (31 - i) for i in range(32)]


def _shift8_matrix():
    """Matrix of the map crc -> (crc<<8) ^ table[crc>>>24]."""
    cols = []
    for i in range(32):
        v = 1 << (31 - i)
        out = ((v << 8) ^ int(_TABLE[(v >> 24) & 0xFF])) & 0xFFFFFFFF
        cols.append(out)
    return cols


def _byte_const(value):
    """Constant term contributed by xoring `value` into the top byte."""
    return int(_TABLE[value & 0xFF])


def _mat_vec(M, v):
    r = 0
    for i in range(32):
        if (v >> (31 - i)) & 1:
            r ^= M[i]
    return r


def _mat_mul(A, B):
    return [_mat_vec(A, B[i]) for i in range(32)]


def stream_crc_combine(stream_crc, block_crc):
    """bzip2 rolling stream CRC: rotate-left-1 then xor block CRC
    (reference Bzip2.js:917)."""
    s = int(stream_crc) & 0xFFFFFFFF
    return (((s << 1) | (s >> 31)) ^ int(block_crc)) & 0xFFFFFFFF
