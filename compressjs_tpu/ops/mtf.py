"""Move-to-front transform over a (possibly remapped) alphabet.

Matches the open-coded MTF loops in the reference codecs
(/root/reference/lib/Bzip2.js:795-812, lib/BWTC.js:89-103): the MTF list
is initialized to the sorted used-symbol alphabet and each coded symbol
moves to the front.

Host path here; the device path (chunked scan with permutation-composition
fixup) lives in compressjs_tpu.ops.jax_kernels.
"""

from __future__ import annotations

import numpy as np

try:
    from .. import native as _native
except Exception:  # pragma: no cover
    _native = None


def used_alphabet(block):
    """Sorted list of byte values present (the bzip2 symbol map)."""
    present = np.zeros(256, dtype=bool)
    present[np.asarray(block)] = True
    return np.nonzero(present)[0].astype(np.uint8)


def mtf_encode(data, alphabet):
    """MTF indices of `data` against the initial `alphabet` ordering.
    Returns int32 array of indices in [0, len(alphabet))."""
    data = np.asarray(data)
    if _native is not None and _native.available() and data.shape[0] > 2048:
        return _native.mtf_encode(data, np.asarray(alphabet, dtype=np.uint8))
    lst = list(int(x) for x in alphabet)
    out = np.empty(data.shape[0], dtype=np.int32)
    find = lst.index
    for i, c in enumerate(data.tolist()):
        j = find(c)
        out[i] = j
        if j:
            del lst[j]
            lst.insert(0, c)
    return out


def mtf_decode(indices, alphabet):
    """Inverse MTF: map indices back to symbols, updating the list."""
    indices = np.asarray(indices)
    if _native is not None and _native.available() and \
            indices.shape[0] > 2048:
        return _native.mtf_decode(indices.astype(np.int32),
                                  np.asarray(alphabet, dtype=np.uint8))
    lst = list(int(x) for x in alphabet)
    out = np.empty(indices.shape[0], dtype=np.uint8)
    for i, j in enumerate(indices.tolist()):
        c = lst[j]
        out[i] = c
        if j:
            del lst[j]
            lst.insert(0, c)
    return out
