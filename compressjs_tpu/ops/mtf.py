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


def used_alphabet(block):
    """Sorted list of byte values present (the bzip2 symbol map)."""
    present = np.zeros(256, dtype=bool)
    present[np.asarray(block)] = True
    return np.nonzero(present)[0].astype(np.uint8)


def mtf_encode(data, alphabet):
    """MTF indices of `data` against the initial `alphabet` ordering.
    Returns int32 array of indices in [0, len(alphabet))."""
    data = np.asarray(data)
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
    lst = list(int(x) for x in alphabet)
    indices = np.asarray(indices)
    out = np.empty(indices.shape[0], dtype=np.uint8)
    for i, j in enumerate(indices.tolist()):
        c = lst[j]
        out[i] = c
        if j:
            del lst[j]
            lst.insert(0, c)
    return out
