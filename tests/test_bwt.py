"""BWT tests: closed-form vectors (reference test/bwtest.js:39-79),
suffix-array property verification (reference test/suftest.js:10-83), and
transform round-trips on the sample corpus."""

import numpy as np
import pytest

from compressjs_tpu.ops import bwt


def sufcheck(T, SA, n):
    """O(n) independent suffix-array correctness proof (port of the
    reference's property verifier, test/suftest.js:10-83)."""
    if n == 0:
        return 0
    SA = np.asarray(SA)
    T = np.asarray(T)
    # range
    assert ((SA >= 0) & (SA < n)).all(), 'SA out of range'
    # first characters non-decreasing
    assert (T[SA[:-1]] <= T[SA[1:]]).all(), 'first chars out of order'
    # induced position check
    C = [0] * 256
    for i in range(n):
        C[T[i]] += 1
    p = 0
    for i in range(256):
        t = C[i]
        C[i] = p
        p += t
    q = C[T[n - 1]]
    C[T[n - 1]] += 1
    for i in range(n):
        p = SA[i]
        if p > 0:
            p -= 1
            c = T[p]
            t = C[c]
        else:
            p = n - 1
            c = T[p]
            t = q
        assert t >= 0 and p == SA[t], 'suffix in wrong position'
        if t != q:
            C[c] += 1
            if n <= C[c] or T[SA[C[c]]] != c:
                C[c] = -1
    return 0


CYCLIC_CASES = [
    ("bcababa", "cbbaaab", 5),
    ("ABCDEFGHIJKLMNOPQRSTUVWXYZ", "ZABCDEFGHIJKLMNOPQRSTUVWXY", 0),
    ("ZYXWVUTSRQPONMLKJIHGFEDCBA", "BCDEFGHIJKLMNOPQRSTUVWXYZA", 25),
    ('SIX.MIXED.PIXIES.SIFT.SIXTY.PIXIE.DUST.BOXES',
     'TEXYDST.E.IXIXIXXSSMPPS.B..E.S.EUSFXDIIOIIIT', 29),
]


@pytest.mark.parametrize('inp,out,idx', CYCLIC_CASES)
def test_bwtransform2_vectors(inp, out, idx):
    T = np.frombuffer(inp.encode('ascii'), dtype=np.uint8)
    U = np.zeros(len(T), dtype=np.uint8)
    pidx = bwt.bwtransform2(T, U, len(T), 256)
    assert U.tobytes().decode('ascii') == out
    assert pidx == idx


def test_bwtransform2_mary():
    # jbzip2 repeated-text case (test/bwtest.js:61-78)
    s = ("Mary had a little lamb, its fleece was white as snow" * 8 +
         "Nary had a little lamb, its fleece was white as snow")
    T = np.frombuffer(s.encode('ascii'), dtype=np.uint8)
    U = np.zeros(len(T), dtype=np.uint8)
    pidx = bwt.bwtransform2(T, U, len(T), 256)
    assert pidx == 99
    rec = bwt.inverse_bwt_cyclic(U, len(T), pidx)
    assert rec.tobytes() == T.tobytes()


def test_bwtransform2_periodic():
    # exact tie-break check on a fully periodic string
    T = np.frombuffer(b'abab', dtype=np.uint8)
    U = np.zeros(4, dtype=np.uint8)
    pidx = bwt.bwtransform2(T, U, 4, 256)
    # rotations sorted: ab(2) ab(0) ba(3) ba(1) -> last chars b b a a
    assert U.tobytes() == b'bbaa'
    assert pidx == 1
    rec = bwt.inverse_bwt_cyclic(U, 4, pidx)
    assert rec.tobytes() == b'abab'


@pytest.mark.parametrize('name', ['sample0', 'sample1', 'sample2', 'sample3'])
def test_suffix_sort_samples(name, ref_samples):
    T = np.frombuffer(ref_samples[name], dtype=np.uint8)
    n = len(T)
    SA = np.zeros(n, dtype=np.int32)
    bwt.suffixsort(T, SA, n, 256)
    sufcheck(T, SA, n)


@pytest.mark.parametrize('name', ['sample0', 'sample1', 'sample2', 'sample3',
                                  'sample4'])
def test_bwt_roundtrip_samples(name, ref_samples):
    T = np.frombuffer(ref_samples[name], dtype=np.uint8)
    n = len(T)
    U = np.zeros(n, dtype=np.uint8)
    V = np.zeros(n, dtype=np.uint8)
    A = np.zeros(n, dtype=np.int32)
    pidx = bwt.bwtransform(T, U, A, n, 256)
    bwt.unbwtransform(U, V, A, n, pidx)
    assert V.tobytes() == T.tobytes()


def test_cyclic_roundtrip_random():
    rng = np.random.RandomState(3)
    for n in [1, 2, 3, 5, 17, 256, 1000]:
        T = rng.randint(0, 8, size=n).astype(np.uint8)
        U = np.zeros(n, dtype=np.uint8)
        pidx = bwt.bwtransform2(T, U, n, 256)
        rec = bwt.inverse_bwt_cyclic(U, n, pidx)
        assert rec.tobytes() == T.tobytes(), n


# --- two-stage sorter differential tests ---------------------------------
# The native runtime ships two independent constructions for each sort:
# the production two-stage (divsufsort-family) sorter and the plain
# SA-IS build it replaced.  These must agree bit-for-bit; periodic and
# low-alphabet inputs exercise the tie-resolution (Larsson-Sadakane
# doubling, identical-rotation ordering) paths.

def _native_or_skip():
    from compressjs_tpu import native
    if not native.available():
        pytest.skip('native runtime unavailable')
    return native


def _adversarial_cases():
    rng = np.random.RandomState(1234)
    cases = [b'a', b'aa', b'ab', b'ba', b'aba', b'a' * 100, b'ab' * 50,
             b'ba' * 50, b'abc' * 33, b'cba' * 33, b'aab' * 40,
             b'banana' * 20, b'mississippi' * 10, b'a' * 99 + b'b',
             b'b' + b'a' * 99, b'ab' * 49 + b'a', b'aaab' * 25,
             b'abab' * 64, bytes(range(256)), bytes(reversed(range(256)))]
    for n in (2, 3, 7, 15, 33, 100, 257):
        for k in (1, 2, 3, 256):
            cases.append(rng.randint(0, k, size=n).astype(np.uint8)
                         .tobytes())
    return cases


def test_two_stage_suffix_sort_matches_sais():
    native = _native_or_skip()
    for t in _adversarial_cases():
        T = np.frombuffer(t, dtype=np.uint8)
        got = native.suffix_sort(T)
        want = native.suffix_sort_sais(T)
        assert (got == want).all(), t[:40]


def test_cyclic_rotation_sort_matches_doubled_string():
    native = _native_or_skip()
    for t in _adversarial_cases():
        T = np.frombuffer(t, dtype=np.uint8)
        u1, p1 = native.bwt_cyclic(T)
        u2, p2 = native.bwt_cyclic_ref(T)
        assert p1 == p2 and (u1 == u2).all(), t[:40]


def test_two_stage_sorters_on_sample_text(ref_samples):
    native = _native_or_skip()
    T = np.frombuffer(ref_samples['sample4'][:120000], dtype=np.uint8)
    assert (native.suffix_sort(T) == native.suffix_sort_sais(T)).all()
    u1, p1 = native.bwt_cyclic(T)
    u2, p2 = native.bwt_cyclic_ref(T)
    assert p1 == p2 and (u1 == u2).all()


@pytest.mark.slow
def test_two_stage_sorters_full_block_scale(ref_samples):
    """Full 900KB-block-scale differential: real text, periodic, and
    low-alphabet inputs through both sort pairs (two-stage vs SA-IS,
    direct-cyclic vs doubled-string)."""
    from compressjs_tpu import native
    if not native.available():
        pytest.skip('native runtime unavailable')
    text = np.frombuffer(ref_samples['sample5'][:899981], dtype=np.uint8)
    rng = np.random.RandomState(77)
    cases = [
        text,
        np.tile(np.frombuffer(b'compressible phrase. ', dtype=np.uint8),
                45000)[:899981],
        rng.randint(0, 3, 899981).astype(np.uint8),
        np.tile(np.frombuffer(b'ab', dtype=np.uint8), 450000)[:899981],
    ]
    for T in cases:
        assert (native.suffix_sort(T) == native.suffix_sort_sais(T)).all()
        u1, p1 = native.bwt_cyclic(T)
        u2, p2 = native.bwt_cyclic_ref(T)
        assert p1 == p2 and (u1 == u2).all()
