"""Length-limited Huffman allocation vectors (reference test/huffman.js)."""

from compressjs_tpu.coders.huffman_allocator import allocate_huffman_code_lengths

FIB = [0, 1, 1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144, 233, 377, 610, 987,
       1597, 2584, 4181, 6765, 10946, 17711, 28657, 46368, 75025, 121393,
       196418, 317811, 514229, 832040, 1346269, 2178309, 3524578, 5702887,
       9227465, 14930352]


def run(freqs, maxlen):
    a = list(freqs)
    allocate_huffman_code_lengths(a, maxlen)
    return a


def test_one_element():
    assert run([1], 32) == [1]


def test_two_elements():
    assert run([1, 1], 32) == [1, 1]


def test_mixed_lengths():
    assert run([1, 1, 1, 1, 1], 32) == [3, 3, 2, 2, 2]


def test_boundary_3bit():
    assert run([0, 0, 1, 1, 1, 1], 3) == [3, 3, 3, 3, 2, 2]


def test_fib36():
    assert run(FIB[:36], 20) == [
        20, 20, 20, 20, 20, 20, 20, 20, 20, 20, 20, 20, 20,
        20, 20, 20, 19, 19, 18, 17, 16, 16, 14, 13, 12, 11,
        10, 9, 8, 7, 6, 5, 4, 3, 2, 1]


def test_fib22():
    assert run(FIB[:22], 20) == [
        20, 20, 19, 19, 19, 17, 16, 15, 14, 13, 12, 11, 10,
        9, 8, 7, 6, 5, 4, 3, 2, 1]


def test_fib21():
    assert run(FIB[:21], 20) == [
        20, 20, 19, 18, 17, 16, 15, 14, 13, 12, 11, 10, 9,
        8, 7, 6, 5, 4, 3, 2, 1]


def test_fib36_6bit():
    assert run(FIB[:36], 6) == [
        6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6,
        6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 5, 5, 5, 4, 3, 2]


def test_native_allocator_matches_python():
    """The native cz_huff_code_lengths must reproduce the Python
    allocator bit-for-bit inside the supported envelope (feasible
    (n, maxlen): the bzip2 codec only ever uses maxlen=20, n<=258)."""
    import random

    import numpy as np
    import pytest

    from compressjs_tpu import native
    from compressjs_tpu.coders.huffman_allocator import (
        allocate_huffman_code_lengths)
    if not native.available():
        pytest.skip('native runtime unavailable')
    rng = random.Random(99)
    checked = 0
    for _ in range(400):
        n = rng.randint(1, 258)
        freqs = [rng.choice([0, 1, 1, 2, 3, 10, 100, 10000, 1 << 20])
                 for _ in range(n)]
        maxlen = rng.choice([20, 17, 9])
        merged = sorted((f << 9) | i for i, f in enumerate(freqs))
        arr = [m >> 9 for m in merged]
        allocate_huffman_code_lengths(arr, maxlen)
        want = np.zeros(n, dtype=np.uint8)
        for m, l in zip(merged, arr):
            want[m & 0x1FF] = l
        ls = [int(x) for x in want]
        if not (all(1 <= x <= maxlen for x in ls)
                and sum(2.0 ** -x for x in ls) <= 1.0 + 1e-9):
            continue  # infeasible combo: outside the envelope
        got = native.huff_code_lengths(np.array(freqs, dtype=np.int64),
                                       maxlen)
        assert (got == want).all(), (n, maxlen)
        checked += 1
    assert checked > 300


def test_native_selector_mtf_matches_python():
    import random

    import numpy as np
    import pytest

    from compressjs_tpu import native
    if not native.available():
        pytest.skip('native runtime unavailable')
    rng = random.Random(5)
    for _ in range(200):
        g = rng.randint(2, 6)
        sel = np.array([rng.randrange(g)
                        for _ in range(rng.randint(1, 200))],
                       dtype=np.uint8)
        lst = list(range(g))
        bits = []
        for s in sel:
            j = lst.index(int(s))
            if j:
                del lst[j]
                lst.insert(0, int(s))
            bits.extend([1] * j)
            bits.append(0)
        assert list(native.selector_mtf(sel, g)) == bits
