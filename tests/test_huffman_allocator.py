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
