"""Differential tests: device entropy stages vs the host build.

The device build (ops.device_entropy) must be byte-identical to the host
build (ops.huffman_stages) — same allocator tie-breaking, same greedy
split, same Lloyd early-break — because the mesh/full-device encoder's
output is asserted byte-identical to codecs.bzip2.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from compressjs_tpu.coders.huffman_allocator import \
    allocate_huffman_code_lengths
from compressjs_tpu.ops import device_entropy as de
from compressjs_tpu.ops import huffman_stages as hs


def _rand_freqs(rng, m, style):
    if style == 'uniform':
        return rng.integers(0, 1000, size=m)
    if style == 'zipf':
        f = (10000 / np.arange(1, m + 1)).astype(np.int64)
        rng.shuffle(f)
        return f
    if style == 'sparse':
        f = np.zeros(m, dtype=np.int64)
        idx = rng.choice(m, size=max(2, m // 8), replace=False)
        f[idx] = rng.integers(1, 100000, size=len(idx))
        return f
    if style == 'fib':  # forces the relocation path (depth limit)
        f = np.ones(m, dtype=np.int64)
        a, b = 1, 1
        for i in range(m):
            f[i] = a
            a, b = b, min(a + b, 1 << 28)
        rng.shuffle(f)
        return f
    raise ValueError(style)


@pytest.mark.parametrize('style', ['uniform', 'zipf', 'sparse', 'fib'])
def test_alloc_lengths_matches_host(style):
    rng = np.random.default_rng(hash(style) % (2**32))
    for m in [3, 5, 17, 50, 130, 258]:
        freqs = np.sort(_rand_freqs(rng, m, style))
        host = list(freqs)
        allocate_huffman_code_lengths(host, 20)
        buf = np.zeros(de.N, dtype=np.int32)
        buf[:m] = freqs
        dev = np.asarray(de.alloc_lengths_dev(jnp.asarray(buf),
                                              jnp.int32(m)))
        assert (dev[:m] == np.asarray(host)).all(), (style, m)


def test_alloc_lengths_tiny():
    for m, expect in [(1, [1]), (2, [1, 1])]:
        buf = np.zeros(de.N, dtype=np.int32)
        buf[:m] = np.arange(1, m + 1)
        dev = np.asarray(de.alloc_lengths_dev(jnp.asarray(buf),
                                              jnp.int32(m)))
        assert (dev[:m] == expect).all()


@pytest.mark.parametrize('style', ['uniform', 'zipf', 'sparse'])
def test_code_lengths_and_codes_match_host(style):
    rng = np.random.default_rng(1 + hash(style) % (2**32))
    for m in [3, 64, 200, 258]:
        freqs = _rand_freqs(rng, m, style)
        host_lens = hs.code_lengths_from_freqs(freqs, m)
        buf = np.zeros(de.N, dtype=np.int32)
        buf[:m] = freqs
        dev_lens = np.asarray(de.code_lengths_from_freqs_dev(
            jnp.asarray(buf), jnp.int32(m)))
        assert (dev_lens[:m] == host_lens).all(), (style, m)
        host_codes = hs.canonical_codes(host_lens)
        dev_codes = np.asarray(de.canonical_codes_dev(
            jnp.asarray(dev_lens), jnp.int32(m)))
        assert (dev_codes[:m] == host_codes).all(), (style, m)


def _host_groups(syms, m):
    freq = np.bincount(syms, minlength=260)
    return hs.optimize_groups(syms.astype(np.int64), m, freq[:m])


def _dev_groups(syms, m, pad_to=None):
    n = len(syms) if pad_to is None else pad_to
    buf = np.full(n, m - 1, dtype=np.int16)  # eob padding
    buf[:len(syms)] = syms
    freq = np.bincount(syms, minlength=260).astype(np.int32)
    n_chunks = -(-n // 50)
    lens, g, sel, codes = de.optimize_groups_dev(
        jnp.asarray(buf), jnp.int32(len(syms)), n_chunks,
        jnp.asarray(freq), jnp.int32(m))
    return (np.asarray(lens), int(g), np.asarray(sel),
            np.asarray(codes))


@pytest.mark.parametrize('n_syms', [120, 700, 3000, 20000])
def test_optimize_groups_matches_host(n_syms):
    rng = np.random.default_rng(n_syms)
    m = 100
    # zipf-ish symbol stream like MTF output (RUNA/RUNB-heavy)
    syms = np.minimum(rng.zipf(1.5, size=n_syms) - 1, m - 1)
    syms = syms.astype(np.int64)
    host_lens, host_sel = _host_groups(syms, m)
    dev_lens, g, dev_sel, dev_codes = _dev_groups(
        syms, m, pad_to=n_syms + 37)
    assert g == host_lens.shape[0]
    assert (dev_lens[:g, :m] == host_lens).all()
    nvc = -(-n_syms // 50)
    assert (dev_sel[:nvc] == host_sel).all()
    for gi in range(g):
        assert (dev_codes[gi, :m] ==
                hs.canonical_codes(host_lens[gi])).all()


def test_payload_pack_matches_host():
    rng = np.random.default_rng(7)
    m = 80
    n_syms = 4321
    syms = np.minimum(rng.zipf(1.5, size=n_syms) - 1, m - 1).astype(
        np.int64)
    host_lens, host_sel = _host_groups(syms, m)
    code_matrix = np.stack([hs.canonical_codes(host_lens[g])
                            for g in range(host_lens.shape[0])])
    host_payload, host_bits = hs.payload_bytes(
        syms, host_sel, host_lens, code_matrix)

    pad_to = n_syms + 29
    dev_lens, g, dev_sel, dev_codes = _dev_groups(syms, m, pad_to=pad_to)
    buf = np.full(pad_to, m - 1, dtype=np.int16)
    buf[:n_syms] = syms
    cap = de.payload_cap_bytes(pad_to)
    payload, bits = de.payload_pack_words_dev(
        jnp.asarray(buf), jnp.int32(n_syms), jnp.asarray(dev_sel),
        jnp.asarray(dev_lens), jnp.asarray(dev_codes), cap)
    payload = np.asarray(payload)
    assert int(bits) == host_bits
    nbytes = (host_bits + 7) // 8
    assert (payload[:nbytes] == host_payload).all()


def test_encode_block_full_matches_host():
    """encode_block_full's downloads reproduce the host block encode
    end-to-end on a real (sample4) block."""
    from compressjs_tpu.ops import bwt as bwt_ops
    from compressjs_tpu.ops import mtf as mtf_ops
    from compressjs_tpu.ops import rle as rle_ops
    data = np.fromfile('/root/reference/test/sample4.ref', dtype=np.uint8)
    n = 100000 - 19
    block, _ = rle_ops.rle1_encode(data, 0, n)
    assert block.shape[0] == n
    used = np.zeros(256, dtype=bool)
    used[block] = True
    alpha = np.nonzero(used)[0].astype(np.uint8)
    remap = np.zeros(256, dtype=np.int32)
    remap[alpha] = np.arange(len(alpha))
    eob = len(alpha) + 1

    pidx, payload, bits, lens, g, sel, count, freq = [
        np.asarray(x) for x in de.encode_block_full(
            jnp.asarray(block), n, jnp.asarray(remap), jnp.int32(eob))]

    # host reference
    U = np.zeros(n, dtype=np.uint8)
    pidx_h = bwt_ops.bwtransform2(block, U, n, 256)
    mtf_seq = mtf_ops.mtf_encode(U, alpha)
    syms_h = rle_ops.mtf_rle2_encode(mtf_seq, eob)
    host_lens, host_sel = _host_groups(syms_h, eob + 1)
    code_matrix = np.stack([hs.canonical_codes(host_lens[k])
                            for k in range(host_lens.shape[0])])
    host_payload, host_bits = hs.payload_bytes(
        syms_h.astype(np.int64), host_sel, host_lens, code_matrix)

    assert int(pidx) == pidx_h
    assert int(count) == len(syms_h)
    assert int(g) == host_lens.shape[0]
    assert (lens[:int(g), :eob + 1] == host_lens).all()
    assert (sel[:len(host_sel)] == host_sel).all()
    assert int(bits) == host_bits
    assert (payload[:(host_bits + 7) // 8] == host_payload).all()


def test_optimize_groups_real_block():
    """Full-size real data: sample5's first bzip2 block through the host
    transform chain, then host vs device group optimization."""
    from compressjs_tpu.ops import bwt as bwt_ops
    from compressjs_tpu.ops import mtf as mtf_ops
    from compressjs_tpu.ops import rle as rle_ops
    data = np.fromfile('/root/reference/test/sample4.ref', dtype=np.uint8)
    block, _ = rle_ops.rle1_encode(data, 0, 100000 - 19)
    n = block.shape[0]
    U = np.zeros(n, dtype=np.uint8)
    bwt_ops.bwtransform2(block, U, n, 256)
    alpha = mtf_ops.used_alphabet(block)
    mtf_seq = mtf_ops.mtf_encode(U, alpha)
    syms = rle_ops.mtf_rle2_encode(mtf_seq, len(alpha) + 1)
    m = len(alpha) + 2
    host_lens, host_sel = _host_groups(syms, m)
    dev_lens, g, dev_sel, dev_codes = _dev_groups(syms, m,
                                                  pad_to=n + 1)
    assert g == host_lens.shape[0]
    assert (dev_lens[:g, :m] == host_lens).all()
    nvc = -(-len(syms) // 50)
    assert (dev_sel[:nvc] == host_sel).all()


@pytest.mark.parametrize('style', ['uniform', 'zipf', 'sparse', 'fib'])
def test_alloc_lengths_pallas_matches_host(style):
    """The Pallas (SMEM scalar-loop) allocator build, interpret mode —
    bit-exactness on real TPU is covered by test_perf_regression."""
    rng = np.random.default_rng(hash(style) % (2**32))
    ms = [1, 2, 3, 17, 130, 258]
    arrs = np.zeros((len(ms), de.N), dtype=np.int32)
    hosts = []
    for i, m in enumerate(ms):
        freqs = np.sort(_rand_freqs(rng, m,
                                    style if m >= 3 else 'uniform'))
        host = list(freqs)
        allocate_huffman_code_lengths(host, 20)
        hosts.append(host)
        arrs[i, :m] = freqs
    got = np.asarray(de.alloc_lengths_pallas(
        jnp.asarray(arrs), jnp.asarray(ms), interpret=True))
    for i, m in enumerate(ms):
        assert (got[i, :m] == np.asarray(hosts[i])).all(), (style, m)


def test_code_lengths_batch_impls_agree():
    rng = np.random.default_rng(7)
    freqs = np.zeros((4, de.N), dtype=np.int32)
    m = 200
    for i in range(4):
        freqs[i, :m] = rng.integers(0, 3000, size=m)
    a = np.asarray(de.code_lengths_batch(jnp.asarray(freqs), m, 'xla'))
    b = np.asarray(de.code_lengths_batch(
        jnp.asarray(freqs), m, 'pallas_interpret'))
    assert np.array_equal(a, b)
