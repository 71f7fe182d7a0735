"""BWTC-L (lane-interleaved entropy format) tests — CPU-runnable.

The format exists so the batched device coder/model kernels
(ops.device_coder / ops.device_model) run at their design point (L in
the hundreds); these tests pin the host reference implementation and
the host<->device lane equivalence on small inputs.
"""

import numpy as np
import pytest

from compressjs_tpu.codecs import bwtcl

SAMPLES = '/root/reference/test'


@pytest.mark.parametrize('data', [
    b'', b'a', b'This is a test\n', b'aaaaaaaaaaaaaaaaaaaaaa',
    bytes(range(256)) * 10,
])
def test_roundtrip_tiny(data):
    arr = np.frombuffer(data, dtype=np.uint8)
    comp = bytes(bwtcl.compress_file(arr, None, 1))
    out = bytes(bwtcl.decompress_file(np.frombuffer(comp, np.uint8)))
    assert out == data


@pytest.mark.parametrize('sample,level', [
    ('sample0.ref', 1), ('sample1.ref', 2), ('sample2.ref', 9),
    ('sample4.ref', 1),
])
def test_roundtrip_samples(sample, level):
    data = np.fromfile('%s/%s' % (SAMPLES, sample), dtype=np.uint8)
    comp = bytes(bwtcl.compress_file(data, None, level))
    out = bytes(bwtcl.decompress_file(np.frombuffer(comp, np.uint8)))
    assert out == data.tobytes()


def test_rle2_undo_matches_symbols():
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 4, 5000).astype(np.uint8)
    used = np.zeros(256, dtype=bool)
    used[raw] = True
    syms, asize = bwtcl.rle2_symbols(raw, used)
    from compressjs_tpu.ops import mtf as mtf_ops
    alphabet = np.nonzero(used)[0].astype(np.uint8)
    mtf_seq = mtf_ops.mtf_encode(raw, alphabet)
    undone = bwtcl.rle2_undo(syms, len(raw))
    assert (undone == mtf_seq).all()


def test_rle2_undo_length_mismatch_raises():
    with pytest.raises(ValueError):
        bwtcl.rle2_undo(np.array([2, 2], dtype=np.int64), 5)


def test_lane_split_sizes():
    syms = np.arange(1003, dtype=np.int32)
    lanes = bwtcl.lane_split(syms, 8)
    sizes = bwtcl.lane_sizes(1003, 8)
    assert [len(x) for x in lanes] == sizes
    back = np.zeros(1003, dtype=np.int32)
    for l in range(8):
        back[l::8] = lanes[l]
    assert (back == syms).all()


def test_python_and_native_lanes_agree():
    """The pure-Python FenwickModel lane coder and the native runtime
    lane coder must produce identical bytes (the device kernels are
    pinned to the same host model elsewhere)."""
    from compressjs_tpu import native
    if not (native is not None and native.available()):
        pytest.skip('native runtime unavailable')
    rng = np.random.default_rng(7)
    syms = rng.integers(0, 60, 400).astype(np.int32)
    import compressjs_tpu.codecs.bwtcl as m
    nat = m._encode_lane(syms, 99)
    try:
        m._native = None
        py = m._encode_lane(syms, 99)
        back = m._decode_lane(np.asarray(nat), 99, 400)
    finally:
        from compressjs_tpu import native as _n
        m._native = _n
    assert bytes(nat) == bytes(py)
    assert (back == syms).all()


def test_device_lane_kernels_match_host():
    """fenwick_encode_streams + batched_range_encode reproduce the host
    lane bytes exactly, and fenwick_decode_streams reads them back —
    the seam the BWTCL device path relies on (CPU jax)."""
    import jax.numpy as jnp
    from compressjs_tpu.ops import device_coder as dc
    from compressjs_tpu.ops import device_model as dm

    rng = np.random.default_rng(11)
    asize = 40
    L, T = 4, 120
    counts = [120, 119, 118, 117]
    lanes = [rng.integers(0, asize + 1, c).astype(np.int32)
             for c in counts]
    host_payloads = [bwtcl._encode_lane(s, asize) for s in lanes]

    symmat = np.zeros((L, T), np.int32)
    valid = np.zeros((L, T), bool)
    for l, s in enumerate(lanes):
        symmat[l, :len(s)] = s
        valid[l, :len(s)] = True
    Ns = np.full(L, asize + 2, np.int32)
    sy, lt, tot, v = dm.fenwick_encode_streams(
        jnp.asarray(symmat), jnp.asarray(valid), jnp.asarray(Ns), 64,
        bwtcl.F_PROB_MAX, bwtcl.F_PROB_INCR)
    tokens, tok_n, bc = dc.batched_range_encode(
        sy, lt, tot, v, jnp.zeros(L, jnp.uint32), jnp.zeros(L, jnp.uint32))
    byts, lens = dc.token_bytes(tokens, tok_n, bc, 4 * T + 64)
    byts, lens = np.asarray(byts), np.asarray(lens)
    for l in range(L):
        assert bytes(byts[l, :lens[l]]) == bytes(host_payloads[l]), l

    # decode direction
    B = int(lens.max())
    paymat = np.zeros((L, B), np.uint8)
    for l in range(L):
        paymat[l, :lens[l]] = byts[l, :lens[l]]
    # host decode_start() discards the free byte at offset 0 and reads
    # the first coder byte at offset 1 — dec_start_state implements the
    # skip-initial-read form, so pos starts at 1
    low, rng_, buf, pos = dc.dec_start_state(jnp.asarray(paymat),
                                             jnp.ones(L, jnp.int32))
    st = np.stack([np.asarray(low), np.asarray(rng_), np.asarray(buf),
                   np.asarray(pos)], axis=1).astype(np.int64)
    out_syms, _ = dm.fenwick_decode_streams(
        jnp.asarray(paymat), jnp.asarray(st), jnp.asarray(Ns), 64,
        bwtcl.F_PROB_MAX, bwtcl.F_PROB_INCR,
        step_valid=jnp.asarray(valid))
    out_syms = np.asarray(out_syms)
    for l, s in enumerate(lanes):
        assert (out_syms[l, :len(s)] == s).all(), l
