"""Batched device range coder + device FenwickModel: byte-exact parity
with the host coder/model (VERDICT round-1 items 3 and 8).

The device coder is validated lane-by-lane against the sequential host
RangeCoder on random triple streams and on the 0-33 symbol flush sweep
(the tail-byte cases of the reference's test/range.js); the device
Fenwick model against host FenwickModel streams long enough to rescale;
and the full-device BWTCP block encode against the real codec."""

import numpy as np
import pytest

import jax.numpy as jnp

from compressjs_tpu.coders.range_coder import RangeCoder
from compressjs_tpu.models.fenwick_model import FenwickModel
from compressjs_tpu.ops import device_coder as dc
from compressjs_tpu.ops import device_model as dm
from compressjs_tpu.utils.stream import BufferStream


def _host_encode(triples, first_byte, init_len):
    out = BufferStream()
    rc = RangeCoder(out)
    rc.encode_start(first_byte, init_len)
    for sy, lt, tot in triples:
        rc.encode_freq(sy, lt, tot)
    bc = rc.encode_finish()
    return out.buffer[:out.pos].copy(), bc


def test_batched_coder_random_lanes():
    rng = np.random.default_rng(0)
    L, T = 6, 500
    sy = np.ones((L, T), np.uint32)
    lt = np.zeros((L, T), np.uint32)
    tot = np.ones((L, T), np.uint32)
    valid = np.zeros((L, T), bool)
    host, fbs, ils = [], [], []
    for l in range(L):
        tl = int(rng.integers(0, T))
        triples = []
        for t in range(tl):
            tf = int(rng.integers(2, 1 << 20))
            s = int(rng.integers(1, tf + 1))
            lf = int(rng.integers(0, tf - s + 1))
            triples.append((s, lf, tf))
            sy[l, t], lt[l, t], tot[l, t], valid[l, t] = s, lf, tf, True
        fb = int(rng.integers(0, 256))
        il = int(rng.integers(0, 4))
        host.append(_host_encode(triples, fb, il))
        fbs.append(fb)
        ils.append(il)
    tokens, tok_n, bc = dc.batched_range_encode(
        jnp.asarray(sy), jnp.asarray(lt), jnp.asarray(tot),
        jnp.asarray(valid), jnp.asarray(np.array(fbs, np.uint32)),
        jnp.asarray(np.array(ils, np.uint32)))
    byts, lens = dc.token_bytes(tokens, tok_n, bc, 3 * T + 16)
    byts, lens, bc = np.asarray(byts), np.asarray(lens), np.asarray(bc)
    for l in range(L):
        hb, hbc = host[l]
        assert int(bc[l]) == hbc, l
        assert lens[l] == len(hb), l
        assert (byts[l, :lens[l]] == hb).all(), l


def test_batched_coder_flush_sweep():
    """0-33 coded bits: every tail-byte/flush case (reference
    test/range.js:67-123); encode_shift(1, b, 1) == encode_freq with
    tot=2."""
    for nbits in range(0, 34):
        bits = [(i * 7) % 2 for i in range(nbits)]
        hb, _ = _host_encode([(1, b, 2) for b in bits], 0x42, 0)
        sy = np.ones((1, 34), np.uint32)
        lt = np.zeros((1, 34), np.uint32)
        tot = np.full((1, 34), 2, np.uint32)
        valid = np.zeros((1, 34), bool)
        for t, b in enumerate(bits):
            lt[0, t] = b
            valid[0, t] = True
        tokens, tok_n, bc = dc.batched_range_encode(
            jnp.asarray(sy), jnp.asarray(lt), jnp.asarray(tot),
            jnp.asarray(valid), jnp.asarray(np.array([0x42], np.uint32)),
            jnp.asarray(np.array([0], np.uint32)))
        byts, lens = dc.token_bytes(tokens, tok_n, bc, 34 * 3 + 16)
        ln = int(np.asarray(lens)[0])
        assert ln == len(hb) and (np.asarray(byts)[0, :ln] == hb).all(), \
            nbits


def test_device_fenwick_matches_host():
    rng = np.random.default_rng(2)
    MAXP, INCR = 0xFF00, 0x0100
    sizes = [5, 37, 200, 256]
    L, T, max_n = len(sizes), 1200, 258
    syms = np.zeros((L, T), np.int32)
    valid = np.zeros((L, T), bool)
    host = []
    for l, size in enumerate(sizes):
        tl = T - l * 57
        s = np.minimum(rng.zipf(1.3, size=tl) - 1, size - 1)
        syms[l, :tl] = s
        valid[l, :tl] = True
        out = BufferStream()
        rc = RangeCoder(out)
        rc.encode_start(0, 0)
        m = FenwickModel(rc, size, MAXP, INCR)
        for v in s:
            m.encode(int(v))
        rc.encode_finish()
        host.append(out.buffer[:out.pos].copy())
    Ns = np.array([sz + 1 for sz in sizes], np.int32)
    sy, lt, tot, v = dm.fenwick_encode_streams(
        jnp.asarray(syms), jnp.asarray(valid), jnp.asarray(Ns), max_n,
        MAXP, INCR)
    tokens, tok_n, bc = dc.batched_range_encode(
        sy, lt, tot, v, jnp.zeros(L, jnp.uint32),
        jnp.zeros(L, jnp.uint32))
    byts, lens = dc.token_bytes(tokens, tok_n, bc, 3 * 2 * T + 16)
    byts, lens = np.asarray(byts), np.asarray(lens)
    for l in range(L):
        hb = host[l]
        assert lens[l] == len(hb), l
        assert (byts[l, :lens[l]] == hb).all(), l


def test_bwtcp_device_byte_parity():
    """Full-device BWTCP block encode (BWT+MTF+RLE2+Fenwick+coder in
    HBM, host header seam) == the real codec, and decodes."""
    from compressjs_tpu.codecs.bwtcp import BWTCP
    from compressjs_tpu.parallel.pipeline import bwtcp_compress_device
    data = np.fromfile('/root/reference/test/sample2.ref',
                       dtype=np.uint8)[:150000]
    # level 9 but tiny data -> single short block exercises host tail;
    # use level-6-on-700KB style via tiled data for a full device block
    tiled = np.tile(data, 5)[:650000]
    host = bytes(BWTCP.compress_file(tiled, None, 6))
    dev = bytes(bwtcp_compress_device(tiled, None, 6, batch=2))
    assert dev == host
    assert bytes(BWTCP.decompress_file(dev)) == tiled.tobytes()


def test_bwtcp_device_low_level_falls_back():
    """Levels <= 5 select DefSum: the device path must fall back to the
    host codec (still byte-identical by construction)."""
    from compressjs_tpu.codecs.bwtcp import BWTCP
    from compressjs_tpu.parallel.pipeline import bwtcp_compress_device
    data = np.fromfile('/root/reference/test/sample1.ref',
                       dtype=np.uint8)
    host = bytes(BWTCP.compress_file(data, None, 3))
    dev = bytes(bwtcp_compress_device(data, None, 3))
    assert dev == host


def test_fenwick_decode_streams_lane_exact():
    """Device decode mirror: host-encoded Fenwick streams (random
    alphabets, forced escapes AND rescales via a low max_prob) decode
    lane-exactly on device from the host coder's export_dec_state
    seam."""
    import jax.numpy as jnp
    from compressjs_tpu.coders.range_coder import RangeCoder
    from compressjs_tpu.models.fenwick_model import FenwickModel
    from compressjs_tpu.ops import device_model as dm
    from compressjs_tpu.utils.stream import (ArrayInputStream,
                                             BufferStream)
    rng = np.random.default_rng(3)
    L, T = 5, 400
    sizes = [4, 16, 100, 256, 256]
    max_n = 257
    streams, states = [], []
    all_syms = np.zeros((L, T), dtype=np.int32)
    for l in range(L):
        syms = np.minimum(rng.geometric(0.1, T) - 1, sizes[l] - 1)
        all_syms[l] = syms
        out = BufferStream()
        coder = RangeCoder(out)
        coder.encode_start(0x42, 1)
        model = FenwickModel(coder, sizes[l], max_prob=0x500,
                             increment=0x100)
        for s in syms:
            model.encode(int(s))
        coder.encode_finish()
        data = out.buffer[:out.pos].copy()
        streams.append(data)
        ins = ArrayInputStream(data)
        dec = RangeCoder(ins)
        assert dec.decode_start(False) == 0x42
        states.append(dec.export_dec_state(ins.pos)[:4])
    B = max(len(s) for s in streams) + 8
    payload = np.zeros((L, B), np.uint8)
    for l, s in enumerate(streams):
        payload[l, :len(s)] = s
    syms_dev, _state = dm.fenwick_decode_streams(
        jnp.asarray(payload),
        jnp.asarray(np.stack(states).astype(np.int64)),
        jnp.asarray([sz + 1 for sz in sizes], dtype=jnp.int32),
        max_n, 0x500, 0x100, jnp.ones((L, T), dtype=jnp.bool_))
    assert (np.asarray(syms_dev) == all_syms).all()


def test_fenwick_encode_decode_device_roundtrip():
    """Device encode -> device decode roundtrip with default model
    parameters (no host coder in the loop at all)."""
    import jax.numpy as jnp
    from compressjs_tpu.ops import device_coder as dc
    from compressjs_tpu.ops import device_model as dm
    rng = np.random.default_rng(9)
    L, T, size, max_n = 3, 300, 64, 65
    syms = rng.integers(0, size, (L, T)).astype(np.int32)
    Ns = jnp.full(L, size + 1, dtype=jnp.int32)
    valid = jnp.ones((L, T), dtype=jnp.bool_)
    sy, lt, tot, v = dm.fenwick_encode_streams(
        jnp.asarray(syms), valid, Ns, max_n, 0xFF00, 0x100)
    toks, tok_n, bc = dc.batched_range_encode(
        sy, lt, tot, v, jnp.full(L, 0x42, jnp.uint32),
        jnp.ones(L, jnp.uint32))
    byts, lens = dc.token_bytes(toks, tok_n, bc, 4 * T + 32)
    # device decode from byte 1 (byte 0 is the encode_start free byte):
    # decode_start consumes bytes[1] as the first coder buffer byte
    L_, B = byts.shape
    state = []
    for l in range(L_):
        buf = int(byts[l, 1])
        state.append([buf >> 1, 1 << 7, buf, 2])
    syms_dev, _ = dm.fenwick_decode_streams(
        byts, jnp.asarray(np.array(state, dtype=np.int64)),
        Ns, max_n, 0xFF00, 0x100, valid)
    assert (np.asarray(syms_dev) == syms).all()
