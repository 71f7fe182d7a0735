"""Multi-chip (virtual 8-device CPU mesh) and device-kernel tests:
the fake-backend analog the reference never needed (SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from compressjs_tpu.ops import jax_kernels as jk
from compressjs_tpu.ops import bwt as bwt_host
from compressjs_tpu.ops import mtf as mtf_host
from compressjs_tpu.ops import rle as rle_host

REF = '/root/reference/test'


def _data(n, seed=0):
    base = open(f'{REF}/sample1.ref', 'rb').read()
    start = (seed * 977) % (len(base) - n)
    return np.frombuffer(base[start:start + n], dtype=np.uint8)


def test_device_suffix_sort_matches_host():
    d = _data(20000)
    dev = np.asarray(jk.cyclic_suffix_sort(jnp.asarray(d), len(d)))
    host = bwt_host.cyclic_suffix_array(d)
    assert (dev == host).all()


def test_device_suffix_sort_periodic():
    d = np.frombuffer(b'xy' * 600, dtype=np.uint8)
    dev = np.asarray(jk.cyclic_suffix_sort(jnp.asarray(d), len(d)))
    host = bwt_host.cyclic_suffix_array(d)
    assert (dev == host).all()


def test_device_mtf_matches_host():
    d = _data(30000, 3)
    alpha = mtf_host.used_alphabet(d)
    remap = np.zeros(256, np.int32)
    remap[alpha] = np.arange(len(alpha))
    dense = remap[d].astype(np.uint8)
    host = mtf_host.mtf_encode(d, alpha)
    dev = np.asarray(jk.mtf_encode(jnp.asarray(dense), len(dense)))
    assert (host == dev).all()


def test_device_rle2_matches_host():
    d = _data(30000, 5)
    alpha = mtf_host.used_alphabet(d)
    m = mtf_host.mtf_encode(d, alpha)
    eob = len(alpha) + 1
    host = rle_host.mtf_rle2_encode(m, eob)
    syms, cnt, freq = jk.rle2_encode(jnp.asarray(m), len(m), eob)
    cnt = int(cnt)
    assert cnt == len(host)
    assert (np.asarray(syms)[:cnt] == host.astype(np.int64)).all()
    assert (np.asarray(freq)[:len(np.bincount(host, minlength=260))]
            == np.bincount(host, minlength=260)).all()


def test_encode_block_core_fused():
    d = _data(8192, 7)
    alpha = mtf_host.used_alphabet(d)
    remap = np.zeros(256, np.int32)
    remap[alpha] = np.arange(len(alpha))
    eob = len(alpha) + 1
    pidx, syms, count, freq = jk.encode_block_core(
        jnp.asarray(d), len(d), jnp.asarray(remap), jnp.int32(eob))
    U = np.zeros(len(d), np.uint8)
    pidx_h = bwt_host.bwtransform2(d, U, len(d), 256)
    m_h = mtf_host.mtf_encode(U, alpha)
    s_h = rle_host.mtf_rle2_encode(m_h, eob)
    assert int(pidx) == pidx_h
    assert int(count) == len(s_h)
    assert (np.asarray(syms)[:len(s_h)] == s_h.astype(np.int64)).all()


@pytest.mark.parametrize('n_devices', [2, 8])
def test_sharded_block_encode(n_devices):
    if jax.device_count() < n_devices:
        pytest.skip('need %d devices' % n_devices)
    from compressjs_tpu.parallel import mesh as pmesh
    n = 1024
    raw = np.stack([_data(n, i) for i in range(n_devices)])
    blocks, remaps, eobs = pmesh.prepare_blocks(list(raw))
    m = pmesh.make_mesh(jax.devices()[:n_devices])
    pidx, syms, count, freq, all_counts = pmesh.sharded_block_encode(
        m, jnp.asarray(blocks), jnp.asarray(remaps), jnp.asarray(eobs))
    counts = np.asarray(count)
    assert np.asarray(all_counts).shape == (n_devices,)
    # every shard's result must equal the host pipeline's
    for b in range(n_devices):
        U = np.zeros(n, np.uint8)
        pidx_h = bwt_host.bwtransform2(raw[b], U, n, 256)
        alpha = mtf_host.used_alphabet(raw[b])
        s_h = rle_host.mtf_rle2_encode(
            mtf_host.mtf_encode(U, alpha), len(alpha) + 1)
        assert int(np.asarray(pidx)[b]) == pidx_h
        assert int(counts[b]) == len(s_h)
        assert (np.asarray(syms)[b][:len(s_h)] == s_h.astype(np.int64)).all()


def test_dryrun_multichip_entry():
    import sys
    sys.path.insert(0, '/root/repo')
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert len(out) == 4
    g.dryrun_multichip(min(8, jax.device_count()))


def test_device_pipeline_byte_parity(ref_samples):
    from compressjs_tpu.parallel.pipeline import DeviceBzip2Encoder
    from compressjs_tpu.codecs import bzip2
    data = ref_samples['sample2']
    host = bytes(bzip2.compress_file(data, None, 1))
    for mode in ('hybrid', 'core', 'full'):
        dev = bytes(DeviceBzip2Encoder(1, mode).compress(data))
        assert dev == host, mode


def test_device_pipeline_batched_dispatch(ref_samples):
    """batch=True: every full-size block through ONE vmapped device
    call (jk.bwt_block_batch) — byte-identical, self-check enabled."""
    from compressjs_tpu.parallel.pipeline import DeviceBzip2Encoder
    from compressjs_tpu.codecs import bzip2
    data = ref_samples['sample2'][:260000]   # 2 full blocks + tail at -1
    host = bytes(bzip2.compress_file(data, None, 1))
    enc = DeviceBzip2Encoder(1, 'hybrid', batch=True, self_check=True)
    assert bytes(enc.compress(data)) == host


def test_mesh_decode_byte_parity(ref_samples):
    """decompress_file_mesh: host Huffman walk + device mesh ragged
    inverse BWT + host RLE1 undo == sequential decoder."""
    from compressjs_tpu.codecs import bzip2
    from compressjs_tpu.parallel.decode import decompress_file_mesh
    from compressjs_tpu.parallel.mesh import make_mesh
    data = bytes(ref_samples['sample4'])
    comp = bytes(bzip2.compress_file(data, None, 1))  # multi-block
    m = make_mesh(jax.devices()[:min(8, jax.device_count())])
    assert bytes(decompress_file_mesh(comp, mesh=m)) == data
    # single-block + tiny inputs route through the same code
    small = bytes(bzip2.compress_file(data[:1000], None, 9))
    assert bytes(decompress_file_mesh(small, mesh=m)) == data[:1000]


def test_mesh_decode_device_entropy(ref_samples):
    """entropy='device': parallel canonical-Huffman walk + device
    RLE2/MTF undo + mesh inverse BWT — no host pass over payloads."""
    import jax
    from compressjs_tpu.codecs.bzip2 import compress_file
    from compressjs_tpu.parallel.decode import decompress_file_mesh
    from compressjs_tpu.parallel.mesh import make_mesh
    data = bytes(ref_samples['sample4'][:350000])
    comp = compress_file(data, None, 1)  # 4 blocks
    m = make_mesh(jax.devices()[:4])
    assert bytes(decompress_file_mesh(comp, mesh=m,
                                      entropy='device')) == data


def test_mesh_decode_device_entropy_corrupt_falls_back(ref_samples):
    """Payload corruption must still produce the sequential decoder's
    error, not wrong output, through the device-entropy path."""
    import jax
    import pytest
    from compressjs_tpu.codecs.bzip2 import compress_file
    from compressjs_tpu.parallel.decode import decompress_file_mesh
    from compressjs_tpu.parallel.mesh import make_mesh
    data = bytes(ref_samples['sample1'][:120000])
    comp = bytearray(compress_file(data, None, 1))
    comp[len(comp) // 2] ^= 0xFF
    m = make_mesh(jax.devices()[:2])
    with pytest.raises(ValueError):
        decompress_file_mesh(bytes(comp), mesh=m, entropy='device')


def test_mesh_decode_corrupt_falls_back(ref_samples):
    """A corrupted block must produce the sequential decoder's exact
    error, not a silent wrong result."""
    import pytest
    from compressjs_tpu.codecs import bzip2
    from compressjs_tpu.parallel.decode import decompress_file_mesh
    from compressjs_tpu.parallel.mesh import make_mesh
    data = bytes(ref_samples['sample4'])
    comp = bytearray(bytes(bzip2.compress_file(data, None, 1)))
    comp[len(comp) // 2] ^= 0xFF
    m = make_mesh(jax.devices()[:min(8, jax.device_count())])
    with pytest.raises(ValueError):
        decompress_file_mesh(bytes(comp), mesh=m)


def test_ragged_inverse_bwt_kernel():
    """sharded_ragged_inverse_bwt inverts columns of distinct lengths."""
    from compressjs_tpu.ops import bwt as bwt_ops
    from compressjs_tpu.parallel.mesh import make_mesh, \
        sharded_ragged_inverse_bwt
    rng = np.random.RandomState(5)
    cap = 2048
    lengths = [2048, 1777, 513, 1]
    Us = np.zeros((len(lengths), cap), dtype=np.uint8)
    ns = np.array(lengths, dtype=np.int32)
    pidxs = np.zeros(len(lengths), dtype=np.int32)
    blocks = []
    for i, L in enumerate(lengths):
        blk = rng.randint(0, 40, size=L).astype(np.uint8)
        U = np.zeros(L, dtype=np.uint8)
        pidxs[i] = bwt_ops.bwtransform2(blk, U, L, 256)
        Us[i, :L] = U
        blocks.append(blk)
    m = make_mesh(jax.devices()[:min(8, jax.device_count())])
    out = np.asarray(sharded_ragged_inverse_bwt(m, Us, ns, pidxs))
    for i, blk in enumerate(blocks):
        assert (out[i, :len(blk)] == blk).all(), i
        assert (out[i, len(blk):] == 0).all(), i


def test_hetero_byte_parity(ref_samples):
    """Host workers + device pipeline sharing one block queue produce
    byte-identical output (parallel/hetero.py), in both device modes and
    host-only degenerate form."""
    from compressjs_tpu.parallel.hetero import hetero_compress_bzip2
    from compressjs_tpu.codecs import bzip2
    data = ref_samples['sample2']
    host = bytes(bzip2.compress_file(data, None, 1))
    for kwargs in ({'device': True, 'device_mode': 'full'},
                   {'device': True, 'device_mode': 'hybrid'},
                   {'device': False, 'host_workers': 1}):
        out = bytes(hetero_compress_bzip2(data, None, 1, **kwargs))
        assert out == host, kwargs


def test_device_huffman_stage_kernels():
    """group_costs_dev / chunk_freqs_dev / payload_pack_dev (the
    all-on-device entropy scans) match the host build."""
    from compressjs_tpu.ops import huffman_stages as hs
    d = _data(20000, 9)
    alpha = mtf_host.used_alphabet(d)
    m = mtf_host.mtf_encode(d, alpha)
    eob = len(alpha) + 1
    syms = rle_host.mtf_rle2_encode(m, eob)
    freq = np.bincount(syms, minlength=eob + 1)
    lm, sel = hs.optimize_groups(syms.astype(np.int64), eob + 1, freq)
    L = np.full((6, 260), 255, dtype=np.int32)
    L[:lm.shape[0], :eob + 1] = lm
    L[:lm.shape[0], eob + 1:] = 0
    cm = np.stack([hs.canonical_codes(lm[g]) for g in range(lm.shape[0])])
    C = np.zeros((6, 260), dtype=np.int32)
    C[:cm.shape[0], :eob + 1] = cm
    count = jnp.int32(len(syms))
    pad = np.full(len(syms) + 7, eob, dtype=np.int16)
    pad[:len(syms)] = syms
    costs = np.asarray(jk.group_costs_dev(jnp.asarray(pad), count,
                                          jnp.asarray(L)))
    host_costs = hs.group_costs(lm, syms.astype(np.int64))
    nvalid = host_costs.shape[0]
    assert (costs[:nvalid, :lm.shape[0]] == host_costs).all()
    n_chunks = -(-pad.shape[0] // 50)
    selpad = np.zeros(n_chunks, dtype=np.int32)
    selpad[:len(sel)] = sel
    freqs = np.asarray(jk.chunk_freqs_dev(jnp.asarray(pad), count, 6,
                                          jnp.asarray(selpad), eob + 1))
    host_freqs = hs.chunk_freqs(syms.astype(np.int64), sel, lm.shape[0],
                                eob + 1)
    assert (freqs[:lm.shape[0], :eob + 1] == host_freqs).all()
    packed, total = jk.payload_pack_dev(jnp.asarray(pad), count,
                                        jnp.asarray(selpad),
                                        jnp.asarray(L), jnp.asarray(C))
    host_packed, host_total = hs.payload_bytes(
        syms.astype(np.int64), sel, lm, cm)
    assert int(total) == host_total
    assert np.asarray(packed)[:len(host_packed)].tobytes() == \
        host_packed.tobytes()


def test_device_bwtc_encoder_byte_parity(ref_samples):
    from compressjs_tpu.parallel.pipeline import DeviceBWTCEncoder
    from compressjs_tpu.codecs.bwtc import BWTC
    data = ref_samples['sample2']
    dev = bytes(DeviceBWTCEncoder(1).compress(data))
    host = bytes(BWTC.compress_file(data, None, 1))
    assert dev == host
    assert bytes(BWTC.decompress_file(dev)) == data


def test_device_inverse_bwt_kernels():
    """inverse_bwt_block / inverse_bwt_eof_block (orbit-doubling LF
    walk) invert the device forward transforms and match the host
    inverses, including the pidx==n periodic edge."""
    from compressjs_tpu.ops import jax_kernels as jk
    from compressjs_tpu.ops import bwt as bwt_ops
    rng = np.random.RandomState(5)
    for trial in range(6):
        n = int(rng.randint(2, 2000))
        T = rng.randint(0, rng.choice([2, 256]), size=n).astype(np.uint8)
        U = np.zeros(n, np.uint8)
        pidx = bwt_ops.bwtransform2(T, U, n, 256)
        assert np.array_equal(np.asarray(jk.inverse_bwt_block(U, n, pidx)),
                              T), trial
        Ue = np.zeros(n, np.uint8)
        A = np.zeros(n, np.int32)
        pe = bwt_ops.bwtransform(T, Ue, A, n, 256)
        assert np.array_equal(
            np.asarray(jk.inverse_bwt_eof_block(Ue, n, pe)), T), trial
    T = np.frombuffer(b'ba' * 700, np.uint8)   # pidx == n edge
    n = T.shape[0]
    Ue = np.zeros(n, np.uint8)
    A = np.zeros(n, np.int32)
    pe = bwt_ops.bwtransform(T, Ue, A, n, 256)
    assert np.array_equal(np.asarray(jk.inverse_bwt_eof_block(Ue, n, pe)), T)


def test_device_eof_bwt_matches_host():
    d = _data(20000, 11)
    U_dev, pidx_dev = jk.bwt_eof_block(jnp.asarray(d), len(d))
    U = np.zeros(len(d), np.uint8)
    A = np.zeros(len(d), np.int32)
    pidx_h = bwt_host.bwtransform(d, U, A, len(d), 256)
    assert int(pidx_dev) == pidx_h
    assert (np.asarray(U_dev) == U).all()


def test_sharded_block_decode():
    """Mesh decode dual: forward BWT per block, then invert sharded over
    the 8-device CPU mesh — both the cyclic and EOF contracts."""
    from compressjs_tpu.parallel import mesh as mesh_mod
    from compressjs_tpu.ops import bwt as bwt_ops
    import jax
    mesh = mesh_mod.make_mesh(jax.devices()[:8])
    rng = np.random.RandomState(21)
    n = 1536
    B = 8
    blocks = rng.randint(0, 256, size=(B, n)).astype(np.uint8)
    for eof in (False, True):
        Us = np.zeros_like(blocks)
        pidxs = np.zeros(B, np.int32)
        for i in range(B):
            if eof:
                A = np.zeros(n, np.int32)
                pidxs[i] = bwt_ops.bwtransform(blocks[i], Us[i], A, n, 256)
            else:
                pidxs[i] = bwt_ops.bwtransform2(blocks[i], Us[i], n, 256)
        out = np.asarray(mesh_mod.sharded_block_decode(
            mesh, jnp.asarray(Us), jnp.asarray(pidxs), eof=eof))
        assert np.array_equal(out, blocks), eof


def test_mesh_compress_bwtcp_end_to_end(ref_samples):
    """BWTCP over the mesh: sharded device EOF BWTs + threaded
    independent host coders — byte-identical to the host codec."""
    from compressjs_tpu.parallel import mesh as mesh_mod
    import compressjs_tpu as cz
    mesh = mesh_mod.make_mesh(jax.devices()[:4])
    # sample2*3 = 637,020 B = 6 full level-1 blocks (100,000 each) +
    # tail; the mesh path needs >1 full block, and 6 pads to 8 lanes
    data = ref_samples['sample2'] * 3
    ref = bytes(cz.BWTCP.compress_file(data, None, 1))
    got = bytes(mesh_mod.mesh_compress_bwtcp(
        mesh, np.frombuffer(data, np.uint8), 1))
    assert got == ref
    assert bytes(cz.BWTCP.decompress_file(got)) == data


def test_mesh_compress_bzip2_end_to_end(ref_samples):
    """BASELINE config: blocks sharded over the mesh, ordered gather,
    bit-concatenated standard container — byte-identical to the host."""
    if jax.device_count() < 8:
        pytest.skip('need 8 devices')
    from compressjs_tpu.parallel.mesh import make_mesh, mesh_compress_bzip2
    from compressjs_tpu.codecs import bzip2
    mesh = make_mesh(jax.devices()[:8])
    data = ref_samples['sample4'][:450000]  # several full level-1 blocks
    comp = bytes(mesh_compress_bzip2(mesh, data, 1))
    assert comp == bytes(bzip2.compress_file(data, None, 1))
    assert bytes(bzip2.decompress_file(comp)) == data


def test_device_bwtc_encoder_immune_to_job_order(ref_samples, monkeypatch):
    """The codec's prefetch pool may run block transform jobs in any
    order; the device encoder's BWT-cache hook must match each block by
    content, not call order (regression: call-order bookkeeping handed
    two full blocks each other's transforms when the second job ran
    first).  A fake executor runs the SECOND-submitted job first —
    exactly the failing interleaving (full reversal would make every
    call-order lookup miss and fall back to the host path, masking
    the swap)."""
    import concurrent.futures as cf
    from compressjs_tpu.parallel.pipeline import DeviceBWTCEncoder
    from compressjs_tpu.codecs.bwtc import BWTC

    class LazyFuture(cf.Future):
        def __init__(self, owner):
            super().__init__()
            self._owner = owner

        def result(self, timeout=None):
            self._owner.drain()
            return super().result(timeout)

    class SwappedExecutor:
        """Defers every job; the first result() request runs all
        pending jobs with the first two swapped (second runs first)."""

        def __init__(self, *a, **k):
            self._q = []

        def submit(self, fn, *args, **kwargs):
            f = LazyFuture(self)
            self._q.append((f, fn, args, kwargs))
            return f

        def drain(self):
            q, self._q = self._q, []
            if len(q) >= 2:
                q[0], q[1] = q[1], q[0]
            for f, fn, args, kwargs in q:
                try:
                    f.set_result(fn(*args, **kwargs))
                except Exception as e:  # pragma: no cover
                    f.set_exception(e)

        def shutdown(self, wait=True):
            self.drain()

    data = ref_samples['sample2']
    host = bytes(BWTC.compress_file(data, None, 1))
    monkeypatch.setattr(cf, "ThreadPoolExecutor", SwappedExecutor)
    dev = bytes(DeviceBWTCEncoder(1).compress(data))
    assert dev == host
