"""ops/pallas_compose: the VMEM windowed permutation-composition must be
element-exact against both the XLA dynamic-slice build
(`device_huffman._compose_windowed`, the differential reference) and a
numpy brute force — including the clipped-jump junk values at the array
tail, which must match the XLA build bit-for-bit so build selection can
never change decoded bytes."""

import numpy as np
import pytest

jnp = pytest.importorskip('jax.numpy')


def _case(rng, G, cap, blo, bhi):
    jumps = rng.randint(blo, bhi + 1, size=(G, cap))
    b = np.minimum(np.arange(cap)[None, :] + jumps,
                   cap - 1).astype(np.int32)
    a = np.minimum(
        np.arange(cap)[None, :] + rng.randint(blo, bhi + 1, size=(G, cap)),
        cap - 1).astype(np.int32)
    return a, b


@pytest.mark.parametrize('G,cap,blo,bhi,tr', [
    (6, 8192, 2, 40, 8),      # k=2 window
    (3, 16384, 16, 320, 16),  # k=16 window
    (2, 8192, 1, 20, 8),      # k=1 window
    (6, 8192, 32, 640, 8),    # k=32 window (widest production sweep)
    (6, 8192, 33, 635, 8),    # window not aligned to the lane size
    (1, 4096, 5, 100, 32),    # single group, mid window
])
def test_matches_xla_windowed_exactly(G, cap, blo, bhi, tr):
    from compressjs_tpu.ops.device_huffman import _compose_windowed
    from compressjs_tpu.ops.pallas_compose import compose_windowed
    rng = np.random.RandomState(G * cap + bhi)
    a, b = _case(rng, G, cap, blo, bhi)
    ref = np.asarray(_compose_windowed(
        jnp.asarray(a), jnp.asarray(b), blo, bhi, cap))
    got = np.asarray(compose_windowed(
        jnp.asarray(a), jnp.asarray(b), blo, bhi, tr))
    assert (got == ref).all()


def test_matches_brute_force_on_valid_region():
    from compressjs_tpu.ops.pallas_compose import compose_windowed
    rng = np.random.RandomState(7)
    G, cap, blo, bhi = 4, 8192, 2, 40
    a, b = _case(rng, G, cap, blo, bhi)
    got = np.asarray(compose_windowed(
        jnp.asarray(a), jnp.asarray(b), blo, bhi, 8))
    brute = np.stack([a[g][b[g]] for g in range(G)])
    valid = np.arange(cap) < cap - (bhi + 1)  # contract-valid jumps
    assert (got[:, valid] == brute[:, valid]).all()


def test_power_k_pallas_matches_gather():
    """_power_k with the pallas build == the gather build, end to end
    (the exact composition the production walk runs)."""
    import os
    from compressjs_tpu.ops import device_huffman as dh
    rng = np.random.RandomState(3)
    cap, G = 16384, 3
    lens = rng.randint(1, 21, size=(G, cap))
    nxt = np.minimum(np.arange(cap)[None, :] + lens,
                     cap - 1).astype(np.int32)
    nxt_j = jnp.asarray(nxt)
    for k in (2, 5, 10, 25, 50):
        ref = np.asarray(dh._power_k_gather(nxt_j, cap, k))
        old = os.environ.get('COMPRESSJS_TPU_COMPOSE')
        os.environ['COMPRESSJS_TPU_COMPOSE'] = 'pallas'
        try:
            got = np.asarray(dh._power_k(nxt_j, cap, k))
        finally:
            if old is None:
                os.environ.pop('COMPRESSJS_TPU_COMPOSE', None)
            else:
                os.environ['COMPRESSJS_TPU_COMPOSE'] = old
        # the two builds may differ only at tail positions whose jump
        # chain escapes the window contract; the walk never reads them
        valid = np.arange(cap) < cap - 20 * k - 1
        assert (got[:, valid] == ref[:, valid]).all(), k
