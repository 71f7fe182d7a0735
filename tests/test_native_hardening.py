"""Native decode hardening: crafted hostile inputs that previously
crashed the process (stack smash / wild memset) must now fail cleanly.

These drive the native entry points directly with adversarial tables —
the level a crafted .bz2 reaches after the (intentionally permissive,
reference-matching) header parse.
"""

import numpy as np
import pytest

from compressjs_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native runtime unavailable')


def _tables(n_groups=1):
    limit = np.zeros((n_groups, 25), dtype=np.int64)
    base = np.zeros((n_groups, 22), dtype=np.int64)
    permute = np.zeros((n_groups, 258), dtype=np.int32)
    return limit, base, permute


def test_oversubscribed_table_rejected():
    """Kraft > 1 table (257 'length-1' codes) must not smash the LUT."""
    limit, base, permute = _tables()
    limit[0, 1] = 256          # claims codes 0..256 all have length 1
    limit[0, 12] = (1 << 13) - 1
    permute[0, :258] = np.arange(258)
    minlen = np.array([1], dtype=np.int32)
    maxlen = np.array([12], dtype=np.int32)
    selectors = np.zeros(10, dtype=np.uint8)
    s2b = np.arange(256, dtype=np.uint8)
    data = np.frombuffer(b'\xa5' * 64, dtype=np.uint8)
    try:
        native.bz2_decode_block(data, 0, selectors, minlen, maxlen,
                                limit, base, permute, 255, s2b, 900000)
    except ValueError:
        pass  # clean rejection is fine; crashing is not


def test_run_symbol_overflow_rejected():
    """62 RUNA digits would wrap the run accumulator; must error, not
    memset with a negative length."""
    limit, base, permute = _tables()
    # canonical 3-symbol table: len1 -> RUNA, len2 -> RUNB / EOB
    limit[0, 1] = 0
    limit[0, 2] = 3
    base[0, 2] = 1
    limit[0, 3:] = (1 << 62)
    permute[0, :3] = [0, 1, 2]
    minlen = np.array([1], dtype=np.int32)
    maxlen = np.array([2], dtype=np.int32)
    # 70 RUNA symbols (bit 0 each) then RUNB ('10'), padding after
    bits = [0] * 70 + [1, 0] + [1, 1] * 30
    packed = np.packbits(np.array(bits, dtype=np.uint8))
    selectors = np.zeros(40, dtype=np.uint8)
    s2b = np.arange(256, dtype=np.uint8)
    with pytest.raises(ValueError):
        native.bz2_decode_block(packed, 0, selectors, minlen, maxlen,
                                limit, base, permute, 255, s2b, 900000)


def test_selector_mtf_rejects_bad_group_count():
    sel = np.zeros(4, dtype=np.uint8)
    for bad in (0, 7, 200):
        with pytest.raises(ValueError):
            native.selector_mtf(sel, bad)
    assert list(native.selector_mtf(sel, 2)) == [0, 0, 0, 0]
