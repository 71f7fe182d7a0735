"""Round-4 probe: where do the >40-min XLA compiles of the windowed
Huffman walk (VERDICT r3 weak #4) actually come from?

Times jit lowering+compile (and first run) of the walk's pieces in
isolation on the real TPU, at the real sample5 shapes:
  A. _power_k windowed at k=50 on a (G, cap) nxt map
  B. _power_k gather build (round-2 baseline) at the same shape
  C. the full huffman_walk_dev, windowed vs gather
  D. the vmap B=8 decode_block_full_dev (the bench's killer shape)

Run: python tools/walk_compile_probe.py [--steps=A,B,...]
Each step prints wall seconds; persistent compile cache is DISABLED so
numbers are true cold compiles (use --cache to enable).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if '--cache' in sys.argv:
    jax.config.update('jax_compilation_cache_dir',
                      os.path.expanduser('~/.cache/jax_comp_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)

import jax.numpy as jnp
import numpy as np

steps = 'ABCD'
for a in sys.argv[1:]:
    if a.startswith('--steps='):
        steps = a.split('=', 1)[1].upper()

SAMPLES = '/root/reference/test'


def tlog(msg, t0):
    print('%-40s %7.1f s' % (msg, time.time() - t0), flush=True)


def main():
    from compressjs_tpu.codecs import bzip2
    from compressjs_tpu.ops import device_huffman as dh

    data = np.fromfile(os.path.join(SAMPLES, 'sample5.ref'), np.uint8)
    comp = np.frombuffer(bytes(bzip2.compress_file(data, None, 9)),
                         np.uint8)
    r = bzip2._BitReader(comp)
    r.read_bits(32)
    assert r.read_bits(48) == bzip2.WHOLEPI
    r.read_bits(32)
    optr, s2b, selectors, groups = bzip2._parse_block_header(r, 900000)
    byte0, bit0 = r.pos >> 3, r.pos & 7
    limits, bases, perms, mins = dh.tables_for_device(groups, len(groups))
    payload = jax.device_put(jnp.asarray(comp[byte0:]))
    nbits_cap = (comp.shape[0] - byte0) * 8
    s_cap = len(selectors)
    G = len(groups)
    print('shapes: nbits_cap=%d s_cap=%d G=%d' % (nbits_cap, s_cap, G),
          flush=True)

    nxt = jax.device_put(jnp.tile(
        jnp.arange(nbits_cap, dtype=jnp.int32)[None, :] % (nbits_cap - 21)
        + 2, (G, 1)))

    if 'A' in steps:
        os.environ['COMPRESSJS_TPU_COMPOSE'] = 'windowed'
        f = jax.jit(lambda x: dh._power_k(x, nbits_cap, 50))
        t0 = time.time()
        lo = f.lower(nxt)
        tlog('A windowed k=50 lower', t0)
        t0 = time.time()
        co = lo.compile()
        tlog('A windowed k=50 compile', t0)
        t0 = time.time()
        np.asarray(co(nxt))[0, 0]
        tlog('A windowed k=50 first run', t0)
        t0 = time.time()
        np.asarray(co(nxt))[0, 0]
        tlog('A windowed k=50 second run', t0)

    if 'B' in steps:
        os.environ['COMPRESSJS_TPU_COMPOSE'] = 'gather'
        f = jax.jit(lambda x: dh._power_k(x, nbits_cap, 50))
        t0 = time.time()
        co = f.lower(nxt).compile()
        tlog('B gather k=50 lower+compile', t0)
        t0 = time.time()
        np.asarray(co(nxt))[0, 0]
        tlog('B gather k=50 first run', t0)
        t0 = time.time()
        np.asarray(co(nxt))[0, 0]
        tlog('B gather k=50 second run', t0)

    def walk_args(pk):
        return (payload, bit0, nbits_cap, s_cap, G, limits, bases,
                perms, mins, jnp.asarray(selectors, jnp.int32),
                jnp.int32(s_cap), jnp.int32(len(s2b) + 1), pk)

    if 'C' in steps:
        for mode in ('windowed', 'gather'):
            os.environ['COMPRESSJS_TPU_COMPOSE'] = mode
            dh.huffman_walk_dev.clear_cache()
            t0 = time.time()
            syms, count, end = dh.huffman_walk_dev(*walk_args(50))
            c = int(count)
            tlog('C full walk %s compile+run (count=%d)' % (mode, c), t0)
            t0 = time.time()
            _, count, _ = dh.huffman_walk_dev(*walk_args(50))
            int(count)
            tlog('C full walk %s warm run' % mode, t0)

    if 'D' in steps:
        from compressjs_tpu.ops import device_huffman as dh2
        s2b_arr = np.zeros(256, np.uint8)
        s2b_arr[:len(s2b)] = s2b
        caps = (nbits_cap, s_cap, G, 900000 + 8, 1000000)
        B = 8
        sel = jnp.asarray(selectors, jnp.int32)
        selb = jnp.broadcast_to(sel, (B,) + sel.shape)
        pb = jnp.broadcast_to(payload, (B,) + payload.shape)
        # gather only: the windowed vmap B=8 compile is the suspected
        # multi-hour round-3 killer; do not trigger it casually
        for mode in ('gather',):
            os.environ['COMPRESSJS_TPU_COMPOSE'] = mode
            dh2.decode_block_full_dev.clear_cache()
            vdec = jax.jit(jax.vmap(lambda p, s: dh2.decode_block_full_dev(
                p, bit0, *caps, limits, bases, perms, mins, s,
                jnp.int32(s_cap), jnp.int32(len(s2b) + 1),
                jnp.asarray(s2b_arr), jnp.int32(optr))))
            t0 = time.time()
            out, cnt, _ = vdec(pb, selb)
            np.asarray(cnt)
            tlog('D vmap B=8 %s compile+run' % mode, t0)
            t0 = time.time()
            out, cnt, _ = vdec(pb, selb)
            np.asarray(cnt)
            tlog('D vmap B=8 %s warm run' % mode, t0)


def step_e():
    """vmap B=8 of the WALK ONLY (gather build): isolates whether the
    round-3 compile blowup lives in the walk or in the vmapped decode
    tail (rle2_decode / mtf_decode / inverse BWT)."""
    from compressjs_tpu.codecs import bzip2
    from compressjs_tpu.ops import device_huffman as dh
    data = np.fromfile(os.path.join(SAMPLES, 'sample5.ref'), np.uint8)
    comp = np.frombuffer(bytes(bzip2.compress_file(data, None, 9)),
                         np.uint8)
    r = bzip2._BitReader(comp)
    r.read_bits(32)
    assert r.read_bits(48) == bzip2.WHOLEPI
    r.read_bits(32)
    optr, s2b, selectors, groups = bzip2._parse_block_header(r, 900000)
    byte0, bit0 = r.pos >> 3, r.pos & 7
    limits, bases, perms, mins = dh.tables_for_device(groups, len(groups))
    payload = jax.device_put(jnp.asarray(comp[byte0:]))
    nbits_cap = (comp.shape[0] - byte0) * 8
    s_cap = len(selectors)
    G = len(groups)
    B = 8
    sel = jnp.asarray(selectors, jnp.int32)
    selb = jnp.broadcast_to(sel, (B,) + sel.shape)
    pb = jnp.broadcast_to(payload, (B,) + payload.shape)
    os.environ['COMPRESSJS_TPU_COMPOSE'] = 'gather'
    vwalk = jax.jit(jax.vmap(lambda p, s: dh.huffman_walk_dev(
        p, bit0, nbits_cap, s_cap, G, limits, bases, perms, mins, s,
        jnp.int32(s_cap), jnp.int32(len(s2b) + 1))))
    t0 = time.time()
    syms, cnt, _ = vwalk(pb, selb)
    np.asarray(cnt)
    tlog('E vmap B=8 walk-only gather compile+run', t0)
    t0 = time.time()
    syms, cnt, _ = vwalk(pb, selb)
    np.asarray(cnt)
    tlog('E vmap B=8 walk-only gather warm', t0)


if __name__ == '__main__':
    if 'E' in steps and len(steps) == 1:
        step_e()
    else:
        main()
