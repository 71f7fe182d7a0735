"""Benchmark: the BASELINE.md north-star configs.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N,
   "detail": {...}}

Headline: bzip2 -9 encode throughput on a deterministic 100 MB corpus
(the reference's enwik8 scale; enwik8 itself is not in the image, so the
corpus is the reference sample files cut into 4 KB chunks, shuffled with
seed 7, and tiled to 100 MB).  vs_baseline is our rate over the
reference's enwik8 bzip2 -9 encode rate (100 MB / 1068.51 s =
0.0936 MB/s, BASELINE.md:42).  The winning pipeline is hetero (host
cores + the TPU pulling blocks from one queue, parallel/hetero.py) when
the device helps, else host-only — both verified by full roundtrip.

detail carries the rest of the tracked matrix: sample5 host/device
numbers, device compute-only stage rates (transfers amortized inside one
jit loop), 100 MB decode, tracked codec configs with size parity, and
the CPU-mesh scaling validation.  Device pieces run in subprocesses with
hard per-mode timeouts under one total wall budget (BENCH_BUDGET_S, def
1080 s): XLA compiles over the axon tunnel can take minutes and
occasionally stall (results are cached under ~/.cache/jax_comp_cache,
so warm runs skip them).  A complete headline JSON line is re-printed
after every sub-mode, so the last stdout line is always parseable even
if the driver kills the run.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

SAMPLES = '/root/reference/test'
CORPUS_PATH = '/tmp/compressjs_tpu_bench/corpus100.bin'
CORPUS_BYTES = 100 * 1000 * 1000
BASELINE_ENWIK8_RATE = 100.0 / 1068.51   # MB/s, reference bzip2 -9
BASELINE_SAMPLE5_SECONDS = 22.57         # reference bzip2 -9 sample5

# Total wall budget for the whole bench (round-3 lesson: the driver runs
# bench.py under its own timeout and a kill that leaves no JSON destroys
# every number — BENCH_r03.json was rc=124/tail="").  The budget is
# enforced by (a) skipping device sub-modes once spent and (b) printing a
# complete headline JSON snapshot after EVERY sub-mode, so even an
# external kill leaves the last snapshot as the parseable tail line.
TOTAL_BUDGET_S = float(os.environ.get('BENCH_BUDGET_S', 1080))
_T_START = time.time()


def _remaining():
    return TOTAL_BUDGET_S - (time.time() - _T_START)

TRACKED = [
    # (codec, level, sample, reference size)
    ('bzip2', 1, 'sample0.ref', None),
    ('bzip2', 9, 'sample5.ref', 275087),
    ('bwtc', 9, 'sample5.ref', 272997),
    ('lzp3', None, 'sample5.ref', 292978),
    ('lzjbr', 9, 'sample5.ref', 491476),
]


def _enable_compile_cache():
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir',
                          os.path.expanduser('~/.cache/jax_comp_cache'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)
    except Exception:
        pass


def build_corpus():
    if os.path.exists(CORPUS_PATH) and \
            os.path.getsize(CORPUS_PATH) == CORPUS_BYTES:
        return np.fromfile(CORPUS_PATH, dtype=np.uint8)
    parts = []
    for i in range(6):
        parts.append(np.fromfile(os.path.join(SAMPLES,
                                               'sample%d.ref' % i),
                                 dtype=np.uint8))
    base = np.concatenate(parts)
    base = base[:len(base) // 4096 * 4096].reshape(-1, 4096)
    rng = np.random.default_rng(7)
    base = base[rng.permutation(base.shape[0])].reshape(-1)
    reps = -(-CORPUS_BYTES // len(base))
    corpus = np.tile(base, reps)[:CORPUS_BYTES]
    os.makedirs(os.path.dirname(CORPUS_PATH), exist_ok=True)
    corpus.tofile(CORPUS_PATH)
    return corpus


def _timed(fn, *args, reps=1):
    best = None
    out = None
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, out


def bench_corpus_host(corpus):
    """Host pipeline on the 100 MB corpus: encode, verify, decode."""
    from compressjs_tpu.codecs import bzip2
    # best-of-2: single runs swing ~30% on the shared 2-core host
    t_enc, comp = _timed(lambda: bytes(bzip2.compress_file(corpus,
                                                           None, 9)),
                         reps=2)
    t_dec, out = _timed(lambda: bytes(bzip2.decompress_file(comp)),
                        reps=2)
    assert out == corpus.tobytes(), '100MB roundtrip failed'
    return t_enc, t_dec, len(comp)


def bench_tracked():
    import compressjs_tpu as cz
    name_map = {'bzip2': cz.Bzip2, 'bwtc': cz.BWTC, 'lzp3': cz.Lzp3,
                'lzjbr': cz.LzjbR}
    out = {}
    for codec, level, sample, ref_size in TRACKED:
        data = np.fromfile(os.path.join(SAMPLES, sample), dtype=np.uint8)
        c = name_map[codec]
        args = (data, None, level) if level is not None else (data, None)
        t, comp = _timed(lambda: bytes(c.compress_file(*args)))
        assert bytes(c.decompress_file(comp)) == data.tobytes()
        key = '%s%s %s' % (codec, '-%d' % level if level else '', sample)
        mbs = len(data) / 1e6 / t
        out[key] = {'mb_s': round(mbs, 2), 'size': len(comp)}
        if ref_size is not None:
            assert len(comp) <= ref_size, (key, len(comp), ref_size)
            out[key]['ref_size'] = ref_size
    return out


def _run_sub(args, timeout, submodes=None, all_lines=False, exe=None):
    """Run a bench sub-mode in a subprocess; return parsed JSON (the
    last line, or ALL parsed lines when all_lines=True — the suite
    protocol prints one JSON line per completed section, and a timeout
    must still salvage the sections that finished).

    Records status + wall seconds into `submodes` so a missing number in
    the final artifact is diagnosable (VERDICT r3 #8).  `exe` overrides
    the child command (tests)."""
    name = args[0].lstrip('-')
    t0 = time.time()
    status = 'ok'
    stdout = ''
    try:
        r = subprocess.run((exe or [sys.executable,
                                    os.path.abspath(__file__)])
                           + args, capture_output=True, text=True,
                           timeout=timeout)
        stdout = r.stdout or ''
        stderr = r.stderr or ''
    except subprocess.TimeoutExpired as e:
        status = 'timeout@%ds' % int(timeout)
        stdout = (e.stdout or b'').decode('utf-8', 'replace') \
            if isinstance(e.stdout, bytes) else (e.stdout or '')
        stderr = ''
        print('# %s timed out' % args, file=sys.stderr)
    parsed = []
    for line in stdout.splitlines():
        if line.startswith('{'):
            try:
                parsed.append(json.loads(line))
            except ValueError:
                pass
    if not parsed and status == 'ok':
        status = 'failed: ' + stderr[-200:].replace('\n', ' ')
        print('# %s %s' % (args, status), file=sys.stderr)
    if submodes is not None:
        submodes[name] = {'status': status,
                          'wall_s': round(time.time() - t0, 1)}
    if all_lines:
        return parsed
    return parsed[-1] if parsed else None


# --- subprocess modes -------------------------------------------------------

def _make_chain_timer(K=10):
    """chain_time(body, init) -> (seconds_per_iteration, compile_s).

    K invocations chained inside one jit so tunnel transfers amortize
    away; warmup wall time is reported as compile_s (VERDICT r3 #8: the
    compile-vs-run split belongs in the artifact)."""
    import jax
    from jax import lax

    def chain_time(body, init):
        @jax.jit
        def run(x):
            return lax.fori_loop(0, K, lambda i, c: body(c), x)
        t0 = time.perf_counter()
        r = run(init)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            r = run(init)
            np.asarray(jax.tree_util.tree_leaves(r)[0])
            ts.append(time.perf_counter() - t0)
        return min(ts) / K, compile_s
    return chain_time

HETERO_PAIRS = int(os.environ.get('BENCH_HETERO_PAIRS', '3'))


def sec_hetero():
    """Hetero (host+device) encode of the 100 MB corpus, measured as
    INTERLEAVED A/B pairs (host, hetero, host, hetero, ...) with the
    per-pair delta recorded (VERDICT r4 #1).  Callers warm the device
    first (sec_warm).

    Why pairs: the shared 2-core host swings +-10% across a bench run
    — larger than any plausible chip contribution — so a single
    comparison cannot attribute a few-percent delta.  Each pair is
    same-moment; the MEDIAN per-pair delta is the recorded verdict on
    whether the chip adds throughput, and README/ARCHITECTURE claims
    track it and nothing else."""
    corpus = build_corpus()
    mb = len(corpus) / 1e6
    from compressjs_tpu.codecs import bzip2
    from compressjs_tpu.parallel.hetero import hetero_compress_bzip2
    pairs = []
    comp = None
    for _ in range(HETERO_PAIRS):
        t_h, _ = _timed(
            lambda: bytes(bzip2.compress_file(corpus, None, 9)))
        t_x, comp = _timed(
            lambda: bytes(hetero_compress_bzip2(corpus, None, 9)))
        pairs.append((t_h, t_x))
    out = bytes(bzip2.decompress_file(comp))
    assert out == corpus.tobytes(), 'hetero roundtrip failed'
    deltas = sorted(mb / t_x - mb / t_h for t_h, t_x in pairs)
    med = deltas[len(deltas) // 2] if len(deltas) % 2 else \
        (deltas[len(deltas) // 2 - 1] + deltas[len(deltas) // 2]) / 2
    return {'t': min(t_x for _, t_x in pairs), 'size': len(comp),
            't_host_adjacent': min(t_h for t_h, _ in pairs),
            'paired': {
                'pairs_mb_s': [[round(mb / t_h, 2), round(mb / t_x, 2)]
                               for t_h, t_x in pairs],
                'deltas_mb_s': [round(d, 2) for d in deltas],
                'median_delta_mb_s': round(med, 2)},
            'stats': hetero_compress_bzip2.last_stats}


def sec_warm():
    """Compile the device encode pipeline (the one program every encode
    section shares — see DeviceBzip2Encoder.fixed_width) outside any
    timed region.  Over the axon tunnel this is the dominant one-time
    cost (measured 220-600 s; no local cache covers it)."""
    from compressjs_tpu.parallel.hetero import warm_device
    t0 = time.perf_counter()
    warm_device(9)
    return {'compile_s': round(time.perf_counter() - t0, 1)}


def sec_sample5_device():
    """All-device pipeline, sample5 end-to-end (tunnel transfers and
    dispatch latency included)."""
    data = np.fromfile(os.path.join(SAMPLES, 'sample5.ref'),
                       dtype=np.uint8)
    from compressjs_tpu.codecs import bzip2
    from compressjs_tpu.parallel.pipeline import DeviceBzip2Encoder
    enc = DeviceBzip2Encoder(level=9, mode='full')
    t0 = time.perf_counter()
    bytes(enc.compress(data))   # warmup compiles; bytes() forces sync
    compile_s = time.perf_counter() - t0
    t, comp = _timed(lambda: bytes(enc.compress(data)), reps=3)
    assert bytes(bzip2.decompress_file(comp)) == data.tobytes()
    assert len(comp) <= 275087
    return {'t': t, 'size': len(comp), 'compile_s': round(compile_s, 1)}


def sec_sample5_hybrid():
    """Hybrid pipeline (sort+BWT on device, entropy on host), sample5
    end-to-end — the per-mode number VERDICT r2 #9 asked for."""
    data = np.fromfile(os.path.join(SAMPLES, 'sample5.ref'),
                       dtype=np.uint8)
    from compressjs_tpu.codecs import bzip2
    from compressjs_tpu.parallel.pipeline import DeviceBzip2Encoder
    enc = DeviceBzip2Encoder(level=9, mode='hybrid')
    t0 = time.perf_counter()
    bytes(enc.compress(data))   # warmup compiles
    compile_s = time.perf_counter() - t0
    t, comp = _timed(lambda: bytes(enc.compress(data)), reps=3)
    assert bytes(bzip2.decompress_file(comp)) == data.tobytes()
    return {'t': t, 'size': len(comp), 'compile_s': round(compile_s, 1)}


def sec_bwtcl_device():
    """BWTC-L (lane-interleaved entropy format): all-device encode AND
    decode of sample5, end-to-end with transfers — the batched
    coder/model kernels at their L=128-lane design point."""
    data = np.fromfile(os.path.join(SAMPLES, 'sample5.ref'),
                       dtype=np.uint8)
    from compressjs_tpu.parallel.pipeline import bwtcl_compress_device, \
        bwtcl_decompress_device
    t0 = time.perf_counter()
    comp = bytes(bwtcl_compress_device(data, None, 9))  # warmup
    compile_enc = time.perf_counter() - t0
    t_enc, comp = _timed(lambda: bytes(bwtcl_compress_device(
        data, None, 9)), reps=3)
    t0 = time.perf_counter()
    out = bytes(bwtcl_decompress_device(comp))          # warmup
    compile_dec = time.perf_counter() - t0
    assert out == data.tobytes()
    t_dec, out = _timed(lambda: bytes(bwtcl_decompress_device(comp)),
                        reps=3)
    assert out == data.tobytes()
    from compressjs_tpu.codecs import bwtcl as bl
    assert bytes(bl.BWTCL.decompress_file(comp)) == data.tobytes()
    return {'t_enc': t_enc, 't_dec': t_dec, 'size': len(comp),
            'compile_s': {'enc': round(compile_enc, 1),
                          'dec': round(compile_dec, 1)}}


def sec_bwtcp_device():
    """BWTC-P encode with the per-block EOF BWTs on the device mesh
    (single-chip here) + threaded host coders."""
    import jax
    data = np.fromfile(os.path.join(SAMPLES, 'sample5.ref'),
                       dtype=np.uint8)
    from compressjs_tpu.codecs import bwtcp
    from compressjs_tpu.parallel import mesh as pmesh
    m = pmesh.make_mesh(jax.devices()[:1])
    t0 = time.perf_counter()
    comp = bytes(pmesh.mesh_compress_bwtcp(m, data, 9))  # warmup
    compile_s = time.perf_counter() - t0
    t, comp = _timed(lambda: bytes(pmesh.mesh_compress_bwtcp(
        m, data, 9)), reps=3)
    assert bytes(bwtcp.BWTCP.decompress_file(comp)) == data.tobytes()
    return {'t': t, 'size': len(comp), 'compile_s': round(compile_s, 1)}


def _direct_timer():
    """Time repeated direct dispatches of an already-jitted program whose
    input stays on device (K back-to-back calls, one tiny probe fetch at
    the end).  Replaces the round-3 fori-chained timers: each chained
    wrapper was a SECOND 35-100 s XLA compile of a program the
    production path never runs, while direct dispatch times the exact
    executable hetero/mesh use (~ms dispatch overhead included — which
    the production path also pays)."""
    import jax
    import jax.numpy as jnp
    probe = jax.jit(lambda x: x.reshape(-1)[0] % 2)

    def timed(f, arg, K=6):
        t0 = time.perf_counter()
        int(np.asarray(probe(f(arg))))
        compile_s = time.perf_counter() - t0
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            r = None
            for _ in range(K):
                r = f(arg)
            int(np.asarray(probe(r)))
            dt = (time.perf_counter() - t0) / K
            best = dt if best is None else min(best, dt)
        return best, compile_s
    return timed


def sec_device_compute():
    """Compute-only device stage rates (input resident on device,
    direct dispatch of the production executables)."""
    import jax
    import jax.numpy as jnp
    from compressjs_tpu.ops import jax_kernels as jk
    from compressjs_tpu.ops import device_entropy as de
    from compressjs_tpu.ops import rle as rle_ops

    data = np.fromfile(os.path.join(SAMPLES, 'sample5.ref'),
                       dtype=np.uint8)
    block, _ = rle_ops.rle1_encode(data, 0, 9 * 100000 - 19)
    n = block.shape[0]
    dblock = jax.device_put(jnp.asarray(block))
    used = np.zeros(256, dtype=bool)
    used[block] = True
    remap = np.zeros(256, dtype=np.int32)
    remap[np.nonzero(used)[0]] = np.arange(int(used.sum()))
    dremap = jax.device_put(jnp.asarray(remap))
    eob = jnp.int32(int(used.sum()) + 1)
    timed = _direct_timer()

    out = {'compile_s': {}}
    t, cs = timed(lambda b: jk.cyclic_suffix_sort(b, n), dblock)
    out['rotation_sort_mb_s'] = round(n / 1e6 / t, 2)
    out['compile_s']['rotation_sort'] = round(cs, 1)
    # same (width=256, mtf=pallas) program DeviceBzip2Encoder submits,
    # so a sec_warm that ran first makes this compile_s ~0
    t, cs = timed(lambda b: de.encode_block_full(
        b, n, dremap, eob, 256, 'pallas')[1], dblock)
    out['full_block_encode_mb_s'] = round(n / 1e6 / t, 2)
    out['compile_s']['full_block_encode'] = round(cs, 1)
    return out


def sec_device_decode():
    """Compute-only all-device block decode rate (parallel Huffman walk
    -> RLE2/MTF undo -> inverse BWT -> RLE1 undo), direct dispatch.

    NO vmap B=8 lane metric: measured round 4 (tools/
    walk_compile_probe.py steps D/E on the real v5e), the vmapped walk
    costs 214 s compile and runs at 1.9 s/lane vs 0.8 s unbatched —
    vmap LOSES 2.4x per lane on this chip and the full vmapped decode
    does not compile inside 20 min.  Multi-block device decode
    therefore uses the per-device single-block program (the shard_map
    shape the mesh decode actually runs)."""
    import jax
    import jax.numpy as jnp
    from compressjs_tpu.codecs import bzip2
    from compressjs_tpu.ops import device_huffman as dh

    data = np.fromfile(os.path.join(SAMPLES, 'sample5.ref'),
                       dtype=np.uint8)
    n = 9 * 100000 - 19
    comp = np.frombuffer(bytes(bzip2.compress_file(data, None, 9)),
                         np.uint8)
    r = bzip2._BitReader(comp)
    r.read_bits(32)
    assert r.read_bits(48) == bzip2.WHOLEPI
    r.read_bits(32)
    optr, s2b, selectors, groups = bzip2._parse_block_header(
        r, 900000)
    byte0, bit0 = r.pos >> 3, r.pos & 7
    limits, bases, perms, mins = dh.tables_for_device(groups,
                                                      len(groups))
    s2b_arr = np.zeros(256, np.uint8)
    s2b_arr[:len(s2b)] = s2b
    payload = jax.device_put(jnp.asarray(comp[byte0:]))
    sel = jax.device_put(jnp.asarray(selectors, dtype=jnp.int32))
    # bit cap rounded to the Pallas compose tile (16384) so this times
    # the same composition build the production pow2-cap path runs
    caps = (-(-(comp.shape[0] - byte0) * 8 // 16384) * 16384,
            len(selectors), len(groups), 900000 + 8, 1000000)
    timed = _direct_timer()

    out = {'compile_s': {}}
    t, cs = timed(lambda p: dh.decode_block_full_dev(
        p, bit0, *caps, limits, bases, perms, mins, sel,
        jnp.int32(len(selectors)), jnp.int32(len(s2b) + 1),
        jnp.asarray(s2b_arr), jnp.int32(optr))[0], payload, K=4)
    out['full_block_decode_mb_s'] = round(n / 1e6 / t, 2)
    out['compile_s']['full_block_decode'] = round(cs, 1)
    out['vmap_b8_note'] = 'dropped: 214s compile, 2.4x/lane slower'
    return out


def sec_roofline():
    """Per-stage roofline table (VERDICT r4 #7), inside the artifact.

    Every stage input is computed on the HOST (native pipeline) and
    uploaded, so the only device cost per stage is its own jit compile
    + the timed direct dispatches — no fused prep program.  Stages are
    budget-gated individually: whatever fit is reported, with the rest
    marked skipped."""
    import jax
    import jax.numpy as jnp
    from compressjs_tpu.codecs import bzip2
    from compressjs_tpu.ops import bwt as bwt_ops
    from compressjs_tpu.ops import device_entropy as de
    from compressjs_tpu.ops import device_huffman as dh
    from compressjs_tpu.ops import jax_kernels as jk
    from compressjs_tpu.ops import mtf as mtf_ops
    from compressjs_tpu.ops import rle as rle_ops
    from compressjs_tpu.parallel import profiling as prof

    t_sec0 = time.time()
    budget = float(os.environ.get('BENCH_ROOFLINE_BUDGET_S', 240))
    data = np.fromfile(os.path.join(SAMPLES, 'sample5.ref'),
                       dtype=np.uint8)
    block, _ = rle_ops.rle1_encode(data, 0, 9 * 100000 - 19)
    n = block.shape[0]

    # host-side stage inputs (native pipeline, ~0.1 s total)
    U = np.zeros(n, dtype=np.uint8)
    pidx = bwt_ops.bwtransform2(block, U, n, 256)
    alphabet = np.unique(block)
    remap = np.zeros(256, dtype=np.int32)
    remap[alphabet] = np.arange(alphabet.shape[0])
    dense = remap[U]
    eob = alphabet.shape[0] + 1
    mtf_seq = mtf_ops.mtf_encode(U, alphabet)
    syms_host = rle_ops.mtf_rle2_encode(mtf_seq, eob)
    syms_pad = np.full(n + 1, eob, dtype=np.int16)
    syms_pad[:len(syms_host)] = syms_host
    count = jnp.int32(len(syms_host))
    freq = jnp.asarray(np.bincount(syms_host, minlength=260)
                       .astype(np.int32))
    n_chunks = -(-(n + 1) // de.GROUP_SIZE)
    timed = _direct_timer()

    out = {}

    def stage(name, fn, arg):
        left = budget - (time.time() - t_sec0)
        if left < 25:
            out[name] = {'skipped': 'budget (%.0fs left)' % left}
            return None
        t, cs = timed(fn, arg)
        out[name] = prof.roofline(name, n, t)
        out[name]['compile_s'] = round(cs, 1)
        return t

    dblock = jax.device_put(jnp.asarray(block))
    ddense = jax.device_put(jnp.asarray(dense.astype(np.int32)))
    dmtf = jax.device_put(jnp.asarray(mtf_seq.astype(np.int32)))
    dsyms = jax.device_put(jnp.asarray(syms_pad))

    stage('sort', lambda b: jk.cyclic_suffix_sort(b, n), dblock)
    stage('mtf', lambda d: jk.mtf_encode(d, n, 512, 256), ddense)
    stage('rle2', lambda s: jk.rle2_encode(s, n, jnp.int32(eob))[0],
          dmtf)
    stage('groups', lambda s: de.optimize_groups_dev(
        s, count, n_chunks, freq, eob + 1, 'xla')[0], dsyms)
    # pack needs the groups outputs once (not timed)
    try:
        lens, g, sel, codes = de.optimize_groups_dev(
            dsyms, count, n_chunks, freq, eob + 1, 'xla')
        stage('pack', lambda s: de.payload_pack_words_dev(
            s, count, sel, lens, codes, de.payload_cap_bytes(n))[0],
            dsyms)
    except Exception as e:
        out['pack'] = {'error': str(e)[-120:]}

    # decode stages on the real compressed block (exact caps, the same
    # shapes sec_device_decode times end-to-end)
    comp = np.frombuffer(bytes(bzip2.compress_file(data, None, 9)),
                         np.uint8)
    r = bzip2._BitReader(comp)
    r.read_bits(32)
    assert r.read_bits(48) == bzip2.WHOLEPI
    r.read_bits(32)
    optr, s2b, selectors, groups = bzip2._parse_block_header(r, 900000)
    byte0, bit0 = r.pos >> 3, r.pos & 7
    limits, bases, perms, mins = dh.tables_for_device(groups,
                                                      len(groups))
    payload = jax.device_put(jnp.asarray(comp[byte0:]))
    # cap rounded to the Pallas compose tile (16384 bits) so the walk
    # here runs the same build the production pow2-cap path uses;
    # positions past the real payload read BitStream-style zero fill
    nbits_cap = -(-(comp.shape[0] - byte0) * 8 // 16384) * 16384
    s_cap = len(selectors)
    selv = jax.device_put(jnp.asarray(selectors, dtype=jnp.int32))
    dbuf_cap = 900000 + 8

    stage('walk', lambda p: dh.huffman_walk_dev(
        p, bit0, nbits_cap, s_cap, len(groups), limits, bases, perms,
        mins, selv, jnp.int32(s_cap), jnp.int32(len(s2b) + 1))[0],
        payload)
    # host-truth symbol stream feeds the undo stages (identical to the
    # walk's output for a valid stream)
    wsyms_host = np.full(s_cap * 50, len(s2b) + 1, dtype=np.int32)
    wsyms_host[:len(syms_host)] = syms_host
    dwsyms = jax.device_put(jnp.asarray(wsyms_host))
    wcount = jnp.int32(len(syms_host) - 1)  # EOB index
    stage('rle2_undo', lambda s: jk.rle2_decode(s, dbuf_cap, wcount)[0],
          dwsyms)
    # the RLE2-undone index stream IS the MTF index sequence; mtf_decode
    # slices indices[:n] so the input must be padded to the cap (the
    # production caller parallel/decode.py:183 passes the padded dbuf)
    didx = jax.device_put(jnp.asarray(np.pad(
        mtf_seq.astype(np.int32), (0, dbuf_cap - n))))
    stage('mtf_undo', lambda i: jk.mtf_decode(i, dbuf_cap), didx)
    total = jnp.int32(n)
    dU = jax.device_put(jnp.asarray(np.pad(U, (0, dbuf_cap - n))))
    stage('ibwt', lambda u: jk.inverse_bwt_block_masked(
        u, dbuf_cap, total, jnp.minimum(jnp.int32(pidx), total - 1)),
        dU)
    # RLE1 undo consumes the pre-RLE1 block bytes (the ibwt output)
    dpacked = jax.device_put(jnp.asarray(np.pad(block,
                                                (0, dbuf_cap - n))))
    stage('rle1_undo', lambda p: jk.rle1_decode_dev(p, 1000000,
                                                    total)[0], dpacked)
    return out


SUITE_SECTIONS = [
    # (name, fn, min_seconds_remaining_to_start)
    ('warm', sec_warm, 500),
    ('hetero', sec_hetero, 140),
    ('sample5_device', sec_sample5_device, 40),
    ('device_compute', sec_device_compute, 60),
    ('device_decode', sec_device_decode, 120),
    # roofline (the per-stage distance-from-memory-bound table, VERDICT
    # r4 #7) outranks the bwtcl/bwtcp checkbox rates: under a cold-cache
    # budget squeeze the tail sections are the ones to lose (r05 clean
    # run skipped roofline at 9th; bwtcl/bwtcp negatives are already
    # recorded in ARCHITECTURE and their rates change nothing)
    ('roofline', sec_roofline, 120),
    ('bwtcl_device', sec_bwtcl_device, 180),
    ('sample5_hybrid', sec_sample5_hybrid, 60),
    ('bwtcp_device', sec_bwtcp_device, 60),
]


def sub_device_suite():
    """All single-chip TPU measurements in ONE process, ordered by
    value: the dominant cost on this chip is server-side XLA compiles
    over the axon tunnel (100-600 s each, no local cache applies), and
    the sections share compiled programs (sec_warm's encode_block_full
    is the same executable hetero, sample5_device and device_compute
    dispatch).  One JSON line per completed section (flushed) — the
    parent merges every line it got even if it must kill us.

    --handshake (round 5): after the warm section, block on stdin for a
    'go <budget>' line.  The parent spawns this suite FIRST and runs
    its host-only sections while our warm compile proceeds — the warm
    wait is a server-side RPC, so the local cores are free and the
    200-600 s compile overlaps the ~60-90 s of host benching instead of
    serializing after it.  The post-warm budget clock starts at 'go',
    so handshake wait never eats section budget."""
    _enable_compile_cache()
    budget = 600.0
    for a in sys.argv[1:]:
        if a.startswith('--suite-budget='):
            budget = float(a.split('=', 1)[1])
    handshake = '--handshake' in sys.argv
    t0 = time.time()
    for name, fn, need in SUITE_SECTIONS:
        left = budget - (time.time() - t0)
        if left < need:
            print(json.dumps({'section': name,
                              'skipped': 'budget (%.0fs left)' % left}),
                  flush=True)
            continue
        try:
            out = fn()
        except Exception as e:
            out = {'error': '%s: %s' % (type(e).__name__, str(e)[-160:])}
        out['section'] = name
        out['at_s'] = round(time.time() - t0, 1)
        print(json.dumps(out), flush=True)
        if handshake and name == 'warm':
            line = sys.stdin.readline().split()
            if len(line) == 2 and line[0] == 'go':
                budget = float(line[1])
            t0 = time.time()  # post-warm sections get the fresh budget
            handshake = False


def sub_device_roofline():
    """Per-stage roofline accounting (VERDICT r2 #6): time every device
    stage chained, relate it to its analytical bytes-moved / gather
    count, and report achieved GB/s + % of the binding bound
    (parallel.profiling.STAGE_MODELS)."""
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax
    from compressjs_tpu.ops import jax_kernels as jk
    from compressjs_tpu.ops import device_entropy as de
    from compressjs_tpu.ops import device_huffman as dh
    from compressjs_tpu.ops import rle as rle_ops
    from compressjs_tpu.parallel import profiling as prof
    from compressjs_tpu.codecs import bzip2

    data = np.fromfile(os.path.join(SAMPLES, 'sample5.ref'),
                       dtype=np.uint8)
    block, _ = rle_ops.rle1_encode(data, 0, 9 * 100000 - 19)
    n = block.shape[0]
    dblock = jax.device_put(jnp.asarray(block))
    used = np.zeros(256, dtype=bool)
    used[block] = True
    remap = np.zeros(256, dtype=np.int32)
    remap[np.nonzero(used)[0]] = np.arange(int(used.sum()))
    dremap = jnp.asarray(remap)
    eob = jnp.int32(int(used.sum()) + 1)
    n_chunks = -(-(n + 1) // de.GROUP_SIZE)

    _ct = _make_chain_timer()

    def chain_time(body, init):
        return _ct(body, init)[0]

    # stage inputs, computed once on device
    @jax.jit
    def prep(b):
        order = jk.cyclic_suffix_sort(b, n)
        U = b[:n][(order - 1) % n]
        dense = dremap[U.astype(jnp.int32)]
        mtf_seq = jk.mtf_encode(dense, n, 512, 256)
        syms, count, freq = jk.rle2_encode(mtf_seq, n, eob)
        return dense, mtf_seq, syms, count, freq
    dense, mtf_seq, syms, count, freq = prep(dblock)
    lens, g, sel, codes = de.optimize_groups_dev(
        syms, count, n_chunks, freq, eob + 1, 'xla')

    out = {}
    t = chain_time(lambda b: (b + (jk.cyclic_suffix_sort(b, n)[0] % 2))
                   .astype(jnp.uint8), dblock)
    out['sort'] = prof.roofline('sort', n, t)
    t = chain_time(lambda d: d + (jk.mtf_encode(d, n, 512, 256)[0] % 2),
                   dense)
    out['mtf'] = prof.roofline('mtf', n, t)
    t = chain_time(lambda s: s + (jk.rle2_encode(s, n, eob)[1]
                                  % 2).astype(jnp.int32), mtf_seq)
    out['rle2'] = prof.roofline('rle2', n, t)
    t = chain_time(lambda s: (s + (de.optimize_groups_dev(
        s, count, n_chunks, freq, eob + 1, 'xla')[1] % 2)
        .astype(jnp.int16)), syms)
    out['groups'] = prof.roofline('groups', n, t)
    t = chain_time(lambda s: (s + (de.payload_pack_words_dev(
        s, count, sel, lens, codes, de.payload_cap_bytes(n))[1] % 2)
        .astype(jnp.int16)), syms)
    out['pack'] = prof.roofline('pack', n, t)

    # decode stages on the real compressed block
    comp = np.frombuffer(bytes(bzip2.compress_file(data, None, 9)),
                         np.uint8)
    r = bzip2._BitReader(comp)
    r.read_bits(32)
    assert r.read_bits(48) == bzip2.WHOLEPI
    r.read_bits(32)
    optr, s2b, selectors, groups = bzip2._parse_block_header(r, 900000)
    byte0, bit0 = r.pos >> 3, r.pos & 7
    limits, bases, perms, mins = dh.tables_for_device(groups,
                                                      len(groups))
    payload = jax.device_put(jnp.asarray(comp[byte0:]))
    nbits_cap = (comp.shape[0] - byte0) * 8
    s_cap = len(selectors)
    selv = jax.device_put(jnp.asarray(selectors, dtype=jnp.int32))

    t = chain_time(lambda p: p + (dh.huffman_walk_dev(
        p, bit0, nbits_cap, s_cap, len(groups), limits, bases, perms,
        mins, selv, jnp.int32(s_cap), jnp.int32(len(s2b) + 1))[1]
        % 2).astype(jnp.uint8), payload)
    out['walk'] = prof.roofline('walk', n, t)

    wsyms, wcount, _ = jax.jit(
        lambda p: dh.huffman_walk_dev(
            p, bit0, nbits_cap, s_cap, len(groups), limits, bases,
            perms, mins, selv, jnp.int32(s_cap),
            jnp.int32(len(s2b) + 1)))(payload)
    dbuf_cap = 900000 + 8
    t = chain_time(lambda s: s + (jk.rle2_decode(s, dbuf_cap, wcount)[1]
                                  % 2).astype(s.dtype), wsyms)
    out['rle2_undo'] = prof.roofline('rle2_undo', n, t)
    idx, total = jax.jit(
        lambda s: jk.rle2_decode(s, dbuf_cap, wcount))(wsyms)
    t = chain_time(lambda i: i + (jk.mtf_decode(i, dbuf_cap)[0] % 2),
                   idx)
    out['mtf_undo'] = prof.roofline('mtf_undo', n, t)
    s2b_arr = np.zeros(256, np.uint8)
    s2b_arr[:len(s2b)] = s2b
    U = jax.jit(lambda i: jnp.asarray(s2b_arr)[jk.mtf_decode(
        i, dbuf_cap)].astype(jnp.uint8))(idx)
    t = chain_time(lambda u: (u + jk.inverse_bwt_block_masked(
        u, dbuf_cap, total, jnp.minimum(jnp.int32(optr), total - 1))[0]
        % 2).astype(jnp.uint8), U)
    out['ibwt'] = prof.roofline('ibwt', n, t)
    packed = jax.jit(lambda u: jk.inverse_bwt_block_masked(
        u, dbuf_cap, total, jnp.minimum(jnp.int32(optr),
                                        total - 1)))(U)
    t = chain_time(lambda p: (p + jk.rle1_decode_dev(
        p, 1000000, total)[0][:p.shape[0]] % 2).astype(jnp.uint8),
        packed)
    out['rle1_undo'] = prof.roofline('rle1_undo', n, t)
    print(json.dumps(out))


def sub_mesh_scaling():
    """CPU-mesh validation of the DP shard program (the real multi-chip
    measurement needs hardware this container lacks; this validates the
    sharding and measures dispatch scaling on 8 virtual devices over 2
    physical cores — wall-clock parallel speedup is NOT expected here)."""
    os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') +
                               ' --xla_force_host_platform_device_count=8'
                               ).strip()
    import jax
    jax.config.update('jax_platforms', 'cpu')
    _enable_compile_cache()
    import jax.numpy as jnp
    from compressjs_tpu.codecs import bzip2
    from compressjs_tpu.parallel import mesh as pmesh

    data = build_corpus()[:8 * 900000]
    out = {}
    # 1 and 8 devices only: the scaling CURVE is not the point on a
    # 2-core host (wall-clock speedup is impossible); 1d vs 8d shows the
    # shard program compiles+executes at both extremes, and dropping the
    # 2d point keeps the fixed work (~55 s) inside the reserved tail
    for ndev in (1, 8):
        m = pmesh.make_mesh(jax.devices()[:ndev])
        t, comp = _timed(lambda: bytes(pmesh.mesh_compress_bzip2(
            m, data, 9)))
        assert bytes(bzip2.decompress_file(comp)) == data.tobytes()
        out['mesh_%dd_s' % ndev] = round(t, 2)
    print(json.dumps(out))


# --- main -------------------------------------------------------------------

def _emit(detail, het_t, t_host, mb):
    """Print a complete headline JSON snapshot (flushed).  Called after
    every sub-mode: the LAST printed line is always the most complete,
    so an external kill still leaves a parseable artifact tail.

    Kept COMPACT on purpose: the driver records only the tail of
    stdout, and a final line longer than its window would truncate at
    the front and parse to nothing (the round-3 empty-artifact failure
    through a different door).  Diagnostic sub-dicts are flattened and
    ok-statuses elided; the full per-section lines are already on
    stdout above."""
    best = mb / t_host
    pipeline = 'host pipeline'
    if het_t and mb / het_t > best:
        best = mb / het_t
        pipeline = 'hetero host+TPU pipeline'
    d = {}
    for k, v in detail.items():
        if k == 'sections':
            # keep the first 80 chars of skip/error text: a bare
            # "error" status in the artifact is undiagnosable (r05
            # final-run lesson) and the guard below still bounds the
            # total line
            bad = {n: (s['status'] if not s.get('detail')
                       else '%s: %s' % (s['status'],
                                        str(s['detail'])[:80]))
                   for n, s in v.items() if s.get('status') != 'ok'}
            d['sections_ok'] = len(v) - len(bad)
            if bad:
                d['sections_bad'] = bad
        elif k == 'submodes':
            d[k] = {n: (s['status'] if s.get('status') != 'ok'
                        else 'ok@%ds' % s.get('wall_s', 0))
                    for n, s in v.items()}
        elif k == 'baseline':
            d[k] = 'ref bzip2 -9 enwik8 0.0936 MB/s (BASELINE.md)'
        elif k == 'device_compute_only' and isinstance(v, dict):
            d[k] = {kk: vv for kk, vv in v.items()
                    if kk not in ('vmap_b8_note', 'compile_s')}
        elif k == 'tracked' and isinstance(v, dict):
            # "bzip2-9 sample5.ref": {mb_s, size, ref_size} ->
            # "bzip2-9": [mb_s, size] (ref sizes are test-pinned)
            d[k] = {kk.split(' ')[0]: [vv.get('mb_s'), vv.get('size')]
                    for kk, vv in v.items()}
        elif k == 'cp_sort_8mb_spot' and isinstance(v, dict):
            d['cp_sort_8mb'] = [v.get('wall_s'),
                                bool(v.get('host_sa_verified'))]
        else:
            d[k] = v

    def _line():
        return json.dumps({
            'metric': 'bzip2 -9 encode throughput (100MB corpus, %s)'
                      % pipeline,
            'value': round(best, 4),
            'unit': 'MB/s',
            'vs_baseline': round(best / BASELINE_ENWIK8_RATE, 2),
            'detail': d,
        })

    # hard size guard: the driver records a FIXED tail window (r04
    # artifact: exactly 2000 chars) and a final line longer than it
    # truncates at the FRONT, parsing to nothing — the round-3 empty-
    # artifact failure.  Drop diagnostic keys (least essential first)
    # until the line fits with margin; every dropped dict is still on
    # stdout in the per-section lines above.
    out = _line()
    for k in ('stage_roofline', 'tracked', 'bwtcl_compile_s',
              'hetero_stats', 'cp_sort_8mb', 'cpu_mesh_validation',
              'submodes'):
        if len(out) <= 1900:
            break
        if d.pop(k, None) is not None:
            out = _line()
    print(out, flush=True)


def _spawn_suite_overlapped(submodes, exe=None):
    """Start the device suite early (its warm section is a server-side
    XLA compile the local cores don't participate in) and return a
    collector: collect(budget) sends 'go <budget>', waits for the suite
    under a deadline, and returns every JSON line it printed (partial
    results salvaged on a kill).  `exe` overrides the child (tests)."""
    t0 = time.time()
    proc = subprocess.Popen(
        exe or [sys.executable, os.path.abspath(__file__),
                '--device-suite', '--handshake',
                '--suite-budget=%d' % TOTAL_BUDGET_S],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True)
    lines = []

    def _reader():
        for line in proc.stdout:
            lines.append(line)
    import threading
    reader = threading.Thread(target=_reader, daemon=True)
    reader.start()

    def collect(budget):
        status = 'ok'
        try:
            proc.stdin.write('go %d\n' % budget)
            proc.stdin.flush()
        except (BrokenPipeError, OSError):
            status = 'failed: suite died before go'
        deadline = time.time() + budget + 60
        while proc.poll() is None and time.time() < deadline:
            time.sleep(1.0)
        if proc.poll() is None:
            status = 'timeout@%ds' % int(budget + 60)
            proc.kill()
            print('# device-suite timed out', file=sys.stderr)
        reader.join(timeout=10)
        parsed = []
        for line in lines:
            if line.startswith('{'):
                try:
                    parsed.append(json.loads(line))
                except ValueError:
                    pass
        if not parsed and status == 'ok':
            status = 'failed: no output'
        submodes['device-suite'] = {
            'status': status, 'wall_s': round(time.time() - t0, 1)}
        return parsed
    return collect


def main():
    detail = {'budget_s': TOTAL_BUDGET_S}
    submodes = detail['submodes'] = {}
    corpus = build_corpus()
    mb = len(corpus) / 1e6

    # spawn the device suite BEFORE the host sections: its first act is
    # the 200-600 s server-side warm compile, which overlaps the host
    # corpus bench below (VERDICT r4 #4); it then blocks until 'go'
    suite_collect = _spawn_suite_overlapped(submodes)

    t_host, t_dec, size_host = bench_corpus_host(corpus)
    detail['corpus_host_encode_mb_s'] = round(mb / t_host, 2)
    detail['corpus_host_decode_mb_s'] = round(mb / t_dec, 2)
    detail['corpus_compressed_bytes'] = size_host
    detail['baseline'] = ('reference bzip2 -9 enwik8: 0.0936 MB/s '
                          '(BASELINE.md:42); sample5 detail rates vs '
                          '22.57 s')
    try:
        detail['tracked'] = bench_tracked()
    except Exception as e:  # tracked configs must never kill the bench
        detail['tracked_error'] = str(e)[-200:]
    het_t = None
    _emit(detail, het_t, t_host, mb)   # first parseable snapshot

    def ap_hetero(het):
        nonlocal het_t
        het_t = het['t']
        detail['corpus_hetero_encode_mb_s'] = round(mb / het['t'], 2)
        if het.get('t_host_adjacent'):
            detail['corpus_host_encode_adjacent_mb_s'] = round(
                mb / het['t_host_adjacent'], 2)
        if het.get('paired'):
            detail['hetero_paired'] = het['paired']
        detail['hetero_stats'] = het.get('stats')
        assert het['size'] == size_host  # byte-identical pipelines

    def ap_bwtcl(bcl):
        detail['bwtcl_device_encode_mb_s'] = round(
            2.13064 / bcl['t_enc'], 2)
        detail['bwtcl_device_decode_mb_s'] = round(
            2.13064 / bcl['t_dec'], 2)
        detail['bwtcl_size'] = bcl['size']
        detail['bwtcl_compile_s'] = bcl.get('compile_s')

    section_apply = {
        'warm': lambda o: detail.__setitem__('device_warm_compile_s',
                                             o.get('compile_s')),
        'hetero': ap_hetero,
        'sample5_device': lambda o: detail.__setitem__(
            'sample5_device_e2e_mb_s', round(2.13064 / o['t'], 2)),
        'device_compute': lambda o: detail.setdefault(
            'device_compute_only', {}).update(
                {k: v for k, v in o.items()
                 if k not in ('section', 'at_s')}),
        'device_decode': lambda o: detail.setdefault(
            'device_compute_only', {}).update(
                {k: v for k, v in o.items()
                 if k not in ('section', 'at_s', 'compile_s')}),
        'bwtcl_device': ap_bwtcl,
        'sample5_hybrid': lambda o: detail.__setitem__(
            'sample5_device_hybrid_mb_s', round(2.13064 / o['t'], 2)),
        'bwtcp_device': lambda o: detail.__setitem__(
            'bwtcp_device_encode_mb_s', round(2.13064 / o['t'], 2)),
        # compact per-stage roofline [ms, pct_of_bound, bound-initial]
        # — the full entries are on stdout above; the headline carries
        # just enough to see each stage's distance from its bound
        'roofline': lambda o: detail.__setitem__('stage_roofline', {
            k: ([v['ms'], v['pct_of_bound'], v['bound'][0]]
                if isinstance(v, dict) and 'ms' in v
                else 'skip' if isinstance(v, dict) and 'skipped' in v
                else 'err')
            for k, v in o.items() if k not in ('section', 'at_s',
                                               'compile_s')}),
    }

    # release the (already-spawned, already-warming) device suite and
    # collect its per-section JSON lines (salvaged even on timeout),
    # then the CPU-mesh validation in its own (cpu-platform) subprocess
    # reserve enough tail for mesh-scaling (~55-80 s of fixed work) plus
    # final emits: a cold-cache suite can overrun its own estimates (r05
    # clean run: suite ok@980 s left mesh-scaling only 67 s -> timeout),
    # and losing the suite's LAST section to the smaller budget degrades
    # gracefully (sections are salvaged) while losing mesh-scaling
    # drops cpu_mesh_validation from the artifact entirely
    suite_budget = max(0, _remaining() - 240)
    lines = suite_collect(suite_budget)
    sections = detail['sections'] = {}
    for o in lines or []:
        name = o.get('section')
        if not name:
            continue
        status = ('skipped' if 'skipped' in o else
                  'error' if 'error' in o else 'ok')
        sections[name] = {'status': status,
                          'at_s': o.get('at_s'),
                          'detail': o.get('skipped') or o.get('error')}
        if status == 'ok' and name in section_apply:
            try:
                section_apply[name](o)
            except Exception as e:
                sections[name] = {'status': 'apply-error: %s' % e}
    _emit(detail, het_t, t_host, mb)

    mesh = _run_sub(['--mesh-scaling'],
                    min(300, max(120, _remaining() - 30)), submodes)
    if mesh:
        detail['cpu_mesh_validation'] = mesh
    # the 8 MB O(n/d) CP sharded sort costs ~20 min on the 2-core CPU
    # mesh — far beyond this budget — so it runs once per round
    # out-of-band (tools/cpsort_spot.py, hard timeout) and its recorded
    # wall time rides along here so the round-3 regression mode (gate
    # killed by CP sort growth) stays visible in the artifact
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(
                __file__)), 'tools', 'cpsort_spot.json')) as f:
            detail['cp_sort_8mb_spot'] = json.load(f)
    except Exception:
        pass
    detail['total_wall_s'] = round(time.time() - _T_START, 1)
    _emit(detail, het_t, t_host, mb)


def _run_section_standalone(name):
    _enable_compile_cache()
    fn = dict((n, f) for n, f, _ in SUITE_SECTIONS)[name]
    print(json.dumps(fn()))


if __name__ == '__main__':
    if '--device-suite' in sys.argv:
        sub_device_suite()
    elif '--device-roofline' in sys.argv:
        sub_device_roofline()
    elif '--mesh-scaling' in sys.argv:
        sub_mesh_scaling()
    else:
        for _a in sys.argv[1:]:
            if _a.startswith('--section='):
                _run_section_standalone(_a.split('=', 1)[1])
                sys.exit(0)
        main()
