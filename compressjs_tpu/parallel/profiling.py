"""Tracing / profiling support (SURVEY.md §5 aux subsystems).

The reference's only instrumentation was the range coder's byte counter
(kept: RangeCoder.bytecount) and external timing.  Here:

* `stage_timer()` — lightweight per-stage wall-clock accounting for the
  block pipelines; enabled with COMPRESSJS_TPU_TRACE=1 (report printed to
  stderr) or used programmatically.
* `device_trace(logdir)` — context manager around `jax.profiler` so a
  pipeline run emits a TensorBoard-compatible device trace.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time
from collections import defaultdict


class StageTimer:
    def __init__(self, enabled=None):
        if enabled is None:
            enabled = os.environ.get('COMPRESSJS_TPU_TRACE') == '1'
        self.enabled = enabled
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self, out=None):
        if not self.enabled or not self.totals:
            return
        out = out or sys.stderr
        total = sum(self.totals.values())
        print('# stage timing:', file=out)
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            print('#   %-24s %8.3fs  x%-5d (%4.1f%%)'
                  % (name, t, self.counts[name], 100 * t / total), file=out)


_global_timer = None


def stage_timer():
    global _global_timer
    if _global_timer is None:
        _global_timer = StageTimer()
    return _global_timer


@contextlib.contextmanager
def device_trace(logdir):
    """Wrap a region in a jax.profiler trace (TensorBoard format)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# v5e single-chip peaks for roofline accounting
HBM_PEAK_GBS = 819.0
# measured on this chip (tools/probe_vmem_gather.py + the decode-walk
# profile): XLA random HBM gathers sustain ~0.11 G elements/s, and a
# Pallas VMEM lane-gather measured no better (0.097 G/s) — random
# gathers are issue-rate-bound on this part, not a kernel defect
GATHER_PEAK_G = 0.11


# Analytical per-stage cost models for the 900 KB block pipelines:
# bytes(n) is the MINIMAL HBM traffic the algorithm needs (one
# read+write of each live array per pass — a lower bound, so
# pct_of_bound is honest), gathers(n) the random-gather count for
# latency-bound stages.  The binding constraint picks the bound.
STAGE_MODELS = {
    # 6 quad prefix-doubling rounds; an ideal radix-family round would
    # partition the 4x20-bit key in ~10 8-bit passes over 5 int32
    # arrays (r+w) — lax.sort instead runs a ~210-stage bitonic network
    # at HBM speed, so pct_of_bound ~5% is the comparison-sort tax, not
    # a kernel defect (round-2/3 negative results: compacted tails,
    # Pallas VMEM tiles, and Pallas gathers all measured worse)
    'sort': dict(bytes=lambda n: 6 * 10 * 2 * 5 * 4 * n,
                 gathers=lambda n: 0),
    # scan of chunk_len=512 steps over a (n/512, 256) u8 state (r+w)
    # plus the data in/out
    'mtf': dict(bytes=lambda n: 512 * 2 * (-(-n // 512) * 256) + 8 * n,
                gathers=lambda n: 0),
    # ~10 n-sized int32 intermediates (scans, cumsums, scatter-max)
    'rle2': dict(bytes=lambda n: 10 * 2 * 4 * n, gathers=lambda n: 0),
    # Lloyd refinement: R=4 sweeps x (cost gather (G, n_chunks x 50) +
    # histogram) — dominated by the 6n per-symbol table gathers
    'groups': dict(bytes=lambda n: 4 * 2 * 4 * n,
                   gathers=lambda n: 6 * n),
    # 20 bit-candidates per symbol expanded, scattered, packed 8:1
    'pack': dict(bytes=lambda n: 20 * n * 2 + 8 * n,
                 gathers=lambda n: 0),
    # decode walk, round-5 Pallas build (POWER_K=10): next-map build
    # (20 length-compare passes over (G=6, ~2.44n) windows) + 4 VMEM
    # windowed compose levels x 3 HBM passes each — the VPU select
    # sweep inside VMEM is the real cost and is NOT HBM traffic, so
    # pct_of_bound here reads as "distance above pure-traffic floor";
    # the chase's 5*(n/50/50-ish) scalar gathers are negligible
    'walk': dict(bytes=lambda n: (20 + 4 * 3) * 4 * 6 * int(2.44 * n),
                 gathers=lambda n: 0),
    'rle2_undo': dict(bytes=lambda n: 8 * 2 * 4 * n,
                      gathers=lambda n: 0),
    'mtf_undo': dict(bytes=lambda n: 512 * 2 * (-(-n // 512) * 256) +
                     8 * n, gathers=lambda n: 0),
    # round-5 two-phase orbit (m=4096 cursors): log2(m)+1 composition
    # rounds of n-element permutation gathers + n chase-gather elements
    'ibwt': dict(bytes=lambda n: 0, gathers=lambda n: 14 * n),
    'rle1_undo': dict(bytes=lambda n: 12 * 2 * 4 * n,
                      gathers=lambda n: 0),
}


def roofline(stage, n, seconds):
    """Roofline entry for one measured stage: achieved GB/s (by the
    model's minimal traffic), the binding bound (HBM bandwidth or
    random-gather issue rate), and the fraction of that bound achieved.
    pct_of_bound ~ 100 means the stage runs at the hardware limit for
    its access pattern; small values mark kernel headroom."""
    m = STAGE_MODELS[stage]
    b, g = m['bytes'](n), m['gathers'](n)
    t_hbm = b / (HBM_PEAK_GBS * 1e9)
    t_gather = g / (GATHER_PEAK_G * 1e9)
    bound = 'gather' if t_gather > t_hbm else 'hbm'
    t_bound = max(t_gather, t_hbm)
    out = {
        'ms': round(seconds * 1e3, 2),
        'bytes_moved_mb': round(b / 1e6, 1),
        'gathers_m': round(g / 1e6, 1),
        'achieved_gb_s': round(b / seconds / 1e9, 1),
        'bound': bound,
        'pct_of_bound': round(100 * t_bound / seconds, 1),
    }
    return out


def chain_throughput(body, init, n_bytes, iters=10, reps=2):
    """Throughput of a device stage with transfers amortized: `iters`
    chained applications inside ONE jit (the carry defeats DCE), timed
    with a forced host fetch — block_until_ready does not wait over the
    axon tunnel.  Returns (mb_per_s, hbm_fraction): achieved input
    bytes/s and the fraction of HBM peak assuming one read+write of the
    working set per stage (a LOWER bound on the stage's real traffic —
    useful as a regression ratio, not an absolute MFU)."""
    import jax
    import numpy as np
    from jax import lax

    @jax.jit
    def run(x):
        return lax.fori_loop(0, iters, lambda i, c: body(c), x)

    r = run(init)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = run(init)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        ts.append(time.perf_counter() - t0)
    sec = min(ts) / iters
    mbs = n_bytes / 1e6 / sec
    hbm_frac = (2 * n_bytes / sec) / (HBM_PEAK_GBS * 1e9)
    return mbs, hbm_frac
