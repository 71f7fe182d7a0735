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
