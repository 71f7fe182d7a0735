"""Pallas TPU kernels for the hot transform inner loops.

`mtf_chunks` is the move-to-front position scan as a single fused kernel:
chunks ride the 128-wide lane dimension, the symbol-position table
(width x 128) lives in VMEM for the whole chunk, and each step is three
VPU passes over the table (mask-select for the index, compare-add for the
bump, mask-zero for the front move) — no gathers, no per-step XLA loop
machinery.  The XLA `lax.scan` build of the same algorithm
(ops.jax_kernels.mtf_encode) pays dynamic-update-slice and loop-carry
overhead every step; this kernel exists to close that gap.

Falls back to interpret mode off-TPU so the CPU test mesh exercises the
same code path.

Status (v5e, axon, round 4): this kernel IS the production MTF on TPU —
`parallel/pipeline.py` selects ``mtf_impl='pallas'`` whenever the default
backend is a TPU, and `tests/test_perf_regression.py` floors it at
30 MB/s against a measured 37.7 MB/s (512-symbol chunks), vs 28.4 MB/s
for the XLA `lax.scan` build of the same algorithm
(`ops.jax_kernels.mtf_encode`, which stays the off-TPU/fallback path).
An earlier revision of this kernel measured ~3x slower than the scan;
the current shape (table rides the lane dimension, three VPU passes per
step) is what closed that gap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
try:  # pltpu only resolves fully on TPU builds; guard for CPU test runs
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

LANES = 128


def _on_tpu():
    try:
        return jax.devices()[0].platform in ('tpu', 'axon')
    except Exception:
        return False


SUBLANES = 8  # int32 sublane tile; dynamic row access must stay aligned


def _mtf_kernel(chunk_len, width, lanes, data_ref, starts_ref, out_ref):
    """One grid step: `lanes` chunks in the lane dimension.

    data:  (chunk_len, lanes) int32 — symbols, one chunk per lane
    starts:(width, lanes) int32     — symbol -> position at chunk start
    out:   (chunk_len, lanes) int32 — MTF indices

    Rows are consumed in aligned groups of 8 (the int32 sublane tile) with
    the inner 8 steps unrolled; each step is three VPU passes over the
    (width, lanes) position table."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (width, lanes), 0)

    def group(g, pos):
        base = g * SUBLANES
        blk = data_ref[pl.ds(base, SUBLANES), :]     # (8, 128), aligned
        outs = []
        for s in range(SUBLANES):
            syms = blk[s, :]                         # (128,)
            mask = rows == syms[None, :]             # one-hot per lane
            j = jnp.sum(jnp.where(mask, pos, 0), axis=0)
            bump = (pos < j[None, :]).astype(jnp.int32)
            pos = jnp.where(mask, 0, pos + bump)
            outs.append(j)
        out_ref[pl.ds(base, SUBLANES), :] = jnp.stack(outs, axis=0)
        return pos

    jax.lax.fori_loop(0, chunk_len // SUBLANES, group, starts_ref[:, :])


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def mtf_chunks(data, starts, chunk_len, width, interpret=False,
               lanes_per_program=LANES):
    """Run the MTF scan over all chunks.

    data:   (chunk_len, C) int32 with C a multiple of 128
    starts: (width, C) int32
    returns (chunk_len, C) int32 of MTF indices.

    lanes_per_program widens each grid step's position table (more VPU
    lanes per pass, fewer sequential grid steps); VMEM bounds it at
    ~(chunk_len + width) * lanes * 8 bytes."""
    C = data.shape[1]
    lanes = min(lanes_per_program, C)
    grid = (C // lanes,)
    kernel = functools.partial(_mtf_kernel, chunk_len, width, lanes)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk_len, lanes), lambda i: (0, i)),
            pl.BlockSpec((width, lanes), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((chunk_len, lanes), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((chunk_len, C), jnp.int32),
        interpret=interpret,
    )(data, starts)


def mtf_encode_pallas(data, n, chunk_len=512, width=256, interpret=None,
                      lanes_per_program=512):
    """Full MTF encode via the pallas kernel: chunk-start states from the
    last-occurrence max-scan (ops.jax_kernels), then the fused scan.

    lanes_per_program > 128 puts several independent chunk chains in one
    grid step: each scan step's table passes widen from (width, 128) to
    (width, lanes) vregs, so the serial step chain (the latency bound —
    steps depend through the position table) amortizes over 4x+ more
    parallel work.  Measured v5e, 900 KB block: 48 ms at lanes=128 ->
    ~7 ms at lanes=512/chunk_len=512."""
    from . import jax_kernels as jk
    if interpret is None:
        interpret = not _on_tpu()
    n_chunks = -(-n // chunk_len)
    lanes = min(lanes_per_program,
                -(-n_chunks // LANES) * LANES)
    C = -(-n_chunks // lanes) * lanes
    d = jnp.zeros(C * chunk_len, dtype=jnp.int32)
    d = d.at[:n].set(data[:n].astype(jnp.int32))
    chunks = d.reshape(C, chunk_len)
    starts = jk._chunk_start_positions(chunks[:n_chunks], n_chunks,
                                       chunk_len, width)
    full_starts = jnp.broadcast_to(
        jnp.arange(width, dtype=jnp.int32)[None, :], (C, width))
    full_starts = full_starts.at[:n_chunks].set(starts)
    out = mtf_chunks(chunks.T, full_starts.T, chunk_len, width,
                     interpret, lanes)
    return out.T.reshape(-1)[:n]
