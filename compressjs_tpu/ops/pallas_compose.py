"""Pallas windowed permutation-composition for the device Huffman walk.

`compose_windowed(a, b, blo, bhi)` computes ``c[g, p] = a[g, b[g, p]]``
for (G, cap) int32 position maps whose jump ``b[g, p] - p`` is bounded
in ``[blo, bhi]`` (bzip2 code lengths are 1..20 bits, so ``nxt^k``
jumps k..20k — reference walk: Bzip2.js:288-361).

Why this kernel exists: the same composition as random gathers costs
~cap*G gather issues (the v5e sustains only ~0.11 G/s — ~120 ms for
one k=2 level at bench shapes), and the XLA windowed build
(`device_huffman._compose_windowed`) re-reads the whole (G, cap) array
from HBM once per window offset (~156 MB * W sweeps) AND costs 374 s
of server-side XLA compile at k=50 (ARCHITECTURE.md negative (h)).
Here the sweep runs entirely in VMEM: each grid step loads one tile of
`a` (plus its right neighbor, covering the window overhang) and `b`,
then sweeps the W = bhi-blo+1 offsets with two lane-rotates and two
selects per offset — VPU-bound, one HBM pass total, and a Mosaic
program small enough to compile in seconds (`fori_loop` body, no
unrolled W).

Layout: each group row a[g] is viewed as (cap/128, 128); a flat shift
by t is rows t//128 down + lanes t%128 right with row carry, i.e.
``cand[r, l] = buf[q + r + (l + s >= 128), (l + s) % 128]`` for
q = t//128, s = t%128 — two lane-rotates of adjacent row windows
selected by lane index.  The q advance is the outer (static) loop, the
s advance the inner `fori_loop` with a TRACED rotate amount
(pltpu.roll supports dynamic shifts; interpret mode uses jnp.roll).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
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


def _roll_lanes(x, s, interpret):
    """x rotated left by a TRACED amount s along the lane axis."""
    if interpret or pltpu is None:
        return jnp.roll(x, -s, axis=1)
    return pltpu.roll(x, -s, axis=1)


def _compose_kernel(R, blo, bhi, interpret, a_cur, a_nxt, b_ref, out_ref):
    """One (group, tile) step: out[r, l] = a[flat(b[r, l]) - tile_base].

    a_cur/a_nxt: (1, 1, R, 128) blocks — this tile of `a` and the next
    (the window never reaches past one tile: bhi < R*128 is asserted
    by the caller).  b_ref/out_ref: (1, 1, R, 128)."""
    i = pl.program_id(1)
    base = i * (R * LANES)
    rows = lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    lanes = lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    flat = base + rows * LANES + lanes
    # jump, clipped into the window (positions clipped at the array
    # tail select a junk-but-in-range value, exactly like the XLA
    # build; the selector chase never reaches them)
    d = jnp.clip(b_ref[0, 0] - flat, blo, bhi)
    buf = jnp.concatenate([a_cur[0, 0], a_nxt[0, 0]], axis=0)  # (2R, 128)

    acc = jnp.zeros((R, LANES), jnp.int32)
    n_q = (bhi // LANES) - (blo // LANES) + 1

    for qi in range(n_q):  # static outer: row offset of the shift
        q = blo // LANES + qi
        c1 = buf[q:q + R, :]           # rows for lanes that don't carry
        c2 = buf[q + 1:q + 1 + R, :]   # rows for lanes that carry over
        s_lo = max(blo - q * LANES, 0)
        s_hi = min(bhi - q * LANES, LANES - 1)

        def body(s, acc):
            r1 = _roll_lanes(c1, s, interpret)
            r2 = _roll_lanes(c2, s, interpret)
            cand = jnp.where(lanes < LANES - s, r1, r2)
            return jnp.where(d == q * LANES + s, cand, acc)

        acc = lax.fori_loop(s_lo, s_hi + 1, body, acc)
    out_ref[0, 0] = acc


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def compose_windowed(a, b, blo, bhi, tile_rows=64, interpret=None):
    """c[g, p] = a[g, b[g, p]] with b[g, p] - p in [blo, bhi].

    a, b: (G, cap) int32, cap a multiple of 128*tile_rows (the walk's
    nbits_cap is a power of two >= 4096).  Returns (G, cap) int32."""
    if interpret is None:
        interpret = not _on_tpu()
    G, cap = a.shape
    T = tile_rows * LANES
    assert cap % T == 0 and 0 <= blo <= bhi < T, (cap, T, blo, bhi)
    n_tiles = cap // T
    # one pad tile on the right so the (g, i+1) neighbor spec of the
    # last tile stays in bounds; it broadcasts a[:, -1] so tail
    # positions whose jump was clipped select exactly the same junk
    # value as the XLA windowed build (bit-stable across builds)
    a3 = jnp.concatenate(
        [a.reshape(G, n_tiles, tile_rows, LANES),
         jnp.broadcast_to(a[:, -1][:, None, None, None],
                          (G, 1, tile_rows, LANES)).astype(jnp.int32)],
        axis=1)
    b3 = b.reshape(G, n_tiles, tile_rows, LANES)
    kernel = functools.partial(_compose_kernel, tile_rows, blo, bhi,
                               interpret)
    out = pl.pallas_call(
        kernel,
        grid=(G, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, tile_rows, LANES),
                         lambda g, i: (g, i, 0, 0)),
            pl.BlockSpec((1, 1, tile_rows, LANES),
                         lambda g, i: (g, i + 1, 0, 0)),
            pl.BlockSpec((1, 1, tile_rows, LANES),
                         lambda g, i: (g, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, tile_rows, LANES),
                               lambda g, i: (g, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, n_tiles, tile_rows, LANES),
                                       jnp.int32),
        interpret=interpret,
    )(a3, a3, b3)
    return out.reshape(G, cap)
