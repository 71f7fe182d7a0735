"""Multi-chip data-parallel block encoding over a jax.sharding.Mesh.

Blocks are the DP axis (SURVEY.md §2: bzip2 blocks share only the rolling
stream CRC and bit alignment, both host-side).  Each device runs the fused
transform kernel on its block shard; the per-block compressed sizes are
exchanged with an `all_gather` over the mesh axis so every device knows
the output ordering (the ragged-gather manifest), and payload assembly
happens on the host in file order.

Scaling axes:
* dp   — blocks across devices (this module)
* intra-block parallelism — the sort/scan kernels themselves vectorize
  across the sequence dimension (ops.jax_kernels)
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import jax_kernels as jk


def make_mesh(devices=None, axis='dp'):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def sharded_block_encode(mesh, blocks, remaps, eobs):
    """Encode B equal-length blocks sharded over the mesh's 'dp' axis.

    blocks: (B, n) uint8; remaps: (B, 256) int32; eobs: (B,) int32.
    Returns (pidxs (B,), syms (B, n+1), counts (B,), freqs (B, 260),
    all_counts (B, B_total)) with outputs sharded the same way."""
    n = blocks.shape[1]

    def per_shard(blocks_s, remaps_s, eobs_s):
        core = jax.vmap(lambda b, r, e: jk.encode_block_core(b, n, r, e))
        pidx, syms, count, freq = core(blocks_s, remaps_s, eobs_s)
        # exchange symbol counts across the mesh: the ordered-assembly
        # manifest (every device learns all block sizes via ICI)
        all_counts = lax.all_gather(count, 'dp', tiled=True)
        return pidx, syms, count, freq, all_counts

    f = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P('dp', None), P('dp', None), P('dp')),
        out_specs=(P('dp'), P('dp', None), P('dp'), P('dp', None), P(None)),
        check_rep=False)
    return jax.jit(f)(blocks, remaps, eobs)


def prepare_blocks(raw_blocks):
    """Host prep: dense-alphabet remap tables and EOB symbols per block."""
    remaps = []
    eobs = []
    for b in raw_blocks:
        used = np.zeros(256, dtype=bool)
        used[b] = True
        remap = np.zeros(256, dtype=np.int32)
        remap[np.nonzero(used)[0]] = np.arange(int(used.sum()))
        remaps.append(remap)
        eobs.append(int(used.sum()) + 1)
    return (np.stack(raw_blocks), np.stack(remaps),
            np.asarray(eobs, dtype=np.int32))
