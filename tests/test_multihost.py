"""True multi-process mesh test: two OS processes with two CPU devices
each form one four-device jax.distributed mesh, run the data-parallel
block-encode shard program, and each process verifies its addressable
shards against the single-host pipeline (SURVEY.md §4's 'fake backend'
analog — the CPU simulation of a multi-host TPU deployment)."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r'''
import os, sys
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
sys.path.insert(0, {repo!r})
import jax
jax.config.update('jax_platforms', 'cpu')
jax.distributed.initialize(coordinator_address='127.0.0.1:' + port,
                           num_processes=nproc, process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from compressjs_tpu.parallel import mesh as pmesh
from compressjs_tpu.ops import bwt as bwt_host, mtf as mtf_host, rle as rle_host

devs = jax.devices()
assert len(devs) == 2 * nproc, devs
mesh = Mesh(np.array(devs), ('dp',))

n, n_blocks = 512, 2 * nproc
base = (b'the quick brown fox jumps over the lazy dog. ' * 40)
blocks = [np.frombuffer(base[(i * 131) % (len(base) - n):][:n], dtype=np.uint8)
          for i in range(n_blocks)]
raw, remaps, eobs = pmesh.prepare_blocks(blocks)

def make_global(arr, spec):
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        arr.shape, sh, lambda idx: arr[idx])

g_blocks = make_global(np.asarray(raw), P('dp', None))
g_remaps = make_global(np.asarray(remaps), P('dp', None))
g_eobs = make_global(np.asarray(eobs), P('dp'))

pidx, syms, count, freq, all_counts = pmesh.sharded_block_encode(
    mesh, g_blocks, g_remaps, g_eobs)

# the size manifest is replicated: every process sees every block size
ac = np.asarray(all_counts)
assert ac.shape[0] == n_blocks

# verify the blocks THIS process owns against the host pipeline
checked = 0
for shard in count.addressable_shards:
    i0 = shard.index[0].start or 0
    for off, c in enumerate(np.asarray(shard.data)):
        i = i0 + off
        U = np.zeros(n, dtype=np.uint8)
        bwt_host.bwtransform2(raw[i], U, n, 256)
        alpha = mtf_host.used_alphabet(raw[i])
        s_host = rle_host.mtf_rle2_encode(
            mtf_host.mtf_encode(U, alpha), len(alpha) + 1)
        assert int(c) == len(s_host), (i, int(c), len(s_host))
        assert int(ac[i]) == len(s_host)
        checked += 1
assert checked == n_blocks // nproc, checked
print('WORKER_OK pid=%d checked=%d' % (pid, checked), flush=True)
'''


@pytest.mark.slow
def test_two_process_distributed_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        port = str(s.getsockname()[1])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / 'worker.py'
    script.write_text(_WORKER.replace('{repo!r}', repr(repo)))
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), '2', port],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, (rc, out[-500:], err[-1500:])
        assert 'WORKER_OK' in out, (out[-500:], err[-800:])
