"""Round spot-check (VERDICT r4 #8): the 8 MB O(n/d)-memory CP sharded
sort, run once per round under a hard timeout, wall time recorded in
tools/cpsort_spot.json — bench.py embeds it in the artifact so the
round-3 regression mode (gate killed by CP sort growth) stays visible.
Run: timeout 2400 python tools/cpsort_spot.py"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') +
                           ' --xla_force_host_platform_device_count=8').strip()
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np, jax.numpy as jnp
from compressjs_tpu.parallel.sharded_sort import sharded_cyclic_suffix_sort
from compressjs_tpu.parallel.mesh import make_mesh
from compressjs_tpu.ops import bwt as bwt_host

base = open('/root/reference/test/sample5.ref', 'rb').read()
n = 8 << 20
data = np.frombuffer((base * (-(-n // len(base))))[:n], dtype=np.uint8)
m = make_mesh(jax.devices()[:8])
t0 = time.time()
order = np.asarray(sharded_cyclic_suffix_sort(m, jnp.asarray(data)))
wall = time.time() - t0
ok = bool((order == bwt_host.cyclic_suffix_array(data)).all())
out = {'case': 'cp_sharded_sort_8mb_cpu_mesh_8dev', 'wall_s': round(wall, 1),
       'host_sa_verified': ok, 'recorded_unix': int(time.time())}
with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'cpsort_spot.json'), 'w') as f:
    json.dump(out, f)
print(json.dumps(out), flush=True)
assert ok
