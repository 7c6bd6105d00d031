"""Worker process for the 2-process jax.distributed dryrun
(tests/test_multihost.py).  Each process owns 2 virtual CPU devices; the
global mesh spans 4.  Runs ONE data-parallel train step on a small config
with per-process local batches and prints the (globally reduced,
replicated) loss.

Usage: python tests/_multihost_worker.py <coordinator_port> <process_id>
"""

import os
import sys

port, pid = sys.argv[1], int(sys.argv[2])
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=2'
                           ).strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.distributed.initialize(coordinator_address=f'localhost:{port}',
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert jax.local_device_count() == 2
assert jax.device_count() == 4

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import __graft_entry__  # noqa: E402
from jmodt_tpu.data.synthetic import make_pair_batch  # noqa: E402
from jmodt_tpu.models import PointRCNN  # noqa: E402
from jmodt_tpu.parallel import (make_mesh, put_replicated,  # noqa: E402
                                replicated_sharding, shard_batch)
from jmodt_tpu.train import create_train_state, make_train_step  # noqa: E402

cfg = __graft_entry__._small_config()
model = PointRCNN(cfg, mode='TRAIN')
mesh = make_mesh()  # 4 global devices (2 per process)

# 2 local pairs -> 4 local rows -> global batch 8 rows over 4 devices;
# per-process data differs (seed=pid) like a real distributed loader
batch = make_pair_batch(seed=pid, cfg=cfg, num_pairs=2,
                        npoints=cfg.RPN.NUM_POINTS, img_hw=(64, 128))

init_key, step_key = jax.random.split(jax.random.PRNGKey(0))
variables = jax.jit(lambda k: model.init(
    k, batch['pts_input'][:2], batch['img'][:2], batch['pts_xy'][:2],
    gt_boxes3d=batch['gt_boxes3d'][:2], gt_tids=batch['gt_tids'][:2],
    sample_key=jax.random.PRNGKey(1), train=True))(init_key)
state, tx = create_train_state(cfg, variables, steps_per_epoch=10)
step_fn = make_train_step(cfg, model, tx)

repl = replicated_sharding(mesh)
gbatch = shard_batch(batch, mesh)
gstate = put_replicated(state, mesh)
step = jax.jit(step_fn, out_shardings=(repl, repl))
new_state, tb = step(gstate, gbatch, step_key)
loss = float(tb['loss'])
gnorm = float(tb.get('grad_norm', 0.0)) if isinstance(tb, dict) else 0.0
assert loss == loss and loss != float('inf'), f'bad loss {loss}'
print(f'MULTIHOST_OK pid={pid} loss={loss:.6f} gnorm={gnorm:.4f}',
      flush=True)
