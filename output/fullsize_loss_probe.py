import sys; sys.path.insert(0, '/root/repo')
import jax, numpy as np
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
from jmodt_tpu.config import Config
from jmodt_tpu.data.synthetic import make_pair_batch
from jmodt_tpu.models import PointRCNN
from jmodt_tpu.train.train_step import compute_losses

cfg = Config()
model = PointRCNN(cfg, mode='TRAIN')
batch = make_pair_batch(seed=0, cfg=cfg, num_pairs=1, npoints=cfg.RPN.NUM_POINTS)
var_shapes = jax.eval_shape(
    lambda k: model.init(k, batch['pts_input'][:2], batch['img'][:2], batch['pts_xy'][:2],
                         gt_boxes3d=batch['gt_boxes3d'][:2], gt_tids=batch['gt_tids'][:2],
                         sample_key=jax.random.PRNGKey(1), train=True),
    jax.random.PRNGKey(0))

def materialize(path, s):
    name = jax.tree_util.keystr(path)
    if s.dtype not in (jnp.float32, jnp.bfloat16, jnp.float64):
        return jnp.zeros(s.shape, s.dtype)
    if name.endswith("'var']") or name.endswith("'scale']"):
        return jnp.ones(s.shape, s.dtype)
    if s.ndim < 2:
        return jnp.zeros(s.shape, s.dtype)
    seed = abs(hash(name)) % (2 ** 31)
    return (0.02 * jax.random.normal(jax.random.PRNGKey(seed), s.shape)).astype(s.dtype)

variables = jax.tree_util.tree_map_with_path(materialize, var_shapes)

@jax.jit
def fwd(variables, batch):
    out, _ = model.apply(variables, batch['pts_input'], batch['img'], batch['pts_xy'],
                         gt_boxes3d=batch['gt_boxes3d'], gt_tids=batch['gt_tids'],
                         sample_key=jax.random.PRNGKey(1), train=True,
                         mutable=['batch_stats'])
    loss, tb = compute_losses(cfg, out, batch)
    aux = {'n_valid_roi': jnp.sum(out['rois'][..., 3] > 0) if 'rois' in out else -1}
    for k in ('reid_link_mask', 'reid_start_mask', 'reid_end_mask'):
        if k in out:
            aux['sum_' + k] = jnp.sum(out[k])
    if 'targets' in out:
        t = out['targets']
        for f in ('cls_label', 'max_iou'):
            v = getattr(t, f, None)
            if v is not None:
                aux['targets_' + f + '_minmax'] = jnp.stack([jnp.min(v), jnp.max(v)])
    return loss, tb, aux

loss, tb, aux = fwd(variables, batch)
print('LOSS', float(loss), flush=True)
for k in sorted(tb):
    print('tb', k, np.asarray(tb[k]).tolist(), flush=True)
for k in sorted(aux):
    print('aux', k, np.asarray(aux[k]).tolist(), flush=True)
print('DONE', flush=True)
