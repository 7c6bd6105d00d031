"""Distance-zone proposal logic (reference distance_based_proposal,
proposal_layer.py:59-121): 70/30 budget split at 40 m, zone-2 fallback to
zone-1 overflow ranks, score ordering."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from jmodt_tpu.models.proposal import proposal_layer


def make_cfg(pre=16, post=10):
    import __graft_entry__
    base = __graft_entry__._small_config()
    return dataclasses.replace(
        base, EVAL=dataclasses.replace(base.EVAL, RPN_PRE_NMS_TOP_N=pre,
                                       RPN_POST_NMS_TOP_N=post,
                                       RPN_NMS_THRESH=0.99))


def run(cfg, xyz, scores):
    n = xyz.shape[1]
    reg = np.zeros((1, n, 76), np.float32)  # decode ~ centered on the point
    out = proposal_layer(cfg, 'EVAL', jnp.asarray(scores), jnp.asarray(reg),
                         jnp.asarray(xyz))
    boxes = np.asarray(out.boxes[0])
    mask = np.asarray(out.mask[0])
    return boxes[mask], mask


def test_zone_budgets():
    """post=10 -> 7 near-zone slots, 3 far-zone slots."""
    cfg = make_cfg()
    n = 64
    rng = np.random.RandomState(0)
    xyz = np.zeros((1, n, 3), np.float32)
    xyz[0, :, 0] = np.linspace(-30, 30, n)     # spread in x: no NMS overlap
    xyz[0, :32, 2] = 20.0                      # near zone (z <= 40)
    xyz[0, 32:, 2] = 60.0                      # far zone
    scores = rng.rand(1, n).astype(np.float32)
    boxes, mask = run(cfg, xyz, scores)
    near = boxes[:, 2] < 40
    assert near.sum() == 7 and (~near).sum() == 3


def test_far_zone_fallback_to_near_overflow():
    """With NO far points, the far-zone budget refills from near-zone ranks
    past the near budget (proposal_layer.py:93-102)."""
    cfg = make_cfg()
    n = 64
    rng = np.random.RandomState(1)
    xyz = np.zeros((1, n, 3), np.float32)
    xyz[0, :, 0] = np.linspace(-30, 30, n)
    xyz[0, :, 2] = 15.0  # everything near
    scores = rng.rand(1, n).astype(np.float32)
    boxes, mask = run(cfg, xyz, scores)
    # all 10 slots filled from the near zone
    assert mask.sum() == 10
    assert (boxes[:, 2] < 40).all()


def test_empty_input_keeps_masks_clean():
    cfg = make_cfg()
    n = 64
    xyz = np.zeros((1, n, 3), np.float32)
    xyz[0, :, 2] = -5.0  # behind the camera: outside both zones
    scores = np.zeros((1, n), np.float32)
    boxes, mask = run(cfg, xyz, scores)
    assert mask.sum() == 0
