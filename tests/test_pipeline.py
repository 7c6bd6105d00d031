"""Streaming pipeline tests (small config, CPU): the per-frame joint step
and the chunked scan executor produce consistent, finite tracking rows."""

import jax
import numpy as np
import pytest


@pytest.fixture(scope='module')
def setup():
    import __graft_entry__
    from jmodt_tpu.data.synthetic import make_eval_frame
    from jmodt_tpu.models import PointRCNN
    from jmodt_tpu.models.rcnn import CorrelationHead

    cfg = __graft_entry__._small_config()
    model = PointRCNN(cfg, mode='EVAL')
    frames = [make_eval_frame(seed=s, cfg=cfg, img_hw=(64, 128))
              for s in range(6)]
    f0 = frames[0]
    variables = jax.jit(lambda k: model.init(
        k, f0['pts_input'], f0['img'], f0['pts_xy'],
        train=False))(jax.random.PRNGKey(0))
    feat_dim = cfg.RCNN.SA_CONFIG.MLPS[-1][-1]
    head = CorrelationHead(cfg.REID.LINK_FC)
    link_p = head.init(jax.random.PRNGKey(1),
                       np.zeros((1, feat_dim), np.float32))
    return cfg, model, variables, head, link_p, feat_dim, frames


def test_joint_pipeline(setup):
    from jmodt_tpu.pipeline import JointPipeline
    cfg, model, variables, head, link_p, feat_dim, frames = setup
    pipe = JointPipeline(cfg, model, variables, head.apply, link_p,
                         feat_dim=feat_dim, max_tracks=16, track_k=8,
                         fetch_lag=2, det_score_thresh=0.0)
    results = []
    for i in range(6):
        f = frames[i]
        r = pipe.push(i + 1, f['pts_input'], f['img'], f['pts_xy'])
        if r is not None:
            results.append(r)
    results.extend(pipe.flush())
    assert [fid for fid, _ in results] == list(range(1, 7))
    for fid, rows in results:
        for tid, box, score in rows:
            assert tid > 0 and np.isfinite(box).all()


def test_scan_pipeline_matches_joint(setup):
    from jmodt_tpu.pipeline import JointPipeline, ScanPipeline
    cfg, model, variables, head, link_p, feat_dim, frames = setup
    kw = dict(feat_dim=feat_dim, max_tracks=16, track_k=8,
              det_score_thresh=0.0)
    joint = JointPipeline(cfg, model, variables, head.apply, link_p,
                          fetch_lag=1, **kw)
    scan = ScanPipeline(cfg, model, variables, head.apply, link_p,
                        chunk=3, **kw)
    jr, sr = [], []
    for i in range(6):
        f = frames[i]
        r = joint.push(i + 1, f['pts_input'], f['img'], f['pts_xy'])
        if r is not None:
            jr.append(r)
        sr.extend(scan.push(i + 1, f['pts_input'], f['img'], f['pts_xy']))
    jr.extend(joint.flush())
    sr.extend(scan.flush())
    assert len(jr) == len(sr) == 6
    for (jf, jrows), (sf, srows) in zip(jr, sr):
        assert jf == sf
        assert [r[0] for r in jrows] == [r[0] for r in srows]
        for (jt, jb, js), (st_, sb, ss) in zip(jrows, srows):
            np.testing.assert_allclose(jb, sb, rtol=1e-4, atol=1e-4)


def test_scan_pipeline_ragged_tail(setup):
    """flush() pads a partial chunk and returns exactly the real frames."""
    from jmodt_tpu.pipeline import ScanPipeline
    cfg, model, variables, head, link_p, feat_dim, frames = setup
    scan = ScanPipeline(cfg, model, variables, head.apply, link_p,
                        feat_dim=feat_dim, max_tracks=16, track_k=8,
                        det_score_thresh=0.0, chunk=4)
    results = []
    for i in range(6):  # 1 full chunk + 2-frame tail
        f = frames[i]
        results.extend(scan.push(i + 1, f['pts_input'], f['img'],
                                 f['pts_xy']))
    results.extend(scan.flush())
    assert [fid for fid, _ in results] == [1, 2, 3, 4, 5, 6]
    for _, rows in results:
        for tid, box, score in rows:
            assert tid > 0 and np.isfinite(box).all()


def test_batched_joint_matches_independent(setup):
    """S=2 lockstep streams through make_batched_joint_step emit exactly
    what two independent make_joint_step streams emit."""
    import jax.numpy as jnp
    from jmodt_tpu.pipeline import make_batched_joint_step, make_joint_step
    from jmodt_tpu.tracking.device_tracker import (init_batched_state,
                                                   init_state)
    cfg, model, variables, head, link_p, feat_dim, frames = setup
    kw = dict(track_k=8, det_score_thresh=0.0)
    joint = make_joint_step(cfg, model, head.apply, **kw)
    bj = make_batched_joint_step(cfg, model, head.apply, track_k=8,
                                 det_score_thresh=0.0)

    streams = [frames[0:3], frames[3:6]]  # two 3-frame streams
    # serial reference: each stream independently
    serial = []
    for st_frames in streams:
        st = init_state(16, feat_dim)
        outs = []
        for i, f in enumerate(st_frames):
            st, packed = joint(variables, link_p, st, jnp.asarray(i + 1),
                               f['pts_input'], f['img'], f['pts_xy'])
            outs.append(np.asarray(packed))
        serial.append(outs)

    # lockstep batched
    states = init_batched_state(2, 16, feat_dim)
    for i in range(3):
        pts = np.concatenate([streams[0][i]['pts_input'],
                              streams[1][i]['pts_input']])
        img = np.concatenate([streams[0][i]['img'], streams[1][i]['img']])
        xy = np.concatenate([streams[0][i]['pts_xy'],
                             streams[1][i]['pts_xy']])
        fids = np.asarray([i + 1, i + 1], np.int32)
        states, packed = bj(variables, link_p, states, fids, pts, img, xy)
        arr = np.asarray(packed)
        for s in range(2):
            np.testing.assert_allclose(arr[s], serial[s][i],
                                       rtol=1e-4, atol=1e-4)


def test_batched_joint_sharded_matches_unsharded(setup):
    """mesh-sharded lockstep streams == unsharded batched step: streams are
    independent, so splitting S over a 4-device mesh must be a pure layout
    change (params replicated, zero collectives)."""
    import jax.numpy as jnp
    from jmodt_tpu.parallel import make_mesh
    from jmodt_tpu.pipeline import make_batched_joint_step
    from jmodt_tpu.tracking.device_tracker import init_batched_state
    cfg, model, variables, head, link_p, feat_dim, frames = setup
    kw = dict(track_k=8, det_score_thresh=0.0)
    bj = make_batched_joint_step(cfg, model, head.apply, **kw)
    sj = make_batched_joint_step(cfg, model, head.apply,
                                 mesh=make_mesh(jax.devices()[:4]), **kw)

    s_count = 4
    st_ref = init_batched_state(s_count, 16, feat_dim)
    st_shd = init_batched_state(s_count, 16, feat_dim)
    for i in range(3):
        pts = np.concatenate([frames[(i + s) % 6]['pts_input']
                              for s in range(s_count)])
        img = np.concatenate([frames[(i + s) % 6]['img']
                              for s in range(s_count)])
        xy = np.concatenate([frames[(i + s) % 6]['pts_xy']
                             for s in range(s_count)])
        fids = np.full((s_count,), i + 1, np.int32)
        st_ref, p_ref = bj(variables, link_p, st_ref, fids, pts, img, xy)
        st_shd, p_shd = sj(variables, link_p, st_shd, fids, pts, img, xy)
        np.testing.assert_allclose(np.asarray(p_shd), np.asarray(p_ref),
                                   rtol=1e-4, atol=1e-4)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4),
        st_shd, st_ref)
