"""Streaming joint detection + tracking pipeline.

One jitted program per frame runs the ENTIRE online loop on device: fused
detection (backbone -> RPN -> proposals -> RCNN -> decode -> NMS), top-K
detection selection, and the on-device tracker step — then packs the frame's
tracking output into a single buffer.  The host never feeds data back into
the loop, so output fetches are free to lag behind compute: frame i's
result transfers while frame i+1 executes, making throughput compute-bound
instead of host-link-latency-bound.

This replaces the reference's per-frame device<->host ping-pong
(tools/eval.py:351-397: detection files -> host tracker -> CUDA affinity ->
host CBC solver) with a TPU-resident stream.
"""

from __future__ import annotations

from collections import deque
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from jmodt_tpu.config import Config
from jmodt_tpu.models.inference import make_detection_step
from jmodt_tpu.models.point_rcnn import PointRCNN
from jmodt_tpu.tracking.device_tracker import (TrackerState, init_state,
                                               make_device_tracker_step)


def make_joint_step(cfg: Config, model: PointRCNN, link_apply: Callable,
                    track_k: int = 16,
                    det_score_thresh: float = 0.85, **tracker_kw):
    """Jitted `joint(variables, link_params, state, frame_id, pts, img, xy)
    -> (state, packed (T, 10))` where packed rows are
    [tid, x, y, z, h, w, l, ry, score, emit].  `link_apply(params, x)`
    scores correlation features; its params are a runtime argument (closure
    captures become executable constants, which poison this relay's
    program cache)."""
    det_step = make_detection_step(cfg, model, jit=False)
    trk_step = make_device_tracker_step(link_apply, jit=False, **tracker_kw)

    @jax.jit
    def joint(variables, link_params, state: TrackerState, frame_id, pts,
              img, xy):
        det = det_step(variables, pts, img, xy)
        scores = jnp.where(det['keep'][0], det['scores'][0], -1.0)
        top = jax.lax.top_k(scores, track_k)[1]
        det_boxes = det['boxes'][0][top]
        det_scores = scores[top]
        det_feats = det['feats'][0][top]
        det_mask = det_scores > det_score_thresh

        state, out = trk_step(state, frame_id, det_boxes, det_scores,
                              det_feats, det_mask, link_params)
        packed = jnp.concatenate([
            out['tid'].astype(jnp.float32)[:, None],
            out['box'],
            out['score'][:, None],
            out['emit'].astype(jnp.float32)[:, None]], axis=1)
        return state, packed

    return joint


def make_batched_joint_step(cfg: Config, model: PointRCNN,
                            link_apply: Callable, track_k: int = 16,
                            det_score_thresh: float = 0.85,
                            mesh=None, **tracker_kw):
    """S independent streams advance in LOCKSTEP through one program:
    batched detection + the vmapped tracker step.  This is the
    fused-throughput analog of tools/eval.py --batch_seqs (which batches
    only stage 2 from detection files); the reference evaluates its val
    sequences serially (reference tools/eval.py:351-397).

    Measured scaling (v5e, round 3): S=4 costs ~3.6x one frame — the
    detection program is HBM-bandwidth-bound (grouped SA intermediates),
    not latency-bound, so lockstep buys ~10% per-frame plus one dispatch
    instead of four; it remains the right shape for multi-camera serving
    (one program, one tracker state tensor) rather than a 4x throughput
    trick.

    joint(variables, link_params, states, frame_ids (S,), pts (S, N, 3),
          imgs (S, H, W, 3), xys (S, N, 2)) -> (states, packed (S, T, 10))

    Build `states` with `init_batched_state(S, max_tracks, feat_dim)`;
    packed rows are [tid, x, y, z, h, w, l, ry, score, emit] per stream.

    `mesh`: optional 1-D `jax.sharding.Mesh` — streams are independent, so
    the step shards perfectly over the mesh's first axis (S must divide by
    its size): inputs/states split on axis 0, params replicate, and GSPMD
    inserts no collectives.  This is the multi-chip offline-eval /
    multi-camera serving shape: each chip carries S/n_dev sequences
    end-to-end (detection + tracker state) with zero cross-chip traffic.
    """
    det_step = make_detection_step(cfg, model, jit=False)
    trk_step = make_device_tracker_step(link_apply, jit=False, **tracker_kw)
    btrk = jax.vmap(trk_step, in_axes=(0, 0, 0, 0, 0, 0, None))

    def joint(variables, link_params, states: TrackerState, frame_ids,
              pts, imgs, xys):
        det = det_step(variables, pts, imgs, xys)
        scores = jnp.where(det['keep'], det['scores'], -1.0)      # (S, M)
        top = jax.lax.top_k(scores, track_k)[1]                   # (S, K)
        det_boxes = jnp.take_along_axis(det['boxes'], top[..., None], 1)
        det_scores = jnp.take_along_axis(scores, top, 1)
        det_feats = jnp.take_along_axis(det['feats'], top[..., None], 1)
        det_mask = det_scores > det_score_thresh

        states, out = btrk(states, frame_ids, det_boxes, det_scores,
                           det_feats, det_mask, link_params)
        packed = jnp.concatenate([
            out['tid'].astype(jnp.float32)[..., None],
            out['box'],
            out['score'][..., None],
            out['emit'].astype(jnp.float32)[..., None]], axis=-1)
        return states, packed

    if mesh is None:
        return jax.jit(joint)
    from jax.sharding import NamedSharding, PartitionSpec as P
    axis = mesh.axis_names[0]
    strm = NamedSharding(mesh, P(axis))   # leading stream axis split
    repl = NamedSharding(mesh, P())
    return jax.jit(joint,
                   in_shardings=(repl, repl, strm, strm, strm, strm, strm),
                   out_shardings=(strm, strm))


def make_scan_step(cfg: Config, model: PointRCNN, link_apply: Callable,
                   track_k: int = 16,
                   det_score_thresh: float = 0.85, **tracker_kw):
    """Chunked streaming: `lax.scan` the joint step over K stacked frames
    inside ONE program (K = the leading dim of the stacked inputs; each
    distinct K compiles once).

    scan_step(variables, link_params, state, frame_ids (K,),
              pts (K, 1, N, 3), imgs (K, 1, H, W, 3), xys (K, 1, N, 2))
        -> (state, packed (K, T, 10))

    The sequential frame loop runs on device, so per-frame dispatch /
    program-(re)load overhead is paid once per K frames; per-frame output
    rows come back in one buffer.  This is the TPU analog of processing a
    video as a time-major scan — same per-frame semantics as
    make_joint_step, results delivered with up-to-K-frame latency.
    """
    det_step = make_detection_step(cfg, model, jit=False)
    trk_step = make_device_tracker_step(link_apply, jit=False, **tracker_kw)

    @jax.jit
    def scan_step(variables, link_params, state: TrackerState, frame_ids,
                  pts, imgs, xys):
        def body(state, frame):
            fid, p, im, xy = frame
            det = det_step(variables, p, im, xy)
            scores = jnp.where(det['keep'][0], det['scores'][0], -1.0)
            top = jax.lax.top_k(scores, track_k)[1]
            state, out = trk_step(
                state, fid, det['boxes'][0][top], scores[top],
                det['feats'][0][top], scores[top] > det_score_thresh,
                link_params)
            packed = jnp.concatenate([
                out['tid'].astype(jnp.float32)[:, None],
                out['box'], out['score'][:, None],
                out['emit'].astype(jnp.float32)[:, None]], axis=1)
            return state, packed

        return jax.lax.scan(body, state, (frame_ids, pts, imgs, xys))

    return scan_step


class ScanPipeline:
    """Chunked streaming executor over make_scan_step: buffers `chunk`
    frames, runs them as one device program, fetches the PREVIOUS chunk's
    results while the next computes."""

    def __init__(self, cfg: Config, model: PointRCNN, variables,
                 link_apply: Callable, link_params, feat_dim: int,
                 chunk: int = 16, max_tracks: int = 64, track_k: int = 16,
                 det_score_thresh: float = 0.85, **tracker_kw):
        self.scan = make_scan_step(cfg, model, link_apply,
                                   track_k=track_k,
                                   det_score_thresh=det_score_thresh,
                                   **tracker_kw)
        self.variables = variables
        self.link_params = link_params
        self.chunk = chunk
        self.max_tracks = max_tracks
        self.feat_dim = feat_dim
        self.reset()

    def reset(self):
        self.state = init_state(self.max_tracks, self.feat_dim)
        self._buf = []
        self._pending = None  # (frame_ids, packed) of the previous chunk

    def push(self, frame_id: int, pts, img, xy):
        """Submit one frame; returns a list of (frame_id, rows) results
        (empty while buffering) — results arrive chunk-at-a-time."""
        self._buf.append((frame_id, pts, img, xy))
        if len(self._buf) < self.chunk:
            return []
        fids = np.array([b[0] for b in self._buf], np.int32)
        pts_s = np.stack([b[1] for b in self._buf])
        img_s = np.stack([b[2] for b in self._buf])
        xy_s = np.stack([b[3] for b in self._buf])
        self._buf = []
        self.state, packed = self.scan(self.variables, self.link_params,
                                       self.state, fids, pts_s, img_s, xy_s)
        done = self._drain()
        self._pending = (fids, packed)
        return done

    def flush(self):
        """Process any buffered tail (padded to a full chunk by repeating
        the last frame) and drain all results.  Terminal for the current
        sequence: the pad frames advance the tracker state, so call
        reset() before streaming another sequence."""
        out = []
        if self._buf:
            n = len(self._buf)
            last = self._buf[-1]
            while len(self._buf) < self.chunk - 1:
                self._buf.append(last)
            out.extend(self.push(last[0], *last[1:]))  # completes the chunk
            if self._pending is not None:  # keep only the n real frames
                fids, packed = self._pending
                self._pending = (fids[:n], packed[:n])
        out.extend(self._drain())
        return out

    def _drain(self):
        if self._pending is None:
            return []
        fids, packed = self._pending
        self._pending = None
        arr = np.asarray(packed)  # one fetch per chunk
        out = []
        for i, fid in enumerate(fids):
            emit = arr[i, :, 9] > 0.5
            rows = arr[i][emit]
            out.append((int(fid),
                        [(int(r[0]), r[1:8], float(r[8])) for r in rows]))
        return out


class JointPipeline:
    """Streams frames through the joint step with an N-frame fetch lag."""

    def __init__(self, cfg: Config, model: PointRCNN, variables,
                 link_apply: Callable, link_params, feat_dim: int,
                 max_tracks: int = 64, track_k: int = 16,
                 fetch_lag: int = 4, det_score_thresh: float = 0.85,
                 **tracker_kw):
        self.joint = make_joint_step(cfg, model, link_apply,
                                     track_k=track_k,
                                     det_score_thresh=det_score_thresh,
                                     **tracker_kw)
        self.variables = variables
        self.link_params = link_params
        self.max_tracks = max_tracks
        self.feat_dim = feat_dim
        self.fetch_lag = fetch_lag
        self.reset()

    def reset(self):
        self.state = init_state(self.max_tracks, self.feat_dim)
        self._pending = deque()

    def push(self, frame_id: int, pts, img, xy):
        """Submit one frame; returns the completed result of a frame
        `fetch_lag` steps back (or None while the pipeline fills)."""
        self.state, packed = self.joint(self.variables, self.link_params,
                                        self.state, jnp.asarray(frame_id),
                                        pts, img, xy)
        self._pending.append((frame_id, packed))
        if len(self._pending) > self.fetch_lag:
            return self._materialize(*self._pending.popleft())
        return None

    def flush(self):
        """Drain remaining frames' results."""
        out = [self._materialize(fid, p) for fid, p in self._pending]
        self._pending.clear()
        return out

    @staticmethod
    def _materialize(frame_id, packed):
        arr = np.asarray(packed)
        emit = arr[:, 9] > 0.5
        rows = arr[emit]
        return frame_id, [(int(r[0]), r[1:8], float(r[8])) for r in rows]
